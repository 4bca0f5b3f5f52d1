package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.core.Tables

/** Skew-safe gap sessionization (the two-phase cure for q43's scale
  * hazard: a Window partitioned by user_id alone sorts EVERY event of a
  * hot user in one task, and AQE's skew splitting does not apply to
  * Window).
  *
  * Phase 1 keys the window by (user_id, time block): a hot user's events
  * spread over as many tasks as they span blocks, each task sorting only
  * its block. Per (user, block) it emits a mergeable summary — local
  * session count, first/last event time, event count.
  *
  * Phase 2 runs per-user over BLOCK SUMMARIES (one row per user-block,
  * bounded by time range / block size — independent of event rate, so no
  * hot key can reform): two sessions merge across a block boundary iff
  * the next block's first event is within `gapMinutes` of the previous
  * block's last, so
  *
  *   n_sessions(user) = sum(local sessions) - (merged boundaries).
  *
  * Identical results to the single-window form (SkewSpec pins equality on
  * a planted hot user; q54's oracle is the same SQL as q43's). The block
  * width is the skew knob: width >> gap keeps boundary merges meaningful,
  * narrower width spreads hotter users further.
  */
object Sessionize {

  /** Per-user (n_sessions, n_events) with a >gapMinutes silence starting
    * a new session. `events` needs columns user_id, ts, event_id.
    */
  def sessionCountsAtScale(
      events: DataFrame,
      gapMinutes: Int = 30,
      blockMinutes: Int = 360): DataFrame = {
    val gap: Column = expr(s"INTERVAL $gapMinutes MINUTE")
    val blk = (unix_timestamp(col("ts")) / lit(blockMinutes * 60L))
      .cast("long").as("__blk")

    // Phase 1: local sessionization inside each (user, block) — the
    // window shuffle is keyed on BOTH, which is what spreads a hot user.
    val wBlk = Window.partitionBy(col("user_id"), col("__blk"))
      .orderBy(col("ts"), col("event_id"))
    val flagged = events
      .select(col("user_id"), col("ts"), col("event_id"), blk)
      .withColumn("ns", when(
        lag(col("ts"), 1).over(wBlk).isNull ||
          col("ts") > lag(col("ts"), 1).over(wBlk) + gap, 1).otherwise(0))
    val summaries = flagged
      .groupBy(col("user_id"), col("__blk"))
      .agg(
        sum(col("ns")).as("local_sessions"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"),
        count(lit(1)).as("n_events"))

    // Phase 2: merge across block boundaries on the tiny summary table.
    val wUser = Window.partitionBy(col("user_id")).orderBy(col("__blk"))
    val prevLast = lag(col("last_ts"), 1).over(wUser)
    summaries
      .withColumn("merged", when(
        prevLast.isNotNull && col("first_ts") <= prevLast + gap, 1)
        .otherwise(0))
      .groupBy(col("user_id"))
      .agg(
        (sum(col("local_sessions")) - sum(col("merged")))
          .cast("long").as("n_sessions"),
        sum(col("n_events")).as("n_events"))
  }

  def defs: Seq[Q] = Seq(
    // Same semantics (and same oracle SQL) as q43, computed through the
    // skew-safe two-phase operator.
    Q("q54_sessionize_scale",
      (s, d) =>
        sessionCountsAtScale(Tables.load(s, d, "events"))
          .orderBy(col("user_id")),
      Some("""WITH flagged AS (
                SELECT user_id,
                       CASE WHEN LAG(ts) OVER w IS NULL
                              OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS ns
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
              SELECT user_id,
                     CAST(SUM(ns) AS BIGINT) AS n_sessions,
                     COUNT(*) AS n_events
              FROM flagged GROUP BY user_id ORDER BY user_id"""))
  )
}
