package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Analytic operators beyond the reference's surface that a complete
  * engine needs: rollup with grouping flags, lag/lead deltas, filtered
  * aggregates, correlated scalar subqueries (Catalyst decorrelation),
  * an as-of join, and a time-range join.
  *
  * The as-of join is composed the scale-correct Spark way: union both
  * sides, ONE shuffle by key, and a running `last(..., ignoreNulls)`
  * window — never a per-row range probe. Cost is a single sort per key
  * group regardless of how many events each order precedes.
  */
object Advanced {

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    Tables.load(spark, sfDir, name)

  def defs: Seq[Q] = Seq(
    // ROLLUP with grouping() disambiguation (subtotal rows vs real null).
    Q("q39_rollup",
      (s, d) =>
        t(s, d, "orders")
          // grouping() must reference an attribute, not an inline alias
          .withColumn("yraw", year(col("o_orderdate")))
          .rollup(col("yraw"))
          .agg(count(lit(1)).as("n"),
            grouping(col("yraw")).cast("int").as("g"))
          .select(coalesce(col("yraw"), lit(-1)).cast("int").as("y"),
            col("g"), col("n"))
          .orderBy(col("y"), col("g")),
      Some("""SELECT COALESCE(CAST(YEAR(o_orderdate) AS INT), -1) AS y,
                     CAST(GROUPING(YEAR(o_orderdate)) AS INT) AS g,
                     COUNT(*) AS n
              FROM orders GROUP BY ROLLUP(YEAR(o_orderdate))
              ORDER BY y, g""")),

    // LAG with default: per-customer order-to-order price delta.
    Q("q40_lag_delta",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, d, "orders")
          .select(col("o_orderkey"),
            round(col("o_totalprice") - lag(col("o_totalprice"), 1, 0.0).over(w), 2)
              .as("diff"))
          .orderBy(col("o_orderkey"))
          .limit(200)
      },
      Some("""SELECT o_orderkey,
                     ROUND(o_totalprice - LAG(o_totalprice, 1, 0.0)
                           OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey), 2) AS diff
              FROM orders ORDER BY o_orderkey LIMIT 200""")),

    // Filtered aggregate (conditional count) per group.
    Q("q44_filtered_agg",
      (s, d) =>
        t(s, d, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(
            count(when(col("o_totalprice") > 100000, 1)).as("big"),
            count(lit(1)).as("n"))
          .orderBy(col("o_orderstatus")),
      Some("""SELECT o_orderstatus,
                     COUNT(*) FILTER (WHERE o_totalprice > 100000) AS big,
                     COUNT(*) AS n
              FROM orders GROUP BY 1 ORDER BY 1""")),

    // Correlated scalar subquery -> Catalyst decorrelates to an
    // aggregate + left outer join (no per-row execution).
    Q("q45_scalar_subquery",
      (s, d) =>
        Engine.sql(s, d,
          """SELECT c_custkey,
                    (SELECT MAX(o_totalprice) FROM orders o
                     WHERE o.o_custkey = c.c_custkey) AS mx
             FROM customer c ORDER BY c_custkey LIMIT 100"""),
      Some("""SELECT c_custkey,
                     (SELECT MAX(o_totalprice) FROM orders o
                      WHERE o.o_custkey = c.c_custkey) AS mx
              FROM customer c ORDER BY c_custkey LIMIT 100""")),

    // As-of join: latest order date at or before each event, per user.
    // Union + single key shuffle + running last(ignoreNulls) — the
    // composition that survives 100 TB (no range probe, no explosion).
    Q("q46_asof_join",
      (s, d) => {
        val events = t(s, d, "events").select(
          col("user_id").as("k"), col("ts").cast("timestamp").as("t"),
          col("event_id"), lit(1).as("is_event"))
        val orders = t(s, d, "orders").select(
          col("o_custkey").as("k"), col("o_orderdate").cast("timestamp").as("t"),
          lit(null).cast("long").as("event_id"), lit(0).as("is_event"))
        // orders sort before events at the same instant (<= semantics)
        val w = Window.partitionBy(col("k"))
          .orderBy(col("t"), col("is_event"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events.unionByName(orders)
          .withColumn("asof_t",
            last(when(col("is_event") === 0, col("t")), ignoreNulls = true).over(w))
          .filter(col("is_event") === 1)
          .select(col("event_id"),
            date_format(col("asof_t"), "yyyy-MM-dd").as("asof"))
          .orderBy(col("event_id"))
          .limit(200)
      },
      Some("""SELECT event_id,
                     (SELECT STRFTIME(MAX(o_orderdate), '%Y-%m-%d') FROM orders o
                      WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) AS asof
              FROM events e ORDER BY event_id LIMIT 200""")),

    // Time-range self join: same-user event pairs within one hour.
    Q("q47_range_join",
      (s, d) => {
        val e = t(s, d, "events")
        val a = e.select(col("user_id").as("k"), col("ts").as("ta"))
        val b = e.select(col("user_id").as("k"), col("ts").as("tb"))
        a.join(b,
          a("k") === b("k") && col("ta") < col("tb") &&
            col("tb") <= col("ta") + expr("INTERVAL 1 HOUR"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""SELECT COUNT(*) AS n FROM events a JOIN events b
              ON a.user_id = b.user_id AND a.ts < b.ts
             AND b.ts <= a.ts + INTERVAL 1 HOUR"""))
  )
}
