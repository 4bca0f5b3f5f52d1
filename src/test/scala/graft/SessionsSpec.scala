package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Sessions

/** Session windows: native session_window vs the batch lag/cumsum
  * sessionization on real testdata, streaming session merging across
  * micro-batches, and mapGroupsWithState state persistence.
  */
class SessionsSpec extends AnyFunSuite with TestSpark {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("session_window counts == lag/cumsum sessionization on real events") {
    val events = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val viaSessionWindow = Sessions.sessionCountsPerUser(events)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    // the q43 formulation: new-session flag where the gap exceeds 30 min
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val viaLag = events
      .withColumn("ns", when(
        lag(col("ts"), 1).over(w).isNull ||
          col("ts") > lag(col("ts"), 1).over(w) + expr("INTERVAL 30 MINUTE"),
        1).otherwise(0))
      .groupBy(col("user_id"))
      .agg(sum(col("ns")).cast("long").as("n_sessions"),
        count(lit(1)).as("n_events"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    assert(viaSessionWindow == viaLag)
  }

  test("streaming session_window merges events arriving across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val stream = MemoryStream[(Timestamp, Long)]
    val events = stream.toDF().toDF("ts", "user_id")
    // session-window aggregations only support append mode on streams:
    // a session row is emitted once, when the watermark passes its end
    val query = Sessions.sessionCounts(events, gap = "30 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("sess_counts")
      .outputMode("append").start()

    // user 1: 10:00 and 10:10 are one session; user 2 isolated at 10:05
    stream.addData(Seq((ts(0), 1L), (ts(10), 1L), (ts(5), 2L)))
    query.processAllAvailable()
    // 10:25 is within 30 min of 10:10 -> still session 1 for user 1
    stream.addData(Seq((ts(25), 1L)))
    query.processAllAvailable()
    // watermark-advancing event (13:00), then one more batch so the
    // closed sessions are emitted downstream of the new watermark
    stream.addData(Seq((Timestamp.valueOf("2024-01-01 13:00:00"), 99L)))
    query.processAllAvailable()
    stream.addData(Seq((Timestamp.valueOf("2024-01-01 13:01:00"), 99L)))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("sess_counts")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3)))
    // user 1 has ONE merged session starting 10:00 holding all 3 events
    assert(rows.count(_._1 == 1L) == 1, s"user 1 sessions: ${rows.mkString(",")}")
    assert(rows.find(_._1 == 1L).get._3 == 3L)
    assert(rows.find(_._1 == 2L).get._3 == 1L)
  }

  test("mapGroupsWithState accumulates per-user state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val stream = MemoryStream[Sessions.Ev]
    val query = Sessions.runningTotals(stream.toDS())
      .writeStream.format("memory").queryName("run_totals")
      .outputMode("update").start()

    stream.addData(Sessions.Ev(1L, 2.0), Sessions.Ev(1L, 3.0), Sessions.Ev(2L, 10.0))
    query.processAllAvailable()
    stream.addData(Sessions.Ev(1L, 5.0))
    query.processAllAvailable()
    query.stop()

    // latest state per user: user 1 saw 3 events totalling 10.0
    val latest = spark.table("run_totals")
      .groupBy("user_id").agg(max("events").as("e"), max("total").as("t"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(latest(1L) == ((3L, 10.0)))
    assert(latest(2L) == ((1L, 10.0)))
  }

  test("gapAlerts: silent key fires from the state store when the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(minute: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

    val stream = MemoryStream[Sessions.Beat]
    // gap 15 min of event time, watermark delay 5 min
    val query = Sessions.gapAlerts(stream.toDS(), gapMs = 15L * 60 * 1000)
      .writeStream.format("memory").queryName("gap_alerts")
      .outputMode("append").start()

    // batch 1: users 1 and 2 both beat at 10:00
    stream.addData(Sessions.Beat(1L, ts(0)), Sessions.Beat(2L, ts(0)))
    query.processAllAvailable()
    // batch 2: user 2 keeps beating (10:50 -> timeout re-armed to 11:05);
    // user 1 goes silent (timeout stays armed at 10:15); the 11:00 beat
    // moves the watermark to 10:55 AFTER this batch
    stream.addData(Sessions.Beat(2L, ts(50)), Sessions.Beat(99L, ts(60)))
    query.processAllAvailable()
    // batch 3: watermark 10:55 now applies -> user 1's 10:15 timeout
    // fires FROM STATE (no user-1 row anywhere in this batch);
    // user 2 (11:05) and the fresh 99 stay live
    stream.addData(Sessions.Beat(99L, ts(61)))
    query.processAllAvailable()
    query.stop()

    val alerts = spark.table("gap_alerts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    assert(alerts == Set((1L, ts(0))), s"got $alerts")
  }
}
