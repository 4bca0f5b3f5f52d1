package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventWindows

/** Q24 streaming path: event-time tumbling windows with watermark —
  * batch equivalence and late-data drop (SURVEY §5.2 item 6).
  */
class StreamingSpec extends AnyFunSuite with TestSpark {

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  test("streaming tumbling counts match the batch form; late rows dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Timestamp, Long)]
    val events = stream.toDF().toDF("ts", "user_id")
    val agg = EventWindows.tumblingCounts(events,
      windowLength = "5 minutes", watermark = "10 minutes")

    // default micro-batch trigger: processAllAvailable() drains each
    // addData batch synchronously (AvailableNow would finish and stop
    // before the first addData).
    val query = agg.writeStream
      .format("memory").queryName("win_counts")
      .outputMode("update")
      .start()

    // batch 1: events in windows [10:00,10:05) and [10:05,10:10), plus a
    // max event time of 10:30 to advance the watermark to 10:20.
    stream.addData(Seq(
      (ts(1), 1L), (ts(2), 2L), (ts(6), 3L), (ts(7), 4L), (ts(30), 5L))
      .map { case (t, u) => (t, u) })
    query.processAllAvailable()

    // batch 2: an event at 10:03 — BEFORE the 10:20 watermark — must be
    // dropped; an event at 10:31 lands normally.
    stream.addData(Seq((ts(3), 9L), (ts(31), 6L)))
    query.processAllAvailable()
    query.stop()

    val res = spark.table("win_counts")
      .groupBy("win_start").agg(max("n").as("n"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toMap

    assert(res(ts(0)) == 2L, "window [10:00,10:05) should hold exactly the 2 on-time events")
    assert(res(ts(5)) == 2L)
    assert(res(ts(30)) == 2L, "10:30 + 10:31 share the [10:30,10:35) window")
    // the late 10:03 event did NOT bump the first window
    assert(!res.exists { case (w, n) => w == ts(0) && n > 2 })
  }

  test("window() form and q24 bucket form agree on batch data") {
    import spark.implicits._
    val batch = Seq(
      (ts(1), 1L), (ts(2), 2L), (ts(6), 3L), (ts(12), 4L), (ts(13), 5L))
      .toDF("ts", "user_id")
    val viaWindow = EventWindows.tumblingCounts(batch)
      .select(unix_timestamp(col("win_start")).as("sec"), col("n"))
      .collect().map(r => (r.getLong(0) / 300, r.getLong(1))).toMap
    val viaBucket = EventWindows.bucketCounts(batch)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaWindow == viaBucket)
  }
}
