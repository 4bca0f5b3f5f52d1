package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamJoin

/** Stream-stream watermarked interval join: streamed matches equal the
  * batch join on the on-time subset, out-of-window clicks never match,
  * and a view arriving behind both watermarks is dropped by the state
  * store rather than joined retroactively.
  */
class StreamJoinSpec extends AnyFunSuite with TestSpark {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("stream-stream interval join == batch join on on-time rows; late view dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val views = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val joined = StreamJoin.attributed(
      views.toDF().toDF("v_user", "vts"),
      clicks.toDF().toDF("c_user", "cts", "click_id"),
      within = "10 minutes", watermark = "15 minutes")

    val query = joined.writeStream
      .format("memory").queryName("attributed")
      .outputMode("append")
      .start()

    // batch 1: views for users 1 and 2, plus a click by user 1 three
    // minutes after its view (in window) and one 20 minutes after the
    // view (outside the 10-minute window)
    views.addData((1L, ts(0)), (2L, ts(1)))
    clicks.addData((1L, ts(3), 100L), (1L, ts(20), 101L))
    query.processAllAvailable()

    // batch 2: user 2 clicks in-window against batch-1 view state; the
    // 10:59 pair on both sides pushes both watermarks to ~10:44
    views.addData((9L, ts(59)))
    clicks.addData((2L, ts(8), 200L), (9L, ts(59), 999L))
    query.processAllAvailable()

    // batch 3: a LATE view for user 1 at 10:12 — in-window for click
    // 101 (cts 10:20) by timestamps alone, but behind both watermarks
    // (~10:44): the state store must drop it, never join retroactively
    views.addData((1L, ts(12)))
    query.processAllAvailable()
    query.stop()

    val got = spark.table("attributed")
      .select(col("click_id"), col("user_id"),
        unix_timestamp(col("vts")).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val want = Set(
      (100L, 1L, ts(0).getTime / 1000),
      (200L, 2L, ts(1).getTime / 1000),
      (999L, 9L, ts(59).getTime / 1000))
    assert(got == want, s"got $got want $want")

    // the SAME operator on batch frames (watermarks no-op) over the
    // on-time rows gives the identical answer — click 101 has no
    // in-window on-time view in either mode
    val bViews = Seq((1L, ts(0)), (2L, ts(1)), (9L, ts(59)))
      .toDF("v_user", "vts")
    val bClicks = Seq((1L, ts(3), 100L), (1L, ts(20), 101L),
      (2L, ts(8), 200L), (9L, ts(59), 999L))
      .toDF("c_user", "cts", "click_id")
    val batch = StreamJoin.attributed(bViews, bClicks,
        within = "10 minutes", watermark = "15 minutes")
      .select(col("click_id"), col("user_id"),
        unix_timestamp(col("vts")).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch == want, s"batch $batch want $want")
  }
}
