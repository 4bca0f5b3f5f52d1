package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingCusum
import graft.streaming.StreamingCusum.{CusumBase, CusumEv}

/** Streaming CUSUM vs a stored baseline: day close on rollover with
  * q223's exact integer increment, quiet-day decay rows, replay /
  * straggler no-ops, unknown-type drop, idle finalization.
  */
class StreamingCusumSpec extends AnyFunSuite with TestSpark {

  private def ts(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-0$day%d $hour%02d:00:00")

  // baseline for type "a": 2 events/day over 3 days -> sum_t=6, n_days=3
  private val base = Map(
    "a" -> CusumBase("a", sum_t = 6L, n_days = 3L))

  test("rollover closes days with exact integer folds, quiet days " +
      "decay, stragglers/replays/unknown types are no-ops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[CusumEv]
    val query = StreamingCusum.alarms(
        stream.toDS().withWatermark("ts", "0 seconds"), base,
        idleMs = 100L * 24 * 3600 * 1000)
      .writeStream.format("memory").queryName("cusum_alarms")
      .outputMode("append").start()

    // day 1: 5 events of "a" (spike), plus an unknown type
    stream.addData(
      CusumEv("a", ts(1, 1), 1L), CusumEv("a", ts(1, 2), 2L),
      CusumEv("a", ts(1, 3), 3L), CusumEv("a", ts(1, 4), 4L),
      CusumEv("a", ts(1, 5), 5L),
      CusumEv("zzz", ts(1, 1), 90L))
    query.processAllAvailable()
    // nothing finalized yet: day 1 is still open
    assert(spark.table("cusum_alarms").count() == 0)

    // day 4 arrives: closes day 1 (x=5 -> S = 3*5-6 = 9 > 6 ALARM),
    // decays quiet days 2 (S=3) and 3 (S=0), opens day 4.
    // A replay of event 1 and a straggler into day 1 apply nothing.
    stream.addData(
      CusumEv("a", ts(4, 1), 10L),
      CusumEv("a", ts(1, 1), 1L), CusumEv("a", ts(1, 0), 0L))
    query.processAllAvailable()

    val rows = spark.table("cusum_alarms").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4), r.getString(5))))
      .toMap
    assert(rows.keySet == Set(("a", "2024-01-01"), ("a", "2024-01-02"),
      ("a", "2024-01-03")))
    assert(rows(("a", "2024-01-01")) == ((5L, 9L, true, null)))
    assert(rows(("a", "2024-01-02")) == ((0L, 3L, false, null)))
    assert(rows(("a", "2024-01-03")) == ((0L, 0L, false, null)))
    query.stop()
  }

  test("idle timeout finalizes the open day with closed_by=idle and " +
      "leaves a tombstone: a returning type resumes with the quiet " +
      "days zero-folded, matching the batch recompute") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // slow decay (mean 2/3 per day) so the statistic SURVIVES the idle
    // gap — a fresh restart after eviction would visibly diverge
    val slowBase = Map("b" -> CusumBase("b", sum_t = 2L, n_days = 3L))
    val stream = MemoryStream[CusumEv]
    val query = StreamingCusum.alarms(
        stream.toDS().withWatermark("ts", "0 seconds"), slowBase,
        // exactly the one-day contract minimum (alarms() rejects less:
        // a shorter timeout would silently drop events arriving back
        // into the idle-closed day); the day-5 watermark still fires it
        idleMs = 24L * 3600 * 1000)
      .writeStream.format("memory").queryName("cusum_evict")
      .outputMode("append").start()

    // day 1: 4 events, then the watermark jumps past day 1 + idle
    stream.addData(
      CusumEv("b", ts(1, 1), 1L), CusumEv("b", ts(1, 2), 2L),
      CusumEv("b", ts(1, 3), 3L), CusumEv("b", ts(1, 4), 4L))
    query.processAllAvailable()
    stream.addData(CusumEv("zzz", ts(5, 0), 99L)) // advances watermark only
    query.processAllAvailable()

    val rows = spark.table("cusum_evict").collect()
      .map(r => (r.getString(1),
        (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getString(5))))
      .toMap
    // day 1 finalized by idle: x=4 -> S = 3*4-2 = 10, alarm 10 > 2
    assert(rows == Map("2024-01-01" -> ((4L, 10L, true, "idle"))))

    // tombstone resume: day-6 arrival zero-folds quiet days 2-5
    // (10 -> 8 -> 6 -> 4 -> 2), day-7 rollover closes day 6 from the
    // DECAYED statistic: S = max(0, 2 + 3*1 - 2) = 3 (a fresh restart
    // would have read 1 — the divergence the tombstone exists to kill)
    stream.addData(CusumEv("b", ts(6, 1), 100L),
      CusumEv("b", ts(7, 1), 101L))
    query.processAllAvailable()
    val after = spark.table("cusum_evict").collect()
      .map(r => (r.getString(1),
        (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getString(5))))
      .toMap
    assert(after("2024-01-02") == ((0L, 8L, true, null)))
    assert(after("2024-01-03") == ((0L, 6L, true, null)))
    assert(after("2024-01-04") == ((0L, 4L, true, null)))
    assert(after("2024-01-05") == ((0L, 2L, false, null)))
    assert(after("2024-01-06") == ((1L, 3L, true, null)))
    query.stop()
  }

  test("file-landing e2e: baseline artifact read, landing drops folded " +
      "through the checkpoint") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cusum")
    val landing = s"$dir/landing"
    val out = s"$dir/out"
    Seq(("a", 6L, 3L)).toDF("event_type", "sum_t", "n_days")
      .write.parquet(s"$dir/baseline")
    Seq(CusumEv("a", ts(1, 1), 1L), CusumEv("a", ts(1, 2), 2L),
      CusumEv("a", ts(1, 3), 3L), CusumEv("a", ts(2, 1), 4L))
      .toDS().write.parquet(landing)
    StreamingCusum.start(spark, landing, s"$dir/baseline", out,
        idleMs = 100L * 24 * 3600 * 1000, watermarkDelay = "0 seconds")
      .awaitTermination()
    val rows = spark.read.parquet(s"$out/cusum").collect()
      .map(r => r.getString(1) -> r.getLong(3)).toMap
    // day 1 (x=3): S = 3*3-6 = 3; day 2 still open
    assert(rows == Map("2024-01-01" -> 3L))
  }

  test("a sub-day idleMs is rejected up front — the documented " +
      "tombstone contract is machine-checked, not silent event loss") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[CusumEv]
    val e = intercept[IllegalArgumentException] {
      StreamingCusum.alarms(
        stream.toDS().withWatermark("ts", "0 seconds"), base,
        idleMs = 12L * 3600 * 1000)
    }
    assert(e.getMessage.contains("at least one day"))
  }
}
