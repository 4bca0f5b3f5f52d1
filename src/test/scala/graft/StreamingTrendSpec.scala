package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Advanced
import graft.streaming.StreamingTrend
import graft.streaming.StreamingTrend.TrendEv

/** Streaming EWMA: levels carried across micro-batches must be
  * BIT-EQUAL to the batch q208 fold on the union of applied events
  * (the recurrence never reassociates); replays/stragglers are no-ops;
  * idle eviction emits the final level and removes state.
  */
class StreamingTrendSpec extends AnyFunSuite with TestSpark {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("cross-batch levels are bit-equal to the batch q208 fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[TrendEv]
    val query = StreamingTrend.levels(stream.toDS(), 0.3)
      .writeStream.format("memory").queryName("trend_levels")
      .outputMode("append").start()

    // user 1 split across batches OUT OF ORDER within each batch;
    // user 2 in one batch
    stream.addData(
      TrendEv(1L, ts(2), 2L, 20.0), TrendEv(1L, ts(1), 1L, 10.0),
      TrendEv(2L, ts(1), 5L, 4.25))
    query.processAllAvailable()
    stream.addData(
      TrendEv(1L, ts(9), 4L, 5.5), TrendEv(1L, ts(5), 3L, 30.0),
      // replay of an applied event and an out-of-order straggler: no-ops
      TrendEv(1L, ts(1), 1L, 999.0), TrendEv(2L, ts(0), 0L, 999.0))
    query.processAllAvailable()

    val snaps = spark.table("trend_levels").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // one snapshot per (batch, user-with-applied-events); the replayed
    // straggler batch applied nothing for user 2 -> no second user-2 row
    assert(snaps.count(_._1 == 1L) == 2)
    assert(snaps.count(_._1 == 2L) == 1)

    // final levels: BIT-equal to the literal left fold on the applied
    // union (same op sequence, just split at the batch boundary)
    def foldOf(vs: Double*) =
      vs.reduceLeft((e, x) => 0.3 * x + (1.0 - 0.3) * e)
    val last1 = snaps.filter(_._1 == 1L).maxBy(_._2)
    assert(last1 == ((1L, 4L, foldOf(10.0, 20.0, 30.0, 5.5))))
    assert(snaps.find(_._1 == 2L).get == ((2L, 1L, 4.25)))

    // and to the batch q208 on the same events (4-dp display rounding)
    val batch = Seq(
      (1L, ts(1), 1L, 10.0), (1L, ts(2), 2L, 20.0), (1L, ts(5), 3L, 30.0),
      (1L, ts(9), 4L, 5.5), (2L, ts(1), 5L, 4.25))
      .toDF("user_id", "ts", "event_id", "value")
    val q208 = Advanced.ewmaTrend(batch, 0.3).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(q208(1L) ==
      BigDecimal(last1._3).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    assert(q208(2L) == 4.25)
    query.stop()
  }

  test("idle eviction emits the final level, fresh fold after") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[TrendEv]
    val query = StreamingTrend
      .levelsEvicting(stream.toDS().withWatermark("ts", "0 seconds"),
        0.5, idleMs = 3L * 60 * 1000)
      .writeStream.format("memory").queryName("trend_evict")
      .outputMode("append").start()

    // user 1: two events then silence; user 9 drives the watermark
    stream.addData(TrendEv(1L, ts(1), 1L, 2.0), TrendEv(1L, ts(2), 2L, 4.0))
    query.processAllAvailable()
    stream.addData(TrendEv(9L, ts(30), 9L, 1.0))
    query.processAllAvailable()
    // one more batch so the timeout fires against the advanced watermark
    stream.addData(TrendEv(9L, ts(31), 10L, 1.0))
    query.processAllAvailable()

    val rows = spark.table("trend_evict").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        Option(r.getString(3))))
    val idle = rows.filter(_._4.contains("idle"))
    assert(idle.toSeq == Seq((1L, 2L, 0.5 * 4.0 + 0.5 * 2.0, Some("idle"))),
      s"got ${rows.toSeq}")

    // an event after eviction starts a FRESH level, not a continuation
    stream.addData(TrendEv(1L, ts(40), 11L, 7.0))
    query.processAllAvailable()
    val live1 = spark.table("trend_evict").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        Option(r.getString(3))))
      .filter(r => r._1 == 1L && r._4.isEmpty).toSet
    // the pre-eviction batch snapshot (n=2), then the post-eviction
    // fresh fold seeded from NOTHING (n=1, level = the raw value)
    assert(live1 == Set((1L, 2L, 3.0, None), (1L, 1L, 7.0, None)),
      s"got $live1")
    query.stop()
  }

  test("trend CLI wiring: file landing -> levels parquet, restart-safe") {
    import spark.implicits._
    val landing = java.nio.file.Files
      .createTempDirectory("graft-trend-in").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft-trend-out").toString
    def land(name: String, evs: Seq[TrendEv]): Unit = {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-trend-wave").toString
      evs.toDS().coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(landing, name))
    }
    def drain(): Unit = StreamingTrend.startLevels(spark, landing, out,
      alpha = 0.5, idleMs = 3L * 60 * 1000, watermarkDelay = "0 seconds")
      .awaitTermination()
    def levelsOut() = spark.read.parquet(s"$out/levels").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        Option(r.getString(3)))).toSet

    land("w1.parquet", Seq(TrendEv(1L, ts(1), 1L, 2.0),
      TrendEv(1L, ts(2), 2L, 4.0)))
    drain()
    assert(levelsOut() == Set((1L, 2L, 3.0, None)), s"got ${levelsOut()}")

    // restarted query: the checkpoint carries the level across
    // restarts; a far-future event advances the watermark, the next
    // wave fires the idle eviction
    land("w2.parquet", Seq(TrendEv(1L, ts(3), 3L, 9.0),
      TrendEv(9L, ts(40), 9L, 1.0)))
    drain()
    land("w3.parquet", Seq(TrendEv(9L, ts(45), 10L, 1.0)))
    drain()
    val got = levelsOut()
    // wave-2 snapshot continued the CHECKPOINTED level: .5*9 + .5*3 = 6
    assert(got.contains((1L, 3L, 6.0, None)), s"got $got")
    assert(got.contains((1L, 3L, 6.0, Some("idle"))), s"got $got")
  }
}
