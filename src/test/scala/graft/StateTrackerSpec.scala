package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Advanced
import graft.streaming.StateTracker
import graft.streaming.StateTracker.TrackEv

/** Streaming SCD2: closed runs emitted across micro-batches must equal
  * the batch q176 history's CLOSED intervals on the union; replays and
  * stragglers are no-ops.
  */
class StateTrackerSpec extends AnyFunSuite with TestSpark {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("cross-batch closed runs == batch q176 closed intervals") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[TrackEv]
    val query = StateTracker.runs(stream.toDS())
      .writeStream.format("memory").queryName("scd2_runs")
      .outputMode("append").start()

    // user 1: A A | B A — two closes across the batch boundary;
    // user 2: C only — stays open, never emits
    stream.addData(
      TrackEv(1L, "A", ts(1), 1L), TrackEv(1L, "A", ts(2), 2L),
      TrackEv(2L, "C", ts(1), 3L))
    query.processAllAvailable()
    stream.addData(
      TrackEv(1L, "B", ts(5), 4L), TrackEv(1L, "A", ts(9), 5L),
      // replay of an already-applied event: no-op
      TrackEv(1L, "A", ts(2), 2L),
      // out-of-order straggler older than the applied watermark: dropped
      TrackEv(1L, "B", ts(1), 0L))
    query.processAllAvailable()

    val got = spark.table("scd2_runs").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), r.getTimestamp(3), r.getLong(4))).toSet
    assert(got == Set(
      (1L, "A", ts(1), ts(5), 2L),
      (1L, "B", ts(5), ts(9), 1L)), s"got $got")

    // the batch q176 on the SAME applied events agrees on closed rows
    val batch = Seq(
      (1L, ts(1), 1L, "A"), (2L, ts(1), 3L, "C"), (1L, ts(2), 2L, "A"),
      (1L, ts(5), 4L, "B"), (1L, ts(9), 5L, "A"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val closed = Advanced.stateHistory(batch)
      .filter($"valid_to".isNotNull)
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        Timestamp.valueOf(r.getString(2)), Timestamp.valueOf(r.getString(3)),
        r.getLong(4))).toSet
    assert(closed == got, s"batch=$closed stream=$got")
    query.stop()
  }

  test("idle eviction: open tail emitted as a final idle-closed run, state removed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[TrackEv]
    // 3-minute idle gap, zero watermark delay: once the watermark
    // passes lastMs + 3 min, the open run closes and the state evicts
    val query = StateTracker
      .runsEvicting(stream.toDS().withWatermark("ts", "0 seconds"),
        idleMs = 3L * 60 * 1000)
      .writeStream.format("memory").queryName("scd2_evict")
      .outputMode("append").start()

    // user 1: A A, then silence; user 9 keeps the watermark moving
    stream.addData(TrackEv(1L, "A", ts(1), 1L), TrackEv(1L, "A", ts(2), 2L))
    query.processAllAvailable()
    stream.addData(TrackEv(9L, "Z", ts(30), 3L))
    query.processAllAvailable() // wm -> ts(30): user 1 times out
    val got = spark.table("scd2_evict").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        r.getTimestamp(3), r.getLong(4), r.getString(5))).toSet
    assert(got == Set((1L, "A", ts(1), ts(2), 2L, "idle")), s"got $got")

    // a post-eviction event starts a FRESH run (state really removed):
    // same state A, but the later transition counts only the new event
    stream.addData(TrackEv(1L, "A", ts(40), 4L))
    query.processAllAvailable()
    stream.addData(TrackEv(1L, "B", ts(41), 5L))
    query.processAllAvailable()
    val after = spark.table("scd2_evict").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        r.getTimestamp(3), r.getLong(4), r.getString(5))).toSet
    assert(after.contains((1L, "A", ts(40), ts(41), 1L, "transition")),
      s"fresh run after eviction missing: $after")
    query.stop()
  }

  test("track e2e: landed parquet -> checkpointed runs, idle closes " +
      "fire across restarts") {
    // the `track` CLI's engine (r13 verdict #5): AvailableNow drains,
    // checkpoint carries the state + watermark across runs, closed
    // runs append to <out>/runs
    import spark.implicits._
    val landing = java.nio.file.Files
      .createTempDirectory("graft-track-in").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft-track-out").toString
    def land(name: String, evs: Seq[TrackEv]): Unit = {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-track-wave").toString
      evs.toDS().coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(landing, name))
    }
    def drain(): Unit = StateTracker.startTracking(spark, landing, out,
      idleMs = 3L * 60 * 1000, watermarkDelay = "0 seconds")
      .awaitTermination()
    def runsOut() = spark.read.parquet(s"$out/runs").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        r.getTimestamp(3), r.getLong(4), r.getString(5))).toSet

    // wave 1: user 1 transitions A -> B (closed run); user 2 open
    land("w1.parquet", Seq(TrackEv(1L, "A", ts(1), 1L),
      TrackEv(1L, "A", ts(2), 2L), TrackEv(1L, "B", ts(5), 3L),
      TrackEv(2L, "C", ts(5), 4L)))
    drain()
    assert(runsOut() == Set((1L, "A", ts(1), ts(5), 2L, "transition")),
      s"got ${runsOut()}")

    // waves 2+3 on RESTARTED queries: a far-future event advances the
    // checkpointed watermark past every idle horizon; the next batch
    // fires the timeouts — user 1's B tail and user 2's C run close as
    // idle with valid_to = their last observed event
    land("w2.parquet", Seq(TrackEv(9L, "Z", ts(40), 9L)))
    drain()
    land("w3.parquet", Seq(TrackEv(9L, "Z", ts(45), 10L)))
    drain()
    val got = runsOut()
    assert(got.contains((1L, "B", ts(5), ts(5), 1L, "idle")), s"got $got")
    assert(got.contains((2L, "C", ts(5), ts(5), 1L, "idle")), s"got $got")
  }

  test("same-instant events order by event_id, matching the q176 tie rule") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[TrackEv]
    val query = StateTracker.runs(stream.toDS())
      .writeStream.format("memory").queryName("scd2_ties")
      .outputMode("append").start()
    // B (id 1) then A (id 2) at the SAME ts: run B closes at the same
    // instant it opened
    stream.addData(TrackEv(3L, "B", ts(1), 1L), TrackEv(3L, "A", ts(1), 2L))
    query.processAllAvailable()
    val got = spark.table("scd2_ties").collect()
      .map(r => (r.getString(1), r.getLong(4))).toSet
    assert(got == Set(("B", 1L)), s"got $got")
    query.stop()
  }
}
