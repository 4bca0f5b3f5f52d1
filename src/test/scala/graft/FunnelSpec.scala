package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Funnel
import graft.streaming.Funnel.{FunnelEv, StageReached}

/** Streaming funnel state machine: stage rows across split micro-batches
  * must equal the strict q150 chain on the union, pre-stage events and
  * re-deliveries must be no-ops.
  */
class FunnelSpec extends AnyFunSuite with TestSpark {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("cross-batch stage chain == batch chain; replays and stragglers are no-ops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[FunnelEv]
    val query = Funnel.stages(stream.toDS())
      .writeStream.format("memory").queryName("funnel_stages")
      .outputMode("append").start()

    // batch 1: user 1 views; user 2 clicks BEFORE any view (no-op)
    stream.addData(
      FunnelEv(1L, "view", ts(1)),
      FunnelEv(2L, "click", ts(1)), FunnelEv(2L, "view", ts(2)))
    query.processAllAvailable()
    // batch 2: user 1 advances twice in one batch; user 2's click at the
    // SAME instant as its view is excluded by the strict rule; a replay
    // of user 1's view is a no-op
    stream.addData(
      FunnelEv(1L, "click", ts(3)), FunnelEv(1L, "purchase", ts(5)),
      FunnelEv(2L, "click", ts(2)),
      FunnelEv(1L, "view", ts(1)))
    query.processAllAvailable()
    // batch 3: user 2 finally clicks strictly after its view; a second
    // view for user 2 is a no-op (stage already passed)
    stream.addData(
      FunnelEv(2L, "click", ts(6)), FunnelEv(2L, "view", ts(4)))
    query.processAllAvailable()
    query.stop()

    val got = spark.table("funnel_stages").as[StageReached].collect()
      .map(s => (s.user_id, s.stage, s.at)).toSet
    val want = Set(
      (1L, 1, ts(1)), (1L, 2, ts(3)), (1L, 3, ts(5)),
      (2L, 1, ts(2)), (2L, 2, ts(6)))
    assert(got == want, s"got $got want $want")
  }
}
