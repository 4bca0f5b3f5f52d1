package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Advanced
import graft.streaming.StreamingAb
import graft.streaming.StreamingAb.AbEv

/** Always-on A/B monitor semantics: the cumulative readout after any
  * sequence of waves equals the batch q242 (`Advanced.abTest`) on the
  * union of landed events — the batch/streaming parity contract — a
  * user emits at most two deltas ever, and a restart drains from the
  * checkpoint without double counting.
  */
class StreamingAbSpec extends AnyFunSuite with TestSpark {

  private def ts(sec: Long): Timestamp = new Timestamp(1700000000000L + sec * 1000)

  test("monitor readout == batch abTest on the landed union; a second " +
      "wave converting an old user adds exactly one delta; restart-safe") {
    import spark.implicits._
    val landing = java.nio.file.Files
      .createTempDirectory("graft-ab-in").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft-ab-out").toString
    def land(name: String, evs: Seq[AbEv]): Unit = {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-ab-wave").toString
      evs.toDS().coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(landing, name))
    }
    def drain(): Unit =
      StreamingAb.start(spark, landing, out).awaitTermination()
    def readout() = {
      val dirs = new java.io.File(s"$out/readouts").listFiles()
        .filter(_.getName.startsWith("batch=")).map(_.getName)
        .map(n => n.stripPrefix("batch=").toLong).max
      spark.read.parquet(s"$out/readouts/batch=$dirs").collect().head
    }
    def batchOn(evs: Seq[AbEv]) =
      Advanced.abTest(evs.toDF(), "purchase").collect().head

    // wave 1: users 1-20 view; odd users purchase
    val w1 = (1L to 20L).flatMap { u =>
      Seq(AbEv(u, ts(u), u * 10, "view")) ++
        (if (u % 2 == 1) Seq(AbEv(u, ts(u + 100), u * 10 + 1, "purchase"))
         else Nil)
    }
    land("w1.parquet", w1)
    drain()
    val r1 = readout()
    val b1 = batchOn(w1)
    assert((0 to 7).forall(i => r1.get(i) == b1.get(i)),
      s"wave-1 parity: $r1 vs $b1")

    // wave 2: user 2 (previously unconverted) purchases; user 3
    // (already converted) purchases AGAIN — must add nothing; user 21
    // is brand new and converts immediately
    val w2 = Seq(
      AbEv(2L, ts(300), 901L, "purchase"),
      AbEv(3L, ts(301), 902L, "purchase"),
      AbEv(21L, ts(302), 903L, "purchase"))
    land("w2.parquet", w2)
    drain()  // fresh query, same checkpoint: restart-safe continuation
    val r2 = readout()
    val b2 = batchOn(w1 ++ w2)
    assert((0 to 7).forall(i => r2.get(i) == b2.get(i)),
      s"wave-2 parity: $r2 vs $b2")

    // the delta table stays O(|users|): 21 first-sight rows + exactly
    // one later-conversion row for user 2
    val nDeltas = spark.read.parquet(s"$out/deltas").count()
    assert(nDeltas == 22L, s"expected 22 delta rows, got $nDeltas")
  }
}
