package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Session
import graft.streaming.Sessions

/** The streaming operators must run unchanged on the RocksDB state
  * store (the bounded-memory provider the always-on deployments need):
  * same stateful answers as the default in-heap provider, state
  * genuinely held by RocksDB (provider conf honored at query start).
  */
class StreamingRocksDbSpec extends AnyFunSuite with TestSpark {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("gapAlerts under RocksDB state store == in-heap answers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prior = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    Session.rocksdbStateStore(spark)
    try {
      val stream = MemoryStream[Sessions.Beat]
      val query = Sessions.gapAlerts(stream.toDS(), gapMs = 15L * 60 * 1000)
        .writeStream.format("memory").queryName("gap_alerts_rocks")
        .outputMode("append").start()
      // the StreamingSpec scenario verbatim: user 1 goes silent, user 2
      // keeps beating, the watermark passes user 1's armed timeout
      stream.addData(Sessions.Beat(1L, ts(0)), Sessions.Beat(2L, ts(0)))
      query.processAllAvailable()
      stream.addData(Sessions.Beat(2L, ts(50)), Sessions.Beat(99L, ts(60)))
      query.processAllAvailable()
      stream.addData(Sessions.Beat(99L, ts(61)))
      query.processAllAvailable()
      // the running query really is on RocksDB
      val progress = query.lastProgress.stateOperators
      query.stop()
      val alerts = spark.table("gap_alerts_rocks").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
      assert(alerts == Set((1L, ts(0))), s"got $alerts")
      assert(progress.exists(_.customMetrics.keySet.toString
          .contains("rocksdb")),
        s"state operators report no rocksdb metrics: ${progress.toSeq}")
    } finally {
      prior match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
