package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingGeo
import graft.streaming.StreamingGeo.GeoEv

/** Always-on proximity monitor semantics: cross-batch alerts equal a
  * brute-force new-vs-earlier scan (banding completeness, the q264
  * guarantee, across the persisted index), within-batch pairs stay the
  * batch query's job, and a restart drains from the checkpoint without
  * duplicate alerts.
  */
class StreamingGeoSpec extends AnyFunSuite with TestSpark {

  private def h32(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16)
  }

  private def pos(eventId: Long, userId: Long): (Long, Long) = (
    h32(s"$userId:blat") % 500000 + h32(s"$eventId:jlat") % 10000 - 5000,
    h32(s"$userId:blon") % 500000 + h32(s"$eventId:jlon") % 10000 - 5000)

  private def hav(la1: Long, lo1: Long, la2: Long, lo2: Long): Double = {
    val k = 1.7453292519943295e-8
    val h = math.sin((la2 - la1) * k / 2) * math.sin((la2 - la1) * k / 2) +
      math.cos(la1 * k) * math.cos(la2 * k) *
        math.sin((lo2 - lo1) * k / 2) * math.sin((lo2 - lo1) * k / 2)
    2.0 * 6371000.0 * math.asin(math.sqrt(h))
  }

  private def ts(sec: Long): Timestamp =
    new Timestamp(1700000000000L + sec * 1000)

  test("cross-batch alerts == brute force against the prior index; " +
      "within-batch pairs silent; restart-safe (no duplicates)") {
    import spark.implicits._
    val landing = java.nio.file.Files
      .createTempDirectory("graft-geo-in").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft-geo-out").toString
    def land(name: String, evs: Seq[GeoEv]): Unit = {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-geo-wave").toString
      evs.toDS().coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(landing, name))
    }
    def drain(): Unit =
      StreamingGeo.start(spark, landing, out).awaitTermination()
    def alerts(): Set[(Long, Long, Long, Long)] =
      spark.read.parquet(s"$out/alerts").collect()
        .map(r => (r.getAs[Long]("u_new"), r.getAs[Long]("u_old"),
          r.getAs[Long]("hour"), r.getAs[Long]("m"))).toSet

    // wave 1: users 1-150 ping at hour 0; wave 2: users 151-300 at the
    // same hour — only NEW-vs-EARLIER pairs may alert
    val w1u = (1L to 150L)
    val w2u = (151L to 300L)
    land("w1.parquet", w1u.map(u => GeoEv(u * 10, u, ts(60))))
    drain()
    assert(alerts().isEmpty,
      "first batch has no earlier index — within-batch pairs are the " +
        "batch query's job")
    land("w2.parquet", w2u.map(u => GeoEv(u * 10, u, ts(120))))
    drain()
    val got = alerts()
    // brute force: every (new, old) pair within 500 m at hour 0
    val hourOf = math.floor((1700000000L + 60) / 3600.0).toLong
    val oldPts = w1u.map(u => (u, pos(u * 10, u)))
    val newPts = w2u.map(u => (u, pos(u * 10, u)))
    val expect = (for {
      (un, (la1, lo1)) <- newPts
      (uo, (la2, lo2)) <- oldPts
      m = math.round(hav(la1, lo1, la2, lo2)) if m <= 500L
    } yield (un, uo, hourOf, m)).toSet
    assert(expect.nonEmpty, "planted population produced no encounters")
    assert(got == expect,
      s"missing=${expect -- got} extra=${got -- expect}")
    // restart with nothing new: no duplicate alerts, same partitions
    drain()
    assert(alerts() == got)
    val batches = new java.io.File(s"$out/alerts").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).sorted
    assert(batches.length == 2, batches.toSeq.toString)
    // the incremental occupancy summaries landed per batch
    val occ = new java.io.File(s"$out/occ").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).sorted
    assert(occ.length == 2, occ.toSeq.toString)
  }

  test("hot-cell salting engaged everywhere (hotOccupancy=0, lanes " +
      "from the occ summaries) alerts EXACTLY the unsalted pairs") {
    import spark.implicits._
    def run(outDir: String, hot: Long): Set[(Long, Long, Long, Long)] = {
      val landing = java.nio.file.Files
        .createTempDirectory("graft-geo-in2").toString
      def land(name: String, evs: Seq[GeoEv]): Unit = {
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-geo-wave2").toString
        evs.toDS().coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(landing, name))
      }
      land("w1.parquet", (1L to 150L).map(u => GeoEv(u * 10, u, ts(60))))
      StreamingGeo.start(spark, landing, outDir,
        hotOccupancy = hot).awaitTermination()
      land("w2.parquet",
        (151L to 300L).map(u => GeoEv(u * 10, u, ts(120))))
      StreamingGeo.start(spark, landing, outDir,
        hotOccupancy = hot).awaitTermination()
      spark.read.parquet(s"$outDir/alerts").collect()
        .map(r => (r.getAs[Long]("u_new"), r.getAs[Long]("u_old"),
          r.getAs[Long]("hour"), r.getAs[Long]("m"))).toSet
    }
    val plain = run(java.nio.file.Files
      .createTempDirectory("graft-geo-o1").toString, Long.MaxValue)
    val salted = run(java.nio.file.Files
      .createTempDirectory("graft-geo-o2").toString, 0L)
    assert(plain.nonEmpty)
    assert(salted == plain,
      s"missing=${plain -- salted} extra=${salted -- plain}")
  }
}
