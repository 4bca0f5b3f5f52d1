package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.TextOps
import graft.streaming.StreamingPack
import graft.streaming.StreamingPack.PackDoc

/** Always-on sequence packer semantics: one-wave output equals the
  * batch q260 fold, a second wave CONTINUES each shard's open bin
  * (no per-batch repacking waste), and a restart drains from the
  * checkpoint without reassigning.
  */
class StreamingPackSpec extends AnyFunSuite with TestSpark {

  private def words(n: Int): String = Seq.fill(n)("w").mkString(" ")

  test("one wave == batch packSequences; wave 2 continues the open " +
      "bin; restart-safe continuation") {
    import spark.implicits._
    val landing = java.nio.file.Files
      .createTempDirectory("graft-pack-in").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft-pack-out").toString
    def land(name: String, docs: Seq[PackDoc]): Unit = {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-pack-wave").toString
      docs.toDS().coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(landing, name))
    }
    def drain(): Unit =
      StreamingPack.start(spark, landing, out, shards = 1, capacity = 5)
        .awaitTermination()
    def assigns(): Map[Long, Long] =
      spark.read.parquet(s"$out/assignments").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bin")).toMap

    // wave 1: token counts 3, 4 at capacity 5 -> bins 0, 1 (4 can't
    // join 3), bin 1 left with fill 4
    val w1 = Seq(PackDoc(1L, words(3)), PackDoc(2L, words(4)))
    land("w1.parquet", w1)
    drain()
    val a1 = assigns()
    // parity with the batch fold on the same single wave
    val batch1 = TextOps.packSequences(
      w1.toDF("doc_id", "text"), shards = 1, capacity = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(a1 == batch1 && a1 == Map(1L -> 0L, 2L -> 1L))

    // wave 2: count 1 FITS the open bin (fill 4+1=5); count 2 then
    // overflows into bin 2 — per-batch repacking would have restarted
    // at bin 0 and lost the continuation
    val w2 = Seq(PackDoc(3L, words(1)), PackDoc(4L, words(2)))
    land("w2.parquet", w2)
    drain() // fresh query, same checkpoint: restart-safe continuation
    val a2 = assigns()
    assert(a2 == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L), s"$a2")

    // draining again with nothing new reassigns nothing
    drain()
    assert(assigns() == a2)
    // batch partitions are the replay unit
    val dirs = new java.io.File(s"$out/assignments").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).sorted
    assert(dirs.length == 2, s"expected 2 batch partitions: ${dirs.toSeq}")
  }

  test("shards pack independently and state is per-shard") {
    import spark.implicits._
    val landing = java.nio.file.Files
      .createTempDirectory("graft-pack2-in").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft-pack2-out").toString
    // find doc ids landing in different shards under the md5 ":pack"
    // addressing at shards=2
    def shardOf(id: Long, shards: Int): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:pack".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16) % shards).toInt
    }
    val s0 = (1L to 100L).filter(shardOf(_, 2) == 0).take(2)
    val s1 = (1L to 100L).filter(shardOf(_, 2) == 1).take(2)
    val docs = (s0 ++ s1).map(id => PackDoc(id, words(4)))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-pack2-wave").toString
    docs.toDS().coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(landing, "w1.parquet"))
    StreamingPack.start(spark, landing, out, shards = 2, capacity = 5)
      .awaitTermination()
    val rows = spark.read.parquet(s"$out/assignments").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("shard"),
        r.getAs[Long]("bin"))).toSet
    // per-shard independence: two 4-token docs at capacity 5 -> bins
    // 0 and 1 in BOTH shards (state never bleeds across shards)
    val expect = (s0.sorted.zipWithIndex.map { case (id, i) =>
      (id, 0, i.toLong) } ++ s1.sorted.zipWithIndex.map { case (id, i) =>
      (id, 1, i.toLong) }).toSet
    assert(rows == expect, s"$rows vs $expect")
  }
}
