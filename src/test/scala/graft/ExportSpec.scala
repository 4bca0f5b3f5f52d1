package graft

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Writers

/** Shuffled-shard export: exactly-once, layout-independent determinism,
  * and one ordered file per shard — the properties a training run
  * replaying the corpus depends on.
  */
class ExportSpec extends AnyFunSuite with TestSpark {

  /** Mirror of Writers.shuffleKey: first 15 hex chars of
    * md5(decimal id || ":shuf") as a long.
    */
  private def shufKey(id: Long): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest((id.toString + ":shuf").getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  test("shuffled shards: exactly-once, deterministic across input layouts, ordered files") {
    import spark.implicits._
    val ids = (0L until 500L)
    val df = ids.map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val dir1 = java.nio.file.Files.createTempDirectory("shards1").toString
    val dir2 = java.nio.file.Files.createTempDirectory("shards2").toString
    Writers.shuffledShards(df, "doc_id", dir1, shards = 8)
    // a different input partitioning must produce the identical export
    Writers.shuffledShards(df.repartition(7), "doc_id", dir2, shards = 8)

    val back = spark.read.parquet(dir1)
    assert(back.count() == 500)
    assert(back.columns.toSet == Set("doc_id", "text", "shard"))
    assert(back.select("doc_id").collect().map(_.getLong(0)).toSet == ids.toSet)

    (0 until 8).foreach { sh =>
      val expected = ids.filter(i => shufKey(i) % 8 == sh)
        .sortBy(i => (shufKey(i), i))
      assert(expected.nonEmpty, s"degenerate fixture: shard $sh empty")
      Seq(dir1, dir2).foreach { dir =>
        val files = new java.io.File(s"$dir/shard=$sh").listFiles()
          .filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1,
          s"shard $sh in $dir has ${files.length} files, want 1")
        // one small file = one input split, so read order is file order
        val got = spark.read.parquet(files.head.toString)
          .select("doc_id").collect().map(_.getLong(0)).toSeq
        assert(got == expected, s"shard $sh order/membership mismatch in $dir")
      }
    }
  }

  test("shard manifest: layout-independent signature, tamper detection") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-man").toString
    val docs = spark.range(500).select(col("id").as("doc_id"),
      concat(lit("t"), col("id")).as("text"))
    Writers.shuffledShards(docs, "doc_id", dir, shards = 4)
    Writers.writeShardManifest(spark, dir)
    val m1 = spark.read.parquet(s"$dir/_manifest").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    // counts agree with an independent recount per shard
    val counts = spark.read.parquet(dir).groupBy("shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(m1.view.mapValues(_._1).toMap == counts)
    // recomputing over the SAME content (different read layout) agrees
    val m2 = Writers.shardManifest(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m2 == m1)
    // a different id set must change the signature even at equal counts
    val tampered = docs.withColumn("doc_id",
      when(col("doc_id") === 7L, 9999L).otherwise(col("doc_id")))
    val dir2 = java.nio.file.Files.createTempDirectory("graft-man2").toString
    Writers.shuffledShards(tampered, "doc_id", dir2, shards = 4)
    val m3 = Writers.shardManifest(spark, dir2).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(m3 != m1.view.mapValues(_._2).toMap,
      "signature failed to detect an id substitution")
  }
}
