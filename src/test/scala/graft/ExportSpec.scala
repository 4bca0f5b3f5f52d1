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
}
