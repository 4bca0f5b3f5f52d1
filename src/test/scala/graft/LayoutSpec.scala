package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.etl.Writers

/** Z-order layout: every written file must cover a compact rectangle of
  * the two clustered dimensions (the property parquet min/max pruning
  * needs), where a single-key layout leaves the second dimension's
  * per-file ranges as wide as the table.
  */
class LayoutSpec extends AnyFunSuite with TestSpark {

  /** Mean per-file normalized (hi-lo) range of `c`, via the engine. */
  private def meanRange(dir: String, c: String): Double = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.getPath)
    assert(files.length >= 8, s"expected multiple files, got ${files.length}")
    val whole = spark.read.parquet(dir)
      .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
    val span = whole.getDouble(1) - whole.getDouble(0)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
      (r.getDouble(1) - r.getDouble(0)) / span
    }
    ranges.sum / ranges.length
  }

  test("zorderParquet: per-file ranges narrow on BOTH dims; single-key layout does not") {
    val orders = Tables.load(spark, "/root/testdata/sf0.01", "orders")
    val tmp = java.nio.file.Files.createTempDirectory("graft-zorder").toString

    // baseline: a typical single-key (time/id) range layout
    orders.repartitionByRange(16, col("o_orderkey"))
      .write.mode("overwrite").parquet(s"$tmp/naive")
    // z-ordered on (o_custkey, o_totalprice)
    Writers.zorderParquet(orders, "o_custkey", "o_totalprice", s"$tmp/zorder")

    // nothing lost or duplicated
    assert(spark.read.parquet(s"$tmp/zorder").count() == orders.count())

    val nCust = meanRange(s"$tmp/naive", "o_custkey")
    val nPrice = meanRange(s"$tmp/naive", "o_totalprice")
    val zCust = meanRange(s"$tmp/zorder", "o_custkey")
    val zPrice = meanRange(s"$tmp/zorder", "o_totalprice")

    // the single-key layout leaves both non-key dims table-wide per file
    assert(nCust > 0.8 && nPrice > 0.8,
      s"naive layout unexpectedly clustered: cust=$nCust price=$nPrice")
    // the z-order layout keeps BOTH dims compact per file — min/max
    // stats can prune on either predicate
    assert(zCust < 0.5 && zPrice < 0.5,
      s"zorder not compact: cust=$zCust price=$zPrice")
    assert(zCust < nCust / 2 && zPrice < nPrice / 2,
      s"zorder no better than naive: z=($zCust,$zPrice) naive=($nCust,$nPrice)")
  }

  test("rangeParquet: per-file key ranges are disjoint and sorted") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-range").toString
    Writers.rangeParquet(docs, "n_chars", "doc_id", tmp, files = 8)

    assert(spark.read.parquet(tmp).count() == docs.count())
    val files = new java.io.File(tmp).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
      .map(_.getPath)
    assert(files.length >= 4, s"expected multiple files, got ${files.length}")
    // the property min/max row-group pruning needs: each file covers a
    // contiguous key slice and the slices don't interleave (boundaries
    // may touch — equal lengths split by the doc_id tiebreak)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("n_chars")), max(col("n_chars"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach { case Array((_, hiA), (loB, _)) =>
      assert(hiA <= loB, s"interleaved file ranges: hi=$hiA > lo=$loB")
    }
    // and within a file the rows are key-sorted (row-group stats align)
    val one = spark.read.parquet(files.head)
      .select(col("n_chars")).collect().map(_.getLong(0))
    assert(one.sameElements(one.sorted), "file not sorted by key")
    // the sampler's split points approximate q209's exact equi-depth
    // boundaries: no file may hold more than 2x its equal share (the
    // audit relationship the q209 Scaladoc claims)
    val counts = files.map(f => spark.read.parquet(f).count())
    val share = docs.count().toDouble / files.length
    assert(counts.max <= 2 * share,
      s"sampler far off equi-depth: max=${counts.max} share=$share")
  }

  test("zorderParquet rejects unusable bounds with the column named") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-zorder-err").toString
    val orders = Tables.load(spark, "/root/testdata/sf0.01", "orders")
    // a string column casts to all-null doubles -> no bounds
    val e1 = intercept[IllegalArgumentException] {
      Writers.zorderParquet(orders, "o_orderstatus", "o_totalprice", s"$tmp/a")
    }
    assert(e1.getMessage.contains("o_orderstatus"), e1.getMessage)
    // empty input -> no bounds for the first column checked
    val e2 = intercept[IllegalArgumentException] {
      Writers.zorderParquet(orders.filter(lit(false)),
        "o_custkey", "o_totalprice", s"$tmp/b")
    }
    assert(e2.getMessage.contains("o_custkey"), e2.getMessage)
  }
}
