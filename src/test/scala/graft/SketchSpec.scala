package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.etl.Profiler

/** Mergeable HLL distinct sketches (OP-19 at scale): accuracy against
  * exact counts and the union-of-slices == whole-input property that
  * makes incremental profiling possible.
  */
class SketchSpec extends AnyFunSuite with TestSpark {

  private val sf = "/root/testdata/sf0.01"
  private val cols = Seq("l_orderkey", "l_partkey", "l_returnflag")

  test("sketch estimates land within 5% of exact distinct counts") {
    val li = Tables.load(spark, sf, "lineitem")
    val est = Profiler.sketchEstimates(Profiler.distinctSketches(li, cols))
      .head()
    val exact = li.agg(
      countDistinct(col(cols(0))).as("a"),
      countDistinct(col(cols(1))).as("b"),
      countDistinct(col(cols(2))).as("c")).head()
    cols.indices.foreach { i =>
      val e = est.getLong(i).toDouble
      val x = exact.getLong(i).toDouble
      assert(math.abs(e - x) / x <= 0.05,
        s"${cols(i)}: sketch $e vs exact $x off by ${math.abs(e - x) / x}")
    }
  }

  test("union of per-slice sketches matches the whole-input sketch") {
    val li = Tables.load(spark, sf, "lineitem")
    val a = Profiler.distinctSketches(li.filter(col("l_orderkey") % 2 === 0), cols)
    val b = Profiler.distinctSketches(li.filter(col("l_orderkey") % 2 =!= 0), cols)
    val merged = Profiler.sketchEstimates(
      Profiler.unionSketches(a.unionByName(b))).head()
    val whole = Profiler.sketchEstimates(
      Profiler.distinctSketches(li, cols)).head()
    cols.indices.foreach { i =>
      val m = merged.getLong(i).toDouble
      val w = whole.getLong(i).toDouble
      assert(math.abs(m - w) / math.max(w, 1.0) <= 0.02,
        s"${cols(i)}: merged $m vs whole $w")
    }
  }

  test("count-min estimates dominate exact counts; collision-free at wide width") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val rows = Seq(
      Row(1L, "apple apple apple banana banana cherry"),
      Row(2L, "apple banana date elder fig grape"),
      Row(3L, "apple cherry cherry cherry date date"))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

    // default width: the CMS guarantee est >= exact, always
    val est = graft.llm.TextOps.cmsHeavyHitters(df, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(est.nonEmpty)
    est.foreach { case (t, exact, cms) =>
      assert(cms >= exact, s"$t: cms $cms < exact $exact") }
    // exact top-1 is apple x5 and survives the sketch route
    assert(est.head._1 == "apple" && est.head._2 == 5L)

    // at a width far beyond the vocabulary, 4 md5 rows collide with
    // probability ~(7 tokens / 2^20)^... none: est == exact everywhere
    val wide = graft.llm.TextOps.cmsHeavyHitters(df, k = 10, w = 1 << 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    wide.foreach { case (t, exact, cms) =>
      assert(cms == exact, s"$t: wide-width cms $cms != exact $exact") }
  }
}
