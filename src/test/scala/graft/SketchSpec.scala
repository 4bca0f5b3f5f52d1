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
}
