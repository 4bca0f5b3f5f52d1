package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Skew

/** Salting equivalence: skew-mitigated plans must return exactly the
  * direct plan's results.
  */
class SkewSpec extends AnyFunSuite with TestSpark {

  // 10k rows, 90% on one hot key
  private lazy val skewed = {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("rid", LongType),
      StructField("v", DoubleType)))
    val rows = (0L until 10000L).map { i =>
      Row(if (i % 10 == 0) i % 7 + 100 else 1L, i, (i % 97).toDouble)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 8), schema)
  }

  test("two-phase salted aggregation equals direct aggregation") {
    val direct = skewed.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.twoPhaseAgg(skewed, Seq("k"), 16, col("rid"))(
      partial = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
      finalAgg = Seq(sum("ps").as("s"), sum("pn").as("n")))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("salted join equals direct join") {
    val dim = {
      val schema = StructType(Seq(
        StructField("k", LongType), StructField("name", StringType)))
      val rows = (0L until 110L).map(i => Row(i, s"dim_$i"))
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    }
    val direct = skewed.join(dim, "k")
      .groupBy("name").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", 8, col("rid"))
      .groupBy("name").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == direct)
  }
}
