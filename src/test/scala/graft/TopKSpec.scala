package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** The TopKPerKey whole-operator extension: plan rewrite, physical shape
  * (one shuffle, no Window sort), and row-identical results vs the
  * un-rewritten window formulation on real testdata.
  */
class TopKSpec extends AnyFunSuite with TestSpark {

  private val sf = "/root/testdata/sf0.001"

  private def topkQuery(k: Int): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.load(spark, sf, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("o_custkey"), col("o_orderkey"), col("rn"))
  }

  private def withRuleDisabled[T](f: => T): T = {
    val key = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.get(key, "")
    spark.conf.set(key, (if (prev.isEmpty) "" else prev + ",") + "graft.plans.TopKRewrite")
    try f finally spark.conf.set(key, prev)
  }

  test("filtered row_number plans as two-phase TopKPerKey, one shuffle, no Window") {
    val df = topkQuery(3)
    df.collect()
    // AQE prints Final and Initial plans; count shuffles in the final only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("TopKPerKeyFinal"), s"no final exec:\n$plan")
    assert(plan.contains("TopKPerKeyPartial"), s"no partial exec:\n$plan")
    assert(!plan.contains("Window"), s"Window survived the rewrite:\n$plan")
    assert("Exchange hashpartitioning".r.findAllMatchIn(plan).size == 1,
      s"expected exactly one shuffle:\n$plan")
  }

  test("rewritten results are row-identical to the window formulation") {
    def canon(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val rewritten = canon(topkQuery(3))
    val baseline = withRuleDisabled {
      val df = topkQuery(3)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Window"), s"baseline unexpectedly rewritten:\n$plan")
      canon(df)
    }
    assert(rewritten == baseline)
    assert(rewritten.nonEmpty)
  }

  test("rn === 1 form yields exactly the per-key minimum") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val top1 = Tables.load(spark, sf, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val plan = { top1.collect(); top1.queryExecution.executedPlan.toString }
    assert(plan.contains("TopKPerKeyFinal"), s"rn===1 not rewritten:\n$plan")
    // expected: the lexicographically-first (o_orderdate, o_orderkey) per key
    val expected = Tables.load(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(min(struct(col("o_orderdate"), col("o_orderkey"))).as("m"))
      .select(col("o_custkey"), col("m.o_orderkey").as("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = top1.select(col("o_custkey"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("SQL ROW_NUMBER pattern is rewritten identically to the DataFrame path") {
    Tables.registerAll(spark, sf)
    val df = spark.sql(
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 2""".stripMargin)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyFinal"), s"SQL path not rewritten:\n$plan")
  }

  test("conjunction: rn bound is extracted, residual predicate survives") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val df = Tables.load(spark, sf, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") >= 2 && col("rn") <= 4)
      .select(col("o_custkey"), col("o_orderkey"), col("rn"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyFinal"), s"conjunction not rewritten:\n$plan")
    // equivalence against the pure window formulation
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val baseline = withRuleDisabled {
      canon(Tables.load(spark, sf, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") >= 2 && col("rn") <= 4)
        .select(col("o_custkey"), col("o_orderkey"), col("rn")))
    }
    assert(canon(df) == baseline)
    assert(baseline.forall(t => t._3 >= 2 && t._3 <= 4))
  }

  test("dense_rank is NOT rewritten") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val ranked = Tables.load(spark, sf, "orders")
      .withColumn("rk", dense_rank().over(w)).filter(col("rk") <= 3)
    ranked.collect()
    val plan = ranked.queryExecution.executedPlan.toString
    assert(plan.contains("Window") && !plan.contains("TopKPerKey"),
      s"dense_rank() was wrongly rewritten:\n$plan")
  }

  test("rank() is rewritten, keeps boundary ties, row-identical to Window") {
    // order by o_orderdate alone → heavy ties (dates repeat per customer)
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
    def query(): DataFrame = Tables.load(spark, sf, "orders")
      .withColumn("rk", rank().over(w))
      .filter(col("rk") <= 2)
      .select(col("o_custkey"), col("o_orderkey"), col("rk"))
    val df = query()
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("TopKPerKeyFinal"), s"rank() not rewritten:\n$plan")
    assert(!plan.contains("Window"), s"Window survived:\n$plan")
    def canon(d: DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val rewritten = canon(df)
    val baseline = withRuleDisabled { canon(query()) }
    assert(rewritten == baseline)
    assert(rewritten.nonEmpty)
  }

  test("unpartitioned row_number (no PARTITION BY) is rewritten and correct") {
    // the empty-partition case: must plan (AllTuples final), not crash
    val w = Window.orderBy(col("o_orderdate"), col("o_orderkey"))
    def query(): DataFrame = Tables.load(spark, sf, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 7)
      .select(col("o_orderkey"), col("rn"))
    val df = query()
    val got = df.collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("TopKPerKeyFinal"), s"global top-k not rewritten:\n$plan")
    val baseline = withRuleDisabled {
      query().collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    }
    assert(got == baseline)
    assert(got.size == 7)
  }

  test("partial-phase key-map flush (tiny maxKeysInFlight) stays correct") {
    val key = "spark.graft.topk.maxKeysInFlight"
    spark.conf.set(key, "4") // force many flush generations at sf0.001
    try {
      def canon(d: DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
      val flushed = canon(topkQuery(3))
      val baseline = withRuleDisabled { canon(topkQuery(3)) }
      assert(flushed == baseline)
      assert(flushed.nonEmpty)
    } finally spark.conf.unset(key)
  }
}
