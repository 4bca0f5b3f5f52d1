package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.etl.Writers

/** Storage-layout scale paths: bucketed co-located joins (no shuffle)
  * and partition pruning on the dated layout.
  */
class BucketSpec extends AnyFunSuite with TestSpark {
  private val sf = "/root/testdata/sf0.001"

  test("join of same-key bucketed tables runs without a shuffle exchange") {
    Writers.bucketedTable(
      Tables.load(spark, sf, "orders"), "b_orders", Seq("o_custkey"), 8)
    Writers.bucketedTable(
      Tables.load(spark, sf, "customer"), "b_customer", Seq("c_custkey"), 8)

    val joined = spark.table("b_orders")
      .join(spark.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    // sanity: result matches the unbucketed join
    val direct = Tables.load(spark, sf, "orders")
      .join(Tables.load(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey")).count()
    assert(joined.count() == direct)
  }

  test("mixed-case table name: rewrite clears the stale lowercase location") {
    // saveAsTable lowercases the identifier for its warehouse path, so
    // the stale-location cleanup must too. Simulate a previous session's
    // leftover: the LOWERCASE location exists but no catalog entry — a
    // cleanup keyed on the mixed-case name would delete the wrong path
    // and die with LOCATION_ALREADY_EXISTS
    val warehouse = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    val stale = java.nio.file.Paths.get(warehouse, "b_mixedcase")
    java.nio.file.Files.createDirectories(stale)
    java.nio.file.Files.write(stale.resolve("junk"), "x".getBytes)
    val nation = Tables.load(spark, sf, "nation")
    Writers.bucketedTable(nation, "B_MixedCase", Seq("n_nationkey"), 4)
    assert(spark.table("B_MixedCase").count() == 25)
  }

  test("compaction collapses small files, preserves rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    val orders = Tables.load(spark, sf, "orders")
    // simulate a streaming sink's debris: 20 tiny files
    orders.repartition(20).write
      .option("compression", "zstd").parquet(dir)
    def parquetFiles() = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles() == 20)
    val before = spark.read.parquet(dir).count()
    val n = graft.etl.Writers.compact(spark, dir, targetMB = 512)
    assert(n == 1, s"expected 1 output file for tiny input, got $n")
    assert(parquetFiles() == 1)
    assert(spark.read.parquet(dir).count() == before)
  }

  test("dated partition layout prunes at the scan (PartitionFilters)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Writers.datePartitioned(Tables.load(spark, sf, "nation"), dir)
    val read = spark.read.parquet(dir)
      .filter(col("ingest_date") === current_date())
    read.collect()
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.contains("ingest_date"), s"no partition pruning:\n$plan")
    assert(read.count() == 25)
  }
}
