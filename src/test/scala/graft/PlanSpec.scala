package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.etl.Readers
import graft.queries.Registry

/** Physical-plan assertions: the properties that decide whether a plan
  * survives a 100x scale-up — column pruning into the scan, predicate
  * pushdown to parquet, whole-stage codegen on the hot relational path.
  */
class PlanSpec extends AnyFunSuite with TestSpark {
  private val sf = "/root/testdata/sf0.001"

  test("projection prunes the parquet scan to referenced columns only") {
    val plan = Registry.queries("q02_project")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"), plan)
    // the 11-column lineitem scan must read exactly the 3 projected cols
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_partkey")
      && readSchema.contains("l_quantity"), readSchema)
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_comment"),
      s"scan reads unprojected columns: $readSchema")
  }

  test("filters push down to the parquet reader") {
    val plan = Tables.load(spark, sf, "lineitem")
      .filter(col("l_quantity") > 40)
      .select("l_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"),
      s"no pushed filter in:\n$plan")
  }

  test("TPC-H Q1 shape runs inside whole-stage codegen") {
    val df = Registry.queries("q16_tpch_q1")(spark, sf)
    df.collect() // AQE only materializes codegen stages in the FINAL plan
    val plan = df.queryExecution.executedPlan.toString
    // codegen stages print as "*(n) Operator" in the tree rendering
    assert("\\*\\(\\d+\\) HashAggregate".r.findFirstIn(plan).isDefined,
      s"aggregate not inside a codegen stage:\n$plan")
  }

  test("q159: rank cumulatives are block-partitioned, never whole-group") {
    // the Spearman rank grid for a CONTINUOUS column is near
    // row-cardinality, and its group key (l_returnflag) has 3 values —
    // a window partitioned by (g) alone ordered by the grid value would
    // sort tens of millions of rows in one task at 100x. Pin the q153
    // two-phase shape: every value-ordered cumulative window must be
    // partitioned by (g, blk); only the bounded block-summary window
    // (ordered by blk) may partition by g alone.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = Registry.queries("q159_spearman")(spark, sf)
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "expected window nodes in the q159 plan")
    val valueOrdered = wins.filter(_.orderSpec
      .exists(_.child.references.exists(_.name == "v")))
    assert(valueOrdered.nonEmpty,
      s"expected grid-value-ordered cumulative windows, got:\n$wins")
    valueOrdered.foreach { w =>
      val parts = w.partitionSpec.flatMap(_.references).map(_.name)
      assert(parts.contains("blk"),
        s"grid cumulative must be block-partitioned, got partition " +
          s"spec $parts in:\n$w")
    }
  }

  test("OP-23: random sample returns roughly the requested fraction") {
    val li = Tables.load(spark, sf, "lineitem")
    val n = li.count()
    val s = li.sample(withReplacement = false, fraction = 0.2, seed = 42).count()
    assert(s > n / 10 && s < n * 3 / 10, s"sampled $s of $n")
    // seeded sample is reproducible
    val s2 = li.sample(withReplacement = false, fraction = 0.2, seed = 42).count()
    assert(s == s2)
  }

  test("OP-08: JSON config source reads multiline config documents") {
    val f = java.nio.file.Files.createTempFile("graft-conf", ".json").toFile
    val w = new java.io.PrintWriter(f)
    w.println("""{
      "bucket_name": "demo",
      "path_prefix": "raw",
      "file_urls": ["http://a/x.csv", "http://b/y.csv"]
    }""")
    w.close()
    val conf = Readers.jsonConfig(spark, f.getAbsolutePath)
    val row = conf.head()
    assert(row.getAs[String]("bucket_name") == "demo")
    assert(row.getSeq[String](row.fieldIndex("file_urls")).size == 2)
  }
}
