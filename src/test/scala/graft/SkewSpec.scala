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

  test("two-phase sessionization: hot user spread across blocks, identical results") {
    import java.sql.Timestamp
    import graft.queries.Sessionize
    // one hot user with 5,000 events over ~3.5 days (spanning many
    // 6-hour blocks, some gaps > 30 min), plus 20 normal users
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("event_id", LongType)))
    val t0 = 1700000000000L
    val rng = new scala.util.Random(23)
    val hot = (0L until 5000L).map { i =>
      // mostly 1-minute steps, occasional 40-minute silences
      val step = if (rng.nextInt(50) == 0) 40L * 60000 else 60000L
      (i, step)
    }.scanLeft((0L, t0)) { case ((_, acc), (i, step)) => (i, acc + step) }
      .drop(1).map { case (i, ts) => Row(7L, new Timestamp(ts), i) }
    val normal = (0L until 20L).flatMap { u =>
      (0L until 30L).map { i =>
        Row(100L + u, new Timestamp(t0 + i * 45 * 60000 + u * 1000), 10000L + u * 100 + i)
      }
    }
    val events = spark.createDataFrame(
      spark.sparkContext.parallelize(hot ++ normal, 8), schema)

    val twoPhase = Sessionize.sessionCountsAtScale(events,
      gapMinutes = 30, blockMinutes = 360)
    // the phase-1 exchange must be keyed on (user_id, block): that's
    // what spreads the hot user across tasks
    twoPhase.collect()
    val plan = twoPhase.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("__blk"), s"no block key in plan:\n$plan")
    assert("hashpartitioning\\(user_id[^)]*__blk".r.findFirstIn(plan).isDefined,
      s"phase-1 shuffle not keyed on (user_id, __blk):\n$plan")

    // identical to the single-window formulation
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val direct = events
      .withColumn("ns", when(
        lag(col("ts"), 1).over(w).isNull ||
          col("ts") > lag(col("ts"), 1).over(w) + expr("INTERVAL 30 MINUTE"),
        1).otherwise(0))
      .groupBy(col("user_id"))
      .agg(sum(col("ns")).cast("long").as("n_sessions"),
        count(lit(1)).as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = twoPhase
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == direct)
    // sanity: the hot user genuinely has many sessions and blocks
    val hotRow = got.find(_._1 == 7L).get
    assert(hotRow._3 == 5000L && hotRow._2 > 50L)
  }

  test("two-phase running sum: block-partitioned, identical to single window") {
    import graft.queries.ScaleWindows
    val sf = "/root/testdata/sf0.001"
    val orders = graft.core.Tables.load(spark, sf, "orders")
    val twoPhase = ScaleWindows.runningSumAtScale(orders)
      .select(col("o_orderkey"), col("running"))
    twoPhase.collect()
    val plan = twoPhase.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("hashpartitioning\\(o_custkey[^)]*__blk".r.findFirstIn(plan).isDefined,
      s"phase-1 window not keyed on (o_custkey, __blk):\n$plan")

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val direct = orders.select(col("o_orderkey"),
      sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
        .cast("double").as("running"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val got = twoPhase.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got == direct)
    assert(got.nonEmpty)
  }

  test("two-phase token packing: block-partitioned, identical to single window") {
    import graft.llm.TextOps
    val sf = "/root/testdata/sf0.001"
    val documents = graft.core.Tables.load(spark, sf, "documents")
    // small block size so the testdata genuinely spans many blocks per lang
    val twoPhase = TextOps.packChunks(documents, budget = 500L, blockSize = 16L)
    twoPhase.collect()
    val plan = twoPhase.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("hashpartitioning\\(lang[^)]*__blk".r.findFirstIn(plan).isDefined,
      s"phase-1 window not keyed on (lang, __blk):\n$plan")

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val direct = documents
      .select(col("doc_id"), col("lang"),
        when(trim(col("text")) === "", 0)
          .otherwise(size(split(trim(lower(col("text"))), "\\s+")))
          .cast("long").as("nt"))
      .withColumn("chunk",
        floor(coalesce(sum(col("nt")).over(w), lit(0L)) / 500L))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    val got = twoPhase.collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(got == direct)
    assert(got.nonEmpty)
    // sanity: multiple blocks per language actually occurred
    val blocks = documents.select(floor(col("doc_id") / 16L)).distinct().count()
    assert(blocks > 5)
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

  test("equi-depth buckets (q153): complete, ordered, ties-low, sizes near n/8") {
    import graft.queries.Registry
    val rows = Registry.queries("q153_equidepth_histogram")(
      spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // buckets cover every row exactly once and are value-ordered
    val n = rows.map(_._2).sum
    val exact = graft.core.Tables.load(spark, "/root/testdata/sf0.01", "orders")
      .count()
    assert(n == exact, s"bucket counts sum $n != $exact rows")
    rows.sliding(2).foreach {
      case Array((b1, _, _, hi1), (b2, _, lo2, _)) =>
        assert(b1 < b2 && hi1 <= lo2,
          s"buckets out of order: $b1[hi=$hi1] vs $b2[lo=$lo2]")
      case _ =>
    }
    // equi-depth: every bucket within 2x of the ideal n/8 on this
    // near-unique column (ties can only shrink/grow at boundaries)
    rows.foreach { case (b, cnt, _, _) =>
      assert(cnt >= n / 16 && cnt <= n / 4, s"bucket $b size $cnt vs n=$n") }
  }
}
