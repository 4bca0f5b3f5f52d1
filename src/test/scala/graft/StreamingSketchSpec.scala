package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.TextOps
import graft.streaming.StreamingSketch

/** Streaming CMS: per-batch partial counter tables merged on read must
  * equal the one-pass batch sketch of the union (counter mergeability),
  * point estimates must match the batch q152 route, and each batch
  * must land exactly its own partition.
  */
class StreamingSketchSpec extends AnyFunSuite with TestSpark {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("streamed CMS == batch sketch of the union; estimates match q152's route") {
    val landing = Files.createTempDirectory("graft-cms-land").toString
    val outDir = Files.createTempDirectory("graft-cms-out").toString
    val b1 = Seq(
      (1L, "apple apple banana cherry"),
      (2L, "apple date elder banana"))
    val b2 = Seq(
      (3L, "apple banana banana fig"),
      (4L, "grape apple cherry cherry"))
    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit =
      Files.write(Paths.get(landing, name),
        rows.map { case (i, t) => s"""{"doc_id":$i,"text":"$t"}""" }
          .mkString("\n").getBytes)

    writeBatch("b1.json", b1)
    StreamingSketch.startCms(spark, landing, docSchema, outDir)
      .awaitTermination()
    writeBatch("b2.json", b2)
    StreamingSketch.startCms(spark, landing, docSchema, outDir)
      .awaitTermination()

    val parts = new java.io.File(s"$outDir/sketch").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted
    assert(parts.length == 2, s"sketch partitions: ${parts.toSeq}")

    // mergeability: summed per-batch partials == one-pass whole sketch
    val all = spark.createDataFrame(
      spark.sparkContext.parallelize((b1 ++ b2).map(Row.fromTuple), 2),
      docSchema)
    val merged = StreamingSketch.sketch(spark, outDir).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = TextOps.cmsSketch(all).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole, s"merged sketch drifted from batch sketch")

    // point estimates through the streaming reader equal the batch
    // q152 estimates for the same tokens
    val est = StreamingSketch.estimate(spark, outDir,
        Seq("apple", "banana", "cherry")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batchEst = TextOps.cmsHeavyHitters(all, k = 20).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    Seq("apple", "banana", "cherry").foreach { t =>
      assert(est(t) == batchEst(t), s"$t: streamed ${est(t)} vs batch ${batchEst(t)}")
    }
    // CMS guarantee survives the streaming route: apple appears 5 times
    assert(est("apple") >= 5L)

    // a token the stream never saw reports est=0 via the left-join
    // probe (the stored sketch holds only ever-hit buckets; an inner
    // join would silently drop the row, or inflate the min when only
    // SOME of the token's 4 buckets are empty)
    val unseen = StreamingSketch.estimate(spark, outDir,
        Seq("zz-never-streamed-token", "apple")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(unseen("zz-never-streamed-token") == 0L,
      s"unseen token: ${unseen.get("zz-never-streamed-token")}")
    assert(unseen("apple") == est("apple"))
  }

  test("streamed HLL distinct monitor: lossless union across batches, exact at small n") {
    val evSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_type", StringType)))
    val landing = Files.createTempDirectory("graft-hll-land").toString
    val outDir = Files.createTempDirectory("graft-hll-out").toString
    // users overlap ACROSS batches — a per-batch exact-distinct sum
    // would double-count; the HLL union must not
    val b1 = Seq((1L, "click"), (2L, "click"), (3L, "view"), (1L, "view"))
    val b2 = Seq((2L, "click"), (4L, "click"), (3L, "view"), (5L, "buy"))
    val b3 = Seq((1L, "click"), (6L, "view"), (5L, "buy"), (5L, "buy"))
    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit =
      Files.write(Paths.get(landing, name),
        rows.map { case (u, e) => s"""{"user_id":$u,"event_type":"$e"}""" }
          .mkString("\n").getBytes)
    Seq("b1.json" -> b1, "b2.json" -> b2, "b3.json" -> b3).foreach {
      case (f, rows) =>
        writeBatch(f, rows)
        StreamingSketch.startHll(spark, landing, evSchema, outDir,
          keyCol = "event_type", valCol = "user_id").awaitTermination()
    }
    val parts = new java.io.File(s"$outDir/hll").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted
    assert(parts.length == 3, s"hll partitions: ${parts.toSeq}")

    val est = StreamingSketch.distinctEstimate(spark, outDir, "event_type")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // at this cardinality the sketch is exact: click {1,2,4},
    // view {1,3,6}, buy {5}
    assert(est == Map("click" -> 3L, "view" -> 3L, "buy" -> 1L), s"got $est")

    // lossless union: merged per-batch sketches == one-pass sketch of
    // the whole stream, estimate for estimate
    val all = spark.createDataFrame(
      spark.sparkContext.parallelize((b1 ++ b2 ++ b3).map(Row.fromTuple), 2),
      evSchema)
    val whole = all.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id")))
        .as("n_distinct_est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == whole, s"union drifted: streamed $est vs one-pass $whole")
  }
}
