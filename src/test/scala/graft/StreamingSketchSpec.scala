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
}
