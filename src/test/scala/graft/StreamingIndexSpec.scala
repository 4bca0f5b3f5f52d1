package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Pq
import graft.streaming.StreamingIndex

/** Streaming PQ index: batches encode against the seed-trained codebook,
  * land in their own batch partitions (replay-idempotent), and the
  * streamed store answers exactly like a batch-built one.
  */
class StreamingIndexSpec extends AnyFunSuite with TestSpark {

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  private def vec(rng: scala.util.Random): Array[Float] =
    Array.fill(64)((rng.nextDouble() * 4 - 2).toFloat)

  test("streamed batches == batch-built store; batch layout idempotent") {
    val rng = new scala.util.Random(5)
    val all = (0L until 120L).map(i => i -> vec(rng))
    val clone = 999L -> all.head._2 // exact clone of vec 0, arrives late
    val seedDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        all.map { case (i, v) => Row(i, v.toSeq) }, 3), schema)

    val dir = Files.createTempDirectory("graft-sidx").toString
    val landing = Files.createTempDirectory("graft-sidx-land").toString
    StreamingIndex.initPqStore(seedDf, dir, iters = 2)

    def writeBatch(name: String, vecs: Seq[(Long, Array[Float])]): Unit =
      Files.write(Paths.get(landing, name),
        vecs.map { case (i, v) =>
          s"""{"vec_id":$i,"embedding":[${v.mkString(",")}]}"""
        }.mkString("\n").getBytes)

    // batch 1: first 60 vectors; batch 2: the rest + the late clone
    writeBatch("b1.json", all.take(60))
    StreamingIndex.startPqAppend(spark, landing, schema, dir).awaitTermination()
    writeBatch("b2.json", all.drop(60) :+ clone)
    StreamingIndex.startPqAppend(spark, landing, schema, dir).awaitTermination()

    val parts = new java.io.File(s"$dir/codes").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted
    assert(parts.length == 2, s"code partitions: ${parts.toSeq}")

    // streamed codes == batch encode of the same vectors (pure function
    // of vector + codebook, regardless of arrival batch)
    val cb = spark.read.parquet(s"$dir/codebook")
    val fullDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (all :+ clone).map { case (i, v) => Row(i, v.toSeq) }, 3), schema)
    val expected = Pq.encode(fullDf, cb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val streamed = spark.read.parquet(s"$dir/codes")
      .select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(streamed == expected)

    // the streamed store answers: the late-arriving clone tops vec 0's
    // neighbor list
    val qv = all.head._2.map(_.toDouble)
    val top = StreamingIndex.pqTopK(spark, dir, qv, k = 3,
      excludeId = Some(0L)).collect().map(_.getLong(0)).toSeq
    assert(top.head == 999L, s"late clone not first: $top")
  }
}
