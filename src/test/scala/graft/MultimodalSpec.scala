package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Multimodal

/** Binary-column plumbing: schema, deterministic metadata, stubbed
  * decode batch shape, frame sampling.
  */
class MultimodalSpec extends AnyFunSuite with TestSpark {

  private lazy val docs = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("source", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "hello world of bytes", "s0"),
        Row(2L, "x" * 100, "s1"),
        Row(3L, "", "s2")), 2),
      schema)
  }

  test("media table carries binary payload + typed metadata") {
    val m = Multimodal.mediaTable(docs)
    assert(m.schema("media").dataType == BinaryType)
    val r = m.filter(col("doc_id") === 1L).head()
    assert(new String(r.getAs[Array[Byte]]("media")) == "hello world of bytes")
    assert(r.getAs[Int]("width") == 20)
    assert(r.getAs[Int]("n_frames") == 20 % 16)
  }

  test("decode stub: deterministic fixed-dim features via mapPartitions") {
    val f = Multimodal.decodeStub(Multimodal.mediaTable(docs), dim = 8)
    val rows = f.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(rows(1L).size == 8)
    assert(rows(3L).forall(_ == 0.0)) // empty payload -> zero features
    // determinism: second run bit-identical
    val again = Multimodal.decodeStub(Multimodal.mediaTable(docs), dim = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(rows == again)
  }

  test("frame sampling is metadata-only (plan before decode)") {
    val s = Multimodal.sampleFrames(Multimodal.mediaTable(docs), stride = 3)
    val r = s.filter(col("doc_id") === 1L).head()
    assert(r.getSeq[Int](r.fieldIndex("sampled_frames")).toList == List(0, 3))
  }
}
