package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.core.Session
import graft.streaming.StreamingDedup

/** One-off plan diagnostic for the bucketed stream-index probe: lands
  * two micro-batches through startSpans(buckets = 8), then rebuilds
  * the probe join exactly as the stream runs it and prints the
  * executed plan — the question is whether the stored side reads
  * through the bucket spec (no Exchange) in the REAL probe shape
  * (left-semi + df-cap + m-join), not just the spec's bare inner join.
  */
object DiagBucketedProbe {
  def main(args: Array[String]): Unit = {
    val spark = Session.local()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val landing = Files.createTempDirectory("diagb-land").toString
    val index = Files.createTempDirectory("diagb-idx").toString + "/grams"
    val out = Files.createTempDirectory("diagb-out").toString
    def writeBatch(name: String, docs: Seq[(Long, String)]): Unit =
      Files.write(Paths.get(landing, name),
        docs.map { case (i, t) => s"""{"doc_id":$i,"text":"$t"}""" }
          .mkString("\n").getBytes)
    def toks(p: String, n: Int) = (1 to n).map(i => s"$p$i")
    val quote = toks("q", 16)
    writeBatch("b1.json", (0L until 50L).map(d =>
      (d, (toks(s"a$d", 30) ++ quote).mkString(" "))))
    StreamingDedup.startSpans(spark, landing, schema, index, out,
      buckets = 32).awaitTermination()
    writeBatch("b2.json", (100L until 150L).map(d =>
      (d, (toks(s"b$d", 20) ++ quote).mkString(" "))))
    StreamingDedup.startSpans(spark, landing, schema, index, out,
      buckets = 32).awaitTermination()

    // the stream's probe, reconstructed (under the same forced-bucketed
    // conf the monitors scope per micro-batch)
    spark.conf.set(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    val name = "graft_sidx_" + java.security.MessageDigest
      .getInstance("MD5").digest(index.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val idx = spark.table(name).filter(col("batch") < 99L).drop("batch")
    val batchGrams = graft.llm.Dedup.positionalGrams(
      spark.read.schema(schema).json(s"$landing/b2.json")
        .select(col("doc_id"), col("text")),
      graft.llm.Dedup.ExactSubstringMinRun)
    val hits = idx.join(batchGrams.select(col("g")).distinct(),
      Seq("g"), "left_semi")
    hits.write.format("noop").mode("overwrite").save()
    println("=== SEMI JOIN PLAN ===")
    println(hits.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head)
    spark.stop()
  }
}
