package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Session, Tables}
import graft.llm.{Dedup, TextOps}

/** Ad-hoc stage-level timing for the near-dup pipeline (dev tool). */
object Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Session.local()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[diag] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val spreadDocs = docs.repartition(col("doc_id"))
    time("warmup count")(docs.count())
    time("tokens only")(
      spreadDocs.select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
        .select(sum(size(col("ts")))).head())
    val withTs = spreadDocs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
    val withSh = withTs
      .select(col("doc_id"), Dedup.shingleArrayFromTokens(col("ts")).as("sh"))
    time("shingle arrays (no explode)")(
      withSh.select(sum(size(col("sh")))).head())
    println("=== optimized plan of shingle-array job ===")
    println(withSh.select(sum(size(col("sh")))).queryExecution.optimizedPlan.toString.take(4000))
    println("=== optimized plan of explode job ===")
    println(Dedup.shingles(docs).queryExecution.optimizedPlan.toString.take(3000))
    time("shingles explode count 1st")(Dedup.shingles(docs).count())
    time("shingles explode count 2nd")(Dedup.shingles(docs).count())
    time("full minhashCandidates 1st")(
      println("  cands=" + Dedup.minhashCandidates(docs, 0.5).count()))
    time("full minhashCandidates 2nd")(
      println("  cands=" + Dedup.minhashCandidates(docs, 0.5).count()))
    spark.stop()
  }
}
