package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Session, Tables}
import graft.llm.Dedup
import graft.SparkEntry

/** Ad-hoc check for q65: did CollapseProject inline the per-shingle md5
  * projection into the 16 slot lambdas (re-hashing every shingle 16x),
  * and what does an explicit exchange between the hash projection and
  * the slot mins buy? (dev tool)
  *
  * Measured (sf0.1, warm): md5 appears ONCE in the optimized plan (no
  * inlining — the multi-referenced non-cheap alias blocks the
  * collapse), registered form 2.44 s vs 2.05 s with the extra
  * exchange. Verdict: keep the registered form — the ~16% is interpreted
  * slot-lambda cost either way, and the exchange would ship the hash
  * arrays across the wire at scale while avoiding no recompute.
  */
object DiagMd5Minhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Session.local()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[diag] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val q65 = SparkEntry.queries("q65_minhash_md5")(spark, sfDir)
    val plan = q65.queryExecution.optimizedPlan.toString
    val md5Count = "md5\\(".r.findAllIn(plan).size
    println(s"[diag] md5( occurrences in optimized plan: $md5Count")

    time("q65 as registered (1st)")(
      q65.write.format("noop").mode("overwrite").save())
    time("q65 as registered (2nd)")(
      SparkEntry.queries("q65_minhash_md5")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())

    // variant: exchange between hash projection and slot mins, so the
    // md5 pass materializes once regardless of projection collapsing
    val docs = Tables.load(spark, sfDir, "documents")
    val hv = Dedup.withShingleArray(docs)
      .select(col("doc_id"),
        transform(col("sh"), sh =>
          conv(substring(md5(sh), 1, 8), 16, 10).cast("long")).as("hv"))
      .repartition(col("doc_id"))
    val slots = Dedup.Md5MinhashMixers.map { case (a, b) =>
      array_min(transform(col("hv"), h =>
        (lit(a) * h + lit(b)) % Dedup.Md5MinhashMod)).cast("string")
    }
    def variant = hv.select(col("doc_id"), concat_ws("-", slots: _*).as("sig"))
      .orderBy(col("doc_id"))
    val vplan = variant.queryExecution.optimizedPlan.toString
    println(s"[diag] md5( in variant plan: ${"md5\\(".r.findAllIn(vplan).size}")
    time("variant w/ exchange (1st)")(
      variant.write.format("noop").mode("overwrite").save())
    time("variant w/ exchange (2nd)")(
      variant.write.format("noop").mode("overwrite").save())

    spark.stop()
  }
}
