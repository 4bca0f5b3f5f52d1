package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Session, Tables}
import graft.llm.Dedup

/** Ad-hoc comparison of exact n-gram-Jaccard plan shapes (dev tool):
  * the shipping inverted-index self-join vs a shared-shingle prefilter
  * vs per-shingle pair generation from a grouped posting list.
  */
object DiagJaccard {
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

    val sh = Dedup.withShingleHashes(docs)
      .select(col("doc_id"), size(col("hs")).as("n"), explode(col("hs")).as("s"))

    def current() = {
      val inter = sh.as("a")
        .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
          col("a.n").as("na"), col("b.n").as("nb"))
        .agg(count(lit(1)).as("inter"))
      val j = col("inter").cast("double") / (col("na") + col("nb") - col("inter"))
      inter.filter(j >= 0.6).count()
    }

    def windowed() = {
      val shared = sh
        .withColumn("df", count(lit(1)).over(Window.partitionBy("s")))
        .filter(col("df") >= 2).drop("df")
      val inter = shared.as("a")
        .join(shared.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
          col("a.n").as("na"), col("b.n").as("nb"))
        .agg(count(lit(1)).as("inter"))
      val j = col("inter").cast("double") / (col("na") + col("nb") - col("inter"))
      inter.filter(j >= 0.6).count()
    }

    def grouped() = {
      val postings = sh.groupBy(col("s"))
        .agg(collect_list(struct(col("doc_id"), col("n"))).as("ds"))
        .filter(size(col("ds")) >= 2)
      val pairs = postings.select(explode(flatten(transform(col("ds"), a =>
        filter(transform(col("ds"), b =>
          when(a.getField("doc_id") < b.getField("doc_id"),
            struct(a.getField("doc_id").as("d1"), b.getField("doc_id").as("d2"),
              a.getField("n").as("na"), b.getField("n").as("nb")))),
          p => p.isNotNull)))).as("p"))
        .select(col("p.d1"), col("p.d2"), col("p.na"), col("p.nb"))
      val inter = pairs.groupBy("d1", "d2", "na", "nb").agg(count(lit(1)).as("inter"))
      val j = col("inter").cast("double") / (col("na") + col("nb") - col("inter"))
      inter.filter(j >= 0.6).count()
    }

    def cappedShj() = {
      val idx = Dedup.invertedShingleIndex(docs)
      val inter = idx.as("a").hint("shuffle_hash")
        .join(idx.as("b").hint("shuffle_hash"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
          col("a.n").as("na"), col("b.n").as("nb"))
        .agg(count(lit(1)).as("inter"))
      val j = col("inter").cast("double") / (col("na") + col("nb") - col("inter"))
      inter.filter(j >= 0.6).count()
    }

    time("warmup")(docs.count())
    time("current 1st")(println("  pairs=" + current()))
    time("current 2nd")(println("  pairs=" + current()))
    time("windowed df>=2 1st")(println("  pairs=" + windowed()))
    time("windowed df>=2 2nd")(println("  pairs=" + windowed()))
    time("grouped postings 1st")(println("  pairs=" + grouped()))
    time("grouped postings 2nd")(println("  pairs=" + grouped()))
    time("capped SMJ (shipping) 1st")(
      println("  pairs=" + Dedup.hashJaccardPairs(docs, 0.6).count()))
    time("capped SMJ (shipping) 2nd")(
      println("  pairs=" + Dedup.hashJaccardPairs(docs, 0.6).count()))
    time("capped SHJ hint 1st")(println("  pairs=" + cappedShj()))
    time("capped SHJ hint 2nd")(println("  pairs=" + cappedShj()))
    spark.stop()
  }
}
