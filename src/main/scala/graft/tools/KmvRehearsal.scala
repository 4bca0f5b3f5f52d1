package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Session
import graft.etl.KmvStore

/** SCALE evidence for the KMV store contract: `build` is one corpus
  * pass, but `query` (the group-pair overlap readout) touches ONLY
  * the persisted sketches — |groups| × k rows — so its wall stays
  * FLAT as the built corpus grows 10×/100×. Also times the
  * sketch-only `merge` of two corpus-sized sources.
  *
  * Usage: runMain graft.tools.KmvRehearsal [rows] [groups] [steps]
  */
object KmvRehearsal {

  def main(args: Array[String]): Unit = {
    val baseRows = args.headOption.map(_.toLong).getOrElse(1000000L)
    val groups = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val steps = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val spark = Session.local()
    spark.sparkContext.setLogLevel("WARN")

    def corpus(rows: Long, salt: Long) = spark.range(rows)
      .select(concat(lit("g"), pmod(col("id"), lit(groups.toLong)))
          .as("t"),
        // overlapping member domains across groups -> real Jaccard
        (pmod(col("id") * 2654435761L + salt, lit(rows / 2)))
          .cast("string").as("kid"))

    def sec[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    for (step <- 0 until steps) {
      val rows = baseRows * math.pow(10, step).toLong
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-kmvreh-$step").toString
      val (_, tBuild) = sec(KmvStore.build(corpus(rows, 0L),
        col("t"), col("kid"), dir, k = 256))
      val (nPairs, tQuery) = sec(KmvStore.overlap(spark, dir).count())
      val dir2 = java.nio.file.Files
        .createTempDirectory(s"graft-kmvreh2-$step").toString
      val (_, tB2) = sec(KmvStore.build(corpus(rows, 7L),
        col("t"), col("kid"), dir2, k = 256))
      val out = java.nio.file.Files
        .createTempDirectory(s"graft-kmvrehm-$step").toString
      val (_, tMerge) = sec(KmvStore.merge(spark, dir, dir2, out))
      // incremental append of a FIXED-SIZE daily drop into the grown
      // store: wall must track the SLICE, not the built corpus
      val (_, tAppend) = sec(KmvStore.append(corpus(baseRows, 13L),
        col("t"), col("kid"), dir))
      println(f"""[scale] {"tool":"kmv","rows":$rows,"groups":$groups,"build_sec":${tBuild}%.2f,"build2_sec":${tB2}%.2f,"merge_sec":${tMerge}%.2f,"append_sec":${tAppend}%.2f,"query_sec":${tQuery}%.2f,"pairs":$nPairs}""")
    }
    spark.stop()
  }
}
