package graft.tools

import graft.core.Session
import graft.etl.Versioned

/** Versioned-table cost rehearsal (dev tool): in ONE JVM, commit a
  * large base, commit a small delta, and read — demonstrating the
  * O(delta) commit claim (an append never rewrites or copies the
  * base; its cost is the delta's parquet write plus a KB manifest and
  * two renames).
  *
  * Usage: runMain graft.tools.VtableRehearsal <baseParquet>
  *          <deltaParquet> [outDir]
  */
object VtableRehearsal {
  def main(args: Array[String]): Unit = {
    val base = args(0)
    val delta = args(1)
    val dir = args.drop(2).headOption.getOrElse("target/scale/vtable")
    val spark = Session.local()
    spark.sparkContext.setLogLevel("WARN")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"""[vtable] {"step":"$what","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      r
    }
    val b = spark.read.parquet(base)
    val d = spark.read.parquet(delta)
    // warm the scans so the timings are the COMMITS, not page cache
    b.count(); d.count()
    timed("commit_base")(Versioned.commitAppend(b, dir))
    timed("commit_delta")(Versioned.commitAppend(d, dir))
    timed("commit_delta2")(Versioned.commitAppend(d, dir))
    val n = timed("read_latest")(
      Versioned.read(spark, dir).count())
    println(s"[vtable] rows=$n versions=${Versioned.log(spark, dir).size}")

    // Data-skipping demo: the base re-committed as 5 key-banded
    // commits with l_orderkey stats; a one-band predicate then reads
    // 1 subdir via the manifest vs filtering the full scan.
    import org.apache.spark.sql.functions.col
    val dir2 = s"$dir-banded"
    fs.delete(new org.apache.hadoop.fs.Path(dir2), true)
    val keyMax = b.agg(org.apache.spark.sql.functions
      .max(col("l_orderkey"))).head.getLong(0)
    val band = keyMax / 5 + 1
    (0 until 5).foreach { i =>
      Versioned.commitAppend(
        b.filter(col("l_orderkey") >= i * band
          && col("l_orderkey") < (i + 1) * band),
        dir2, Seq("l_orderkey"))
    }
    val lo = 2L * band
    val hi = 3L * band - 1
    val nf = timed("filter_full_scan")(
      Versioned.read(spark, dir2)
        .filter(col("l_orderkey") >= lo && col("l_orderkey") <= hi)
        .count())
    val (pdf, kept, skipped) =
      Versioned.readPruned(spark, dir2, "l_orderkey", lo, hi)
    val np = timed("read_pruned")(pdf.count())
    println(s"[vtable] pruned rows=$np (full-filter rows=$nf) " +
      s"subdirs_read=$kept subdirs_skipped=$skipped " +
      s"agree=${np == nf}")
    spark.stop()
  }
}
