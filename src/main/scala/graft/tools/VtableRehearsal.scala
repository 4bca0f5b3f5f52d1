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
    spark.stop()
  }
}
