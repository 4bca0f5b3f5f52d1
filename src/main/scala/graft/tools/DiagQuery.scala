package graft.tools

import graft.SparkEntry
import graft.core.Session

/** Time individual registry queries by name (dev tool):
  * `runMain graft.tools.DiagQuery <sfDir> <query>...` — one warm-up run
  * then two timed runs per query, through the same noop-write
  * materialization Bench uses.
  */
object DiagQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = Session.local()
    spark.sparkContext.setLogLevel("WARN")
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      val w = once(n)
      val a = once(n)
      val b = once(n)
      println(f"[diagquery] $n warm=$w%.2f t1=$a%.2f t2=$b%.2f s")
    }
    spark.stop()
  }
}
