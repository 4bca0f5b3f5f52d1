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
    // GRAFT_DIAG_RAW=1 reproduces the DRIVER's Bench session (bare
    // builder + Session.tune) instead of the engine's Session.local —
    // the only way to A/B a tune()-level conf the way the official
    // bench will see it; GRAFT_DIAG_BROADCAST overrides the broadcast
    // threshold on top (A/B knob, this tool only).
    val spark =
      if (sys.env.get("GRAFT_DIAG_RAW").contains("1")) {
        val cpus = Runtime.getRuntime.availableProcessors()
        val s = org.apache.spark.sql.SparkSession.builder()
          .master(s"local[$cpus]")
          .config("spark.sql.extensions", "graft.functions.GraftExtensions")
          .config("spark.sql.shuffle.partitions", "32")
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.ui.enabled", "false")
          .getOrCreate()
        Session.tune(s)
        sys.env.get("GRAFT_DIAG_BROADCAST").foreach(v =>
          s.conf.set("spark.sql.autoBroadcastJoinThreshold", v))
        s
      } else Session.local()
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
