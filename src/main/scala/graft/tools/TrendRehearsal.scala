package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Session
import graft.streaming.StreamingTrend

/** Rehearsal for the always-on streaming EWMA
  * ([[graft.streaming.StreamingTrend]]): drives `startLevels` over a
  * parquet landing built from a ScaleRehearsal events dir and reports
  * throughput plus the state population — the quantity the operator's
  * 100 TB story bounds (32 bytes per LIVE user, eviction removing the
  * idle). Run it against BOTH event axes: the density dir (default
  * `target/scale/sf1`: 10× events per user, constant |users| — state
  * stays at |users| while per-batch fold work grows) and the `users`
  * dir (`target/scale/r14users`: 10× the users at original density —
  * state grows with the population, per-user work constant).
  *
  * Usage: runMain graft.tools.TrendRehearsal <eventsDir> <workDir>
  */
object TrendRehearsal {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("target/scale/sf1")
    val workDir = args.drop(1).headOption
      .getOrElse("target/scale/trend")

    val spark = Session.local()
    spark.sparkContext.setLogLevel("WARN")

    // ScaleRehearsal dirs carry ts as LONG nanos (nanosAsLong session)
    val raw = spark.read.parquet(s"$srcDir/events.parquet")
    val ev = raw.select(col("user_id"),
      (if (raw.schema("ts").dataType ==
          org.apache.spark.sql.types.LongType)
        expr("timestamp_micros(ts div 1000)")
      else col("ts").cast("timestamp")).as("ts"),
      col("event_id"), col("value"))
    val landing = s"$workDir/landing"
    ev.repartition(32).write.mode("overwrite").parquet(landing)
    val nEvents = ev.count()
    val nUsers = ev.select(col("user_id")).distinct().count()

    val out = s"$workDir/out"
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)

    val t0 = System.nanoTime()
    StreamingTrend.startLevels(spark, landing, out,
      alpha = 0.3, idleMs = 3600L * 1000, watermarkDelay = "0 seconds")
      .awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9
    val levels = spark.read.parquet(s"$out/levels").count()
    println(f"""[scale] {"tool":"trend","src":"$srcDir","sec":$sec%.2f,"events":$nEvents,"users":$nUsers,"levels":$levels,"events_per_sec":${nEvents / sec}%.0f}""")
    spark.stop()
  }
}
