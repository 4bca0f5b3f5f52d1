package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

import graft.core.Session
import graft.etl.Writers
import graft.streaming.StreamingUpsert

/** Rehearsal for the SCD1 upsert family (r14 components): measures the
  * claim in [[graft.etl.Writers.upsertPartitioned]]'s Scaladoc — merge
  * cost proportional to the delta's TOUCHED partitions, never the
  * table — against the table-wide [[graft.etl.Writers.upsert]] on the
  * same data, plus one [[graft.streaming.StreamingUpsert]] micro-batch
  * to show the always-on wrapper inherits the partition-bounded cost.
  *
  * Layout: the 10x events table (re-salted event_ids, the
  * ScaleRehearsal shape) written twice — hive-partitioned by event day
  * (`day=yyyy-MM-dd`, ~30 partitions) and flat. The delta is one day's
  * update slice (value bumped, version = ts advanced one second so the
  * delta deterministically wins the merge). The partitioned route runs
  * FIRST, so it pays any residual JVM warmup — conservative for the
  * claim under test.
  *
  * Prints one `[scale]` JSON line per route: wall seconds, merged
  * rows, and the bytes the route REWROTE (touched partition dir vs
  * whole table) — the quantity that scales with the table at 100 TB.
  *
  * Usage: runMain graft.tools.UpsertRehearsal <outDir> <mult>
  */
object UpsertRehearsal {
  def main(args: Array[String]): Unit = {
    val srcDir = "/root/testdata/sf0.1"
    val outDir = args.headOption.getOrElse("target/scale/upsert")
    val mult = args.drop(1).headOption.map(_.toInt).getOrElse(10)

    val spark = Session.local()
    spark.sparkContext.setLogLevel("WARN")
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dirMb(p: String): Double = {
      val path = new org.apache.hadoop.fs.Path(p)
      if (!fs.exists(path)) 0.0
      else fs.getContentSummary(path).getLength / 1e6
    }

    val ev = spark.read.parquet(s"$srcDir/events.parquet")
    val stride = ev.agg(max(col("event_id"))).head.getLong(0) + 1L
    // ts may surface as LONG nanos (nanosAsLong) or as a timestamp
    val tsAsTimestamp =
      if (ev.schema("ts").dataType == LongType)
        (col("ts") / lit(1000000000L)).cast("timestamp")
      else col("ts")
    val scaled = ev.crossJoin(spark.range(mult).toDF("copy"))
      .withColumn("event_id", col("event_id") + col("copy") * lit(stride))
      .drop("copy")
      .withColumn("day", date_format(tsAsTimestamp, "yyyy-MM-dd"))

    val partDir = s"$outDir/events_part"
    val flatDir = s"$outDir/events_flat"
    scaled.repartition(32, col("event_id"))
      .write.mode("overwrite").partitionBy("day").parquet(partDir)
    scaled.repartition(32, col("event_id"))
      .write.mode("overwrite").parquet(flatDir)
    val nPartitions = fs.listStatus(new org.apache.hadoop.fs.Path(partDir))
      .count(s => s.isDirectory && s.getPath.getName.startsWith("day="))
    val tableRows = scaled.count()

    // One day's update slice: every 4th event of day 15, value bumped,
    // version advanced one second so the delta wins the merge outright.
    val day = "2024-01-15"
    def delta(d: String): DataFrame = spark.read.parquet(flatDir)
      .filter(col("day") === d && col("event_id") % 4 === 0)
      .withColumn("value", col("value") + lit(1.0))
      .withColumn("ts",
        if (ev.schema("ts").dataType == LongType)
          col("ts") + lit(1000000000L)
        else expr("timestampadd(SECOND, 1, ts)"))
    val d0 = delta(day).cache()
    val deltaRows = d0.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // Route 1 (first, pays warmup): partition-scoped — rewrites ONLY
    // the touched day dir.
    val (mergedPart, secPart) = timed {
      Writers.upsertPartitioned(spark, partDir, d0, "day",
        Seq("event_id"), "ts")
    }
    val rewrotePart = dirMb(s"$partDir/day=$day")
    println(f"""[scale] {"op":"upsert_partitioned","sec":$secPart%.2f,"rows_merged":$mergedPart,"rewritten_mb":$rewrotePart%.1f,"partitions_touched":1,"table_partitions":$nPartitions,"table_rows":$tableRows,"delta_rows":$deltaRows}""")

    // Route 2: table-wide — reads and rewrites the WHOLE flat table.
    val (mergedFlat, secFlat) = timed {
      Writers.upsert(spark, flatDir, d0, Seq("event_id"), "ts")
    }
    val rewroteFlat = dirMb(flatDir)
    println(f"""[scale] {"op":"upsert_full_table","sec":$secFlat%.2f,"rows_merged":$mergedFlat,"rewritten_mb":$rewroteFlat%.1f,"partitions_touched":$nPartitions,"table_partitions":$nPartitions,"table_rows":$tableRows,"delta_rows":$deltaRows}""")

    // Route 3: the same partition-bounded cost through the always-on
    // streaming CDC wrapper — a fresh day's delta lands as one file,
    // one AvailableNow micro-batch applies it.
    val day2 = "2024-01-20"
    val landing = s"$outDir/landing"
    val d1 = delta(day2)
    val deltaSchema: StructType = d1.schema
    d1.coalesce(1).write.mode("overwrite").parquet(landing)
    val (_, secStream) = timed {
      val q = StreamingUpsert.start(spark, landing, partDir, deltaSchema,
        "day", Seq("event_id"), "ts",
        checkpoint = Some(s"$outDir/checkpoint"))
      q.awaitTermination()
    }
    println(f"""[scale] {"op":"upsert_streaming_batch","sec":$secStream%.2f,"rewritten_mb":${dirMb(s"$partDir/day=$day2")}%.1f,"partitions_touched":1,"table_partitions":$nPartitions,"table_rows":$tableRows,"delta_rows":$deltaRows}""")

    spark.stop()
  }
}
