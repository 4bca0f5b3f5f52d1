package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.etl.{Readers, SchemaOptimizer, Writers}

/** The streaming successor of the reference's per-day ingest+preprocess
  * loop (SURVEY.md §3.2/§7.1 item 9): a Structured Streaming file source
  * watches the landing prefix the Ingestor writes to, and every
  * micro-batch runs the SchemaOptimizer pipeline incrementally —
  * multi-token null normalization, duplicate-column drop, date parsing,
  * downcasts, quarantine split — appending to an optimized parquet table
  * plus a quarantine audit table.
  *
  * At scale this is the always-on form of the batch pipeline: the file
  * source tracks processed files in the checkpoint, so restarts are
  * exactly-once per input file, and each batch's work is proportional to
  * newly landed data only.
  */
object Incremental {

  /** Start the incremental pipeline. `schema` must be explicit —
    * streaming sources cannot infer (and production readers shouldn't
    * anyway, SURVEY §1.4). `trigger` defaults to AvailableNow: drain
    * what's landed, then stop — cron-friendly; pass a processing-time
    * trigger for an always-on daemon.
    */
  def start(
      spark: SparkSession,
      landingDir: String,
      outDir: String,
      schema: StructType,
      dateCols: Seq[String] = Seq(),
      dropPattern: Option[String] = Some(".*_ar$"),
      checkpoint: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val stream = spark.readStream
      .option("header", "true")
      .schema(schema)
      .csv(landingDir)

    stream.writeStream
      .option("checkpointLocation",
        checkpoint.getOrElse(s"$outDir/_checkpoint"))
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val cleaned = Readers.normalizeAllNullMarkers(batch)
        val (optimized, quarantined) =
          SchemaOptimizer.optimize(cleaned, dropPattern, dateCols)
        optimized.write.mode("append")
          .option("compression", Writers.DefaultCompression)
          .parquet(s"$outDir/optimized")
        quarantined.write.mode("append")
          .option("compression", Writers.DefaultCompression)
          .parquet(s"$outDir/quarantine")
      }
      .start()
  }
}
