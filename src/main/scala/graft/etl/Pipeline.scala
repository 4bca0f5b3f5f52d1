package graft.etl

import org.apache.spark.sql.SparkSession

import graft.ingest.Ingestor

/** The reference's flagship flow as ONE command (OP-41 / SURVEY §3.3):
  * parameters.json → chunked HTTP ingest → CSV scan with multi-token
  * null normalization → SchemaOptimizer (duplicate-column drop, downcast
  * ladder, quarantine split) → dated-partitioned zstd parquet plus a
  * quarantine audit, per ingested table. The reference spreads this
  * across a Lambda, notebooks, and a Step Functions claim; here the
  * library pieces compose behind `graft.Main pipeline <config> <landing>
  * <out>` so a user goes from config to optimized parquet in one step
  * (each stage remains available as its own subcommand).
  */
object Pipeline {

  final case class TableResult(table: String, rows: Long,
      quarantined: Long, schema: String)

  /** Ingest per `configPath`, then preprocess every landed CSV into
    * `outDir/<table>/{optimized,quarantine}`. Non-CSV landings (the
    * suffix map can route archives or binaries) are left as-is — they
    * have no tabular preprocessing step.
    */
  def run(spark: SparkSession, configPath: String, landingDir: String,
      outDir: String): (Ingestor.Report, Seq[TableResult]) = {
    val report = Ingestor.ingestFromConfig(spark, configPath, landingDir)
    val tables = report.succeeded
      .filter(_.dest.endsWith(".csv"))
      .map { f =>
        val table = new java.io.File(f.dest).getName.stripSuffix(".csv")
        val raw = Readers.csv(spark, f.dest)
        val (optimized, quarantined) = SchemaOptimizer.optimize(raw)
        Writers.datePartitioned(optimized, s"$outDir/$table/optimized")
        Writers.quarantine(quarantined, s"$outDir/$table/quarantine")
        TableResult(table,
          spark.read.parquet(s"$outDir/$table/optimized").count(),
          spark.read.parquet(s"$outDir/$table/quarantine").count(),
          optimized.schema.simpleString)
      }
    (report, tables)
  }
}
