package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog of the driver-provided star schema (TESTDATA.md).
  *
  * Each table is one parquet file under `sfDir`. Reads are plain
  * `spark.read.parquet` so Catalyst owns column pruning and predicate
  * pushdown — a query that touches 2 columns scans 2 columns
  * (verify via `PushedFilters`/`ReadSchema` in `.explain("formatted")`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any scale factor the
    * engine targets (region/nation are fixed-size in TPC-H-style data). */
  val broadcastable: Set[String] = Set("region", "nation")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view for `spark.sql` queries. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
