package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Source readers (SURVEY.md §2A OP-04/OP-08).
  *
  * The reference scans CSV lazily with multi-token null markers and a
  * 10k-row inference window (`notebooks/preprocessing_with_polars.ipynb:
  * 225-228`: `null_values=["", "null", "NULL", "None"],
  * infer_schema_length=10000`). Spark's CSV `nullValue` option accepts a
  * single token, so the remaining markers are normalized post-scan with a
  * `when(isin).otherwise` rewrite — a codegen'd expression, no UDF.
  */
object Readers {

  /** Tokens the reference treats as SQL NULL at scan time. */
  val NullMarkers: Seq[String] = Seq("", "null", "NULL", "None")

  /** Rewrite the given string columns so any value in [[NullMarkers]]
    * becomes NULL. Pure column expressions — stays inside whole-stage
    * codegen and is pushed past the scan where possible.
    */
  def normalizeNullMarkers(df: DataFrame, cols: Seq[String]): DataFrame = {
    val stringCols = {
      val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
      cols.filter(c => byName.get(c).contains(StringType))
    }
    stringCols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c,
        when(col(c).isin(NullMarkers: _*), lit(null).cast(StringType))
          .otherwise(col(c)))
    }
  }

  /** Normalize every string column. */
  def normalizeAllNullMarkers(df: DataFrame): DataFrame =
    normalizeNullMarkers(df,
      df.schema.fields.filter(_.dataType == StringType).map(_.name).toSeq)

  /** CSV scan with header + schema inference (OP-04). `samplingRatio`
    * approximates the reference's bounded inference window without a
    * second full pass; pass an explicit schema for production reads.
    */
  def csv(
      spark: SparkSession,
      path: String,
      schema: Option[StructType] = None,
      inferSamplingRatio: Double = 1.0): DataFrame = {
    val base = spark.read
      .option("header", "true")
      // Spark's single-token nullValue covers ""; the rest via rewrite.
      .option("nullValue", "")
    val withSchema = schema match {
      case Some(s) => base.schema(s)
      case None =>
        base.option("inferSchema", "true")
          .option("samplingRatio", inferSamplingRatio.toString)
    }
    normalizeAllNullMarkers(withSchema.csv(path))
  }

  /** JSON config source (OP-08): small config documents, multiline. */
  def jsonConfig(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

  /** Parquet scan — Catalyst owns pruning/pushdown. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC scan — the second columnar format a complete engine reads;
    * Spark's native vectorized ORC reader gives the same predicate
    * pushdown + column pruning as parquet (EtlSpec pins PushedFilters
    * on the scan), so downstream operators are format-agnostic.
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** JSONL (one JSON document per line) scan with an explicit schema —
    * the interchange format crawl/curation dumps actually arrive in.
    * Schema REQUIRED by design: at 100 TB, schema inference is a full
    * extra pass; a malformed line yields a null row, not a job failure
    * (ANSI-off engine semantics).
    */
  def jsonl(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
