package graft.etl

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** OP-18/19/33: the engine's ANALYZE — per-column min/max, distinct
  * ratio, and sample-extrapolated byte sizing, mirroring the reference's
  * `estimate_size` (`notebooks/preprocessing_with_polars.ipynb:296-360`)
  * and distinct-ratio scans (`:1857-1862`, `:2721-2726`).
  *
  * Shape for scale: ONE aggregation job over a bounded sample computes
  * every statistic for every column in a single pass (partial+final
  * hash agg, no per-column scans), plus one exact COUNT over the full
  * input. At 100 TB the sample is a cheap prefix read and the count is a
  * metadata-only parquet scan.
  */
object Profiler {

  final case class ColumnProfile(
      name: String,
      dataType: String,
      isNumeric: Boolean,
      min: Option[Double],
      max: Option[Double],
      distinctRatio: Option[Double],
      estBytesPerRow: Double,
      estTotalBytes: Double)

  /** Fixed in-memory width of a primitive value; strings/binary measured
    * from the sample (reference: pandas deep memory accounting).
    */
  private def fixedWidth(t: DataType): Option[Int] = t match {
    case BooleanType | ByteType => Some(1)
    case ShortType => Some(2)
    case IntegerType | FloatType | DateType => Some(4)
    case LongType | DoubleType | TimestampType | TimestampNTZType => Some(8)
    case _ => None
  }

  private def isNumericType(t: DataType): Boolean = t match {
    case _: NumericType => true
    case _ => false
  }

  /** Profile every column of `df` from a `sampleRows`-row sample,
    * extrapolated to the exact full row count. `approxDistinct` switches
    * the distinct counter to HLL (`approx_count_distinct`) — the 100 TB
    * mode; exact mode is what the oracle checks (SURVEY §2 OP-19).
    */
  def profile(df: DataFrame, sampleRows: Int = 50000,
      approxDistinct: Boolean = false): Seq[ColumnProfile] = {
    val totalRows = df.count()
    val sample = df.limit(sampleRows)

    val fields = df.schema.fields.toSeq
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val distinctAgg =
        if (approxDistinct) approx_count_distinct(c).as(s"${f.name}__nd")
        else countDistinct(c).as(s"${f.name}__nd")
      val minMax = f.dataType match {
        case t if isNumericType(t) =>
          Seq(min(c).cast("double").as(s"${f.name}__min"),
            max(c).cast("double").as(s"${f.name}__max"))
        case _ => Seq()
      }
      val width = fixedWidth(f.dataType) match {
        case Some(w) => Seq(lit(w.toDouble).as(s"${f.name}__w"))
        // String/binary/array: measured mean byte length (+offset word).
        case None =>
          Seq((coalesce(avg(length(c)), lit(0.0)) + 8.0).as(s"${f.name}__w"))
      }
      distinctAgg +: (minMax ++ width) :+ count(c).as(s"${f.name}__cnt")
    }

    val row: Row = sample.agg(aggs.head, aggs.tail: _*).head()
    def d(name: String): Option[Double] =
      if (row.isNullAt(row.fieldIndex(name))) None
      else Some(row.getAs[Any](name) match {
        case x: Double => x
        case x: Long => x.toDouble
        case x: Int => x.toDouble
        case x => x.toString.toDouble
      })

    val sampleCount = math.min(totalRows, sampleRows.toLong).toDouble
    fields.map { f =>
      val nd = d(s"${f.name}__nd")
      val bytesPerRow = d(s"${f.name}__w").getOrElse(8.0)
      ColumnProfile(
        name = f.name,
        dataType = f.dataType.typeName,
        isNumeric = isNumericType(f.dataType),
        min = if (isNumericType(f.dataType)) d(s"${f.name}__min") else None,
        max = if (isNumericType(f.dataType)) d(s"${f.name}__max") else None,
        distinctRatio =
          if (sampleCount > 0) nd.map(_ / sampleCount) else None,
        estBytesPerRow = bytesPerRow,
        estTotalBytes = bytesPerRow * totalRows)
    }
  }

  /** Profile as a DataFrame (the OP-33 "profile table" the reference
    * sorts by est_total_bytes desc, OP-24).
    */
  def profileDF(df: DataFrame, sampleRows: Int = 50000,
      approxDistinct: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    profile(df, sampleRows, approxDistinct)
      .toDF()
      .orderBy(desc("estTotalBytes"))
  }

  /** One binary Datasketches-HLL sketch per column (values hashed as
    * strings so every column type is sketchable uniformly).
    *
    * This is the 100 TB distinct-profiling shape: sketches are
    * MERGEABLE, so each partition/day/ingest-batch profiles itself
    * independently and the per-slice sketch rows union losslessly later
    * (`unionSketches`) — no re-scan of history when new data lands,
    * unlike `countDistinct` or a re-run of `approx_count_distinct` over
    * the full input.
    */
  def distinctSketches(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val names = if (columns.isEmpty) df.columns.toSeq else columns
    val aggs = names.map(n => hll_sketch_agg(col(n).cast("string")).as(n))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Union per-column sketch rows produced by `distinctSketches` over
    * independent slices into one combined sketch row.
    */
  def unionSketches(sketchRows: DataFrame): DataFrame = {
    val names = sketchRows.columns.toSeq
    val aggs = names.map(n => hll_union_agg(col(n)).as(n))
    sketchRows.agg(aggs.head, aggs.tail: _*)
  }

  /** Distinct-count estimates from a sketch row. */
  def sketchEstimates(sketchRow: DataFrame): DataFrame = {
    val names = sketchRow.columns.toSeq
    sketchRow.select(names.map(n => hll_sketch_estimate(col(n)).as(n)): _*)
  }
}
