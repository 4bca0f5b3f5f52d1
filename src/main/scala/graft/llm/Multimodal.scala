package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.queries.Q

/** Multimodal-column plumbing: image/audio/video as opaque binary
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side machinery — schema, batch shape, partition-parallel
  * decode signature — is real and tested. The codec itself is STUBBED
  * (this container has no image/audio libraries): `decodeStub` derives a
  * deterministic fake feature vector from the bytes, so every pipeline
  * stage downstream of decode exercises realistic shapes. Swap
  * `decodeStub`'s body for a real codec (JNI/javacv) without touching
  * any caller.
  *
  * At 100 TB: binary payloads ride the same parquet row groups as
  * metadata; decode is `mapPartitions` (one codec init per partition,
  * not per row) — the Scala analog of `mapInPandas` batch processing.
  */
object Multimodal {

  /** Media row schema: the typed-metadata contract for opaque blobs. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true)))

  /** Build a media table from `documents`: the text bytes stand in for
    * an encoded payload; metadata is derived deterministically so tests
    * and oracles can check the plumbing end to end.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      concat(lit("image/fake-"), col("source")).as("media_type"),
      (octet_length(col("text")) % 640).cast("int").as("width"),
      ((col("doc_id") * 31) % 480).cast("int").as("height"),
      (octet_length(col("text")) % 16).cast("int").as("n_frames"))

  /** STUB decode: bytes → fixed-length feature vector. Deterministic
    * fake (per-byte rolling accumulation into `dim` buckets) standing in
    * for a real codec. Runs via mapPartitions so a real implementation
    * pays codec initialization once per partition.
    */
  def decodeStub(media: DataFrame, dim: Int = 8): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("features", ArrayType(DoubleType), nullable = true)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("doc_id", "media").mapPartitions { rows =>
      // Real codec would be initialized HERE, once per partition.
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val acc = new Array[Double](dim)
        var i = 0
        while (i < bytes.length) {
          acc(i % dim) += (bytes(i) & 0xFF) / 255.0
          i += 1
        }
        Row(id, acc.toSeq)
      }
    }(encoder)
  }

  /** Frame sampling: keep every `stride`-th frame index of a clip. Pure
    * column expressions over the metadata — no decode needed to plan
    * which frames to fetch (the scan-pruning property that matters at
    * scale: sample THEN decode, never the reverse).
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.withColumn("sampled_frames",
      when(col("n_frames") > 0,
        sequence(lit(0), col("n_frames") - 1, lit(stride)))
        .otherwise(array().cast("array<int>")))

  def defs: Seq[Q] = Seq(
    // Metadata extraction over binary payloads — oracle-checked: the
    // byte-length/meta derivations are engine-agnostic arithmetic.
    Q("q38_multimodal_meta",
      (s, d) =>
        mediaTable(Tables.load(s, d, "documents"))
          .select(col("doc_id"), col("media_type"),
            octet_length(col("media")).cast("int").as("n_bytes"),
            col("width"), col("height"), col("n_frames"))
          .orderBy(col("doc_id"))
          .limit(200),
      Some("""SELECT doc_id,
                     'image/fake-' || source AS media_type,
                     CAST(OCTET_LENGTH(ENCODE(text)) AS INT) AS n_bytes,
                     CAST(OCTET_LENGTH(ENCODE(text)) % 640 AS INT) AS width,
                     CAST((doc_id * 31) % 480 AS INT) AS height,
                     CAST(OCTET_LENGTH(ENCODE(text)) % 16 AS INT) AS n_frames
              FROM documents ORDER BY doc_id LIMIT 200""")),

    // Storage accounting + frame-sampling savings per media type: total
    // payload bytes per format and how many frames a stride-4 sampler
    // keeps (the decode-cost estimate you consult BEFORE launching the
    // decode stage). Exercises binary-column aggregation and the
    // sampleFrames operator under the value-hash oracle:
    // size(sequence(0, n-1, 4)) == ceil(n/4) for n > 0.
    Q("q63_media_storage",
      (s, d) => {
        val m = sampleFrames(mediaTable(Tables.load(s, d, "documents")), stride = 4)
        m.groupBy(col("media_type"))
          .agg(
            count(lit(1)).as("n_media"),
            sum(octet_length(col("media"))).as("total_bytes"),
            sum(col("n_frames")).cast("long").as("frames_total"),
            sum(size(col("sampled_frames"))).cast("long").as("frames_sampled"))
          .orderBy(col("media_type"))
      },
      Some("""WITH m AS (
                SELECT 'image/fake-' || source AS media_type,
                       OCTET_LENGTH(ENCODE(text)) AS n_bytes,
                       CAST(OCTET_LENGTH(ENCODE(text)) % 16 AS INT) AS n_frames
                FROM documents)
              SELECT media_type, COUNT(*) AS n_media,
                     CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
                     CAST(SUM(n_frames) AS BIGINT) AS frames_total,
                     CAST(SUM(CASE WHEN n_frames > 0
                                   THEN CAST(CEIL(n_frames / 4.0) AS INT)
                                   ELSE 0 END) AS BIGINT) AS frames_sampled
              FROM m GROUP BY 1 ORDER BY 1"""))
  )
}
