package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.etl.Writers
import graft.llm.Dedup

/** Always-on near-dup deduplication: the streaming form of
  * [[graft.llm.Dedup.incrementalCandidates]].
  *
  * Every micro-batch of new documents is MinHash-signed and banded ONCE
  * (map-side), probes the persisted corpus band index with the
  * (band, band_hash) equi-join for near-dup candidates against
  * everything ingested before it, then appends its own bands to the
  * index. The corpus is never re-signed — per-batch work is
  * proportional to the batch, the historical index is only ever read
  * and appended.
  *
  * At 100 TB the index parquet is partitioned/bucketed by band_hash so
  * the probe join co-locates; here the layout is plain parquet and the
  * join shape is identical. Intra-batch duplicates are also reported
  * (minhashCandidates within the batch), so the dedup decision is
  * complete: a doc is new iff it has no candidate in EITHER output.
  */
object StreamingDedup {

  /** Start the streaming dedup. `docs` schema must carry doc_id + text.
    * Candidates (d_new, d_old, est_jaccard) land under `outDir/candidates`;
    * the growing band index under `indexDir`.
    */
  def start(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      indexDir: String,
      outDir: String,
      minEstJaccard: Double = 0.5,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val stream = spark.readStream
      .schema(schema)
      .json(landingDir)

    stream.writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val fs = new Path(indexDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val hasIndex = fs.exists(new Path(indexDir))
        // bands computed ONCE per batch, reused for probe + append
        val batchBands = Dedup.minhashBands(batch).localCheckpoint(true)
        if (hasIndex) {
          val corpus = spark.read.parquet(indexDir)
          Dedup.incrementalCandidatesFromBands(batchBands, corpus, minEstJaccard)
            .write.mode("append")
            .option("compression", Writers.DefaultCompression)
            .parquet(s"$outDir/candidates")
        }
        batchBands.write.mode("append")
          .option("compression", Writers.DefaultCompression)
          .parquet(indexDir)
      }
      .start()
  }
}
