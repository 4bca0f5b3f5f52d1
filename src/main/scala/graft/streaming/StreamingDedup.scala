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
        try {
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
        } finally
          // release the checkpoint blocks before the batch closure
          // returns: in always-on mode every micro-batch would otherwise
          // pin one RDD's blocks forever — the exact persisted-RDD leak
          // class that degraded ~100 downstream queries 35% in r9
          // (zero-persisted-RDD-delta discipline, StreamingDedupSpec pin)
          Dedup.checkpointRdd(batchBands).foreach(_.unpersist(blocking = false))
      }
      .start()
  }

  /** Always-on CONTENT-LEVEL MEDIA dedup — [[start]]'s shape for the
    * binary modality: every micro-batch of media rows is perceptual-
    * hashed and chunk-banded ONCE (map-side,
    * [[graft.llm.Multimodal.phashBands]]), probes the persisted corpus
    * band index with the (band, chunk) equi-join for near-identical
    * payloads against everything ingested before (certified by Hamming
    * distance on the signatures riding the rows — the payload bytes
    * never leave their batch), then appends its own bands to the index.
    * Candidates (d_new, d_old, hamming) land under `outDir/candidates`.
    * Media arrives base64-encoded in the landing JSON (`media_b64`) —
    * JSON carries no raw bytes; a parquet/binary landing feed plugs in
    * by swapping the decode projection.
    */
  def startMedia(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      indexDir: String,
      outDir: String,
      maxHamming: Int = 6,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import org.apache.spark.sql.functions.{col, unbase64}
    import graft.llm.Multimodal
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
        val batchBands = Multimodal.phashBands(
            batch.select(col("doc_id"),
              unbase64(col("media_b64")).as("media")))
          .localCheckpoint(true)
        try {
          if (hasIndex) {
            val corpus = spark.read.parquet(indexDir)
            Multimodal.incrementalPhashCandidates(batchBands, corpus, maxHamming)
              .write.mode("append")
              .option("compression", Writers.DefaultCompression)
              .parquet(s"$outDir/candidates")
          }
          batchBands.write.mode("append")
            .option("compression", Writers.DefaultCompression)
            .parquet(indexDir)
        } finally
          // zero-persisted-RDD-delta: see start()
          Dedup.checkpointRdd(batchBands).foreach(_.unpersist(blocking = false))
      }
      .start()
  }

  /** Always-on EXACT dedup — the stage SCALE.md's rehearsal proved must
    * run BEFORE any near-dup banding (clone groups cost Ω(m²) in the
    * banded joins): each micro-batch keeps one representative per
    * content fingerprint (md5(text), min doc_id within the batch),
    * drops docs whose fingerprint was seen in ANY earlier batch, writes
    * survivors under `outDir/unique`, and records its fingerprints in
    * the seen-set.
    *
    * Exactly-once by construction, without locks: the seen-set is laid
    * out as one `batch=<id>` partition per micro-batch, the probe reads
    * only partitions with `batch < current`, and BOTH writes overwrite
    * their own batch partition — so a replayed batch recomputes the
    * identical survivor set (its own partial state partition is
    * invisible to the probe) and overwrites, never duplicates.
    *
    * Scale shape: the seen-set is probed with a broadcast LEFT SEMI of
    * the batch's (small) fingerprint set and only the (bounded, <=
    * batch-sized) hits are broadcast back for the anti join — the
    * historical seen-set is scanned map-side but NEVER shuffled, the
    * per-batch exchange cost is the batch's own fingerprints. At 100 TB
    * the fp partitions compact like any small-file state (see
    * StreamingCuration.compactState for the lease pattern; here
    * compaction must preserve the batch=N layout the idempotency
    * depends on, so fold files WITHIN partitions only).
    */
  def startExact(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      stateDir: String,
      outDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val stream = spark.readStream
      .schema(schema)
      .json(landingDir)

    stream.writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
        val batchDocs = batch
          .select(col("doc_id"), col("text"), md5(col("text")).as("fp"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
          .localCheckpoint(true) // reused by probe + both writes
        val fs = new Path(stateDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val survivors =
          if (fs.exists(new Path(stateDir))) {
            val seen = spark.read.parquet(stateDir)
              .filter(col("batch") < bid) // replay: own partial state invisible
            val hits = seen
              .join(broadcast(batchDocs.select(col("fp"))), Seq("fp"), "left_semi")
              .select(col("fp")).distinct()
            batchDocs.join(broadcast(hits), Seq("fp"), "left_anti")
          } else batchDocs
        val kept = survivors.localCheckpoint(true)
        try {
          kept.select(col("doc_id"), col("text"), col("fp"))
            .write.mode("overwrite")
            .option("compression", Writers.DefaultCompression)
            .parquet(s"$outDir/unique/batch=$bid")
          kept.select(col("fp"))
            .write.mode("overwrite")
            .option("compression", Writers.DefaultCompression)
            .parquet(s"$stateDir/batch=$bid")
        } finally {
          // zero-persisted-RDD-delta: see start()
          Dedup.checkpointRdd(kept).foreach(_.unpersist(blocking = false))
          Dedup.checkpointRdd(batchDocs).foreach(_.unpersist(blocking = false))
        }
      }
      .start()
  }
}
