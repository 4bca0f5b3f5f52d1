package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.etl.Writers
import graft.llm.{Curation, TextOps}

/** Always-on corpus curation: the streaming form of q66 test-set
  * decontamination and q67 mixture sampling (the StreamingDedup shape —
  * per-batch work proportional to the batch, history only read/appended).
  *
  * Per micro-batch of documents:
  *  - every doc is hash-split (q59 rule) and content-fingerprinted ONCE;
  *  - TEST-split docs probe the persisted train-fingerprint index for
  *    contamination — history is never re-fingerprinted;
  *  - the batch's TRAIN fingerprints also retro-probe the persisted
  *    test-doc table, so a training document that arrives AFTER the test
  *    document it contaminates is still caught (arrival order cannot
  *    hide leakage);
  *  - train fingerprints / test docs append to their state tables;
  *  - per-language mixture counts (q67's salted-hash rule) append to an
  *    additive stats table.
  *
  * [[contaminationCounts]] / [[mixtureTotals]] fold the accumulated state
  * back to exactly the batch-mode q66/q67 answers over everything
  * ingested so far (StreamingCurationSpec pins equality over 3 batches).
  * At 100 TB the fingerprint index is the only state that grows with the
  * corpus, and it is a single slim column — bucket it by fp the way the
  * band index is bucketed by band_hash.
  */
object StreamingCuration {

  def start(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      stateDir: String,
      outDir: String,
      rates: Map[String, Int],
      defaultRate: Int,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val trainFpDir = s"$stateDir/train_fp"
    val testDocsDir = s"$stateDir/test_docs"
    val stream = spark.readStream
      .schema(schema)
      .json(landingDir)

    stream.writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val fs = new Path(stateDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        // split + fingerprint computed ONCE per batch, reused across the
        // probe, retro-probe, and both state appends
        val t = batch.select(
            col("doc_id"), Curation.splitCol.as("split"),
            TextOps.fingerprint(col("text")).as("fp"))
          .localCheckpoint(true)
        val newTrain = t.filter(col("split") === "train")
          .select(col("fp")).distinct()
        val newTest = t.filter(col("split") === "test")
          .select(col("doc_id"), col("fp"))
        // new test docs vs the whole train history (incl. this batch)
        val trainAll =
          if (fs.exists(new Path(trainFpDir)))
            spark.read.parquet(trainFpDir).unionByName(newTrain)
          else newTrain
        val contNew = newTest.join(trainAll, Seq("fp"), "left_semi")
          .select(col("doc_id"))
        // new train fingerprints vs already-stored test docs (late train)
        val contLate =
          if (fs.exists(new Path(testDocsDir)))
            spark.read.parquet(testDocsDir)
              .join(newTrain, Seq("fp"), "left_semi")
              .select(col("doc_id"))
          else contNew.limit(0)
        contNew.unionByName(contLate)
          .write.mode("append")
          .option("compression", Writers.DefaultCompression)
          .parquet(s"$outDir/contaminated")
        newTrain.write.mode("append")
          .option("compression", Writers.DefaultCompression)
          .parquet(trainFpDir)
        newTest.write.mode("append")
          .option("compression", Writers.DefaultCompression)
          .parquet(testDocsDir)
        Curation.mixtureCounts(batch, rates, defaultRate)
          .write.mode("append")
          .option("compression", Writers.DefaultCompression)
          .parquet(s"$outDir/mixture")
      }
      .start()
  }

  /** Streaming N-GRAM decontamination — the q77 semantics incrementally
    * (the same state shape as [[start]]'s fingerprint check, at 8-gram
    * granularity): per micro-batch, each doc's distinct gram keys are
    * computed ONCE ([[graft.llm.Curation.gramKeys]]); the batch's
    * test-doc grams probe the persisted train-gram index, the batch's
    * train grams retro-probe the persisted test-gram table (late-arriving
    * train contamination is still caught), and both state tables grow by
    * append only — history is never re-tokenized.
    *
    * Hits are stored as (doc_id, k) PAIRS, so folding with distinct
    * counts ([[ngramContaminationTotals]]) is idempotent across batches:
    * a gram flagged by both the forward probe and a later retro-probe, or
    * by several train batches, counts once — exactly the batch-q77
    * answer over everything ingested (StreamingCurationSpec pins it).
    *
    * 100 TB shape: every probe is an equi-join on the near-unique 16-hex
    * key; per-batch cost is proportional to the batch's gram count plus
    * the probed history partitions — bucket both state tables by k the
    * way the band index is bucketed by band_hash.
    */
  def startNgramDecon(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      stateDir: String,
      outDir: String,
      n: Int = 8,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val trainGramDir = s"$stateDir/train_grams"
    val testGramDir = s"$stateDir/test_grams"
    val stream = spark.readStream
      .schema(schema)
      .json(landingDir)

    stream.writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val fs = new Path(stateDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val grams = graft.llm.Curation.gramKeys(batch, n).localCheckpoint(true)
        val newTrain = grams.filter(col("split") === "train")
          .select(col("k")).distinct()
        val newTest = grams.filter(col("split") === "test")
          .select(col("doc_id"), col("k"))
        // new test grams vs the whole train history (incl. this batch)
        val trainAll =
          if (fs.exists(new Path(trainGramDir)))
            spark.read.parquet(trainGramDir).unionByName(newTrain)
          else newTrain
        val hitsNew = newTest.join(trainAll, Seq("k"), "left_semi")
        // new train grams vs already-stored test grams (late train)
        val hitsLate =
          if (fs.exists(new Path(testGramDir)))
            spark.read.parquet(testGramDir)
              .join(newTrain, Seq("k"), "left_semi")
          else hitsNew.limit(0)
        hitsNew.unionByName(hitsLate)
          .write.mode("append")
          .option("compression", Writers.DefaultCompression)
          .parquet(s"$outDir/gram_hits")
        newTrain.write.mode("append")
          .option("compression", Writers.DefaultCompression)
          .parquet(trainGramDir)
        newTest.write.mode("append")
          .option("compression", Writers.DefaultCompression)
          .parquet(testGramDir)
      }
      .start()
  }

  /** Accumulated (n_test, n_contaminated, n_overlap_grams) — equal to
    * the batch q77 answer over the union of every ingested batch.
    * Distinct counts make replayed/multi-source hits idempotent.
    */
  def ngramContaminationTotals(spark: SparkSession, stateDir: String,
      outDir: String): DataFrame = {
    val fs = new Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nTest = spark.read.parquet(s"$stateDir/test_grams")
      .agg(countDistinct(col("doc_id")).as("n_test"))
    val hitsDir = s"$outDir/gram_hits"
    val hits =
      if (fs.exists(new Path(hitsDir)))
        spark.read.parquet(hitsDir)
          .agg(countDistinct(col("doc_id")).as("n_contaminated"),
            countDistinct(col("doc_id"), col("k")).as("n_overlap_grams"))
      else nTest.select(lit(0L).as("n_contaminated"),
        lit(0L).as("n_overlap_grams"))
    nTest.crossJoin(hits)
  }

  /** Accumulated (n_test, n_contaminated) — equal to the batch q66
    * answer over the union of every ingested batch. Contaminated doc ids
    * are distinct-counted: a test doc flagged by several train batches
    * counts once, matching the batch semantics.
    */
  def contaminationCounts(spark: SparkSession, stateDir: String,
      outDir: String): DataFrame = {
    val fs = new Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nTest = spark.read.parquet(s"$stateDir/test_docs")
      .agg(count(lit(1)).as("n_test"))
    val contDir = s"$outDir/contaminated"
    val nCont =
      if (fs.exists(new Path(contDir)))
        spark.read.parquet(contDir)
          .agg(countDistinct(col("doc_id")).as("n_contaminated"))
      else nTest.select(lit(0L).as("n_contaminated"))
    nTest.crossJoin(nCont)
  }

  /** Accumulated per-language (n_docs, n_sampled) — the q67 answer over
    * everything ingested (the per-batch counts are additive because the
    * sampling rule is a pure per-doc hash).
    */
  def mixtureTotals(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/mixture")
      .groupBy(col("lang"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_sampled")).as("n_sampled"))
      .orderBy(col("lang"))
}
