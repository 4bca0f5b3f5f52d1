package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Q

/** Distributed logistic-regression quality classifier — the linear core
  * of a fasttext-style learned quality filter (the step after the q108
  * rule gate in a curation funnel: rules prune the obvious, a learned
  * scorer ranks the rest).
  *
  * Training is full-batch gradient descent where EACH ITERATION IS ONE
  * AGGREGATION JOB: the current weight vector is embedded as literals in
  * a codegen'd sigmoid expression, the gradient avg((p - y)·x_j) is a
  * map-side-combined aggregate, and only d+1 doubles return to the
  * driver. Nothing iterative ever touches the driver except the d+1-row
  * gradient — the corpus-scale work is always one declarative pass, so
  * the loop scales exactly like any other aggregate query. At 100 TB
  * train on a seeded sample (`sampleFraction`, the IvfStore.train
  * convention): logistic regression on 4 features needs thousands of
  * rows, not billions, and scoring — the part that must see every row —
  * is a broadcast of the 1-row weight artifact (train once, score many;
  * the lm/bpe/ivf convention).
  */
object QualityClassifier {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

  /** Feature stop list — the two stopwords the synthetic corpus
    * vocabulary actually contains (see q108; the English list is the
    * production default in spirit).
    */
  val StopList: Seq[String] = Seq("the", "a")

  /** Deterministic per-doc features from raw text, exact rational
    * arithmetic both engines reproduce: bias, n_words/100, stop-hit
    * ratio, distinct-token ratio.
    */
  def features(docsDf: DataFrame, label: Column): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val nw = size(toks).cast("double")
    docsDf.select(
      col("doc_id"),
      label.cast("int").as("y"),
      lit(1.0).as("x0"),
      (nw / 100.0).as("x1"),
      (TextOps.stopHits(toks, StopList).cast("double") / nw).as("x2"),
      (size(array_distinct(toks)).cast("double") / nw).as("x3"))
  }

  val Dim = 4

  /** Gradient-descent training; returns the weight vector. One
    * aggregation job per iteration over the (optionally sampled, then
    * cached) feature frame.
    */
  def train(featsDf: DataFrame, iters: Int = 30, lr: Double = 2.0,
      sampleFraction: Double = 1.0, seed: Long = 42L): Array[Double] = {
    val f = (if (sampleFraction < 1.0)
      featsDf.sample(withReplacement = false, sampleFraction, seed)
    else featsDf).localCheckpoint(true)
    var w = Array.fill(Dim)(0.0)
    for (_ <- 0 until iters) {
      val z = (0 until Dim).map(j => col(s"x$j") * lit(w(j)))
        .reduce(_ + _)
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val err = p - col("y").cast("double")
      val g = f.agg(
        avg(err * col("x0")), avg(err * col("x1")),
        avg(err * col("x2")), avg(err * col("x3"))).head()
      w = w.zipWithIndex.map { case (wj, j) => wj - lr * g.getDouble(j) }
    }
    // Dataset.unpersist alone does NOT free an eager localCheckpoint's
    // blocks (it only talks to the CacheManager); drop the backing
    // persisted RDD too, or every train() call pins one snapshot for the
    // session's lifetime — the r9 pageRank leak class, now failed loud
    // by Bench's standing zero-persisted-RDD assertion.
    f.unpersist()
    Dedup.checkpointRdd(f).foreach(_.unpersist(blocking = false))
    w
  }

  /** The weight artifact: ONE row (w0..w3) — broadcastable anywhere,
    * readable by any engine.
    */
  def weightsDf(spark: SparkSession, w: Array[Double]): DataFrame = {
    import spark.implicits._
    Seq((w(0), w(1), w(2), w(3))).toDF("w0", "w1", "w2", "w3")
  }

  /** Score every document against a stored weight artifact: broadcast
    * 1-row cross join + codegen'd sigmoid — a map-only pass over the
    * corpus.
    */
  def scoreWith(featsDf: DataFrame, weights: DataFrame): DataFrame = {
    val z = (0 until Dim).map(j => col(s"x$j") * col(s"w$j"))
      .reduce(_ + _)
    val p = lit(1.0) / (lit(1.0) + exp(-z))
    featsDf.crossJoin(broadcast(weights))
      .select(col("doc_id"), col("y"),
        round(p, 4).as("p_score"),
        (p >= 0.5).cast("int").as("pred"))
  }

  val Q110WeightsDir = graft.core.Artifacts.dir("graft_q110_weights")
  val Q115WeightsDir = graft.core.Artifacts.dir("graft_q115_weights")
  val Q118WeightsDir = graft.core.Artifacts.dir("graft_q118_weights")

  def defs: Seq[Q] = Seq(
    // Learned quality classifier end to end: train logistic regression
    // (30 GD iterations, each one aggregate job) against the lang='en'
    // label, persist the 1-row weight artifact, then score the corpus
    // against the STORED artifact — the oracle reads the same parquet,
    // so the hash pins the scoring math (features, dot product, sigmoid,
    // threshold) exactly; training lives upstream of the shared
    // artifact like q82's codebook.
    Q("q110_quality_classifier",
      (s, d) => {
        val feats = features(docs(s, d), col("lang") === "en")
        val w = train(feats, iters = 30, lr = 2.0)
        weightsDf(s, w).coalesce(1)
          .write.mode("overwrite").parquet(Q110WeightsDir)
        val stored = s.read.parquet(Q110WeightsDir)
        scoreWith(feats, stored)
          .orderBy(col("doc_id"))
          .limit(200)
      },
      Some(s"""WITH t AS (
                SELECT doc_id,
                       CAST(lang = 'en' AS INT) AS y,
                       regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS toks
                FROM documents),
              f AS (
                SELECT doc_id, y,
                       1.0 AS x0,
                       CAST(LEN(toks) AS DOUBLE) / 100.0 AS x1,
                       CAST(LEN(list_filter(toks,
                         x -> list_contains(['the','a'], x))) AS DOUBLE)
                         / LEN(toks) AS x2,
                       CAST(LEN(list_distinct(toks)) AS DOUBLE)
                         / LEN(toks) AS x3
                FROM t),
              w AS (SELECT w0, w1, w2, w3
                    FROM read_parquet('$Q110WeightsDir/*.parquet')),
              sc AS (
                SELECT doc_id, y,
                       1.0 / (1.0 + EXP(-(x0*w0 + x1*w1 + x2*w2 + x3*w3))) AS p
                FROM f CROSS JOIN w)
              SELECT doc_id, y, ROUND(p, 4) AS p_score,
                     CAST(p >= 0.5 AS INT) AS pred
              FROM sc ORDER BY doc_id LIMIT 200""")),

    // Calibration report for the learned scorer: fixed-width probability
    // bins (floor(10·p), a MAP-ONLY bucketing — deliberately not
    // ntile(), whose single-partition global window is the at-scale
    // anti-pattern TopKPerKey exists to kill), per-bin count, empirical
    // positive rate, and mean predicted p. A well-calibrated scorer has
    // y_rate ≈ p_avg per bin; the report is what licenses using p as a
    // sampling weight (q79/q67) rather than just a ranking. Trains and
    // persists its own artifact (self-contained, like every registry
    // entry); the oracle reads the same stored weights.
    Q("q115_classifier_calibration",
      (s, d) => {
        val feats = features(docs(s, d), col("lang") === "en")
        val w = train(feats, iters = 30, lr = 2.0)
        weightsDf(s, w).coalesce(1)
          .write.mode("overwrite").parquet(Q115WeightsDir)
        val stored = s.read.parquet(Q115WeightsDir)
        scoreWith(feats, stored)
          .withColumn("bin",
            least(floor(col("p_score") * 10), lit(9)).cast("int"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"),
            round(avg(col("y")), 4).as("y_rate"),
            round(avg(col("p_score")), 4).as("p_avg"))
          .orderBy(col("bin"))
      },
      Some(s"""WITH t AS (
                SELECT doc_id,
                       CAST(lang = 'en' AS INT) AS y,
                       regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS toks
                FROM documents),
              f AS (
                SELECT doc_id, y,
                       1.0 AS x0,
                       CAST(LEN(toks) AS DOUBLE) / 100.0 AS x1,
                       CAST(LEN(list_filter(toks,
                         x -> list_contains(['the','a'], x))) AS DOUBLE)
                         / LEN(toks) AS x2,
                       CAST(LEN(list_distinct(toks)) AS DOUBLE)
                         / LEN(toks) AS x3
                FROM t),
              w AS (SELECT w0, w1, w2, w3
                    FROM read_parquet('$Q115WeightsDir/*.parquet')),
              sc AS (
                SELECT doc_id, y,
                       ROUND(1.0 / (1.0 + EXP(-(x0*w0 + x1*w1 + x2*w2 + x3*w3))), 4)
                         AS p_score
                FROM f CROSS JOIN w),
              b AS (
                SELECT CAST(LEAST(FLOOR(p_score * 10), 9) AS INT) AS bin,
                       y, p_score
                FROM sc)
              SELECT bin, COUNT(*) AS n,
                     ROUND(AVG(y), 4) AS y_rate,
                     ROUND(AVG(p_score), 4) AS p_avg
              FROM b GROUP BY bin ORDER BY bin""")),

    // Ranking quality of the learned scorer: tie-aware AUC
    // (Mann-Whitney with midranks) computed over DISTINCT scores — the
    // corpus aggregates to at most 10 001 rounded-score rows (p_score is
    // 4-decimal by construction), so the cumulative window that the
    // textbook rank formulation would run over EVERY row runs over a
    // grid whose size is fixed by the rounding, not the corpus. AUC =
    // Σ_s n_pos(s)·(cum_neg_below(s) + n_neg(s)/2) / (P·N). Trains and
    // persists its own artifact; the oracle replicates the identical
    // per-score fold from the same stored weights.
    Q("q118_classifier_auc",
      (s, d) => {
        val feats = features(docs(s, d), col("lang") === "en")
        val w = train(feats, iters = 30, lr = 2.0)
        weightsDf(s, w).coalesce(1)
          .write.mode("overwrite").parquet(Q118WeightsDir)
        val stored = s.read.parquet(Q118WeightsDir)
        aucWith(feats, stored)
      },
      Some(s"""WITH t AS (
                SELECT doc_id,
                       CAST(lang = 'en' AS INT) AS y,
                       regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS toks
                FROM documents),
              f AS (
                SELECT doc_id, y,
                       1.0 AS x0,
                       CAST(LEN(toks) AS DOUBLE) / 100.0 AS x1,
                       CAST(LEN(list_filter(toks,
                         x -> list_contains(['the','a'], x))) AS DOUBLE)
                         / LEN(toks) AS x2,
                       CAST(LEN(list_distinct(toks)) AS DOUBLE)
                         / LEN(toks) AS x3
                FROM t),
              w AS (SELECT w0, w1, w2, w3
                    FROM read_parquet('$Q118WeightsDir/*.parquet')),
              sc AS (
                SELECT doc_id, y,
                       ROUND(1.0 / (1.0 + EXP(-(x0*w0 + x1*w1 + x2*w2 + x3*w3))), 4)
                         AS p_score
                FROM f CROSS JOIN w),
              g AS (
                SELECT p_score,
                       SUM(y) AS n_pos,
                       COUNT(*) - SUM(y) AS n_neg
                FROM sc GROUP BY p_score),
              cum AS (
                SELECT p_score, n_pos, n_neg,
                       COALESCE(SUM(n_neg) OVER (ORDER BY p_score
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                         AS neg_below
                FROM g),
              tot AS (SELECT SUM(n_pos) AS p_tot, SUM(n_neg) AS n_tot
                      FROM g)
              SELECT CAST(tot.p_tot AS BIGINT) AS n_pos,
                     CAST(tot.n_tot AS BIGINT) AS n_neg,
                     ROUND(SUM(cum.n_pos * (cum.neg_below + cum.n_neg / 2.0))
                           / (tot.p_tot * tot.n_tot), 4) AS auc
              FROM cum CROSS JOIN tot
              GROUP BY tot.p_tot, tot.n_tot"""))
  )

  /** Tie-aware AUC of scores against a stored weight artifact. The
    * per-distinct-score aggregation bounds the window input at 10 001
    * rows (the 4-decimal score grid) regardless of corpus size.
    */
  def aucWith(featsDf: DataFrame, weights: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = scoreWith(featsDf, weights)
      .groupBy(col("p_score"))
      .agg(sum(col("y")).as("n_pos"),
        (count(lit(1)) - sum(col("y"))).as("n_neg"))
    val w = Window.orderBy(col("p_score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = g.withColumn("neg_below",
      coalesce(sum(col("n_neg")).over(w), lit(0L)))
    val tot = g.agg(sum(col("n_pos")).as("p_tot"),
      sum(col("n_neg")).as("n_tot"))
    cum.crossJoin(broadcast(tot))
      .agg(first(col("p_tot")).as("n_pos"),
        first(col("n_tot")).as("n_neg"),
        round(sum(col("n_pos") * (col("neg_below") + col("n_neg") / lit(2.0)))
          / (first(col("p_tot")) * first(col("n_tot"))), 4).as("auc"))
  }
}
