package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Fns
import graft.queries.Q

/** Similarity search over the `embeddings` table (`Array[Float]`, dim 64).
  *
  * Baseline is brute-force cosine against a (small) query set — a
  * broadcast nested-loop that is linear in corpus size, the correct
  * shape when |queries| is tiny. The scale path is LSH bucketing
  * (random-hyperplane signatures): candidates come from a bucket
  * equi-join, so the per-query cost is the bucket size, not the corpus.
  *
  * All float math is widened to double FIRST and folded sequentially
  * (`aggregate` over the array) so results are reproducible and match
  * the DuckDB oracle's explicit-double formulation to ~1e-15.
  */
object Similarity {

  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "embeddings")

  /** Array<float> -> array<double> (a single Cast, not a per-element
    * lambda — codegen'd). */
  def asDouble(a: Column): Column = a.cast("array<double>")

  /** Sequential-fold dot product — native DotProduct expression. The HOF
    * reference formulation (`aggregate(zip_with(a,b,_*_), 0.0, _+_)`)
    * folds in the same element order, so values are bit-identical; the
    * native loop just skips the interpreter and the zipped intermediate
    * array (FnsSpec pins the equality).
    */
  def dot(a: Column, b: Column): Column = Fns.dotProduct(a, b)

  /** L2 norm of an array<double> column. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** One-pass native cosine: bit-identical to
    * dot(a,b)/(sqrt(dot(a,a))*sqrt(dot(b,b))) — independent accumulators
    * in one loop. */
  def cosine(a: Column, b: Column): Column = Fns.cosineSim(a, b)

  val LshTables: Int = graft.functions.HyperplaneBuckets.Tables
  val LshBitsPerTable: Int = graft.functions.HyperplaneBuckets.BitsPerTable

  /** One row per (vec, table) with that table's bucket — candidates for a
    * query are the union over tables of its buckets (standard multi-table
    * LSH: recall compounds across tables, cost stays bucket-sized).
    *
    * Buckets come from the native HyperplaneBuckets expression: all
    * LshTables*LshBitsPerTable deterministic hyperplane projections
    * (splitmix64-derived components, same constants as the HOF
    * formulation this replaced) share ONE compiled loop nest per row,
    * instead of 64 interpreted zip_with folds each allocating a zipped
    * array. Map-side only: no shuffle, no model state.
    */
  def lshBuckets(vecs: DataFrame): DataFrame =
    vecs.select(col("vec_id"), col("v"),
      posexplode(Fns.lshBuckets(col("v"))).as(Seq("tbl", "bucket")))

  /** MD5-derived hyperplane buckets (graft.functions.Md5HyperplaneBuckets):
    * same banding shape as lshBuckets, but the plane components are
    * derived from MD5 so DuckDB reproduces the identical sign bits in
    * exact arithmetic — the variant that puts LSH-bucketed ANN under the
    * value-hash oracle (the splitmix64 path stays the fast default, the
    * same convention as q33-xxhash64 vs q65-md5 in Dedup).
    */
  def md5LshBuckets(vecs: DataFrame): DataFrame =
    vecs.select(col("vec_id"), col("v"),
      posexplode(Fns.md5LshBuckets(col("v"))).as(Seq("tbl", "bucket")))

  /** Brute-force cosine top-k for one query vector (by vec_id), the
    * correctness baseline: broadcast the 1-row query side.
    */
  def bruteForceTopK(vectors: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val q = vectors.filter(col("vec_id") === queryVecId)
      .select(asDouble(col("embedding")).as("qv"))
    val sim = cosine(col("v"), col("qv"))
    vectors
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), round(sim, 4).as("sim"), sim.as("sim_raw"))
      .orderBy(col("sim_raw").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("sim"))
  }

  /** LSH-bucketed ANN: candidates share the query's bucket in at least
    * one of the LshTables tables; rank within the candidate set (recall
    * vs the brute-force baseline measured in SimilaritySpec).
    */
  def annTopK(vectors: DataFrame, queryVecId: Long, k: Int): DataFrame =
    annTopKBanded(vectors, queryVecId, k, lshBuckets)

  /** annTopK through the MD5-derived planes — hash-checkable (q72). */
  def md5AnnTopK(vectors: DataFrame, queryVecId: Long, k: Int): DataFrame =
    annTopKBanded(vectors, queryVecId, k, md5LshBuckets)

  private def annTopKBanded(vectors: DataFrame, queryVecId: Long, k: Int,
      bander: DataFrame => DataFrame): DataFrame = {
    // repartition before the per-row projection folds: the embeddings
    // table is a single parquet row group, and the LshTables*LshBits
    // hyperplane projections would otherwise run on one core
    val vecs = vectors.repartition(col("vec_id")).select(col("vec_id"),
      asDouble(col("embedding")).as("v"))
    val banded = bander(vecs)
    val q = banded.filter(col("vec_id") === queryVecId)
      .select(col("v").as("qv"), col("tbl"), col("bucket"))
    val sim = cosine(col("v"), col("qv"))
    banded
      .filter(col("vec_id") =!= queryVecId)
      .join(broadcast(q), Seq("tbl", "bucket"))
      .select(col("vec_id"), col("v"), col("qv"))
      .dropDuplicates("vec_id")
      .select(col("vec_id"), round(sim, 4).as("sim"), sim.as("sim_raw"))
      .orderBy(col("sim_raw").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("sim"))
  }

  /** Batched ANN through the LSH index: the whole query batch probes the
    * banded corpus in ONE equi-join on (tbl, bucket), so per-query cost
    * stays bucket-sized — corpus × batch never materializes (q60's
    * brute-force scoring is the correctness baseline; this is the shape
    * that survives 100 TB). `queries` carries (qid, qv double array).
    *
    * Cosine is computed map-side in the join stage and the cross-table
    * candidate dedup runs on slim (qid, vec_id, sim) rows — sim is
    * functionally determined by the pair, so dedup-after-score is
    * equivalent and the vectors never ride the dedup exchange (same
    * trick as minhashCandidates' est-before-distinct). Ranking is
    * row_number over qid, which TopKRewrite plans as the two-phase
    * TopKPerKey operator: <= k candidates per (partition, query) reach
    * the final shuffle. A small batch side broadcasts under AQE; a large
    * one degrades to a plain shuffle join on the bucket key.
    */
  def batchAnnTopK(vectors: DataFrame, queries: DataFrame, k: Int): DataFrame =
    batchAnnTopKBanded(vectors, queries, k, lshBuckets)

  /** batchAnnTopK through the MD5-derived planes — the hash-checkable
    * sibling (q75), completing the convention: every LSH family member
    * (single-probe q37/q72, batch q64/q75, all-pairs q69/q73) has a fast
    * splitmix64 path and an oracle-pinned MD5 path with the same plan.
    */
  def md5BatchAnnTopK(vectors: DataFrame, queries: DataFrame, k: Int): DataFrame =
    batchAnnTopKBanded(vectors, queries, k, md5LshBuckets)

  /** Retrieval-quality report (q225's body, exposed for planted-list
    * specs): per query, recall / MRR / binary-relevance nDCG of a
    * ranked candidate list `cand` (qid, vec_id, rn — 1-based) against
    * a relevance set `truth` (qid, vec_id). recall divides by the
    * per-query truth size; IDCG is the all-relevant-at-top prefix
    * Σ 1/log2(i+1) over that size (computed as a sequential
    * `aggregate` fold — no data-dependent summation order); DCG/MRR
    * read only the integer ranks. The ≤10-term double sums carry the
    * q49/q84 fold-order exposure, absorbed by round(4).
    *
    * Scale: both inputs are per-query top-k artifacts (|queries|·k
    * rows); everything here is one equi-join on (qid, vec_id) plus a
    * qid-keyed aggregate — report-sized, whatever the corpus was.
    */
  def retrievalEval(cand: DataFrame, truth: DataFrame): DataFrame = {
    val tn = truth.groupBy(col("qid")).agg(count(lit(1)).as("truth_n"))
    val j = cand.select(col("qid"), col("vec_id"), col("rn"))
      .join(truth.select(col("qid"), col("vec_id"), lit(1).as("rel")),
        Seq("qid", "vec_id"), "left")
    j.groupBy(col("qid"))
      .agg(count(lit(1)).as("n_cand"),
        sum(coalesce(col("rel"), lit(0))).as("hits"),
        max(when(col("rel") === 1, lit(1.0) / col("rn"))).as("mrr_raw"),
        sum(when(col("rel") === 1, lit(1.0) / log2(col("rn") + 1)))
          .as("dcg"))
      .join(tn, Seq("qid"))
      .select(col("qid"), col("n_cand"),
        round(col("hits").cast("double") / col("truth_n"), 4).as("recall"),
        round(coalesce(col("mrr_raw"), lit(0.0)), 4).as("mrr"),
        round(coalesce(col("dcg"), lit(0.0)) /
          expr("aggregate(sequence(1L, truth_n), CAST(0 AS DOUBLE), " +
            "(a, i) -> a + 1.0/log2(CAST(i AS DOUBLE) + 1))"), 4)
          .as("ndcg"))
      .orderBy(col("qid"))
  }

  private def batchAnnTopKBanded(vectors: DataFrame, queries: DataFrame,
      k: Int, bander: DataFrame => DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vecs = vectors.repartition(col("vec_id")).select(col("vec_id"),
      asDouble(col("embedding")).as("v"))
    val banded = bander(vecs)
    val qb = bander(queries.select(col("qid").as("vec_id"), col("qv").as("v")))
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("tbl"), col("bucket"))
    val sim = cosine(col("v"), col("qv"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim_raw").desc, col("vec_id"))
    banded.join(qb, Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), sim.as("sim_raw"))
      .dropDuplicates("qid", "vec_id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id"),
        round(col("sim_raw"), 4).as("sim"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** Full-corpus embedding near-dup candidate pairs through the LSH
    * bucket index: pairs sharing a bucket in ANY of the LshTables
    * tables, verified with exact cosine >= minCos. q35's all-pairs probe
    * (bounded subset) is the correctness baseline; this is the corpus
    * shape — candidate cost is the sum of per-bucket pair counts, never
    * n². Cosine is computed map-side in the join stage and the
    * cross-table dedup runs on slim (v1, v2, sim) rows (the
    * batchAnnTopK/minhashCandidates shuffle-shrink).
    */
  def embeddingNearDupPairs(vectors: DataFrame, minCos: Double): DataFrame =
    nearDupPairsBanded(vectors, minCos, lshBuckets)

  /** embeddingNearDupPairs through the MD5-derived planes — the
    * hash-checkable sibling (q73), same slim-join plan. */
  def md5NearDupPairs(vectors: DataFrame, minCos: Double): DataFrame =
    nearDupPairsBanded(vectors, minCos, md5LshBuckets)

  /** The bucket self-join runs on slim (vec_id, tbl, bucket) rows ONLY —
    * the corpus's vectors never traverse the ×LshTables bucket exchange
    * (they'd otherwise ride it 8 times, the heaviest column in the
    * heaviest shuffle at 100 TB). Candidate id-pairs are deduped while
    * still slim, then the two vectors are fetched by id equi-joins
    * against the SAME repartition(vec_id) exchange the banding read from
    * (ReuseExchange: one vector shuffle total) and scored with exact
    * cosine — the `Dedup.jaccardOnCandidates` verify-after-candidates
    * shape.
    */
  private def nearDupPairsBanded(vectors: DataFrame, minCos: Double,
      bander: DataFrame => DataFrame): DataFrame = {
    val vecs = vectors.repartition(col("vec_id")).select(col("vec_id"),
      asDouble(col("embedding")).as("v"))
    val slim = bander(vecs).select(col("vec_id"), col("tbl"), col("bucket"))
    val cand = slim.select(col("vec_id").as("v1"), col("tbl"), col("bucket"))
      .join(slim.select(col("vec_id").as("v2"), col("tbl"), col("bucket")),
        Seq("tbl", "bucket"))
      .filter(col("v1") < col("v2"))
      .select(col("v1"), col("v2"))
      .distinct()
    val va = vecs.select(col("vec_id").as("v1"), col("v").as("va"))
    val vb = vecs.select(col("vec_id").as("v2"), col("v").as("vb"))
    val sim = cosine(col("va"), col("vb"))
    cand.join(va, Seq("v1")).join(vb, Seq("v2"))
      .select(col("v1"), col("v2"), sim.as("sim_raw"))
      .filter(col("sim_raw") >= minCos)
      .select(col("v1"), col("v2"), round(col("sim_raw"), 4).as("sim"))
      .orderBy(col("v1"), col("v2"))
  }

  def defs: Seq[Q] = Seq(
    // Q26 [E] per-vector element aggregation via explode (SURVEY §2B).
    Q("q26_vec_explode",
      (s, d) =>
        emb(s, d)
          .select(col("vec_id"), explode(col("embedding")).as("e"))
          .groupBy(col("vec_id"))
          .agg(
            round(max(col("e").cast("double")), 5).as("max_e"),
            count(col("e")).as("dim"))
          .orderBy(col("vec_id"))
          .limit(50),
      Some("""SELECT vec_id, ROUND(MAX(CAST(e AS DOUBLE)), 5) AS max_e,
                     COUNT(e) AS dim
              FROM (SELECT vec_id, UNNEST(embedding) AS e FROM embeddings) t
              GROUP BY vec_id ORDER BY vec_id LIMIT 50""")),

    // Cosine near-dup pairs on a bounded probe subset (correctness probe;
    // the scale path is the LSH variant below — never all-pairs on the
    // full corpus).
    Q("q35_cosine_pairs",
      (s, d) => {
        val v = emb(s, d).filter(col("vec_id") < 40)
          .select(col("vec_id"), asDouble(col("embedding")).as("a"))
        val p = v.select(col("vec_id").as("v1"), col("a").as("pa"))
        val q = v.select(col("vec_id").as("v2"), col("a").as("qa"))
        val sim = dot(col("pa"), col("qa")) / (norm(col("pa")) * norm(col("qa")))
        p.join(broadcast(q), col("v1") < col("v2"))
          .filter(sim >= 0.25)
          .select(col("v1"), col("v2"), round(sim, 4).as("sim"))
          .orderBy(col("v1"), col("v2"))
      },
      Some("""WITH v AS (
                SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a
                FROM embeddings WHERE vec_id < 40)
              SELECT p.vec_id AS v1, q.vec_id AS v2,
                     ROUND(list_sum(list_transform(generate_series(1, LEN(p.a)),
                             i -> p.a[i] * q.a[i]))
                       / (SQRT(list_sum(list_transform(p.a, x -> x*x)))
                        * SQRT(list_sum(list_transform(q.a, x -> x*x)))), 4) AS sim
              FROM v p JOIN v q ON p.vec_id < q.vec_id
              WHERE list_sum(list_transform(generate_series(1, LEN(p.a)),
                      i -> p.a[i] * q.a[i]))
                    / (SQRT(list_sum(list_transform(p.a, x -> x*x)))
                     * SQRT(list_sum(list_transform(q.a, x -> x*x)))) >= 0.25
              ORDER BY v1, v2""")),

    // Brute-force cosine top-k against query vec_id=0 (ANN baseline).
    Q("q36_cosine_topk",
      (s, d) => bruteForceTopK(emb(s, d), queryVecId = 0L, k = 10),
      Some("""WITH v AS (
                SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a
                FROM embeddings),
              q AS (SELECT a AS qa FROM v WHERE vec_id = 0)
              SELECT v.vec_id,
                     ROUND(list_sum(list_transform(generate_series(1, LEN(v.a)),
                             i -> v.a[i] * q.qa[i]))
                       / (SQRT(list_sum(list_transform(v.a, x -> x*x)))
                        * SQRT(list_sum(list_transform(q.qa, x -> x*x)))), 4) AS sim
              FROM v, q WHERE v.vec_id <> 0
              ORDER BY list_sum(list_transform(generate_series(1, LEN(v.a)),
                         i -> v.a[i] * q.qa[i]))
                       / (SQRT(list_sum(list_transform(v.a, x -> x*x)))
                        * SQRT(list_sum(list_transform(q.qa, x -> x*x)))) DESC,
                       v.vec_id
              LIMIT 10""")),

    // LSH-bucketed ANN (single probe; rows-only — recall vs brute force
    // asserted in SimilaritySpec).
    Q("q37_ann_lsh",
      (s, d) => annTopK(emb(s, d), queryVecId = 0L, k = 10),
      None),

    // IVF-style ANN — hash-checked: the codebook (first IvfCells
    // vectors), the argmax cell assignment (sim DESC, cell ties ascending
    // — exactly ivfCells' sort_array(struct(-sim, cell)) order), the
    // 4-cell probe, and the exact-cosine ranking are all spelled in
    // explicit-double DuckDB SQL, so both engines derive the identical
    // inverted-file layout and candidate set.
    Q("q50_ann_ivf",
      (s, d) => ivfTopK(emb(s, d), queryVecId = 0L, k = 10),
      Some("""WITH v AS (
                SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a
                FROM embeddings),
              cb AS (SELECT vec_id AS cell, a AS cv FROM v WHERE vec_id < 16),
              scored AS (
                SELECT v.vec_id, cb.cell,
                       list_sum(list_transform(generate_series(1, LEN(v.a)),
                         i -> v.a[i] * cb.cv[i]))
                       / (SQRT(list_sum(list_transform(v.a, x -> x*x)))
                        * SQRT(list_sum(list_transform(cb.cv, x -> x*x)))) AS sim
                FROM v CROSS JOIN cb),
              corpus AS (
                SELECT vec_id, cell FROM (
                  SELECT vec_id, cell,
                         ROW_NUMBER() OVER (PARTITION BY vec_id
                           ORDER BY sim DESC, cell) AS rn
                  FROM scored) t WHERE rn = 1),
              qcell AS (
                SELECT cell FROM (
                  SELECT cell, ROW_NUMBER() OVER (ORDER BY sim DESC, cell) AS rn
                  FROM scored WHERE vec_id = 0) t WHERE rn <= 4),
              q AS (SELECT a AS qa FROM v WHERE vec_id = 0)
              SELECT c.vec_id,
                     ROUND(list_sum(list_transform(generate_series(1, LEN(v.a)),
                             i -> v.a[i] * q.qa[i]))
                       / (SQRT(list_sum(list_transform(v.a, x -> x*x)))
                        * SQRT(list_sum(list_transform(q.qa, x -> x*x)))), 4) AS sim
              FROM corpus c
              JOIN qcell USING (cell)
              JOIN v ON v.vec_id = c.vec_id
              CROSS JOIN q
              WHERE c.vec_id <> 0
              ORDER BY list_sum(list_transform(generate_series(1, LEN(v.a)),
                         i -> v.a[i] * q.qa[i]))
                       / (SQRT(list_sum(list_transform(v.a, x -> x*x)))
                        * SQRT(list_sum(list_transform(q.qa, x -> x*x)))) DESC,
                       c.vec_id
              LIMIT 10""")),

    // Embedding near-dup pairs over the WHOLE corpus through the LSH
    // bucket index — q35's semantics at the n²-free scale shape
    // (rows-only: xxhash64 bucketing is engine-specific; planted-pair
    // recall + subset-of-exact asserted in SimilaritySpec). Threshold
    // 0.35 sits inside the testdata's similarity range (max pairwise
    // cosine at sf0.01 is ~0.51) so the entry exercises real
    // collisions, not an empty set.
    Q("q69_embedding_neardup_lsh",
      (s, d) => embeddingNearDupPairs(emb(s, d), minCos = 0.35),
      None),

    // Batched ANN THROUGH the LSH index — q60's batch semantics with
    // bucket-sized per-query cost (rows-only: xxhash64 bucketing is
    // engine-specific; recall vs q60's brute-force baseline asserted in
    // SimilaritySpec).
    Q("q64_batch_ann_lsh",
      (s, d) => {
        val e = emb(s, d)
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"),
            asDouble(col("embedding")).as("qv"))
        batchAnnTopK(e, q, k = 3)
      },
      None),

    // LSH ANN with MD5-derived hyperplanes — the hash-checked sibling of
    // q37 (the q65/q55 convention: keep the fast splitmix64/xxhash64 path
    // as the default, add an MD5 variant both engines compute exactly).
    // The oracle derives the SAME 4x8 plane components from MD5, folds
    // the projections in the same element order (bit-identical doubles,
    // q35/q36-proven), and therefore lands the identical sign bits →
    // identical buckets → identical candidate set.
    Q("q72_ann_lsh_md5",
      (s, d) => md5AnnTopK(emb(s, d), queryVecId = 0L, k = 10),
      Some(s"""WITH v AS (
                SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a
                FROM embeddings),
              planes AS (
                SELECT t, b,
                       LIST(CAST(CAST('0x' || SUBSTR(MD5(t || ':' || b || ':' || i), 1, 8) AS BIGINT)
                                 - 2147483648 AS DOUBLE) ORDER BY i) AS p
                FROM generate_series(0, 3) AS ts(t),
                     generate_series(0, 7) AS bs(b),
                     generate_series(0, 63) AS ds(i)
                GROUP BY t, b),
              buckets AS (
                SELECT v.vec_id, pl.t AS tbl,
                       CAST(SUM(CASE WHEN list_sum(list_transform(
                                        generate_series(1, LEN(v.a)),
                                        j -> pl.p[j] * v.a[j])) >= 0
                                     THEN CAST(1 << pl.b AS BIGINT)
                                     ELSE 0 END) AS BIGINT) AS bucket
                FROM v CROSS JOIN planes pl
                GROUP BY v.vec_id, pl.t),
              cand AS (
                SELECT DISTINCT b1.vec_id
                FROM buckets b1 JOIN buckets b2
                  ON b1.tbl = b2.tbl AND b1.bucket = b2.bucket
                WHERE b2.vec_id = 0 AND b1.vec_id <> 0),
              q AS (SELECT a AS qa FROM v WHERE vec_id = 0)
              SELECT v.vec_id,
                     ROUND(list_sum(list_transform(generate_series(1, LEN(v.a)),
                             i -> v.a[i] * q.qa[i]))
                       / (SQRT(list_sum(list_transform(v.a, x -> x*x)))
                        * SQRT(list_sum(list_transform(q.qa, x -> x*x)))), 4) AS sim
              FROM v JOIN cand USING (vec_id) CROSS JOIN q
              ORDER BY list_sum(list_transform(generate_series(1, LEN(v.a)),
                         i -> v.a[i] * q.qa[i]))
                       / (SQRT(list_sum(list_transform(v.a, x -> x*x)))
                        * SQRT(list_sum(list_transform(q.qa, x -> x*x)))) DESC,
                       v.vec_id
              LIMIT 10""")),

    // Full-corpus embedding near-dup pairs with MD5-derived hyperplanes —
    // the hash-checked sibling of q69 (same slim bucket join + exact
    // cosine verification; the candidate PAIR SET itself crosses the
    // engines, so banding, threshold, and scores are all oracle-pinned).
    Q("q73_embedding_neardup_md5",
      (s, d) => md5NearDupPairs(emb(s, d), minCos = 0.35),
      Some(s"""WITH v AS (
                SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a
                FROM embeddings),
              planes AS (
                SELECT t, b,
                       LIST(CAST(CAST('0x' || SUBSTR(MD5(t || ':' || b || ':' || i), 1, 8) AS BIGINT)
                                 - 2147483648 AS DOUBLE) ORDER BY i) AS p
                FROM generate_series(0, 3) AS ts(t),
                     generate_series(0, 7) AS bs(b),
                     generate_series(0, 63) AS ds(i)
                GROUP BY t, b),
              buckets AS (
                SELECT v.vec_id, pl.t AS tbl,
                       CAST(SUM(CASE WHEN list_sum(list_transform(
                                        generate_series(1, LEN(v.a)),
                                        j -> pl.p[j] * v.a[j])) >= 0
                                     THEN CAST(1 << pl.b AS BIGINT)
                                     ELSE 0 END) AS BIGINT) AS bucket
                FROM v CROSS JOIN planes pl
                GROUP BY v.vec_id, pl.t),
              cand AS (
                SELECT DISTINCT b1.vec_id AS v1, b2.vec_id AS v2
                FROM buckets b1 JOIN buckets b2
                  ON b1.tbl = b2.tbl AND b1.bucket = b2.bucket
                WHERE b1.vec_id < b2.vec_id)
              SELECT c.v1, c.v2,
                     ROUND(list_sum(list_transform(generate_series(1, LEN(p.a)),
                             i -> p.a[i] * q.a[i]))
                       / (SQRT(list_sum(list_transform(p.a, x -> x*x)))
                        * SQRT(list_sum(list_transform(q.a, x -> x*x)))), 4) AS sim
              FROM cand c
              JOIN v p ON p.vec_id = c.v1
              JOIN v q ON q.vec_id = c.v2
              WHERE list_sum(list_transform(generate_series(1, LEN(p.a)),
                      i -> p.a[i] * q.a[i]))
                    / (SQRT(list_sum(list_transform(p.a, x -> x*x)))
                     * SQRT(list_sum(list_transform(q.a, x -> x*x)))) >= 0.35
              ORDER BY v1, v2""")),

    // Batched ANN: top-3 cosine neighbors for EACH of 5 query vectors in
    // one job — the production shape (queries arrive in batches, not one
    // at a time). The per-query ranking is row_number over qid, which
    // TopKRewrite plans as the two-phase TopKPerKey operator: the
    // shuffle carries <= 3 candidates per (partition, query) instead of
    // every scored row — the composition of the custom operator with the
    // similarity surface, under the value-hash oracle.
    Q("q60_batch_ann",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val v = emb(s, d).select(col("vec_id"), asDouble(col("embedding")).as("v"))
        val queries = v.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("v").as("qv"))
        val sim = cosine(col("v"), col("qv"))
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("sim_raw").desc, col("vec_id"))
        v.crossJoin(broadcast(queries))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"), sim.as("sim_raw"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("qid"), col("vec_id"),
            round(col("sim_raw"), 4).as("sim"), col("rn"))
          .orderBy(col("qid"), col("rn"))
      },
      Some("""WITH v AS (
                SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a
                FROM embeddings),
              q AS (SELECT vec_id AS qid, a AS qa FROM v WHERE vec_id < 5),
              s AS (
                SELECT q.qid, v.vec_id,
                       list_sum(list_transform(generate_series(1, LEN(v.a)),
                         i -> v.a[i] * q.qa[i]))
                       / (SQRT(list_sum(list_transform(v.a, x -> x*x)))
                        * SQRT(list_sum(list_transform(q.qa, x -> x*x)))) AS sim
                FROM v, q WHERE v.vec_id <> q.qid),
              r AS (
                SELECT qid, vec_id, sim,
                       CAST(ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY sim DESC, vec_id) AS INT) AS rn
                FROM s)
              SELECT qid, vec_id, ROUND(sim, 4) AS sim, rn
              FROM r WHERE rn <= 3 ORDER BY qid, rn""")),

    // Batched ANN through the MD5-derived LSH index — the hash-checked
    // sibling of q64: banding, the one (tbl, bucket) batch probe join,
    // slim dedup, and per-query ranking all cross the engines, so the
    // candidate sets AND ranks are oracle-pinned (q64 keeps the fast
    // splitmix64 path, the q33/q65 convention).
    Q("q75_batch_ann_md5",
      (s, d) => {
        val e = emb(s, d)
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"),
            asDouble(col("embedding")).as("qv"))
        md5BatchAnnTopK(e, q, k = 3)
      },
      Some("""WITH v AS (
                SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a
                FROM embeddings),
              planes AS (
                SELECT t, b,
                       LIST(CAST(CAST('0x' || SUBSTR(MD5(t || ':' || b || ':' || i), 1, 8) AS BIGINT)
                                 - 2147483648 AS DOUBLE) ORDER BY i) AS p
                FROM generate_series(0, 3) AS ts(t),
                     generate_series(0, 7) AS bs(b),
                     generate_series(0, 63) AS ds(i)
                GROUP BY t, b),
              buckets AS (
                SELECT v.vec_id, pl.t AS tbl,
                       CAST(SUM(CASE WHEN list_sum(list_transform(
                                        generate_series(1, LEN(v.a)),
                                        j -> pl.p[j] * v.a[j])) >= 0
                                     THEN CAST(1 << pl.b AS BIGINT)
                                     ELSE 0 END) AS BIGINT) AS bucket
                FROM v CROSS JOIN planes pl
                GROUP BY v.vec_id, pl.t),
              cand AS (
                SELECT DISTINCT bq.vec_id AS qid, bv.vec_id
                FROM buckets bv JOIN buckets bq
                  ON bv.tbl = bq.tbl AND bv.bucket = bq.bucket
                WHERE bq.vec_id < 5 AND bv.vec_id <> bq.vec_id),
              s AS (
                SELECT c.qid, c.vec_id,
                       list_sum(list_transform(generate_series(1, LEN(cv.a)),
                         i -> cv.a[i] * qv.a[i]))
                       / (SQRT(list_sum(list_transform(cv.a, x -> x*x)))
                        * SQRT(list_sum(list_transform(qv.a, x -> x*x)))) AS sim
                FROM cand c
                JOIN v cv ON cv.vec_id = c.vec_id
                JOIN v qv ON qv.vec_id = c.qid),
              r AS (
                SELECT qid, vec_id, sim,
                       CAST(ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY sim DESC, vec_id) AS INT) AS rn
                FROM s)
              SELECT qid, vec_id, ROUND(sim, 4) AS sim, rn
              FROM r WHERE rn <= 3 ORDER BY qid, rn""")),

    // Retrieval-quality report (see [[retrievalEval]]): recall / MRR /
    // nDCG@10 of the MD5-LSH batched ANN against the exact cosine
    // top-10 — the METRIC layer over the recall-style reports
    // (q133/q197): rank-position-weighted quality, not just set
    // overlap. Both legs are the hash-checked MD5 machinery, so the
    // whole evaluation replays in SQL.
    Q("q225_retrieval_ndcg",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val e = emb(s, d)
        val v = e.select(col("vec_id"), asDouble(col("embedding")).as("v"))
        val queries = v.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("v").as("qv"))
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("sim_raw").desc, col("vec_id"))
        val truth = v.crossJoin(broadcast(queries))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"),
            cosine(col("v"), col("qv")).as("sim_raw"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 10)
          .select(col("qid"), col("vec_id"))
        retrievalEval(md5BatchAnnTopK(e, queries, k = 10), truth)
      },
      Some("""WITH v AS (
                SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a
                FROM embeddings),
              planes AS (
                SELECT t, b,
                       LIST(CAST(CAST('0x' || SUBSTR(MD5(t || ':' || b || ':' || i), 1, 8) AS BIGINT)
                                 - 2147483648 AS DOUBLE) ORDER BY i) AS p
                FROM generate_series(0, 3) AS ts(t),
                     generate_series(0, 7) AS bs(b),
                     generate_series(0, 63) AS ds(i)
                GROUP BY t, b),
              buckets AS (
                SELECT v.vec_id, pl.t AS tbl,
                       CAST(SUM(CASE WHEN list_sum(list_transform(
                                        generate_series(1, LEN(v.a)),
                                        j -> pl.p[j] * v.a[j])) >= 0
                                     THEN CAST(1 << pl.b AS BIGINT)
                                     ELSE 0 END) AS BIGINT) AS bucket
                FROM v CROSS JOIN planes pl
                GROUP BY v.vec_id, pl.t),
              cand AS (
                SELECT DISTINCT bq.vec_id AS qid, bv.vec_id
                FROM buckets bv JOIN buckets bq
                  ON bv.tbl = bq.tbl AND bv.bucket = bq.bucket
                WHERE bq.vec_id < 5 AND bv.vec_id <> bq.vec_id),
              s AS (
                SELECT c.qid, c.vec_id,
                       list_sum(list_transform(generate_series(1, LEN(cv.a)),
                         i -> cv.a[i] * qv.a[i]))
                       / (SQRT(list_sum(list_transform(cv.a, x -> x*x)))
                        * SQRT(list_sum(list_transform(qv.a, x -> x*x)))) AS sim
                FROM cand c
                JOIN v cv ON cv.vec_id = c.vec_id
                JOIN v qv ON qv.vec_id = c.qid),
              r AS (
                SELECT qid, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY qid
                         ORDER BY sim DESC, vec_id) AS rn
                FROM s),
              ex AS (
                SELECT q.vec_id AS qid, v.vec_id,
                       list_sum(list_transform(generate_series(1, LEN(v.a)),
                         i -> v.a[i] * q.a[i]))
                       / (SQRT(list_sum(list_transform(v.a, x -> x*x)))
                        * SQRT(list_sum(list_transform(q.a, x -> x*x)))) AS sim
                FROM v, v q WHERE q.vec_id < 5 AND v.vec_id <> q.vec_id),
              tr AS (
                SELECT qid, vec_id FROM (
                  SELECT qid, vec_id,
                         ROW_NUMBER() OVER (PARTITION BY qid
                           ORDER BY sim DESC, vec_id) AS rn
                  FROM ex) t WHERE rn <= 10),
              tn AS (SELECT qid, COUNT(*) AS truth_n FROM tr GROUP BY 1),
              ev AS (
                SELECT r.qid, r.rn,
                       CASE WHEN tr.vec_id IS NOT NULL THEN 1 ELSE 0 END
                         AS rel
                FROM r LEFT JOIN tr
                  ON tr.qid = r.qid AND tr.vec_id = r.vec_id
                WHERE r.rn <= 10),
              ag AS (
                SELECT qid, COUNT(*) AS n_cand, SUM(rel) AS hits,
                       MAX(CASE WHEN rel = 1
                         THEN CAST(1 AS DOUBLE)/rn END) AS mrr_raw,
                       SUM(CASE WHEN rel = 1
                         THEN CAST(1 AS DOUBLE)/LOG2(rn + 1) END) AS dcg
                FROM ev GROUP BY 1)
              SELECT ag.qid, n_cand,
                     ROUND(CAST(hits AS DOUBLE)/truth_n, 4) AS recall,
                     ROUND(COALESCE(mrr_raw, 0), 4) AS mrr,
                     ROUND(COALESCE(dcg, 0) /
                       list_sum(list_transform(
                         generate_series(1, CAST(truth_n AS BIGINT)),
                         i -> CAST(1 AS DOUBLE)/LOG2(i + 1))), 4) AS ndcg
              FROM ag JOIN tn USING (qid) ORDER BY qid""")),

    // Embedding near-dup GROUPS: the q35 cosine pair graph collapsed to
    // dedup clusters via connected components (min reachable vec_id) —
    // the same pairs-to-clusters step as q56, over the embedding
    // modality. Oracle: recursive-CTE reachability over the identical
    // explicit-double cosine pairs.
    Q("q57_embedding_dedup_groups",
      (s, d) => {
        val v = emb(s, d).filter(col("vec_id") < 40)
          .select(col("vec_id"), asDouble(col("embedding")).as("a"))
        val p = v.select(col("vec_id").as("v1"), col("a").as("pa"))
        val q = v.select(col("vec_id").as("v2"), col("a").as("qa"))
        val sim = dot(col("pa"), col("qa")) / (norm(col("pa")) * norm(col("qa")))
        val pairs = p.join(broadcast(q), col("v1") < col("v2"))
          .filter(sim >= 0.25)
          .select(col("v1").as("d1"), col("v2").as("d2"))
        graft.llm.Dedup.connectedComponents(pairs)
          .select(col("node").as("vec_id"), col("comp"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH RECURSIVE v AS (
                SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a
                FROM embeddings WHERE vec_id < 40),
              pairs AS (
                SELECT p.vec_id AS d1, q.vec_id AS d2
                FROM v p JOIN v q ON p.vec_id < q.vec_id
                WHERE list_sum(list_transform(generate_series(1, LEN(p.a)),
                        i -> p.a[i] * q.a[i]))
                      / (SQRT(list_sum(list_transform(p.a, x -> x*x)))
                       * SQRT(list_sum(list_transform(q.a, x -> x*x)))) >= 0.25),
              edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
                        UNION ALL SELECT d2, d1 FROM pairs),
              reach AS (
                SELECT src AS node, src AS label FROM edges
                UNION
                SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node)
              SELECT node AS vec_id, CAST(MIN(label) AS BIGINT) AS comp
              FROM reach GROUP BY node ORDER BY vec_id""")),

    // Trained-IVF probe, oracle-pinned: train a seeded Lloyd's codebook
    // ([[IvfStore.train]], sampleFraction = 0.5 so the training loop
    // scans a bounded seeded sample — the 100 TB form, where the corpus
    // is read once, by the final assignment), PERSIST it to parquet,
    // read it back, and probe through [[ivfTopKWith]]. The oracle reads
    // the SAME persisted codebook (doubles round-trip parquet exactly),
    // so the argmax assignment, 4-cell probe, and exact-cosine ranking
    // are all value-hash-checked by q50's SQL with the first-16 CTE
    // swapped for the parquet read — training drift can never break the
    // hash because both engines derive from the codebook THIS run wrote.
    Q("q82_ann_ivf_trained",
      (s, d) => {
        val e = emb(s, d)
        val cb = IvfStore.train(e, iters = 3, sampleFraction = 0.5)
        cb.write.mode("overwrite").parquet(Q82CodebookDir)
        val stored = s.read.parquet(Q82CodebookDir)
          .select(col("cell"), col("cv"))
        ivfTopKWith(stored, e, queryVecId = 0L, k = 10)
      },
      Some(s"""WITH v AS (
                SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a
                FROM embeddings),
              cb AS (SELECT cell, cv
                     FROM read_parquet('$Q82CodebookDir/*.parquet')),
              scored AS (
                SELECT v.vec_id, cb.cell,
                       list_sum(list_transform(generate_series(1, LEN(v.a)),
                         i -> v.a[i] * cb.cv[i]))
                       / (SQRT(list_sum(list_transform(v.a, x -> x*x)))
                        * SQRT(list_sum(list_transform(cb.cv, x -> x*x)))) AS sim
                FROM v CROSS JOIN cb),
              corpus AS (
                SELECT vec_id, cell FROM (
                  SELECT vec_id, cell,
                         ROW_NUMBER() OVER (PARTITION BY vec_id
                           ORDER BY sim DESC, cell) AS rn
                  FROM scored) t WHERE rn = 1),
              qcell AS (
                SELECT cell FROM (
                  SELECT cell, ROW_NUMBER() OVER (ORDER BY sim DESC, cell) AS rn
                  FROM scored WHERE vec_id = 0) t WHERE rn <= 4),
              q AS (SELECT a AS qa FROM v WHERE vec_id = 0)
              SELECT c.vec_id,
                     ROUND(list_sum(list_transform(generate_series(1, LEN(v.a)),
                             i -> v.a[i] * q.qa[i]))
                       / (SQRT(list_sum(list_transform(v.a, x -> x*x)))
                        * SQRT(list_sum(list_transform(q.qa, x -> x*x)))), 4) AS sim
              FROM corpus c
              JOIN qcell USING (cell)
              JOIN v ON v.vec_id = c.vec_id
              CROSS JOIN q
              WHERE c.vec_id <> 0
              ORDER BY list_sum(list_transform(generate_series(1, LEN(v.a)),
                         i -> v.a[i] * q.qa[i]))
                       / (SQRT(list_sum(list_transform(v.a, x -> x*x)))
                        * SQRT(list_sum(list_transform(q.qa, x -> x*x)))) DESC,
                       c.vec_id
              LIMIT 10""")),

    // IVF recall-vs-nprobe tuning report: for probe widths 1/2/4/8 over
    // the 16-cell trained codebook, recall@10 of the IVF probe against
    // exact brute force for query vector 0 — the measurement that picks
    // the nprobe knob before an index goes live. Persisted-codebook
    // oracle (q82's pattern): DuckDB reads the same parquet bits and
    // replays assignment, probe ranking, exact baseline, and the
    // per-width candidate top-10, so every recall number value-pins.
    Q("q133_ivf_recall",
      (s, d) => {
        val e = emb(s, d)
        val cb = IvfStore.train(e, iters = 3, sampleFraction = 0.5)
        cb.write.mode("overwrite").parquet(Q133CodebookDir)
        val stored = s.read.parquet(Q133CodebookDir)
          .select(col("cell"), col("cv"))
        ivfRecallReport(stored, e, queryVecId = 0L, k = 10,
          probeWidths = Seq(1, 2, 4, 8))
      },
      Some(s"""WITH v AS (
                SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a
                FROM embeddings),
              cb AS (SELECT cell, cv
                     FROM read_parquet('$Q133CodebookDir/*.parquet')),
              scored AS (
                SELECT v.vec_id, cb.cell,
                       list_sum(list_transform(generate_series(1, LEN(v.a)),
                         i -> v.a[i] * cb.cv[i]))
                       / (SQRT(list_sum(list_transform(v.a, x -> x*x)))
                        * SQRT(list_sum(list_transform(cb.cv, x -> x*x)))) AS sim
                FROM v CROSS JOIN cb),
              corpus AS (
                SELECT vec_id, cell FROM (
                  SELECT vec_id, cell,
                         ROW_NUMBER() OVER (PARTITION BY vec_id
                           ORDER BY sim DESC, cell) AS rn
                  FROM scored) t WHERE rn = 1),
              qrank AS (
                SELECT cell, ROW_NUMBER() OVER (ORDER BY sim DESC, cell) AS pr
                FROM scored WHERE vec_id = 0),
              q AS (SELECT a AS qa FROM v WHERE vec_id = 0),
              exact AS (
                SELECT v.vec_id FROM v CROSS JOIN q
                WHERE v.vec_id <> 0
                ORDER BY list_sum(list_transform(generate_series(1, LEN(v.a)),
                           i -> v.a[i] * q.qa[i]))
                         / (SQRT(list_sum(list_transform(v.a, x -> x*x)))
                          * SQRT(list_sum(list_transform(q.qa, x -> x*x)))) DESC,
                         v.vec_id
                LIMIT 10),
              probes AS (SELECT UNNEST([1, 2, 4, 8]) AS nprobe),
              cand AS (
                SELECT p.nprobe, c.vec_id,
                       ROW_NUMBER() OVER (PARTITION BY p.nprobe
                         ORDER BY list_sum(list_transform(generate_series(1, LEN(v.a)),
                                    i -> v.a[i] * q.qa[i]))
                                  / (SQRT(list_sum(list_transform(v.a, x -> x*x)))
                                   * SQRT(list_sum(list_transform(q.qa, x -> x*x)))) DESC,
                                  c.vec_id) AS rk
                FROM probes p
                JOIN qrank r ON r.pr <= p.nprobe
                JOIN corpus c ON c.cell = r.cell
                JOIN v ON v.vec_id = c.vec_id
                CROSS JOIN q
                WHERE c.vec_id <> 0),
              hits AS (
                SELECT nprobe, COUNT(*) AS n
                FROM cand JOIN exact USING (vec_id)
                WHERE rk <= 10 GROUP BY nprobe)
              SELECT p.nprobe,
                     CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits,
                     ROUND(COALESCE(h.n, 0) / 10.0, 4) AS recall
              FROM probes p LEFT JOIN hits h USING (nprobe)
              ORDER BY p.nprobe""")),

    // SemDeDup-style SEMANTIC dedup: trained-centroid clusters bound
    // the pair space (cells ~ sqrt(corpus) caps each cluster's
    // quadratic), within-cluster cosine >= 0.35 pairs feed connected
    // components — the embedding-space analog of the q56 text funnel,
    // deterministic where q69/q73's LSH buckets are probabilistic. The
    // codebook persists to parquet and the oracle reads the same bits
    // (q82's pattern), so assignment, pair set, and labels all
    // value-pin. One scan feeds both join sides through a single
    // cell-keyed exchange.
    Q("q93_semantic_dedup",
      (s, d) => {
        val e = emb(s, d)
        val cb = IvfStore.train(e, iters = 3, sampleFraction = 0.5)
        cb.write.mode("overwrite").parquet(Q93CodebookDir)
        val stored = s.read.parquet(Q93CodebookDir)
          .select(col("cell"), col("cv"))
        semanticDedupGroups(stored, e, minCos = 0.35)
          .orderBy(col("vec_id"))
      },
      Some(s"""WITH RECURSIVE v AS (
                SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a
                FROM embeddings),
              cb AS (SELECT cell, cv
                     FROM read_parquet('$Q93CodebookDir/*.parquet')),
              scored AS (
                SELECT v.vec_id, cb.cell,
                       list_sum(list_transform(generate_series(1, LEN(v.a)),
                         i -> v.a[i] * cb.cv[i]))
                       / (SQRT(list_sum(list_transform(v.a, x -> x*x)))
                        * SQRT(list_sum(list_transform(cb.cv, x -> x*x)))) AS sim
                FROM v CROSS JOIN cb),
              corpus AS (
                SELECT vec_id, cell FROM (
                  SELECT vec_id, cell,
                         ROW_NUMBER() OVER (PARTITION BY vec_id
                           ORDER BY sim DESC, cell) AS rn
                  FROM scored) t WHERE rn = 1),
              pairs AS (
                SELECT a.vec_id AS d1, b.vec_id AS d2
                FROM corpus a JOIN corpus b
                  ON a.cell = b.cell AND a.vec_id < b.vec_id
                JOIN v va ON va.vec_id = a.vec_id
                JOIN v vb ON vb.vec_id = b.vec_id
                WHERE list_sum(list_transform(generate_series(1, LEN(va.a)),
                        i -> va.a[i] * vb.a[i]))
                      / (SQRT(list_sum(list_transform(va.a, x -> x*x)))
                       * SQRT(list_sum(list_transform(vb.a, x -> x*x)))) >= 0.35),
              edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
                        UNION ALL SELECT d2, d1 FROM pairs),
              reach AS (
                SELECT src AS node, src AS label FROM edges
                UNION
                SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node)
              SELECT node AS vec_id, CAST(MIN(label) AS BIGINT) AS comp
              FROM reach GROUP BY node ORDER BY vec_id""")),

    // c-TF-IDF CLUSTER LABELING (the BERTopic readout, Grootendorst
    // 2022): each semantic cluster's top-5 DISTINCTIVE terms —
    // tf(t, c) · ln(1 + (A/f(t))) with A = mean tokens per cluster and
    // f(t) the corpus term frequency, so cluster-frequent-but-
    // corpus-common terms rank below cluster-specific ones. The "what
    // IS this cluster" label a curation reviewer reads next to q124's
    // numeric cluster profile. Embeddings and documents join 1:1 on
    // vec_id = doc_id.
    //
    // Shape: train-once codebook artifact (the q93 convention — the
    // oracle reads the SAME parquet), map-side argmax assignment,
    // ONE tokenize explode, two token-keyed aggregates, a broadcast
    // 1-row stats join, and a per-cell top-5 window over the bounded
    // (cell, term) grid. Ordering is by the exact score expression
    // (output rounds to 4) with a term tie-break — the q113 rule.
    Q("q187_cluster_topterms",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val e = emb(s, d)
        val cb = IvfStore.train(e, iters = 3, sampleFraction = 0.5)
        cb.write.mode("overwrite").parquet(Q187CodebookDir)
        val stored = s.read.parquet(Q187CodebookDir)
          .select(col("cell"), col("cv"))
        val rows = e.select(col("vec_id"), asDouble(col("embedding")).as("v"))
        val cells = ivfAssign(stored, rows, probes = 1)
          .select(col("vec_id").as("doc_id"), col("cell"))
        val toks = Tables.load(s, d, "documents")
          .select(col("doc_id"),
            explode(TextOps.tokens(col("text"))).as("term"))
        val assigned = toks.join(cells, Seq("doc_id"))
        val tf = assigned.groupBy(col("cell"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val ft = assigned.groupBy(col("term")).agg(count(lit(1)).as("f"))
        val stats = tf.agg(sum(col("tf")).as("total"),
          countDistinct(col("cell")).as("ncells"))
        val w = Window.partitionBy(col("cell"))
          .orderBy(col("score").desc, col("term"))
        tf.join(ft, Seq("term"))
          .crossJoin(broadcast(stats))
          .withColumn("score", col("tf") *
            log(lit(1.0) +
              col("total").cast("double") / col("ncells") / col("f")))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .select(col("cell"), col("rk"), col("term"), col("tf"),
            round(col("score"), 4).as("score"))
          .orderBy(col("cell"), col("rk"))
      },
      Some(s"""WITH v AS (
                SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a
                FROM embeddings),
              cb AS (SELECT cell, cv
                     FROM read_parquet('$Q187CodebookDir/*.parquet')),
              scored AS (
                SELECT v.vec_id, cb.cell,
                       list_sum(list_transform(generate_series(1, LEN(v.a)),
                         i -> v.a[i] * cb.cv[i]))
                       / (SQRT(list_sum(list_transform(v.a, x -> x*x)))
                        * SQRT(list_sum(list_transform(cb.cv, x -> x*x)))) AS sim
                FROM v CROSS JOIN cb),
              corpus AS (
                SELECT vec_id, cell FROM (
                  SELECT vec_id, cell,
                         ROW_NUMBER() OVER (PARTITION BY vec_id
                           ORDER BY sim DESC, cell) AS rn
                  FROM scored) t WHERE rn = 1),
              toks AS (
                SELECT doc_id,
                       UNNEST(regexp_split_to_array(TRIM(LOWER(text)), '\\s+')) AS term
                FROM documents),
              assigned AS (
                SELECT c.cell, t.term FROM toks t
                JOIN corpus c ON c.vec_id = t.doc_id),
              tf AS (SELECT cell, term, COUNT(*) AS tf
                     FROM assigned GROUP BY 1, 2),
              ft AS (SELECT term, COUNT(*) AS f FROM assigned GROUP BY 1),
              st AS (SELECT CAST(SUM(tf) AS DOUBLE) AS total,
                            COUNT(DISTINCT cell) AS ncells FROM tf),
              sc AS (
                SELECT tf.cell, tf.term, tf.tf,
                       tf.tf * LN(1.0 + (SELECT total FROM st)
                         / (SELECT ncells FROM st) / ft.f) AS score
                FROM tf JOIN ft USING (term)),
              rk AS (
                SELECT cell, term, tf, score,
                       ROW_NUMBER() OVER (PARTITION BY cell
                         ORDER BY score DESC, term) AS rk
                FROM sc)
              SELECT cell, CAST(rk AS INT) AS rk, term, tf,
                     ROUND(score, 4) AS score
              FROM rk WHERE rk <= 5 ORDER BY cell, rk""")),

    // k-NN majority-vote classification over the labeled embedding
    // corpus: for each query vector, the 5 cosine-nearest neighbors
    // (excluding itself) vote with their `label`; ties break to the
    // smaller label. The similarity-search family's classification
    // endpoint — nearest-neighbor label transfer is how a curation
    // pipeline propagates scarce human labels (quality tiers, topics)
    // across an unlabeled corpus.
    //
    // Scale shape: brute-force over the corpus is CORRECT here because
    // the query side is tiny — it broadcasts, the corpus streams
    // map-side, and neighbor selection is row_number over qid, which
    // TopKRewrite plans as two-phase TopKPerKey (<= k rows per
    // partition per query reach the exchange). For large query batches
    // the LSH/IVF variants (q60/q64, q50/q82) are the recall/cost
    // trade; the vote layer composes unchanged on top of either.
    Q("q85_knn_classify",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val v = emb(s, d).select(col("vec_id"),
          asDouble(col("embedding")).as("v"), col("label"))
        val q = v.filter(col("vec_id") < 3)
          .select(col("vec_id").as("qid"), col("v").as("qv"))
        val wNn = Window.partitionBy(col("qid"))
          .orderBy(col("sim_raw").desc, col("vec_id"))
        val nn = v.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"), col("label"),
            cosine(col("v"), col("qv")).as("sim_raw"))
          .withColumn("rn", row_number().over(wNn))
          .filter(col("rn") <= 5)
        val wVote = Window.partitionBy(col("qid"))
          .orderBy(col("votes").desc, col("label"))
        nn.groupBy(col("qid"), col("label"))
          .agg(count(lit(1)).as("votes"))
          .withColumn("vr", row_number().over(wVote))
          .filter(col("vr") === 1)
          .select(col("qid"), col("label").as("pred_label"), col("votes"))
          .orderBy(col("qid"))
      },
      Some("""WITH v AS (
                SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a,
                       label
                FROM embeddings),
              q AS (SELECT vec_id AS qid, a AS qa FROM v WHERE vec_id < 3),
              scored AS (
                SELECT q.qid, v.vec_id, v.label,
                       list_sum(list_transform(generate_series(1, LEN(v.a)),
                         i -> v.a[i] * q.qa[i]))
                       / (SQRT(list_sum(list_transform(v.a, x -> x*x)))
                        * SQRT(list_sum(list_transform(q.qa, x -> x*x)))) AS sim
                FROM v CROSS JOIN q
                WHERE v.vec_id <> q.qid),
              nn AS (
                SELECT qid, vec_id, label FROM (
                  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                           ORDER BY sim DESC, vec_id) AS rn
                  FROM scored) t WHERE rn <= 5),
              votes AS (
                SELECT qid, label, COUNT(*) AS votes
                FROM nn GROUP BY 1, 2)
              SELECT qid, label AS pred_label, votes FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                         ORDER BY votes DESC, label) AS vr
                FROM votes) t
              WHERE vr = 1 ORDER BY qid""")),

    // Hard-negative mining for contrastive training: for each query
    // vector, the top-5 most-similar vectors with a DIFFERENT label —
    // the high-sim/wrong-class rows a contrastive loss learns most
    // from. Brute-force scoring against a broadcast 3-query batch is
    // the exact baseline (the banded form composes via batchAnnTopK +
    // the same label anti-filter when the corpus side is 100 TB); the
    // filtered row_number plans through TopKPerKey, so <= 5 candidates
    // per (partition, query) reach the final exchange.
    Q("q96_hard_negatives",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val v = emb(s, d).select(col("vec_id"),
          asDouble(col("embedding")).as("v"), col("label"))
        val q = v.filter(col("vec_id") < 3)
          .select(col("vec_id").as("qid"), col("v").as("qv"),
            col("label").as("qlabel"))
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("sim_raw").desc, col("vec_id"))
        v.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("qid") &&
            col("label") =!= col("qlabel"))
          .select(col("qid"), col("vec_id"),
            cosine(col("v"), col("qv")).as("sim_raw"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("qid"), col("vec_id"),
            round(col("sim_raw"), 4).as("sim"), col("rn"))
          .orderBy(col("qid"), col("rn"))
      },
      Some("""WITH v AS (
                SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a,
                       label
                FROM embeddings),
              q AS (SELECT vec_id AS qid, label AS qlabel, a AS qa
                    FROM v WHERE vec_id < 3),
              scored AS (
                SELECT q.qid, v.vec_id,
                       list_sum(list_transform(generate_series(1, LEN(v.a)),
                         i -> v.a[i] * q.qa[i]))
                       / (SQRT(list_sum(list_transform(v.a, x -> x*x)))
                        * SQRT(list_sum(list_transform(q.qa, x -> x*x)))) AS sim_raw
                FROM v CROSS JOIN q
                WHERE v.vec_id <> q.qid AND v.label <> q.qlabel)
              SELECT qid, vec_id, ROUND(sim_raw, 4) AS sim, CAST(rn AS INT) AS rn
              FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                             ORDER BY sim_raw DESC, vec_id) AS rn
                    FROM scored) t
              WHERE rn <= 5 ORDER BY qid, rn""")),

    // Embedding-space class-separation diagnostics: per label, the mean
    // cosine of members to their own centroid and the mean margin over
    // the best FOREIGN centroid — low margins flag label noise /
    // entangled classes before a training run pays for them. The
    // centroid pass is a slim (label, dim) exchange (corpus vectors
    // never shuffle); scoring is a broadcast join against the ~|labels|
    // centroid table with the native one-pass cosine, map-side.
    Q("q99_class_separation",
      (s, d) => {
        val v = emb(s, d).select(col("vec_id"), col("label"),
          asDouble(col("embedding")).as("v"))
        val cent = v
          .select(col("label"), posexplode(col("v")).as(Seq("i", "x")))
          .groupBy(col("label"), col("i"))
          .agg(avg(col("x")).as("cx"))
          .groupBy(col("label"))
          .agg(transform(
            array_sort(collect_list(struct(col("i"), col("cx")))),
            e => e.getField("cx")).as("c"))
        val scored = v
          .crossJoin(broadcast(
            cent.select(col("label").as("clabel"), col("c"))))
          .select(col("vec_id"), col("label"), col("clabel"),
            cosine(col("v"), col("c")).as("cos"))
        val own = scored.filter(col("label") === col("clabel"))
          .select(col("vec_id"), col("label"), col("cos").as("own"))
        val other = scored.filter(col("label") =!= col("clabel"))
          .groupBy(col("vec_id")).agg(max(col("cos")).as("best_other"))
        own.join(other, Seq("vec_id"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n"),
            round(avg(col("own")), 4).as("avg_own"),
            round(avg(col("own") - col("best_other")), 4).as("avg_margin"))
          .orderBy(col("label"))
      },
      Some("""WITH v AS (
                SELECT vec_id, label,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a
                FROM embeddings),
              e AS (
                SELECT vec_id, label, i, a[i] AS x
                FROM v, UNNEST(generate_series(1, LEN(a))) AS g(i)),
              c AS (
                SELECT label AS clabel, i, AVG(x) AS cx
                FROM e GROUP BY clabel, i),
              s AS (
                SELECT e.vec_id, e.label, c.clabel,
                       SUM(e.x * c.cx)
                       / (SQRT(SUM(e.x * e.x)) * SQRT(SUM(c.cx * c.cx))) AS cos
                FROM e JOIN c USING (i)
                GROUP BY e.vec_id, e.label, c.clabel),
              own AS (
                SELECT vec_id, label, cos AS own FROM s WHERE label = clabel),
              oth AS (
                SELECT vec_id, MAX(cos) AS best_other
                FROM s WHERE label <> clabel GROUP BY vec_id)
              SELECT label, COUNT(*) AS n, ROUND(AVG(own), 4) AS avg_own,
                     ROUND(AVG(own - best_other), 4) AS avg_margin
              FROM own JOIN oth USING (vec_id)
              GROUP BY label ORDER BY label""")),

    // SEMANTIC decontamination — embedding-level test-set leakage: a
    // test-split vector is contaminated when a train-split vector sits
    // within cosine >= 0.35 of it in the same IVF cell. Catches the
    // paraphrase-level leakage the exact-fingerprint (q66) and 8-gram
    // (q77) checks cannot see. Splits reuse the q59 md5 rule (on
    // vec_id); the cell bound is the q93 SemDeDup shape — candidate
    // pairs form only within a cell, so the check costs
    // sum_cell(|test| * |train|), not |test| x |train| corpus-wide, and
    // the first-16 codebook keeps it deterministic + oracle-able
    // (q50's CTE). One scan feeds both join sides through one
    // cell-keyed exchange.
    Q("q105_semantic_decon",
      (s, d) => {
        val vecs = emb(s, d).repartition(col("vec_id"))
          .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        val cb = vecs.filter(col("vec_id") < IvfCells)
          .select(col("vec_id").as("cell"), col("v").as("cv"))
        semanticDeconWith(cb, vecs, minCos = 0.35)
          .orderBy(col("vec_id"))
      },
      Some("""WITH v AS (
                SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a
                FROM embeddings),
              cb AS (SELECT vec_id AS cell, a AS cv FROM v WHERE vec_id < 16),
              scored AS (
                SELECT v.vec_id, cb.cell,
                       list_sum(list_transform(generate_series(1, LEN(v.a)),
                         i -> v.a[i] * cb.cv[i]))
                       / (SQRT(list_sum(list_transform(v.a, x -> x*x)))
                        * SQRT(list_sum(list_transform(cb.cv, x -> x*x)))) AS sim
                FROM v CROSS JOIN cb),
              corpus AS (
                SELECT vec_id, cell FROM (
                  SELECT vec_id, cell,
                         ROW_NUMBER() OVER (PARTITION BY vec_id
                           ORDER BY sim DESC, cell) AS rn
                  FROM scored) t WHERE rn = 1),
              sp AS (
                SELECT vec_id,
                       CASE WHEN b < 90 THEN 'train'
                            WHEN b < 95 THEN 'val' ELSE 'test' END AS split
                FROM (SELECT vec_id,
                             CAST('0x' || SUBSTR(MD5(CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS b
                      FROM v) u),
              te AS (
                SELECT c.vec_id, c.cell, v.a
                FROM corpus c JOIN v USING (vec_id) JOIN sp USING (vec_id)
                WHERE sp.split = 'test'),
              tr AS (
                SELECT c.vec_id, c.cell, v.a
                FROM corpus c JOIN v USING (vec_id) JOIN sp USING (vec_id)
                WHERE sp.split = 'train'),
              p AS (
                SELECT te.vec_id,
                       list_sum(list_transform(generate_series(1, LEN(te.a)),
                         i -> te.a[i] * tr.a[i]))
                       / (SQRT(list_sum(list_transform(te.a, x -> x*x)))
                        * SQRT(list_sum(list_transform(tr.a, x -> x*x)))) AS sim
                FROM te JOIN tr ON te.cell = tr.cell)
              SELECT vec_id,
                     CAST(SUM(CASE WHEN sim >= 0.35 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
                     ROUND(MAX(sim), 4) AS max_sim
              FROM p GROUP BY vec_id
              HAVING SUM(CASE WHEN sim >= 0.35 THEN 1 ELSE 0 END) >= 1
              ORDER BY vec_id""")),

    // Cluster profiling over a TRAINED codebook: per cell — population,
    // mean cosine to own centroid (cohesion), dominant label, and label
    // purity. The curation-side readout of the q82/q93 clustering: low
    // cohesion flags a cell whose centroid is a poor summary (split it),
    // low purity flags entangled topics/label noise concentrated in one
    // region (the cluster-level twin of q99's per-label margins). The
    // codebook persists to parquet and the oracle reads the same bits
    // (q82's pattern), so assignment, cohesion sums, and the mode label
    // all value-pin.
    //
    // Scale shape: assignment is map-side against the broadcast
    // codebook (cosine to the argmax cell rides along — no second
    // pass); everything after aggregates on (cell, label) with map-side
    // combine, so the exchange carries |cells| x |labels| rows, not the
    // corpus. The mode-label window runs over that same slim table.
    Q("q124_cluster_profile",
      (s, d) => {
        val e = emb(s, d)
        val cb = IvfStore.train(e, iters = 3, sampleFraction = 0.5)
        cb.write.mode("overwrite").parquet(Q124CodebookDir)
        val stored = s.read.parquet(Q124CodebookDir)
          .select(col("cell"), col("cv"))
        clusterProfile(stored, e)
      },
      Some(s"""WITH v AS (
                SELECT vec_id, label,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a
                FROM embeddings),
              cb AS (SELECT cell, cv
                     FROM read_parquet('$Q124CodebookDir/*.parquet')),
              scored AS (
                SELECT v.vec_id, v.label, cb.cell,
                       list_sum(list_transform(generate_series(1, LEN(v.a)),
                         i -> v.a[i] * cb.cv[i]))
                       / (SQRT(list_sum(list_transform(v.a, x -> x*x)))
                        * SQRT(list_sum(list_transform(cb.cv, x -> x*x)))) AS sim
                FROM v CROSS JOIN cb),
              corpus AS (
                SELECT vec_id, label, cell, sim FROM (
                  SELECT vec_id, label, cell, sim,
                         ROW_NUMBER() OVER (PARTITION BY vec_id
                           ORDER BY sim DESC, cell) AS rn
                  FROM scored) t WHERE rn = 1),
              bl AS (
                SELECT cell, label, COUNT(*) AS lc, SUM(sim) AS lsum
                FROM corpus GROUP BY 1, 2),
              m AS (
                SELECT cell, label, lc,
                       ROW_NUMBER() OVER (PARTITION BY cell
                         ORDER BY lc DESC, label) AS rn
                FROM bl)
              SELECT bl.cell, CAST(SUM(bl.lc) AS BIGINT) AS n,
                     ROUND(SUM(bl.lsum) / SUM(bl.lc), 4) AS avg_sim,
                     MAX(CASE WHEN m.rn = 1 THEN m.label END) AS top_label,
                     ROUND(CAST(MAX(CASE WHEN m.rn = 1 THEN m.lc END) AS DOUBLE)
                           / SUM(bl.lc), 4) AS purity
              FROM bl JOIN m USING (cell, label)
              GROUP BY bl.cell ORDER BY bl.cell""")),

    // Cluster-balanced sampling: a fixed per-cell quota drawn by a
    // deterministic md5 key — the SemDeDup/DataComp curation move that
    // keeps a subset's TOPIC mix uniform instead of inheriting the
    // corpus's head-heavy cluster sizes (q81 balances on an explicit
    // column; this balances on LEARNED structure). The md5 order makes
    // the draw a reproducible pseudo-random permutation per cell, and
    // the persisted codebook (q82's pattern) lets the oracle re-derive
    // the identical assignment and draw.
    //
    // Scale shape: map-side assignment, then `row_number <= quota` over
    // (cell, md5) — TopKRewrite plans it as two-phase TopKPerKey, so
    // <= quota rows per (partition, cell) reach the exchange; the
    // corpus never sorts globally.
    Q("q125_cluster_balanced_sample",
      (s, d) => {
        val e = emb(s, d)
        val cb = IvfStore.train(e, iters = 3, sampleFraction = 0.5)
        cb.write.mode("overwrite").parquet(Q125CodebookDir)
        val stored = s.read.parquet(Q125CodebookDir)
          .select(col("cell"), col("cv"))
        clusterBalancedSample(stored, e, perCell = 8)
      },
      Some(s"""WITH v AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a
                FROM embeddings),
              cb AS (SELECT cell, cv
                     FROM read_parquet('$Q125CodebookDir/*.parquet')),
              scored AS (
                SELECT v.vec_id, cb.cell,
                       list_sum(list_transform(generate_series(1, LEN(v.a)),
                         i -> v.a[i] * cb.cv[i]))
                       / (SQRT(list_sum(list_transform(v.a, x -> x*x)))
                        * SQRT(list_sum(list_transform(cb.cv, x -> x*x)))) AS sim
                FROM v CROSS JOIN cb),
              corpus AS (
                SELECT vec_id, cell FROM (
                  SELECT vec_id, cell,
                         ROW_NUMBER() OVER (PARTITION BY vec_id
                           ORDER BY sim DESC, cell) AS rn
                  FROM scored) t WHERE rn = 1),
              r AS (
                SELECT cell, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY cell
                         ORDER BY MD5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
                FROM corpus)
              SELECT cell, vec_id, CAST(rn AS INT) AS rn
              FROM r WHERE rn <= 8 ORDER BY cell, rn""")),

    // k-NN-graph hubness: in-degree of each vector in the directed k-NN
    // graph over a bounded id window — the classic high-dimensional ANN
    // diagnostic (Radovanovic et al., JMLR 2010): heavy hubs appear in
    // "nearest" lists far more than chance, dragging retrieval quality
    // and flagging degenerate embedding directions before an index is
    // built. The id window keeps the exact graph oracle-able; at corpus
    // scale the same readout composes over cell-bounded kNN (q93's
    // within-cell pair space) instead of the all-pairs base.
    //
    // Scale shape: the bounded side broadcasts, neighbor selection is
    // `row_number <= k` (TopKPerKey — <= k rows per partition per query
    // reach the exchange), and the in-degree count aggregates <= k*|Q|
    // slim rows.
    Q("q126_knn_hubness",
      (s, d) => knnHubness(emb(s, d), maxId = 200L, k = 5, topHubs = 25),
      Some("""WITH v AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a
                FROM embeddings WHERE vec_id < 200),
              scored AS (
                SELECT q.vec_id AS qid, x.vec_id,
                       list_sum(list_transform(generate_series(1, LEN(x.a)),
                         i -> x.a[i] * q.a[i]))
                       / (SQRT(list_sum(list_transform(x.a, y -> y*y)))
                        * SQRT(list_sum(list_transform(q.a, y -> y*y)))) AS sim
                FROM v x CROSS JOIN v q
                WHERE x.vec_id <> q.vec_id),
              nn AS (
                SELECT qid, vec_id FROM (
                  SELECT qid, vec_id,
                         ROW_NUMBER() OVER (PARTITION BY qid
                           ORDER BY sim DESC, vec_id) AS rn
                  FROM scored) t WHERE rn <= 5)
              SELECT vec_id, COUNT(*) AS in_degree
              FROM nn GROUP BY vec_id
              ORDER BY in_degree DESC, vec_id LIMIT 25""")),

    // SCALAR-quantization (int8) ANN (see [[sqTopK]]) — the remaining
    // rung of the ANN memory ladder (LSH buckets / IVF cells / PQ
    // codes / IVF-PQ): 1 byte per dimension against corpus-wide
    // per-dim bounds, exact L2 ranking on the dequantized codes. The
    // oracle rebuilds bounds, codes, and distances from the same
    // floats.
    Q("q168_ann_sq8",
      (s, d) => sqTopK(emb(s, d), queryVecId = 0L, k = 10),
      Some("""WITH v AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a
                FROM embeddings),
              dim AS (
                SELECT i, MIN(a[i]) AS mn, MAX(a[i]) AS mx
                FROM v, UNNEST(generate_series(1, LEN(a))) AS u(i)
                GROUP BY i),
              b AS (SELECT LIST(mn ORDER BY i) AS mns,
                           LIST(mx ORDER BY i) AS mxs FROM dim),
              c AS (
                SELECT vec_id,
                       list_transform(generate_series(1, LEN(a)), i ->
                         CASE WHEN mxs[i] = mns[i] THEN 0.0
                              ELSE mns[i] + ROUND((a[i] - mns[i]) * 255
                                     / (mxs[i] - mns[i]))
                                   * (mxs[i] - mns[i]) / 255 END) AS dq
                FROM v, b),
              q AS (SELECT dq AS qdq FROM c WHERE vec_id = 0)
              SELECT c.vec_id,
                     ROUND(SQRT(list_sum(list_transform(
                       generate_series(1, LEN(dq)),
                       i -> (dq[i] - qdq[i]) * (dq[i] - qdq[i])))), 4) AS dist
              FROM c, q WHERE c.vec_id <> 0
              ORDER BY SQRT(list_sum(list_transform(
                         generate_series(1, LEN(dq)),
                         i -> (dq[i] - qdq[i]) * (dq[i] - qdq[i])))),
                       c.vec_id
              LIMIT 10""")),

    // IVF-SQ8 composed (see [[ivfSqTopK]]) — q50's cell pruning ×
    // q168's byte codes, the FAISS IVF+SQ8 layout. Oracle = q92's cell
    // CTEs joined with q168's bounds/code CTEs.
    Q("q173_ann_ivfsq",
      (s, d) => ivfSqTopK(emb(s, d), queryVecId = 0L, k = 10),
      Some("""WITH v AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a
                FROM embeddings),
              ivfcb AS (SELECT vec_id AS cell, a AS cv FROM v WHERE vec_id < 16),
              scored AS (
                SELECT v.vec_id, ivfcb.cell,
                       list_sum(list_transform(generate_series(1, LEN(v.a)),
                         i -> v.a[i] * ivfcb.cv[i]))
                       / (SQRT(list_sum(list_transform(v.a, x -> x*x)))
                        * SQRT(list_sum(list_transform(ivfcb.cv, x -> x*x)))) AS sim
                FROM v CROSS JOIN ivfcb),
              corpus AS (
                SELECT vec_id, cell FROM (
                  SELECT vec_id, cell,
                         ROW_NUMBER() OVER (PARTITION BY vec_id
                           ORDER BY sim DESC, cell) AS rn
                  FROM scored) t WHERE rn = 1),
              qcell AS (
                SELECT cell FROM (
                  SELECT cell, ROW_NUMBER() OVER (ORDER BY sim DESC, cell) AS rn
                  FROM scored WHERE vec_id = 0) t WHERE rn <= 4),
              cand AS (SELECT vec_id FROM corpus JOIN qcell USING (cell)),
              dim AS (
                SELECT i, MIN(a[i]) AS mn, MAX(a[i]) AS mx
                FROM v, UNNEST(generate_series(1, LEN(a))) AS u(i)
                GROUP BY i),
              b AS (SELECT LIST(mn ORDER BY i) AS mns,
                           LIST(mx ORDER BY i) AS mxs FROM dim),
              c AS (
                SELECT vec_id,
                       list_transform(generate_series(1, LEN(a)), i ->
                         CASE WHEN mxs[i] = mns[i] THEN 0.0
                              ELSE mns[i] + ROUND((a[i] - mns[i]) * 255
                                     / (mxs[i] - mns[i]))
                                   * (mxs[i] - mns[i]) / 255 END) AS dq
                FROM v, b),
              q AS (SELECT dq AS qdq FROM c WHERE vec_id = 0)
              SELECT c.vec_id,
                     ROUND(SQRT(list_sum(list_transform(
                       generate_series(1, LEN(dq)),
                       i -> (dq[i] - qdq[i]) * (dq[i] - qdq[i])))), 4) AS dist
              FROM c JOIN cand USING (vec_id), q WHERE c.vec_id <> 0
              ORDER BY SQRT(list_sum(list_transform(
                         generate_series(1, LEN(dq)),
                         i -> (dq[i] - qdq[i]) * (dq[i] - qdq[i])))),
                       c.vec_id
              LIMIT 10""")),

    // SQ8 recall-vs-exact tuning report over the PERSISTED byte-code
    // store (q133's sibling for the SQ8/IVF-SQ8 rung — r12 verdict #5):
    // recall@10 of the full SQ8 code scan plus the IVF-SQ8 probe at
    // widths 1/2/4 against exact float L2. The oracle reads the SAME
    // stored bounds and codes parquet (q82's pattern), so the store
    // build, dequantization, cell pruning, and every recall number all
    // value-pin.
    Q("q197_sq8_recall",
      (s, d) => {
        val e = emb(s, d)
        sqBuildStore(e, Q197SqStoreDir)
        sqRecallReport(s, Q197SqStoreDir, e, queryVecId = 0L, k = 10,
          probeWidths = Seq(1, 2, 4))
      },
      Some(s"""WITH v AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a
                FROM embeddings),
              b AS (SELECT LIST(mn ORDER BY i) AS mns,
                           LIST(mx ORDER BY i) AS mxs
                    FROM read_parquet('$Q197SqStoreDir/bounds/*.parquet')),
              c AS (
                SELECT vec_id,
                       list_transform(generate_series(1, LEN(code)), i ->
                         CASE WHEN mxs[i] = mns[i] THEN mns[i]
                              ELSE mns[i] + code[i] * (mxs[i] - mns[i]) / 255
                         END) AS dq
                FROM read_parquet('$Q197SqStoreDir/codes/*.parquet'), b),
              q AS (SELECT dq AS qdq FROM c WHERE vec_id = 0),
              qraw AS (SELECT a AS qa FROM v WHERE vec_id = 0),
              exact AS (
                SELECT v.vec_id FROM v CROSS JOIN qraw
                WHERE v.vec_id <> 0
                ORDER BY list_sum(list_transform(generate_series(1, LEN(a)),
                           i -> (a[i] - qa[i]) * (a[i] - qa[i]))), v.vec_id
                LIMIT 10),
              sqtop AS (
                SELECT c.vec_id FROM c, q
                WHERE c.vec_id <> 0
                ORDER BY list_sum(list_transform(generate_series(1, LEN(dq)),
                           i -> (dq[i] - qdq[i]) * (dq[i] - qdq[i]))), c.vec_id
                LIMIT 10),
              ivfcb AS (SELECT vec_id AS cell, a AS cv FROM v WHERE vec_id < 16),
              scored AS (
                SELECT v.vec_id, ivfcb.cell,
                       list_sum(list_transform(generate_series(1, LEN(v.a)),
                         i -> v.a[i] * ivfcb.cv[i]))
                       / (SQRT(list_sum(list_transform(v.a, x -> x*x)))
                        * SQRT(list_sum(list_transform(ivfcb.cv, x -> x*x)))) AS sim
                FROM v CROSS JOIN ivfcb),
              corpus AS (
                SELECT vec_id, cell FROM (
                  SELECT vec_id, cell,
                         ROW_NUMBER() OVER (PARTITION BY vec_id
                           ORDER BY sim DESC, cell) AS rn
                  FROM scored) t WHERE rn = 1),
              qrank AS (
                SELECT cell, ROW_NUMBER() OVER (ORDER BY sim DESC, cell) AS pr
                FROM scored WHERE vec_id = 0),
              probes AS (SELECT UNNEST([1, 2, 4]) AS np),
              cand AS (
                SELECT p.np, c2.vec_id,
                       ROW_NUMBER() OVER (PARTITION BY p.np
                         ORDER BY list_sum(list_transform(
                                    generate_series(1, LEN(c2.dq)),
                                    i -> (c2.dq[i] - qdq[i]) * (c2.dq[i] - qdq[i]))),
                                  c2.vec_id) AS rk
                FROM probes p
                JOIN qrank r ON r.pr <= p.np
                JOIN corpus cc ON cc.cell = r.cell
                JOIN c c2 ON c2.vec_id = cc.vec_id
                CROSS JOIN q
                WHERE c2.vec_id <> 0),
              ivfhits AS (
                SELECT np, COUNT(*) AS n FROM cand JOIN exact USING (vec_id)
                WHERE rk <= 10 GROUP BY np),
              sqhit AS (SELECT COUNT(*) AS n FROM sqtop JOIN exact USING (vec_id))
              SELECT variant, n_hits, recall FROM (
                SELECT 'sq8' AS variant, CAST(n AS BIGINT) AS n_hits,
                       ROUND(n / 10.0, 4) AS recall
                FROM sqhit
                UNION ALL
                SELECT 'ivfsq8_p' || p.np, CAST(COALESCE(h.n, 0) AS BIGINT),
                       ROUND(COALESCE(h.n, 0) / 10.0, 4)
                FROM probes p LEFT JOIN ivfhits h ON h.np = p.np)
              ORDER BY variant""")),

    // Johnson-Lindenstrauss distortion report (see
    // [[jlDistortionReport]]): histogram of projected/original
    // squared-distance ratios over the declared bounded pair sample —
    // the measured counterpart of the JL lemma's (1±ε) guarantee for
    // the train-free 64→16 Rademacher projection, the same
    // report-before-you-commit discipline as q133/q197/q199.
    Q("q201_jl_distortion",
      (s, d) => jlDistortionReport(emb(s, d)),
      Some(s"""WITH $jlProjectedSql
              pr AS (SELECT
                       list_sum(list_transform(generate_series(1, LEN(x.a)),
                         i -> (x.a[i] - y.a[i]) * (x.a[i] - y.a[i]))) AS od,
                       list_sum(list_transform(generate_series(1, $JlK),
                         r -> (x.p[r] - y.p[r]) * (x.p[r] - y.p[r]))) AS pd
                     FROM p x JOIN p y ON x.vec_id < y.vec_id
                     WHERE x.vec_id < 50 AND y.vec_id < 50),
              rt AS (SELECT pd / od AS ratio FROM pr WHERE od > 0)
              SELECT CAST(FLOOR(ratio * 10) AS BIGINT) AS bucket,
                     COUNT(*) AS n_pairs,
                     ROUND(SUM(CAST(ROUND(ratio * 10000) AS BIGINT))
                           / (COUNT(*) * 10000.0), 4) AS mean_ratio,
                     ROUND(MIN(ratio), 4) AS min_ratio,
                     ROUND(MAX(ratio), 4) AS max_ratio
              FROM rt GROUP BY 1 ORDER BY bucket""")),

    // ANN through the JL-projected space (see [[jlRerankTopK]]):
    // candidates ranked on the 16-dim projection (4× fewer float ops
    // and 4× less memory traffic per comparison than the 64-dim scan),
    // exact L2 rerank touches only the candidate rows — the
    // train-free sibling of the PCA rerank (q120).
    Q("q202_jl_rerank",
      (s, d) => jlRerankTopK(emb(s, d)),
      Some(s"""WITH $jlProjectedSql
              q AS (SELECT vec_id AS qid, a AS qa, p AS qp
                    FROM p WHERE vec_id < 3),
              cand AS (
                SELECT q.qid, x.vec_id, x.a, q.qa,
                       ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
                         list_sum(list_transform(generate_series(1, $JlK),
                           r -> (x.p[r] - q.qp[r]) * (x.p[r] - q.qp[r]))),
                         x.vec_id) AS crn
                FROM p x CROSS JOIN q WHERE x.vec_id <> q.qid),
              ex AS (
                SELECT qid, vec_id,
                       list_sum(list_transform(generate_series(1, LEN(a)),
                         i -> (a[i] - qa[i]) * (a[i] - qa[i]))) AS edist,
                       ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
                         list_sum(list_transform(generate_series(1, LEN(a)),
                           i -> (a[i] - qa[i]) * (a[i] - qa[i]))),
                         vec_id) AS rn
                FROM cand WHERE crn <= 10)
              SELECT qid, vec_id, ROUND(edist, 4) AS dist, rn
              FROM ex WHERE rn <= 5 ORDER BY qid, rn""")),

    // Simplified silhouette over the persisted trained codebook (see
    // [[silhouette]]): the cluster-quality readout that closes the
    // clustering loop — q82 trains, q124 profiles cohesion/purity,
    // q125 samples, q206 says whether the cells are SEPARATED (the
    // merge/split decision q93's semantic dedup and q125's balanced
    // draw both ride on). Centroid-based s(i), O(n·cells), map-side.
    Q("q206_silhouette",
      (s, d) => {
        val e = emb(s, d)
        val cb = IvfStore.train(e, iters = 3, sampleFraction = 0.5)
        cb.write.mode("overwrite").parquet(Q206CodebookDir)
        silhouette(
          s.read.parquet(Q206CodebookDir).select(col("cell"), col("cv")),
          e)
      },
      Some(s"""WITH v AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a
                FROM embeddings),
              cb AS (SELECT cell, cv
                     FROM read_parquet('$Q206CodebookDir/*.parquet')),
              scored AS (
                SELECT v.vec_id, cb.cell,
                       list_sum(list_transform(generate_series(1, LEN(v.a)),
                         i -> v.a[i] * cb.cv[i]))
                       / (SQRT(list_sum(list_transform(v.a, x -> x*x)))
                        * SQRT(list_sum(list_transform(cb.cv, x -> x*x)))) AS sim
                FROM v CROSS JOIN cb),
              rk AS (
                SELECT vec_id, cell, 1 - sim AS dist,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                         ORDER BY sim DESC, cell) AS rn
                FROM scored),
              sv AS (
                SELECT o.cell,
                       CASE WHEN GREATEST(o.dist, t.dist) <= 0 THEN 0.0
                            ELSE (t.dist - o.dist)
                                 / GREATEST(o.dist, t.dist) END AS s
                FROM rk o JOIN rk t
                  ON o.vec_id = t.vec_id AND o.rn = 1 AND t.rn = 2)
              SELECT cell, COUNT(*) AS n,
                     ROUND(SUM(CAST(ROUND(s * 10000) AS BIGINT))
                           / (COUNT(*) * 10000.0), 4) AS avg_sil,
                     ROUND(MIN(s), 4) AS min_sil
              FROM sv GROUP BY cell ORDER BY cell"""))
  )

  /** Scalar-quantization (SQ8) ANN: quantize every dimension to an
    * 8-bit code against corpus-wide per-dimension [min, max] bounds —
    * 4 bytes/float → 1 byte/dim, the classic 4× memory/scan reduction
    * (the FAISS SQ8 layout; PQ (q91) trades more accuracy for 8 bytes
    * per VECTOR, SQ8 is the cheap middle rung) — then rank by exact L2
    * over the DEQUANTIZED codes.
    *
    * Scale shape: the bounds are ONE 64-row aggregate (collected like
    * every codebook artifact — bounded by dimension, not corpus) folded
    * into literal arrays, so coding is a map-side codegen'd projection;
    * the query vector rides a broadcast; ranking is the native
    * DotProduct identity |p−q|² = p·p − 2p·q + q·q with a TakeOrdered
    * finish — no interpreted per-element arithmetic in the corpus scan
    * beyond the single dequantize transform.
    */
  /** Per-dimension [min, max] bounds of a vector corpus — the SQ8
    * "codebook": one aggregate, |dims| rows (a bounded artifact like
    * every codebook, collected and folded into literals).
    */
  private def sqBounds(v: DataFrame): (Seq[Double], Seq[Double]) = {
    val bounds = v
      .select(posexplode(col("a")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy(col("i"))
      .collect() // bounded artifact: one row per DIMENSION (64)
    (bounds.map(_.getDouble(1)).toSeq, bounds.map(_.getDouble(2)).toSeq)
  }

  /** Integer SQ8 code per dim: round((x − mn)·255/span), clamped to
    * [0, 255] so vectors APPENDED after the bounds were fixed can't
    * overflow the byte range (in-corpus values never clamp — the build
    * corpus defines the bounds).
    */
  private def sqCodes(a: Column, mnL: Column, mxL: Column): Column =
    transform(a, (x, i) => {
      val mn = element_at(mnL, i + 1)
      val mx = element_at(mxL, i + 1)
      when(mx === mn, lit(0))
        .otherwise(greatest(lit(0), least(lit(255),
          round((x - mn) * 255 / (mx - mn), 0).cast("int"))))
    })

  /** Dequantize SQ8 codes: mn + code·span/255 (constant dims collapse
    * to mn). */
  private def sqDequant(codes: Column, mnL: Column, mxL: Column): Column =
    transform(codes, (c, i) => {
      val mn = element_at(mnL, i + 1)
      val mx = element_at(mxL, i + 1)
      when(mx === mn, mn).otherwise(mn + c * (mx - mn) / 255)
    })

  def sqTopK(df: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val v = df.select(col("vec_id"), asDouble(col("embedding")).as("a"))
    val (mns, mxs) = sqBounds(v)
    val mnL = typedLit(mns)
    val mxL = typedLit(mxs)
    val coded = v.select(col("vec_id"),
      sqDequant(sqCodes(col("a"), mnL, mxL), mnL, mxL).as("dq"))
    val q = coded.filter(col("vec_id") === queryVecId)
      .select(col("dq").as("qdq"))
    // distance via the native sequential-fold l2sq — the SAME (x-y)
    // then square-and-add ops in the SAME order as the oracle's
    // list_sum over the difference list, so the 4-dp values can't
    // straddle a rounding boundary differently (the float-identity
    // trap: p·p−2p·q+q·q is only equal in the reals)
    coded.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        sqrt(Fns.l2sqDist(col("dq"), col("qdq"))).as("raw"))
      .orderBy(col("raw"), col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("raw"), 4).as("dist"))
  }

  /** Persist the SQ8 layout: `dir/bounds` (i, mn, mx — the |dims|-row
    * codebook) and `dir/codes` (vec_id, code array<int> whose values
    * fit 8 bits — parquet bit-packs them to a byte). The 100 TB story:
    * the corpus is scanned ONCE to fix bounds and once to encode; every
    * later query touches only the 1-byte-per-dim codes, a 4× scan
    * reduction against raw floats with far better accuracy than PQ's
    * 8-bytes-per-vector (the middle rung of the memory ladder).
    */
  def sqBuildStore(vectors: DataFrame, dir: String): Unit = {
    val spark = vectors.sparkSession
    val v = vectors.select(col("vec_id"), asDouble(col("embedding")).as("a"))
    v.select(posexplode(col("a")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .write.mode("overwrite")
      .option("compression", graft.etl.Writers.DefaultCompression)
      .parquet(s"$dir/bounds")
    val (mns, mxs) = storedSqBounds(spark, dir)
    v.repartition(col("vec_id"))
      .select(col("vec_id"),
        sqCodes(col("a"), typedLit(mns), typedLit(mxs)).as("code"))
      .write.mode("overwrite")
      .option("compression", graft.etl.Writers.DefaultCompression)
      .parquet(s"$dir/codes")
  }

  /** Encode a NEW batch against the stored bounds and append its codes
    * (out-of-bounds values clamp — see [[sqCodes]]). */
  def sqAppendStore(newVectors: DataFrame, dir: String): Unit = {
    val (mns, mxs) = storedSqBounds(newVectors.sparkSession, dir)
    newVectors
      .select(col("vec_id"), asDouble(col("embedding")).as("a"))
      .repartition(col("vec_id"))
      .select(col("vec_id"),
        sqCodes(col("a"), typedLit(mns), typedLit(mxs)).as("code"))
      .write.mode("append")
      .option("compression", graft.etl.Writers.DefaultCompression)
      .parquet(s"$dir/codes")
  }

  /** Exact-L2-over-dequantized-codes top-k against the persisted store:
    * the query vector is quantized with the SAME stored bounds, raw
    * vectors are never read. Value-identical to [[sqTopK]] when the
    * store was built from the same corpus (SimilaritySpec pins it).
    */
  def sqTopKStored(spark: SparkSession, dir: String, qv: Array[Double],
      k: Int, excludeId: Option[Long] = None): DataFrame = {
    val (mns, mxs) = storedSqBounds(spark, dir)
    val mnL = typedLit(mns)
    val mxL = typedLit(mxs)
    val qdq = typedLit(qv.toSeq.zipWithIndex.map { case (x, i) =>
      if (mxs(i) == mns(i)) mns(i)
      else {
        val c = math.max(0L, math.min(255L,
          math.round((x - mns(i)) * 255 / (mxs(i) - mns(i)))))
        mns(i) + c * (mxs(i) - mns(i)) / 255
      }
    })
    val base = spark.read.parquet(s"$dir/codes")
    val scoped = excludeId.fold(base)(id => base.filter(col("vec_id") =!= id))
    scoped
      .select(col("vec_id"),
        sqrt(Fns.l2sqDist(sqDequant(col("code"), mnL, mxL), qdq)).as("raw"))
      .orderBy(col("raw"), col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("raw"), 4).as("dist"))
  }

  private def storedSqBounds(spark: SparkSession,
      dir: String): (Seq[Double], Seq[Double]) = {
    val b = spark.read.parquet(s"$dir/bounds").orderBy(col("i")).collect()
    (b.map(_.getDouble(1)).toSeq, b.map(_.getDouble(2)).toSeq)
  }

  /** Recall@k of the SQ8 full-code-scan and IVF-SQ8 probes against
    * exact float L2 — the q133 tuning report's sibling for the
    * byte-code ANN rung (r12 verdict #5): quantization costs accuracy
    * and cell pruning costs candidates, and the number that says
    * whether 4×-smaller scans (and, composed, nprobe-bounded ones) are
    * safe to deploy IS this table. Runs over the PERSISTED store
    * ([[sqBuildStore]]'s bounds + codes parquet) — one build serves
    * every width, raw floats appear only in the exact baseline and the
    * one-off cell assignment; the DuckDB oracle reads the same parquet
    * bits, so every recall number value-pins.
    *
    * 100 TB shape: exact baseline over a fixed query sample (here one
    * pinned query vector — recall estimation never needs every query),
    * candidate ranking map-side over dequantized codes + TakeOrdered,
    * corpus cell assignment computed once and reused across widths.
    */
  def sqRecallReport(spark: SparkSession, dir: String, vectors: DataFrame,
      queryVecId: Long, k: Int, probeWidths: Seq[Int]): DataFrame = {
    val (mns, mxs) = storedSqBounds(spark, dir)
    val mnL = typedLit(mns)
    val mxL = typedLit(mxs)
    val coded = spark.read.parquet(s"$dir/codes")
      .select(col("vec_id"), sqDequant(col("code"), mnL, mxL).as("dq"))
    val v = vectors.repartition(col("vec_id"))
      .select(col("vec_id"), asDouble(col("embedding")).as("a"))
    val qRaw = v.filter(col("vec_id") === queryVecId).select(col("a").as("qa"))
    // exact baseline: squared L2 over RAW floats (same order as sqrt'd,
    // same sequential fold as the oracle's list_sum — the q168 parity)
    val exact = v.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(qRaw))
      .select(col("vec_id"), Fns.l2sqDist(col("a"), col("qa")).as("raw"))
      .orderBy(col("raw"), col("vec_id"))
      .limit(k)
      .select(col("vec_id"))
    val q = coded.filter(col("vec_id") === queryVecId)
      .select(col("dq").as("qdq"))
    def topkFrom(cands: DataFrame): DataFrame = cands
      .filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), Fns.l2sqDist(col("dq"), col("qdq")).as("raw"))
      .orderBy(col("raw"), col("vec_id"))
      .limit(k)
      .select(col("vec_id"))
    def hitRow(cand: DataFrame, label: String): DataFrame =
      cand.join(exact, Seq("vec_id"))
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(label).as("variant"), col("n_hits"),
          round(col("n_hits").cast("double") / k, 4).as("recall"))
    val rows = v.select(col("vec_id"), col("a").as("v"))
    val ivfCb = rows.filter(col("vec_id") < IvfCells)
      .select(col("vec_id").as("cell"), col("v").as("cv"))
    val corpusCells = ivfAssign(ivfCb, rows, probes = 1)
      .select(col("vec_id"), col("cell"))
    val reports = hitRow(topkFrom(coded), "sq8") +:
      probeWidths.sorted.map { np =>
        val qCells = ivfAssign(ivfCb,
            rows.filter(col("vec_id") === queryVecId), np)
          .select(col("cell"))
        val cand = coded.join(corpusCells, Seq("vec_id"))
          .join(broadcast(qCells), Seq("cell"), "left_semi")
          .select(col("vec_id"), col("dq"))
        hitRow(topkFrom(cand), s"ivfsq8_p$np")
      }
    reports.reduce(_.unionByName(_)).orderBy(col("variant"))
  }

  /** IVF-SQ8 — the two layouts composed, the FAISS IVF+SQ8 medium-scale
    * default (the accuracy-friendlier sibling of q92's IVF-PQ): IVF
    * cell pruning bounds WHICH codes the query scans (the q50 first-16
    * cell rule, 4 probes), SQ8 bounds WHAT each candidate costs (1 byte
    * per dim instead of 8 bytes per float dim). Raw vectors appear only
    * in the map-side cell assignment and the one-off bounds aggregate;
    * candidate ranking runs on dequantized codes.
    */
  def ivfSqTopK(df: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val v = df.select(col("vec_id"), asDouble(col("embedding")).as("a"))
    val (mns, mxs) = sqBounds(v)
    val mnL = typedLit(mns)
    val mxL = typedLit(mxs)
    val rows = v.select(col("vec_id"), col("a").as("v"))
    val ivfCb = rows.filter(col("vec_id") < IvfCells)
      .select(col("vec_id").as("cell"), col("v").as("cv"))
    val corpusCells = ivfAssign(ivfCb, rows, probes = 1)
      .select(col("vec_id"), col("cell"))
    val qCells = ivfAssign(ivfCb, rows.filter(col("vec_id") === queryVecId),
        IvfProbes)
      .select(col("cell"))
    val coded = v.select(col("vec_id"),
      sqDequant(sqCodes(col("a"), mnL, mxL), mnL, mxL).as("dq"))
    val q = coded.filter(col("vec_id") === queryVecId)
      .select(col("dq").as("qdq"))
    coded
      .join(corpusCells, Seq("vec_id"))
      .join(broadcast(qCells), Seq("cell"), "left_semi")
      .filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        sqrt(Fns.l2sqDist(col("dq"), col("qdq"))).as("raw"))
      .orderBy(col("raw"), col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("raw"), 4).as("dist"))
  }

  /** Where q82 persists its trained codebook so the DuckDB oracle can
    * read the identical bits (`read_parquet`). Static by necessity: the
    * oracle SQL is a fixed string dumped at Verify time.
    */
  val Q82CodebookDir = graft.core.Artifacts.dir("graft_q82_codebook")
  val Q197SqStoreDir = graft.core.Artifacts.dir("graft_q197_sqstore")
  val Q133CodebookDir = graft.core.Artifacts.dir("graft_q133_codebook")
  val Q93CodebookDir = graft.core.Artifacts.dir("graft_q93_codebook")
  val Q124CodebookDir = graft.core.Artifacts.dir("graft_q124_codebook")
  val Q125CodebookDir = graft.core.Artifacts.dir("graft_q125_codebook")
  val Q206CodebookDir = graft.core.Artifacts.dir("graft_q206_codebook")
  val Q187CodebookDir = graft.core.Artifacts.dir("graft_q187_codebook")

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * cluster embeddings with a trained codebook (map-side argmax
    * assignment), compare pairs ONLY within a cluster, and connect
    * components over the >= minCos pairs. The cells make the pair space
    * deterministic and tunable — cells ~ sqrt(corpus) bounds each
    * cluster's pair quadratic, where q57's broadcast all-pairs form is
    * the exact baseline and q69/q73's LSH buckets are the probabilistic
    * alternative. One scan feeds both join sides through a single
    * cell-keyed exchange (ReuseExchange — the q32 shared-exchange
    * shape); vectors ride the exchange once, slim (cell, id, vec) rows.
    */
  def semanticDedupGroups(codebook: DataFrame, vectors: DataFrame,
      minCos: Double): DataFrame = {
    val vecs = vectors.repartition(col("vec_id"))
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val assigned = ivfAssign(codebook, vecs, probes = 1)
      .repartition(col("cell"))
    val a = assigned.select(col("cell"), col("vec_id").as("d1"), col("v").as("va"))
    val b = assigned.select(col("cell"), col("vec_id").as("d2"), col("v").as("vb"))
    val pairs = a.join(b, Seq("cell"))
      .filter(col("d1") < col("d2") && cosine(col("va"), col("vb")) >= minCos)
      .select(col("d1"), col("d2"))
    graft.llm.Dedup.connectedComponents(pairs)
      .select(col("node").as("vec_id"), col("comp"))
  }

  /** The q59 md5 split rule applied to vec_id (the embedding-side twin
    * of [[graft.llm.Curation.splitCol]]).
    */
  def vecSplitCol: Column = {
    val bucket = pmod(
      conv(substring(md5(col("vec_id").cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(100))
    when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
  }

  /** q105's semantic-decontamination check against an EXPLICIT
    * (cell, cv) codebook: test-split vectors (q59 md5 rule on vec_id)
    * with any train-split vector at cosine >= minCos INSIDE THE SAME
    * IVF CELL. Output (vec_id, n_hits, max_sim), contaminated rows
    * only. The cell bound is the q93 SemDeDup shape — candidate pairs
    * form only within a cell — and an explicit codebook makes the
    * check streamable: train the codebook once (IvfStore.train),
    * then batch (here) and streaming
    * ([[graft.streaming.StreamingCuration.startSemanticDecon]]) probes
    * assign against the same broadcast centers.
    */
  def semanticDeconWith(codebook: DataFrame, vectors: DataFrame,
      minCos: Double): DataFrame = {
    val t = ivfAssign(codebook, vectors, probes = 1)
      .select(col("cell"), col("vec_id"), col("v"), vecSplitCol.as("split"))
      .repartition(col("cell"))
    val test = t.filter(col("split") === "test")
      .select(col("cell"), col("vec_id"), col("v"))
    val train = t.filter(col("split") === "train")
      .select(col("cell"), col("vec_id").as("tid"), col("v").as("tv"))
    val sim = cosine(col("v"), col("tv"))
    test.join(train, Seq("cell"))
      .select(col("vec_id"),
        when(sim >= minCos, 1L).otherwise(0L).as("hit"), sim.as("s"))
      .groupBy(col("vec_id"))
      .agg(sum(col("hit")).as("n_hits"),
        round(max(col("s")), 4).as("max_sim"))
      .filter(col("n_hits") >= 1L)
  }

  /** Per-cell cluster profile against an explicit (cell, cv) codebook:
    * (cell, n, avg_sim, top_label, purity). Assignment keeps the argmax
    * cell's similarity from the same projection (no second scoring
    * pass); the (cell, label) aggregate carries partial counts and
    * cosine sums so the exchange is |cells| x |labels| rows. Dominant
    * label ties break to the smaller label (the q85 vote convention).
    */
  def clusterProfile(codebook: DataFrame, vectors: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vecs = vectors.repartition(col("vec_id"))
      .select(col("vec_id"), asDouble(col("embedding")).as("v"), col("label"))
    val cb = codebook
      .select(struct(col("cell"), col("cv")).as("c"))
      .agg(collect_list(col("c")).as("cb"))
    val scoredCells = transform(col("cb"), c =>
      struct((-cosine(col("v"), c.getField("cv"))).as("negsim"),
        c.getField("cell").as("cell")))
    val assigned = vecs.crossJoin(broadcast(cb))
      .select(col("label"),
        explode(slice(sort_array(scoredCells), 1, 1)).as("sc"))
      .select(col("label"), col("sc.cell").as("cell"),
        (-col("sc.negsim")).as("simc"))
    val byLabel = assigned.groupBy(col("cell"), col("label"))
      .agg(count(lit(1)).as("lc"), sum(col("simc")).as("lsum"))
    val w = Window.partitionBy(col("cell"))
      .orderBy(col("lc").desc, col("label"))
    byLabel.withColumn("rn", row_number().over(w))
      .groupBy(col("cell"))
      .agg(sum(col("lc")).as("n"),
        round(sum(col("lsum")) / sum(col("lc")), 4).as("avg_sim"),
        max(when(col("rn") === 1, col("label"))).as("top_label"),
        round(max(when(col("rn") === 1, col("lc"))).cast("double")
          / sum(col("lc")), 4).as("purity"))
      .orderBy(col("cell"))
  }

  /** Simplified silhouette per cluster (Rousseeuw 1987's s(i) with
    * CENTROID distances standing in for mean pairwise distances — the
    * O(n·cells) form usable at corpus scale, where the classical
    * definition is O(n²)): assignment is the q124 cosine argmax
    * against the persisted codebook, a(i) = cosine distance to the own
    * centroid, b(i) = cosine distance to the nearest OTHER centroid,
    * s(i) = (b−a)/max(a,b) ∈ [−1,1]. Low avg flags a cell overlapping
    * its neighbor (merge it); a negative min flags rows nearer another
    * centroid than their own (argmax ties / boundary rows). Output per
    * cell: (cell, n, avg_sil, min_sil); avg accumulates integer-e4
    * terms (the q201 convention) so the mean is summation-order-
    * independent and the oracle hash exact.
    *
    * Scale shape: ONE map-side projection against the broadcast
    * codebook scores every cell and keeps the top-2 (own + nearest
    * other) inside the same select — no second scoring pass, no join,
    * no per-vector shuffle; the aggregate exchange carries |cells|
    * rows. Pairwise-exact silhouette would be corpus² — this is the
    * published large-scale substitute (the "simplified silhouette" of
    * Hruschka et al.), and it degrades gracefully: cells are a
    * broadcast-sized artifact at any corpus size.
    */
  def silhouette(codebook: DataFrame, vectors: DataFrame): DataFrame = {
    val vecs = vectors.repartition(col("vec_id"))
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val cb = codebook
      .select(struct(col("cell"), col("cv")).as("c"))
      .agg(collect_list(col("c")).as("cb"))
    val scoredCells = transform(col("cb"), c =>
      struct((-cosine(col("v"), c.getField("cv"))).as("negsim"),
        c.getField("cell").as("cell")))
    // sort by (-sim, cell): slot 0 = own cell (argmax, ties to the
    // smaller cell — the q124 convention), slot 1 = nearest other
    val top2 = vecs.crossJoin(broadcast(cb))
      .select(slice(sort_array(scoredCells), 1, 2).as("t"))
      .select(col("t")(0).getField("cell").as("cell"),
        (lit(1.0) + col("t")(0).getField("negsim")).as("a"),
        (lit(1.0) + col("t")(1).getField("negsim")).as("b"))
    top2
      .withColumn("s",
        when(greatest(col("a"), col("b")) <= 0, lit(0.0))
          .otherwise((col("b") - col("a")) / greatest(col("a"), col("b"))))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"),
        round(sum(round(col("s") * 10000).cast("long"))
          / (count(lit(1)) * 10000.0), 4).as("avg_sil"),
        round(min(col("s")), 4).as("min_sil"))
      .orderBy(col("cell"))
  }

  /** Per-cell quota sample against an explicit (cell, cv) codebook:
    * the `perCell` rows with the smallest md5(vec_id) in each cell — a
    * deterministic pseudo-random draw (the q59/q90 md5 convention) that
    * equalizes cluster representation. Output (cell, vec_id, rn).
    */
  def clusterBalancedSample(codebook: DataFrame, vectors: DataFrame,
      perCell: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vecs = vectors.repartition(col("vec_id"))
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val w = Window.partitionBy(col("cell"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
    ivfAssign(codebook, vecs, probes = 1)
      .select(col("cell"), col("vec_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= perCell)
      .select(col("cell"), col("vec_id"), col("rn"))
      .orderBy(col("cell"), col("rn"))
  }

  /** Top in-degree vectors of the directed k-NN graph over vec_id <
    * `maxId`: each vector's k cosine-nearest neighbors vote, hubs are
    * the most-voted. Output (vec_id, in_degree), top `topHubs` by
    * in-degree (ties to the smaller vec_id).
    */
  def knnHubness(vectors: DataFrame, maxId: Long, k: Int,
      topHubs: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = vectors.filter(col("vec_id") < maxId)
      .repartition(col("vec_id"))
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val q = v.select(col("vec_id").as("qid"), col("v").as("qv"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim_raw").desc, col("vec_id"))
    v.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosine(col("v"), col("qv")).as("sim_raw"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("in_degree"))
      .orderBy(col("in_degree").desc, col("vec_id"))
      .limit(topHubs)
  }

  val IvfCells = 16
  val IvfProbes = 4

  /** Corpus vectors tagged with their nearest-centroid cell id.
    * The "codebook" is the first IvfCells vectors (a deterministic
    * training sample standing in for k-means — the partitioning
    * mechanics, which are what matters for the engine, are identical).
    *
    * Assignment is fully MAP-SIDE: the codebook is collapsed to a single
    * broadcast row holding array<struct<cell, cv>>, and each vector
    * scores all cells in one projection — struct(-sim, cell) per cell,
    * sort_array (ascending on negated sim, cell breaks ties), slice to
    * the top `probes` (1 for corpus, IvfProbes for the query), explode.
    * Semantically a per-row argmax; the previous formulation (crossJoin
    * + row_number window) paid a corpus-wide shuffle keyed on vec_id for
    * the same answer.
    */
  def ivfCells(codebook: DataFrame, rows: DataFrame, probes: Int): DataFrame =
    ivfAssign(
      codebook.filter(col("vec_id") < IvfCells)
        .select(col("vec_id").as("cell"), col("v").as("cv")),
      rows, probes)

  /** Cell assignment against an explicit (cell, cv) codebook — the form
    * [[IvfStore]] reuses so corpus growth never re-derives the codebook.
    */
  def ivfAssign(codebook: DataFrame, rows: DataFrame, probes: Int): DataFrame = {
    val cb = codebook
      .select(struct(col("cell"), col("cv")).as("c"))
      .agg(collect_list(col("c")).as("cb"))
    val scored = transform(col("cb"), c =>
      struct((-cosine(col("v"), c.getField("cv"))).as("negsim"),
        c.getField("cell").as("cell")))
    rows.crossJoin(broadcast(cb))
      .select(col("vec_id"), col("v"),
        explode(slice(sort_array(scored), 1, probes)).as("sc"))
      .select(col("vec_id"), col("v"), col("sc.cell").as("cell"))
  }

  /** [[ivfAssign]] keeping the PROBE RANK of each assigned cell (pr = 1
    * is the nearest centroid) — the recall/nprobe report needs to grow
    * the probe set incrementally, and rank-filtering one ranked
    * assignment replaces re-assigning per probe width.
    */
  def ivfAssignRanked(codebook: DataFrame, rows: DataFrame,
      probes: Int): DataFrame = {
    val cb = codebook
      .select(struct(col("cell"), col("cv")).as("c"))
      .agg(collect_list(col("c")).as("cb"))
    val scored = transform(col("cb"), c =>
      struct((-cosine(col("v"), c.getField("cv"))).as("negsim"),
        c.getField("cell").as("cell")))
    rows.crossJoin(broadcast(cb))
      .select(col("vec_id"), col("v"),
        posexplode(slice(sort_array(scored), 1, probes))
          .as(Seq("pr0", "sc")))
      .select(col("vec_id"), col("v"), (col("pr0") + 1).as("pr"),
        col("sc.cell").as("cell"))
  }

  /** Recall@k of the IVF probe vs exact brute force, per probe width —
    * THE tuning report for an IVF deployment: nprobe is the one knob
    * trading cost (probed-cell population scanned per query) against
    * recall, and picking it by measurement on the real corpus is what a
    * 100 TB operator does before wiring the index into retrieval. One
    * ranked query-side assignment (probe order = centroid rank) serves
    * every width by rank-filtering; the corpus assignment (probes = 1)
    * is computed once and reused across widths; each width costs one
    * broadcast-cell join + TakeOrdered(k). At production scale the
    * exact baseline runs over a fixed query SAMPLE — recall estimation
    * never needs every query — and the per-width branches share the
    * persisted assignment exactly as here.
    */
  def ivfRecallReport(codebook: DataFrame, vectors: DataFrame,
      queryVecId: Long, k: Int, probeWidths: Seq[Int]): DataFrame = {
    val vecs = vectors.repartition(col("vec_id")).select(col("vec_id"),
      asDouble(col("embedding")).as("v"))
    val qv = vecs.filter(col("vec_id") === queryVecId)
      .select(col("v").as("qv"))
    val sim = cosine(col("v"), col("qv"))
    val exact = vecs.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"), sim.as("sim_raw"))
      .orderBy(col("sim_raw").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"))
    val corpus = ivfAssign(codebook, vecs, probes = 1)
    val qCells = ivfAssignRanked(codebook,
        vecs.filter(col("vec_id") === queryVecId), probeWidths.max)
      .select(col("v").as("qv"), col("cell"), col("pr"))
    probeWidths.sorted.map { np =>
      val cand = corpus
        .filter(col("vec_id") =!= queryVecId)
        .join(broadcast(qCells.filter(col("pr") <= np)
          .select(col("qv"), col("cell"))), Seq("cell"))
        .select(col("vec_id"), cosine(col("v"), col("qv")).as("sim_raw"))
        .orderBy(col("sim_raw").desc, col("vec_id"))
        .limit(k)
        .select(col("vec_id"))
      cand.join(exact, Seq("vec_id"))
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(np).as("nprobe"), col("n_hits"),
          round(col("n_hits").cast("double") / k, 4).as("recall"))
    }.reduce(_.unionByName(_)).orderBy(col("nprobe"))
  }

  /** IVF ANN: candidates live in the query's IvfProbes nearest cells;
    * rank candidates by exact cosine. The inverted-file structure makes
    * per-query cost proportional to the probed cells' population, not
    * the corpus — the other classic ANN layout besides LSH (q37).
    * Codebook = the oracle-pinned first-IvfCells default; for a TRAINED
    * codebook use [[ivfTopKWith]] / [[IvfStore.train]].
    */
  def ivfTopK(vectors: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val vecs = vectors.repartition(col("vec_id")).select(col("vec_id"),
      asDouble(col("embedding")).as("v"))
    val cb = vecs.filter(col("vec_id") < IvfCells)
      .select(col("vec_id").as("cell"), col("v").as("cv"))
    ivfTopKImpl(cb, vecs, queryVecId, k)
  }

  /** [[ivfTopK]] against an EXPLICIT (cell, cv) codebook — the probe for
    * a trained codebook ([[IvfStore.train]]); same plan shape, only the
    * broadcast cell centers differ.
    */
  def ivfTopKWith(codebook: DataFrame, vectors: DataFrame, queryVecId: Long,
      k: Int): DataFrame = {
    val vecs = vectors.repartition(col("vec_id")).select(col("vec_id"),
      asDouble(col("embedding")).as("v"))
    ivfTopKImpl(codebook, vecs, queryVecId, k)
  }

  private def ivfTopKImpl(codebook: DataFrame, vecs: DataFrame,
      queryVecId: Long, k: Int): DataFrame = {
    val corpus = ivfAssign(codebook, vecs, probes = 1)
    val q = ivfAssign(codebook, vecs.filter(col("vec_id") === queryVecId),
        IvfProbes)
      .select(col("v").as("qv"), col("cell"))
    val sim = cosine(col("v"), col("qv"))
    corpus
      .filter(col("vec_id") =!= queryVecId)
      .join(broadcast(q), Seq("cell"))
      .select(col("vec_id"), round(sim, 4).as("sim"), sim.as("sim_raw"))
      .orderBy(col("sim_raw").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("sim"))
  }

  // ----- Johnson-Lindenstrauss random projection (r14) -----

  /** Target dimension of the JL projection (64 → 16 on the testdata
    * embeddings: 4× cheaper per distance comparison while the JL lemma
    * bounds the squared-distance distortion — E[ratio] = 1,
    * Var = 2/k). */
  val JlK = 16

  /** MD5-derived Rademacher projection matrix: entry (r, i) is ±1/√k
    * with the sign from the parity of the first MD5 byte of "jl:r:i" —
    * engine-agnostic (the Md5HyperplaneBuckets convention), so the
    * DuckDB oracle replays the identical matrix, and any executor can
    * rebuild it from (k, d) alone. ±1 entries satisfy the JL guarantee
    * (Achlioptas 2003, "Database-friendly random projections"); unlike
    * PCA (q111) there is NO training pass — a 100 TB corpus gets its
    * projection for free, which is the practical reason this rung of
    * the dimension-reduction ladder exists. */
  def jlMatrix(k: Int = JlK, d: Int = 64): Array[Array[Double]] = {
    val scale = 1.0 / math.sqrt(k.toDouble)
    Array.tabulate(k, d) { (r, i) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val b0 = md.digest(s"jl:$r:$i".getBytes("UTF-8"))(0) & 0xff
      if (b0 % 2 == 0) scale else -scale
    }
  }

  /** Project a vector column through [[jlMatrix]] — one map-side
    * codegen'd pass per row (native MatProject), no shuffle, no state:
    * the projection composes with every ANN front end (LSH buckets,
    * IVF cells) by projecting before bucketing. */
  def jlProject(vec: Column, k: Int = JlK, d: Int = 64): Column =
    graft.functions.Fns.matProject(vec,
      jlMatrix(k, d).map(_.toSeq).toSeq)

  /** The [[jlMatrix]] projection replayed in DuckDB SQL — shared CTE
    * prefix (`v` = doubles, `p` = vec_id/a/p) for the q201/q202
    * oracles; inner sums fold ascending exactly like MatProject. */
  private def jlProjectedSql: String =
    s"""v AS (SELECT vec_id, list_transform(embedding,
                       x -> CAST(x AS DOUBLE)) AS a
              FROM embeddings),
        p AS (SELECT vec_id, a,
                list_transform(generate_series(0, ${JlK - 1}), r ->
                  list_sum(list_transform(generate_series(1, LEN(a)), i ->
                    a[i] * (CASE WHEN CAST('0x' ||
                        SUBSTR(MD5('jl:' || r || ':' || (i - 1)), 1, 2)
                        AS INT) % 2 = 0
                      THEN 0.25 ELSE -0.25 END)))) AS p
              FROM v),"""

  /** Measured JL distortion: histogram of projected/original squared-
    * L2 ratios over all pairs of the declared bounded sample
    * (`vec_id < sampleN`, C(50,2) = 1225 pairs — a broadcast-sized
    * diagnostic, like the q133/q197 recall reports; at 100 TB the
    * sample is drawn, the report shape is unchanged). Ratios are
    * rounded to 1e-4 integers BEFORE the mean so the aggregate is an
    * exact integer sum (order-independent); min/max are order-free on
    * the raw doubles. Zero-distance pairs (exact clones) are excluded —
    * ratio is undefined there and a projection preserves them
    * trivially. */
  def jlDistortionReport(vectors: DataFrame, sampleN: Int = 50,
      k: Int = JlK, d: Int = 64): DataFrame = {
    import graft.functions.Fns
    val v = vectors.filter(col("vec_id") < sampleN)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val p = v.select(col("vec_id"), col("v"),
      jlProject(col("v"), k, d).as("p"))
    val a = p.select(col("vec_id").as("d1"), col("v").as("v1"),
      col("p").as("p1"))
    val b = p.select(col("vec_id").as("d2"), col("v").as("v2"),
      col("p").as("p2"))
    val pairs = a.join(broadcast(b), col("d1") < col("d2"))
      .select(Fns.l2sqDist(col("v1"), col("v2")).as("od"),
        Fns.l2sqDist(col("p1"), col("p2")).as("pd"))
      .filter(col("od") > 0)
      .withColumn("ratio", col("pd") / col("od"))
    pairs
      .select(floor(col("ratio") * 10).cast("long").as("bucket"),
        col("ratio"),
        round(col("ratio") * 10000, 0).cast("long").as("r4"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_pairs"), sum(col("r4")).as("sr4"),
        min(col("ratio")).as("mn"), max(col("ratio")).as("mx"))
      .select(col("bucket"), col("n_pairs"),
        round(col("sr4") / (col("n_pairs") * 10000.0), 4).as("mean_ratio"),
        round(col("mn"), 4).as("min_ratio"),
        round(col("mx"), 4).as("max_ratio"))
      .orderBy(col("bucket"))
  }

  /** ANN with JL-projected candidate scoring + exact rerank: rank the
    * corpus by 16-dim projected L2 (4× fewer float ops, 4× less memory
    * traffic per comparison than the 64-dim scan), keep `candK` per
    * query, rerank those by exact 64-dim L2 — the train-free sibling
    * of the PCA rerank (q120). Candidate ranking plans through
    * TopKPerKey (filtered row_number), so ≤ candK rows per (partition,
    * query) reach the exchange; the exact vectors are fetched only for
    * the candidates. The brute scan against a broadcast query batch is
    * the exact baseline shape (q96); the banded front ends compose
    * when the corpus side is 100 TB. */
  def jlRerankTopK(vectors: DataFrame, nQueries: Int = 3,
      candK: Int = 10, k: Int = 5, jlDim: Int = JlK,
      d: Int = 64): DataFrame = {
    import graft.functions.Fns
    import org.apache.spark.sql.expressions.Window
    val v = vectors.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("p", jlProject(col("v"), jlDim, d))
    val q = v.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("p").as("qp"))
    val wCand = Window.partitionBy(col("qid"))
      .orderBy(col("pdist_raw"), col("vec_id"))
    val cand = v.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("v"), col("qv"),
        Fns.l2sqDist(col("p"), col("qp")).as("pdist_raw"))
      .withColumn("crn", row_number().over(wCand))
      .filter(col("crn") <= candK)
    val wExact = Window.partitionBy(col("qid"))
      .orderBy(col("edist_raw"), col("vec_id"))
    cand
      .select(col("qid"), col("vec_id"),
        Fns.l2sqDist(col("v"), col("qv")).as("edist_raw"))
      .withColumn("rn", row_number().over(wExact))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id"),
        round(col("edist_raw"), 4).as("dist"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }
}
