package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
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

  /** Array<float> -> array<double>, elementwise. */
  def asDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Sequential-fold dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm of an array<double> column. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  val LshTables = 8
  val LshBitsPerTable = 8
  private val MaxDim = 512

  /** Deterministic pseudo-random hyperplane components in [-1, 1),
    * PRECOMPUTED on the driver (splitmix64 of (plane, dim)) and embedded
    * as array literals — the executor does one multiply per dimension
    * instead of re-hashing (plane, dim) per row.
    */
  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def plane(p: Int): Seq[Double] =
    (0 until MaxDim).map { i =>
      (math.floorMod(splitmix64(p.toLong * MaxDim + i), 2000L).toDouble / 1000.0) - 1.0
    }

  /** Sign bit (at position `bit`) of the projection onto deterministic
    * hyperplane `p` (vectors shorter than MaxDim use its prefix). */
  private def lshBit(vec: Column, p: Int, bit: Int): Column = {
    // slice the plane to the vector's length: zip_with pads the shorter
    // side with nulls, which would null out the whole projection
    val proj = aggregate(
      zip_with(vec, slice(typedlit(plane(p)), lit(1), size(vec)), (x, w) => x * w),
      lit(0.0), (acc, v) => acc + v)
    when(proj >= 0, shiftleft(lit(1), bit)).otherwise(lit(0))
  }

  /** Random-hyperplane bucket id for LSH table `table` (an
    * LshBitsPerTable-bit signature over that table's planes). Map-side
    * only: a per-row array fold, no shuffle, no model state.
    */
  def lshBucket(vec: Column, table: Int): Column =
    (0 until LshBitsPerTable)
      .map(b => lshBit(vec, table * LshBitsPerTable + b, b))
      .reduce((a, c) => a.bitwiseOR(c))

  /** One row per (vec, table) with that table's bucket — candidates for a
    * query are the union over tables of its buckets (standard multi-table
    * LSH: recall compounds across tables, cost stays bucket-sized).
    */
  def lshBuckets(vecs: DataFrame): DataFrame =
    vecs.select(col("vec_id"), col("v"),
      posexplode(array((0 until LshTables).map(t => lshBucket(col("v"), t)): _*))
        .as(Seq("tbl", "bucket")))

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
  def annTopK(vectors: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    // repartition before the per-row projection folds: the embeddings
    // table is a single parquet row group, and the LshTables*LshBits
    // hyperplane projections would otherwise run on one core
    val vecs = vectors.repartition(col("vec_id")).select(col("vec_id"),
      asDouble(col("embedding")).as("v"))
    val banded = lshBuckets(vecs)
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
      None)
  )
}
