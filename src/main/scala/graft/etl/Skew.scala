package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (the 100 TB failure mode AQE's skew-join
  * splitting doesn't cover: skewed AGGREGATION keys, and joins where the
  * skewed side can't be split because the other side must be replicated).
  *
  * Both utilities use a deterministic per-row salt (hash of the whole
  * row's partition-local identity is unnecessary — any uniform spread
  * works, so we hash a cheap distinct column set). No RNG: results are
  * reproducible run to run.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(key, salt) partial aggregate
    * (spreads a hot key over `saltBuckets` reducers), then groupBy(key)
    * final merge. Caller supplies the same-shaped partial and final
    * aggregate expressions (e.g. sum/sum, count/sum).
    */
  def twoPhaseAgg(
      df: DataFrame,
      keys: Seq[String],
      saltBuckets: Int,
      saltSource: Column)(
      partial: Seq[Column],
      finalAgg: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(saltBuckets.toLong)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(finalAgg.head, finalAgg.tail: _*)
  }

  /** Salted join for a skewed LEFT side against a small-ish right side:
    * left rows get a deterministic salt in [0, saltBuckets); the right
    * side is replicated once per salt value. The join key becomes
    * (key, salt), so a hot key's rows spread over saltBuckets tasks.
    * Right-side replication costs saltBuckets x |right| — use for
    * dimension-sized right sides too big to broadcast outright.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltBuckets: Int,
      leftSaltSource: Column): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(leftSaltSource), lit(saltBuckets.toLong)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
