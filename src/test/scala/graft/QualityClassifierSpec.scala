package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.QualityClassifier

/** The learned quality scorer must actually learn: on a linearly
  * separable planted corpus the trained weights must classify both
  * classes correctly, and scoring must stay a broadcast map-only pass.
  */
class QualityClassifierSpec extends AnyFunSuite with TestSpark {

  private val schema = StructType(Seq(StructField("doc_id", LongType),
    StructField("lang", StringType), StructField("text", StringType)))

  // "good" docs: long, stopword-rich; "bad" docs: short, stopword-free
  private def corpus() = {
    val good = (0L until 20L).map(i =>
      Row(i, "en", (Seq("the", "a") ++ Seq.fill(58)("spark")).mkString(" ")))
    val bad = (20L until 40L).map(i =>
      Row(i, "de", Seq.fill(12)("batch").mkString(" ")))
    spark.createDataFrame(
      spark.sparkContext.parallelize(good ++ bad, 4), schema)
  }

  test("gradient descent separates a separable corpus") {
    val feats = QualityClassifier.features(corpus(), col("lang") === "en")
    val w = QualityClassifier.train(feats, iters = 200, lr = 4.0)
    val scored = QualityClassifier
      .scoreWith(feats, QualityClassifier.weightsDf(spark, w))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(3)))
    val acc = scored.count { case (_, y, pred) => y == pred }.toDouble /
      scored.length
    assert(acc == 1.0, s"separable corpus not separated (acc=$acc), w=" +
      w.mkString(","))
    // and the learned direction is interpretable: more words -> higher p
    assert(w(1) > 0.0, s"n_words weight should be positive: ${w.mkString(",")}")
  }

  test("sampled training matches full-corpus accuracy on the planted corpus") {
    val feats = QualityClassifier.features(corpus(), col("lang") === "en")
    val w = QualityClassifier.train(feats, iters = 200, lr = 4.0,
      sampleFraction = 0.6, seed = 7L)
    val scored = QualityClassifier
      .scoreWith(feats, QualityClassifier.weightsDf(spark, w))
      .collect().map(r => (r.getInt(1), r.getInt(3)))
    val acc = scored.count { case (y, pred) => y == pred }.toDouble /
      scored.length
    assert(acc == 1.0, s"sampled training failed to separate (acc=$acc)")
  }

  test("scoring is a broadcast map-only pass over the corpus") {
    val feats = QualityClassifier.features(corpus(), col("lang") === "en")
    val w = QualityClassifier.weightsDf(spark, Array(0.1, 0.2, 0.3, 0.4))
    val plan = QualityClassifier.scoreWith(feats, w)
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"1-row weight artifact should broadcast:\n$plan")
    assert(!plan.contains("ShuffleExchange"),
      s"scoring must not shuffle the corpus:\n$plan")
  }

  test("calibration bins: counts conserve and rates separate on the planted corpus") {
    import org.apache.spark.sql.functions.{avg => favg, col => fcol}
    val feats = QualityClassifier.features(corpus(), fcol("lang") === "en")
    val w = QualityClassifier.train(feats, iters = 200, lr = 4.0)
    val bins = QualityClassifier
      .scoreWith(feats, QualityClassifier.weightsDf(spark, w))
      .withColumn("bin",
        org.apache.spark.sql.functions.least(
          org.apache.spark.sql.functions.floor(fcol("p_score") * 10),
          org.apache.spark.sql.functions.lit(9)).cast("int"))
      .groupBy("bin")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        favg("y").as("y_rate"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    // every doc lands in exactly one bin
    assert(bins.map(_._2).sum == 40)
    // on a separated corpus the top bin is pure positive, the bottom pure
    // negative
    val byBin = bins.sortBy(_._1)
    assert(byBin.head._3 == 0.0, s"lowest bin should be all-negative: ${byBin.toSeq}")
    assert(byBin.last._3 == 1.0, s"highest bin should be all-positive: ${byBin.toSeq}")
  }

  test("aucWith: separable corpus scores AUC 1.0; constant scores midrank to 0.5") {
    val feats = QualityClassifier.features(corpus(), col("lang") === "en")
    val w = QualityClassifier.train(feats, iters = 200, lr = 4.0)
    val sep = QualityClassifier
      .aucWith(feats, QualityClassifier.weightsDf(spark, w))
      .collect().head
    assert(sep.getLong(0) == 20L && sep.getLong(1) == 20L)
    assert(sep.getDouble(2) == 1.0, s"separable AUC: ${sep.getDouble(2)}")
    // all-zero weights -> identical scores everywhere -> tie-aware
    // midranks must yield exactly 0.5, not 0 or 1
    val flat = QualityClassifier
      .aucWith(feats,
        QualityClassifier.weightsDf(spark, Array(0.0, 0.0, 0.0, 0.0)))
      .collect().head
    assert(flat.getDouble(2) == 0.5, s"tied AUC: ${flat.getDouble(2)}")
  }
}
