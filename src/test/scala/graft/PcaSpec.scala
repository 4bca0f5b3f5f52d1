package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Pca

/** Power iteration must recover a planted dominant direction, the
  * artifact must round-trip through parquet, and projection against the
  * stored artifact must be centered (zero-mean) and map-only.
  */
class PcaSpec extends AnyFunSuite with TestSpark {

  private val dim = 8

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("label", IntegerType),
    StructField("a", ArrayType(DoubleType))))

  /** Vectors = mean + s·u + small deterministic off-axis noise: the top
    * principal component is u by construction.
    */
  private def planted() = {
    val u = Array.tabulate(dim)(j => if (j == 0) 0.8 else if (j == 1) 0.6 else 0.0)
    val mean = Array.tabulate(dim)(j => 3.0 + j)
    val rows = (0 until 64).map { i =>
      val s = (i % 16) - 7.5 // spread along u, mean 0
      val noise = Array.tabulate(dim)(j => 0.01 * math.sin(i * 31 + j * 7))
      Row(i.toLong, i % 3,
        Array.tabulate(dim)(j => mean(j) + s * u(j) + noise(j)).toSeq)
    }
    (u, spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema))
  }

  test("power iteration recovers the planted top component") {
    val (u, vecs) = planted()
    val (mu, w) = Pca.powerIteration(vecs, iters = 20)
    val cos = u.zip(w).map { case (x, y) => x * y }.sum /
      math.sqrt(u.map(x => x * x).sum)
    assert(math.abs(cos) > 0.999,
      s"component misses planted direction: |cos|=${math.abs(cos)}")
    // sign canonicalization: largest-|.| coordinate is positive
    val kMax = w.indices.maxBy(j => math.abs(w(j)))
    assert(w(kMax) > 0.0)
    // mean vector is the planted mean (noise is ~1e-2 and sin-balanced)
    mu.zipWithIndex.foreach { case (m, j) =>
      assert(math.abs(m - (3.0 + j)) < 0.05, s"mu($j)=$m") }
  }

  test("one-pass gram training agrees with iterative power iteration") {
    val (u, vecs) = planted()
    val (muG, wG) = Pca.gramComponent(vecs)
    val (muI, wI) = Pca.powerIteration(vecs, iters = 20)
    val cos = wG.zip(wI).map { case (x, y) => x * y }.sum
    assert(math.abs(cos) > 0.9999,
      s"gram and iterative components disagree: cos=$cos")
    muG.zip(muI).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    val cosU = u.zip(wG).map { case (x, y) => x * y }.sum /
      math.sqrt(u.map(x => x * x).sum)
    assert(math.abs(cosU) > 0.999, s"gram component misses planted: $cosU")
  }

  test("sampled training still recovers the planted component") {
    val (u, vecs) = planted()
    val (_, w) = Pca.powerIteration(vecs, iters = 20,
      sampleFraction = 0.5, seed = 11L)
    val cos = u.zip(w).map { case (x, y) => x * y }.sum /
      math.sqrt(u.map(x => x * x).sum)
    assert(math.abs(cos) > 0.99,
      s"sampled component misses planted direction: |cos|=${math.abs(cos)}")
  }

  test("projection against the stored artifact is centered and ordered by variance") {
    val (_, vecs) = planted()
    val (mu, w) = Pca.powerIteration(vecs, iters = 20)
    val dir = java.nio.file.Files.createTempDirectory("pca").toString
    Pca.componentDf(spark, mu, w).coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val proj = Pca.projectWith(vecs, stored).collect()
    assert(proj.length == 64)
    val ps = proj.map(_.getDouble(2))
    // centered: projections sum to ~0 (artifact rounds to 8 decimals)
    assert(math.abs(ps.sum) < 1e-2, s"projections not centered: ${ps.sum}")
    // the planted spread along u is +-7.5, so the projection range
    // reflects it (|s| scale, not noise scale)
    assert(ps.max > 6.0 && ps.min < -6.0,
      s"projection range lost the planted variance: [${ps.min}, ${ps.max}]")
  }

  test("gramComponents: deflation recovers two orthogonal planted directions in order") {
    val u1 = Array.tabulate(dim)(j => if (j == 0) 0.8 else if (j == 1) 0.6 else 0.0)
    val u2 = Array.tabulate(dim)(j => if (j == 0) -0.6 else if (j == 1) 0.8 else 0.0)
    val rows = (0 until 128).map { i =>
      val s1 = ((i % 16) - 7.5) * 2.0 // dominant variance along u1
      val s2 = ((i / 16) % 8) - 3.5   // smaller variance along u2
      Row(i.toLong, 0,
        Array.tabulate(dim)(j => 5.0 + s1 * u1(j) + s2 * u2(j)).toSeq)
    }
    val vecs = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val (_, eigs, comps) = Pca.gramComponents(vecs, k = 2)
    def cosTo(u: Array[Double], w: Array[Double]) =
      math.abs(u.zip(w).map { case (x, y) => x * y }.sum)
    assert(cosTo(u1, comps(0)) > 0.999,
      s"first component should be the dominant direction: ${cosTo(u1, comps(0))}")
    assert(cosTo(u2, comps(1)) > 0.999,
      s"second component should be the deflated direction: ${cosTo(u2, comps(1))}")
    assert(eigs(0) > eigs(1) && eigs(1) > 0.0,
      s"eigenvalues out of order: ${eigs.toSeq}")
    // orthonormal
    val dot12 = comps(0).zip(comps(1)).map { case (x, y) => x * y }.sum
    assert(math.abs(dot12) < 1e-9, s"components not orthogonal: $dot12")
    // hand-checked eigenvalues: var(s1*2... ) along u1 = var of s1 seq
    val s1s = (0 until 128).map(i => ((i % 16) - 7.5) * 2.0)
    val v1 = s1s.map(x => x * x).sum / 128 - math.pow(s1s.sum / 128, 2)
    assert(math.abs(eigs(0) - v1) < 1e-6, s"lambda1 ${eigs(0)} vs planted $v1")
  }

  test("outliersWith: a planted far vector tops the distance list with z > 2") {
    val rows = (0 until 40).map { i =>
      val base = Array.tabulate(dim)(j => 1.0 + 0.01 * ((i + j) % 5))
      Row(i.toLong, 0, base.toSeq)
    } :+ Row(99L, 1, Array.fill(dim)(50.0).toSeq)
    val vecs = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val muRows = (0 until dim).map(j => (j,
      vecs.select(avg(element_at(col("a"), j + 1))).head().getDouble(0)))
    import spark.implicits._
    val centroid = muRows.toDF("j", "mu")
    val out = Pca.outliersWith(vecs, centroid)
      .orderBy(col("dist").desc).collect()
    assert(out.head.getLong(0) == 99L, s"planted outlier not first: ${out.head}")
    assert(out.head.getDouble(3) > 2.0, s"outlier z too low: ${out.head}")
    // the inliers hug the centroid: all well under the outlier distance
    assert(out.tail.forall(_.getDouble(2) < out.head.getDouble(2) / 10))
  }

  test("q120 reduced-space rerank recalls the brute-force top-10 well") {
    val d = "/root/testdata/sf0.001"
    val brute = graft.queries.Registry.queries("q36_cosine_topk")(spark, d)
      .collect().map(_.getLong(0)).toSet
    val rerank = graft.queries.Registry.queries("q120_ann_pca_rerank")(spark, d)
      .collect().map(_.getLong(0)).toSet
    val recall = (brute intersect rerank).size.toDouble / brute.size
    assert(recall >= 0.8,
      s"16-component shortlist recall too low: $recall " +
        s"(brute=$brute rerank=$rerank)")
  }

  test("projection is a map-only pass (no shuffle before the sort)") {
    val (_, vecs) = planted()
    val (mu, w) = Pca.powerIteration(vecs, iters = 5)
    val plan = Pca.projectWith(vecs, Pca.componentDf(spark, mu, w))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"projection should not shuffle:\n$plan")
  }
}
