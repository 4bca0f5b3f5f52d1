package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity

/** ANN machinery: brute-force correctness on a constructed corpus and
  * LSH recall of planted near-identical vectors.
  */
class SimilaritySpec extends AnyFunSuite with TestSpark {

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** 60 deterministic pseudo-random vectors; vec 500 is a tiny
    * perturbation of vec 1 (cosine ~0.9999). Kept as raw Scala data too,
    * so ground truth is computable without Spark.
    */
  private lazy val raw: Seq[(Long, Seq[Float])] = {
    val rng = new scala.util.Random(11)
    val base = (0L until 60L).map { i =>
      (i, Array.fill(32)(rng.nextGaussian().toFloat).toSeq)
    }
    val clone = {
      val v = base(1)._2.toArray
      v(0) = v(0) + 0.001f
      (500L, v.toSeq)
    }
    base :+ clone
  }

  private lazy val vectors = spark.createDataFrame(
    spark.sparkContext.parallelize(raw.map(Row.fromTuple), 2), schema)

  test("brute-force top-k: planted clone of query ranks first") {
    val top = Similarity.bruteForceTopK(vectors, queryVecId = 1L, k = 5).collect()
    assert(top.head.getLong(0) == 500L)
    assert(top.head.getDouble(1) > 0.999)
    // similarities sorted non-increasing
    val sims = top.map(_.getDouble(1)).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("sq8 ANN: planted clone ranks first; int8 ranking recalls exact neighbors") {
    // the clone differs from vec 1 by 0.001 in one dim — far below the
    // per-dim quantization step — so SQ8 must rank it first with a tiny
    // distance; and the quantized top-5 should recall most of the exact
    // (unquantized) L2 top-5
    val top = Similarity.sqTopK(vectors, queryVecId = 1L, k = 5).collect()
    assert(top.head.getLong(0) == 500L, s"got ${top.toSeq}")
    assert(top.head.getDouble(1) < 0.5, s"clone dist: ${top.head}")
    val sqIds = top.map(_.getLong(0)).toSet
    // exact L2 top-5 from the raw Scala data (no Spark)
    val qv = raw.find(_._1 == 1L).get._2.map(_.toDouble)
    val exact = raw.filter(_._1 != 1L)
      .map { case (id, v) =>
        id -> math.sqrt(v.map(_.toDouble).zip(qv)
          .map { case (a, b) => (a - b) * (a - b) }.sum)
      }
      .sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet
    assert((sqIds intersect exact).size >= 4,
      s"sq8 recall too low: sq=$sqIds exact=$exact")
  }

  test("sq8 store: stored query == fresh sqTopK; appended vectors clamp and rank") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sq").toString + "/sq"
    Similarity.sqBuildStore(vectors, dir)
    val qv = raw.find(_._1 == 1L).get._2.map(_.toDouble).toArray
    val stored = Similarity.sqTopKStored(spark, dir, qv, k = 5,
        excludeId = Some(1L)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val fresh = Similarity.sqTopK(vectors, queryVecId = 1L, k = 5).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(stored == fresh, s"stored $stored vs fresh $fresh")
    // append an exact clone of the query built AFTER the bounds were
    // fixed, plus a far out-of-bounds vector (its codes clamp instead
    // of overflowing the byte range)
    val extraSchema = schema
    val extra = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(900L, raw.find(_._1 == 1L).get._2),
        Row(901L, raw.find(_._1 == 1L).get._2.map(v => v * 100f))), 1),
      extraSchema)
    Similarity.sqAppendStore(extra, dir)
    val after = Similarity.sqTopKStored(spark, dir, qv, k = 3,
        excludeId = Some(1L)).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // the appended exact clone quantizes to the query's own codes —
    // dist 0.0, tied with the fixture's sub-quantization-step near-clone
    // (500), ties broken by vec_id
    assert(after.take(2).map(_._1).toSet == Set(500L, 900L)
      && after.take(2).forall(_._2 == 0.0), s"got ${after.toSeq}")
    val codes = spark.read.parquet(s"$dir/codes")
      .filter(org.apache.spark.sql.functions.col("vec_id") === 901L)
      .head().getSeq[Int](1)
    assert(codes.forall(c => c >= 0 && c <= 255), s"clamp failed: $codes")
  }

  test("LSH ANN: near-identical vector lands in a shared bucket (recall)") {
    val ann = Similarity.annTopK(vectors, queryVecId = 1L, k = 5).collect()
    assert(ann.nonEmpty, "no LSH candidates at all")
    assert(ann.head.getLong(0) == 500L,
      s"clone not retrieved; got ${ann.map(_.getLong(0)).mkString(",")}")
  }

  test("IVF ANN: planted clone shares the query's probed cells (recall)") {
    val ivf = Similarity.ivfTopK(vectors, queryVecId = 1L, k = 5).collect()
    assert(ivf.nonEmpty, "no IVF candidates at all")
    // the near-identical vector maps to the same nearest centroid as the
    // query, so with IvfProbes >= 1 it must be retrieved and rank first
    assert(ivf.head.getLong(0) == 500L,
      s"clone not retrieved; got ${ivf.map(_.getLong(0)).mkString(",")}")
    val sims = ivf.map(_.getDouble(1)).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("trained IVF codebook: recall >= the first-16 sample codebook") {
    import org.apache.spark.sql.DataFrame
    import graft.llm.IvfStore
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var sxy = 0.0; var sxx = 0.0; var syy = 0.0
      var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        sxy += x * y; sxx += x * x; syy += y * y; i += 1
      }
      sxy / (math.sqrt(sxx) * math.sqrt(syy))
    }
    val queries = (0L until 10L)
    val k = 5
    // exact top-k ground truth computed independently in plain Scala
    def truth(q: Long): Set[Long] = {
      val qv = raw.find(_._1 == q).get._2
      raw.filter(_._1 != q)
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, s) => (-s, id) }
        .take(k).map(_._1).toSet
    }
    def recall(cb: Option[DataFrame]): Double = {
      val hits = queries.map { q =>
        val got = cb.fold(Similarity.ivfTopK(vectors, q, k))(
            c => Similarity.ivfTopKWith(c, vectors, q, k))
          .collect().map(_.getLong(0)).toSet
        (got intersect truth(q)).size
      }.sum
      hits.toDouble / (k * queries.size)
    }
    val first16 = recall(None)
    val trained = IvfStore.train(vectors, k = Similarity.IvfCells, iters = 5)
    val trainedRecall = recall(Some(trained))
    assert(trainedRecall >= first16,
      s"trained recall $trainedRecall < first-16 sample recall $first16")
    // the planted clone is still retrieved through the trained codebook
    val top = Similarity.ivfTopKWith(trained, vectors, 1L, 5).collect()
    assert(top.head.getLong(0) == 500L,
      s"clone not retrieved through trained codebook: ${top.map(_.getLong(0)).mkString(",")}")
  }

  test("sample-trained IVF codebook: recall within tolerance of full training") {
    import org.apache.spark.sql.DataFrame
    import graft.llm.IvfStore
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var sxy = 0.0; var sxx = 0.0; var syy = 0.0
      var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        sxy += x * y; sxx += x * x; syy += y * y; i += 1
      }
      sxy / (math.sqrt(sxx) * math.sqrt(syy))
    }
    val queries = (0L until 10L)
    val k = 5
    def truth(q: Long): Set[Long] = {
      val qv = raw.find(_._1 == q).get._2
      raw.filter(_._1 != q)
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, s) => (-s, id) }
        .take(k).map(_._1).toSet
    }
    def recall(cb: DataFrame): Double = {
      val hits = queries.map { q =>
        val got = Similarity.ivfTopKWith(cb, vectors, q, k)
          .collect().map(_.getLong(0)).toSet
        (got intersect truth(q)).size
      }.sum
      hits.toDouble / (k * queries.size)
    }
    // k=8 keeps the cells-to-sample ratio honest on the 61-vector
    // fixture: a 50% sample must still hold several vectors per cell
    // for sampled centroids to be meaningful (the real-scale regime —
    // cells ~ sqrt(corpus) — has thousands per cell at any practical
    // sampleFraction)
    val full = IvfStore.train(vectors, k = 8, iters = 5)
    val sampled = IvfStore.train(vectors, k = 8, iters = 5,
      sampleFraction = 0.5)
    // centroids came from half the corpus, so recall may dip — but on
    // the planted-clone fixture it must stay within tolerance of full
    // training (the 100 TB contract: sample-trained centroids still
    // tile the data)
    val fullRecall = recall(full)
    val sampledRecall = recall(sampled)
    assert(sampledRecall >= fullRecall - 0.1,
      s"sampled recall $sampledRecall too far below full $fullRecall")
    // the clone still lands next to its original through sampled centroids
    val top = Similarity.ivfTopKWith(sampled, vectors, 1L, 5).collect()
    assert(top.head.getLong(0) == 500L,
      s"clone not retrieved through sample-trained codebook: ${top.map(_.getLong(0)).mkString(",")}")
    // seeded sampling is deterministic: same inputs, same codebook
    val again = IvfStore.train(vectors, k = 8, iters = 5,
      sampleFraction = 0.5)
    val a = sampled.collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val b = again.collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    assert(a == b, "sample-trained codebook not reproducible")
  }

  test("IVF probes bound the candidate set (not the whole corpus)") {
    import org.apache.spark.sql.functions.col
    val vecs = vectors.select(col("vec_id"),
      Similarity.asDouble(col("embedding")).as("v"))
    val corpusCells = Similarity.ivfCells(vecs, vecs, probes = 1)
    // every vector lands in exactly one cell, and cells partition the corpus
    assert(corpusCells.count() == vectors.count())
    assert(corpusCells.select("vec_id").distinct().count() == vectors.count())
  }

  test("IVF cell assignment is map-side: no corpus shuffle in the plan") {
    import org.apache.spark.sql.functions.col
    val vecs = vectors.select(col("vec_id"),
      Similarity.asDouble(col("embedding")).as("v"))
    val corpusCells = Similarity.ivfCells(vecs, vecs, probes = 1)
    corpusCells.collect()
    val plan = corpusCells.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the only allowed exchange is the codebook's SinglePartition collapse
    // (16 rows feeding a broadcast); the corpus side must not shuffle
    assert(!plan.contains("Exchange hashpartitioning"),
      s"corpus-wide shuffle in IVF assignment:\n$plan")
    assert(!plan.contains("Window"), s"window sort survived:\n$plan")
  }

  test("batched ANN through the LSH index: recall matches single-probe, no cartesian") {
    import org.apache.spark.sql.functions._
    val queries = vectors.filter(col("vec_id").isin(1L, 2L))
      .select(col("vec_id").as("qid"),
        Similarity.asDouble(col("embedding")).as("qv"))
    val batched = Similarity.batchAnnTopK(vectors, queries, k = 5)
    val rows = batched.collect()
    // the planted clone must top qid=1's list — same recall bar as the
    // single-probe annTopK test
    val q1 = rows.filter(_.getLong(0) == 1L).sortBy(_.getInt(3))
    assert(q1.nonEmpty, "no candidates for qid=1")
    assert(q1.head.getLong(1) == 500L,
      s"clone not retrieved for qid=1; got ${q1.map(_.getLong(1)).mkString(",")}")
    assert(q1.head.getDouble(2) > 0.999)
    // both queries produced ranked, non-increasing lists
    Seq(1L, 2L).foreach { qid =>
      val sims = rows.filter(_.getLong(0) == qid).sortBy(_.getInt(3))
        .map(_.getDouble(2)).toSeq
      assert(sims == sims.sorted.reverse, s"qid=$qid not ranked: $sims")
    }
    // candidates come from bucket joins, never corpus x batch
    val plan = batched.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"nested-loop join in plan:\n$plan")
  }

  test("embedding near-dup pairs via LSH: planted clone found, pairs verified, no cartesian") {
    import org.apache.spark.sql.functions._
    val pairs = Similarity.embeddingNearDupPairs(vectors, minCos = 0.9)
    val rows = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the planted near-identical pair (1, 500) must collide in some bucket
    assert(rows.exists(p => p._1 == 1L && p._2 == 500L && p._3 > 0.999),
      s"planted pair missed: ${rows.mkString(",")}")
    // every emitted pair is verified (>= threshold) and canonical
    assert(rows.forall(p => p._3 >= 0.9 && p._1 < p._2))
    // exact pairwise ground truth at the same threshold: LSH output must
    // be a subset (banding can miss, never invent)
    val v = vectors.select(col("vec_id"), Similarity.asDouble(col("embedding")).as("a"))
    val exact = v.select(col("vec_id").as("v1"), col("a").as("pa"))
      .join(broadcast(v.select(col("vec_id").as("v2"), col("a").as("qa"))),
        col("v1") < col("v2"))
      .filter(Similarity.cosine(col("pa"), col("qa")) >= 0.9)
      .select(col("v1"), col("v2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.map(p => (p._1, p._2)).toSet.subsetOf(exact))
    val plan = pairs.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in plan:\n$plan")
  }

  test("MD5-plane LSH ANN: planted clone retrieved (same recall bar as splitmix)") {
    val ann = Similarity.md5AnnTopK(vectors, queryVecId = 1L, k = 5).collect()
    assert(ann.nonEmpty, "no MD5-LSH candidates at all")
    assert(ann.head.getLong(0) == 500L,
      s"clone not retrieved; got ${ann.map(_.getLong(0)).mkString(",")}")
    assert(ann.head.getDouble(1) > 0.999)
  }

  test("MD5-plane near-dup pairs: planted pair found, subset of exact ground truth") {
    import org.apache.spark.sql.functions._
    val pairs = Similarity.md5NearDupPairs(vectors, minCos = 0.9)
    val rows = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.exists(p => p._1 == 1L && p._2 == 500L && p._3 > 0.999),
      s"planted pair missed: ${rows.mkString(",")}")
    val v = vectors.select(col("vec_id"), Similarity.asDouble(col("embedding")).as("a"))
    val exact = v.select(col("vec_id").as("v1"), col("a").as("pa"))
      .join(broadcast(v.select(col("vec_id").as("v2"), col("a").as("qa"))),
        col("v1") < col("v2"))
      .filter(Similarity.cosine(col("pa"), col("qa")) >= 0.9)
      .select(col("v1"), col("v2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.map(p => (p._1, p._2)).toSet.subsetOf(exact))
  }

  test("MD5-plane batched ANN agrees with per-query MD5 ANN") {
    import org.apache.spark.sql.functions._
    val qids = Seq(0L, 1L, 2L)
    val queries = vectors.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"),
        Similarity.asDouble(col("embedding")).as("qv"))
    val batch = Similarity.md5BatchAnnTopK(vectors, queries, k = 3)
      .collect().groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.sortBy(_.getInt(3)).map(r => (r.getLong(1), r.getDouble(2))).toSeq
      }
    qids.foreach { q =>
      val single = Similarity.md5AnnTopK(vectors, q, k = 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch.getOrElse(q, Seq.empty) == single,
        s"batch != single-probe for qid=$q")
    }
  }

  test("near-dup bucket self-join ships no vectors (slim id-only exchange)") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val pairs = Similarity.embeddingNearDupPairs(vectors, minCos = 0.9)
    val plan = pairs.queryExecution.optimizedPlan
    val bucketJoins = plan.collect {
      case j: Join
          if j.condition.exists(_.references.exists(_.name == "bucket")) => j
    }
    assert(bucketJoins.nonEmpty, s"no bucket join in plan:\n$plan")
    bucketJoins.foreach { j =>
      val arrayCols = j.children.flatMap(_.output)
        .filter(_.dataType.isInstanceOf[ArrayType])
      assert(arrayCols.isEmpty,
        s"array<double> vectors ride the bucket-join exchange: $arrayCols")
    }
  }

  test("LSH candidates are a subset of the corpus, no self-match") {
    val ids = Similarity.annTopK(vectors, queryVecId = 1L, k = 50)
      .collect().map(_.getLong(0)).toSet
    assert(!ids.contains(1L))
    assert(ids.subsetOf((0L until 60L).toSet + 500L))
  }
  test("semantic dedup: near-identical vectors share a cell and a component") {
    // random vectors: cross-pair cosines hover near 0, so at minCos 0.95
    // ONLY the planted near-clone pair (1, 500) survives — and identical
    // argmax assignment puts them in the same trained cell by
    // construction
    val cb = graft.llm.IvfStore.train(vectors, k = 8, iters = 2)
    val groups = Similarity.semanticDedupGroups(cb, vectors, minCos = 0.95)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups == Map(1L -> 1L, 500L -> 1L),
      s"expected exactly the planted pair clustered, got $groups")
  }

  // two antipodal clusters with aligned labels, plus their exact centers
  // as an explicit (cell, cv) codebook — assignment, purity, and quota
  // behavior are all hand-checkable
  private lazy val labeledTwoClusters: (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame) = {
    val rng = new scala.util.Random(7)
    val a = Array.fill(16)(rng.nextGaussian().toFloat)
    val b = a.map(x => -x)
    def jitter(base: Array[Float]) =
      base.map(x => x + 0.01f * rng.nextGaussian().toFloat).toSeq
    val schemaL = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val rows = (0L until 20L).map(i => Row(i, jitter(a), 0)) ++
      (20L until 40L).map(i => Row(i, jitter(b), 1))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schemaL)
    val cbSchema = StructType(Seq(
      StructField("cell", LongType),
      StructField("cv", ArrayType(DoubleType))))
    val cbRows = Seq(Row(0L, a.map(_.toDouble).toSeq),
      Row(1L, b.map(_.toDouble).toSeq))
    val cb = spark.createDataFrame(
      spark.sparkContext.parallelize(cbRows, 1), cbSchema)
    (df, cb)
  }

  test("cluster profile: separated clusters -> full purity, high cohesion") {
    val (df, cb) = labeledTwoClusters
    val prof = Similarity.clusterProfile(cb, df)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getInt(3), r.getDouble(4))).toMap
    assert(prof.keySet == Set(0L, 1L))
    prof.foreach { case (cell, (n, avgSim, topLabel, purity)) =>
      assert(n == 20L, s"cell $cell size $n")
      assert(avgSim > 0.99, s"cell $cell cohesion $avgSim")
      assert(topLabel == cell.toInt)
      assert(purity == 1.0)
    }
  }

  test("cluster-balanced sample: exact quota per cell, deterministic draw") {
    val (df, cb) = labeledTwoClusters
    val s1 = Similarity.clusterBalancedSample(cb, df, perCell = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(s1.groupBy(_._1).view.mapValues(_.length).toMap ==
      Map(0L -> 5, 1L -> 5))
    // each sampled vec came from its true cluster's id range
    s1.foreach { case (cell, id, _) =>
      assert(if (cell == 0L) id < 20L else id >= 20L) }
    // no vec sampled twice; rn is 1..quota within each cell
    assert(s1.map(_._2).distinct.length == s1.length)
    assert(s1.filter(_._1 == 0L).map(_._3).sorted.toSeq == (1 to 5))
    // the md5 draw is a pure function of vec_id: re-run is identical
    val s2 = Similarity.clusterBalancedSample(cb, df, perCell = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(s1.toSeq == s2.toSeq)
  }

  test("silhouette: separated antipodal clusters score near 1") {
    val (df, cb) = labeledTwoClusters
    val sil = Similarity.silhouette(cb, df).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(sil.keySet == Set(0L, 1L))
    sil.foreach { case (cell, (n, avg, mn)) =>
      // jittered copies of ±a: a(i) ~ 0, b(i) ~ 2 (antipodal) -> s ~ 1
      assert(n == 20L, s"cell $cell size $n")
      assert(avg > 0.95, s"cell $cell avg_sil $avg")
      assert(mn > 0.9, s"cell $cell min_sil $mn")
    }
  }

  test("silhouette: hand geometry — on-centroid s=1, equidistant s=0") {
    val schemaV = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val rows = Seq(
      Row(0L, Seq(1f, 0f)), // == centroid 0: a=0, b=1 -> s=1
      Row(1L, Seq(1f, 1f)), // equidistant: tie -> cell 0, a=b -> s=0
      Row(2L, Seq(0f, 1f))) // == centroid 1: s=1
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schemaV)
    val cbSchema = StructType(Seq(
      StructField("cell", LongType),
      StructField("cv", ArrayType(DoubleType))))
    val cb = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(0L, Seq(1.0, 0.0)), Row(1L, Seq(0.0, 1.0))), 1), cbSchema)
    val sil = Similarity.silhouette(cb, df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toList.sortBy(_._1)
    // cell 0: {v0 s=1, v1 s=0} -> n=2, avg=0.5, min=0; cell 1: n=1, s=1
    assert(sil == List((0L, 2L, 0.5, 0.0), (1L, 1L, 1.0, 1.0)), s"$sil")
  }

  test("knn hubness: every query votes k times, hubs sorted by in-degree") {
    val out = Similarity.knnHubness(vectors, maxId = 100L, k = 3,
      topHubs = 1000).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // 60 queries x 3 votes land somewhere; the clone 500 is outside maxId
    assert(out.map(_._2).sum == 180L)
    val degs = out.map(_._2).toSeq
    assert(degs == degs.sorted.reverse)
    assert(out.map(_._1).toSet.subsetOf((0L until 60L).toSet))
  }

  test("ivf recall report: recall monotone in nprobe, full probe is exact") {
    val cb = graft.llm.IvfStore.train(vectors, k = 8, iters = 3)
    val rep = Similarity.ivfRecallReport(cb, vectors, queryVecId = 1L,
        k = 5, probeWidths = Seq(1, 2, 4, 8)).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rep.map(_._1).toSeq == Seq(1, 2, 4, 8))
    // recall in [0,1], non-decreasing as the probe set grows
    val recalls = rep.map(_._3).toSeq
    assert(recalls.forall(r => r >= 0.0 && r <= 1.0), s"$recalls")
    assert(recalls == recalls.sorted, s"recall not monotone: $recalls")
    // probing EVERY cell scans the whole corpus -> IVF == brute force
    assert(recalls.last == 1.0, s"full probe must be exact: $recalls")
    // n_hits consistent with recall at k = 5
    rep.foreach { case (_, n, r) => assert(r == n / 5.0) }
  }

  test("JL matrix: deterministic ±1/√k Rademacher entries, balanced signs") {
    val m = Similarity.jlMatrix(k = 8, d = 32)
    assert(m.map(_.toSeq).toSeq ==
      Similarity.jlMatrix(k = 8, d = 32).map(_.toSeq).toSeq)
    val s = 1.0 / math.sqrt(8.0)
    val flat = m.flatten
    assert(flat.forall(v => v == s || v == -s))
    // MD5 parity signs must not be degenerate (all one sign would make
    // the projection a scaled sum, collapsing distances)
    val pos = flat.count(_ > 0)
    assert(pos > flat.length / 4 && pos < 3 * flat.length / 4,
      s"signs degenerate: $pos of ${flat.length}")
  }

  test("JL distortion report: full pair count, ratios concentrate near 1") {
    val rep = Similarity.jlDistortionReport(vectors, sampleN = 1000,
      k = 8, d = 32).collect()
    // fixture ids 0..59 + 500, all < 1000 -> C(61,2) = 1830 pairs, none
    // at distance zero
    val n = rep.map(_.getLong(1)).sum
    assert(n == 1830L, s"pair count: $n")
    rep.foreach { r =>
      assert(r.getDouble(2) >= r.getDouble(3) - 1e-9 &&
        r.getDouble(2) <= r.getDouble(4) + 1e-9,
        s"mean outside [min,max]: $r")
    }
    // E[ratio] = 1 (JL): the weighted mean over all pairs lands near 1,
    // and most mass sits in ratio [0.5, 1.5) (Var = 2/k = 0.25 at k=8)
    val mean = rep.map(r => r.getDouble(2) * r.getLong(1)).sum / n
    assert(mean > 0.85 && mean < 1.15, s"overall mean ratio: $mean")
    val near = rep.filter(r => r.getLong(0) >= 5 && r.getLong(0) <= 14)
      .map(_.getLong(1)).sum
    assert(near >= n * 6 / 10, s"mass near 1: $near of $n")
  }

  test("JL rerank: planted clone tops its query; dists exact and sorted") {
    val df = Similarity.jlRerankTopK(vectors, nQueries = 3, candK = 10,
      k = 5, jlDim = 8, d = 32)
    val top = df.collect()
    // the Scaladoc's claim: candidate ranking plans through TopKPerKey,
    // so <= candK rows per (partition, query) reach the exchange
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"),
      s"candidate cut must plan through TopKPerKey:\n$plan")
    assert(top.length == 15, s"3 queries x 5: ${top.length}")
    // clone 500 differs from vec 1 in ONE coordinate by 0.001; a
    // Rademacher projection maps that to ±0.001/√k per output dim, so
    // the projected distance is ~0 too — it must survive the candidate
    // cut and win the exact rerank
    val q1 = top.filter(_.getLong(0) == 1L).sortBy(_.getInt(3))
    assert(q1.head.getLong(1) == 500L, s"q1 top: ${q1.toSeq}")
    assert(q1.head.getDouble(2) < 0.01)
    top.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ds = rows.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(ds == ds.sorted, s"dists not ascending: $ds")
      assert(rows.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
    }
  }
}
