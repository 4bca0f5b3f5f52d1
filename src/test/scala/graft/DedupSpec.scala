package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Dedup

/** Near-dup machinery: MinHash LSH candidates vs exact Jaccard ground
  * truth, SimHash behavior, and the no-cartesian scale guarantee.
  */
class DedupSpec extends AnyFunSuite with TestSpark {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  /** 40 base docs + near-identical variants of the first 5. */
  private lazy val docs = {
    val rng = new scala.util.Random(7)
    val vocab = Vector("spark", "query", "table", "row", "scan", "join",
      "hash", "sort", "data", "batch", "window", "merge", "filter", "agg")
    def text(): String = Seq.fill(60)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    val base = (0L until 40L).map(i => (i, text()))
    val nearDups = base.take(5).map { case (i, t) =>
      // mutate one token near the end -> jaccard stays ~0.95
      (100L + i, t.split(' ').updated(55, "mutated").mkString(" "))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize((base ++ nearDups).map(Row.fromTuple), 2),
      schema)
  }

  test("minhash LSH finds planted near-duplicates, no all-pairs scan") {
    val cands = Dedup.minhashCandidates(docs, minEstJaccard = 0.5)
    val pairs = cands.select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 5L).foreach { i =>
      assert(pairs.contains((i, 100L + i)), s"missed planted pair ($i, ${100 + i})")
    }
    // and a known-FAR pair (independent random docs) must not appear —
    // the behavioral pin that keeps the rows-only q33 honest
    assert(!pairs.contains((10L, 20L)) && !pairs.contains((20L, 10L)),
      s"independent docs paired: ${pairs.take(20)}")
    // scale guarantee: candidate generation must be a shuffle join on
    // (band, band_hash), never a cartesian product
    val plan = cands.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in plan:\n$plan")
  }

  test("minhash est_jaccard correlates with ground truth on planted pairs") {
    val cands = Dedup.minhashCandidates(docs, minEstJaccard = 0.5)
      .filter(col("d2") >= 100)
    val est = cands.collect().map(r => r.getDouble(2))
    assert(est.nonEmpty && est.forall(_ >= 0.5))
  }

  test("simhash: identical docs hamming 0; near-dups small; distinct docs large") {
    val sig = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 5L).foreach { i =>
      val h = java.lang.Long.bitCount(sig(i) ^ sig(100L + i))
      assert(h <= 10, s"near-dup pair ($i) hamming $h")
    }
    val far = java.lang.Long.bitCount(sig(10L) ^ sig(20L))
    assert(far > 5, s"independent docs implausibly close: $far")
  }

  test("minhash recalls every exact near-dup pair in the real testdata") {
    // Deterministic end-to-end recall check at sf0.001: every pair the
    // exact n-gram Jaccard query reports at >= 0.8 must appear among the
    // banded MinHash candidates (est >= 0.5).
    val sf = "/root/testdata/sf0.001"
    val exact = graft.queries.Registry.queries("q32_ngram_jaccard")(spark, sf)
      .collect().filter(_.getDouble(2) >= 0.8)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cands = graft.queries.Registry.queries("q33_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "testdata lost its planted near-dups?")
    assert(exact.subsetOf(cands),
      s"missed ${exact -- cands} of ${exact.size} exact pairs")
  }

  test("incremental candidates: new batch probes a persisted corpus index") {
    // corpus = the 40 base docs, banded ONCE (simulating a stored index);
    // the new batch holds the 5 near-dup variants and must find its
    // originals without the corpus being re-signed.
    val base = docs.filter(col("doc_id") < 100)
    val corpusIndex = Dedup.minhashBands(base)
    val newBatch = docs.filter(col("doc_id") >= 100)
    val pairs = Dedup.incrementalCandidates(newBatch, corpusIndex, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 5L).foreach { i =>
      assert(pairs.contains((100L + i, i)),
        s"missed planted pair (${100 + i}, $i) in $pairs")
    }
  }

  test("hot-shingle df cap bounds the inverted index's worst key") {
    // 300 docs that all open with the same boilerplate phrase: uncapped,
    // each boilerplate shingle is one join key producing C(300,2) ~ 45k
    // rows — the 100 TB skew-killer. Two of the docs are true near-dups
    // of each other; their discriminating shingles are rare and must
    // survive the cap.
    val rng = new scala.util.Random(13)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron")
    def body(): String = Seq.fill(40)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    val boiler = "terms of service apply here"
    val base = (0L until 300L).map(i => (i, s"$boiler ${body()}"))
    val nearDup = {
      val t = base(7)._2.split(' ').updated(30, "mutated").mkString(" ")
      (900L, t)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize((base :+ nearDup).map(Row.fromTuple), 4),
      schema)

    val maxDf = 64
    val idx = Dedup.invertedShingleIndex(df, maxDf)
    val worstDf = idx.groupBy(col("s")).count()
      .agg(max(col("count"))).collect().head.getLong(0)
    assert(worstDf <= maxDf,
      s"a shingle with df=$worstDf survived the cap — m^2 join-row skew at scale")

    // the boilerplate shingles (df=301) must be gone, so per-key join
    // fan-out is bounded by maxDf^2 instead of corpus^2
    val pairs = Dedup.hashJaccardPairs(df, minJaccard = 0.6, maxDf = maxDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists(p => p._1 == 7L && p._2 == 900L && p._3 >= 0.8),
      s"planted near-dup lost under the cap: ${pairs.mkString(",")}")
    // boilerplate alone must NOT make unrelated docs near-dups
    assert(pairs.forall(p => (p._1, p._2) == (7L, 900L)),
      s"boilerplate-only pairs leaked through: ${pairs.mkString(",")}")
  }

  test("containment flags a short doc embedded in a long one; jaccard misses it") {
    // doc 2 = doc 1's 12 tokens + 48 tokens of filler: every shingle of
    // doc 1 appears in doc 2 (cont_fwd = 1.0) but the union is dominated
    // by filler, so jaccard ~ 10/58 << any useful threshold
    val rng = new scala.util.Random(13)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val short = Seq.fill(12)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    val filler = Seq.fill(48)("pad" + rng.nextInt(40)).mkString(" ")
    val fx = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, short), Row(2L, s"$short $filler"),
        Row(3L, Seq.fill(30)("unrelated" + rng.nextInt(30)).mkString(" "))), 2),
      schema)
    val pairs = Dedup.containmentPairs(fx, minContainment = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(pairs.length === 1)
    val (d1, d2, fwd, rev) = pairs.head
    assert((d1, d2) === (1L, 2L))
    assert(fwd === 1.0) // all of doc 1's shingles are inside doc 2
    assert(rev < 0.5)   // doc 2 is mostly NOT doc 1
    // the symmetric measure misses this pair at the same threshold
    val jac = Dedup.hashJaccardPairs(fx, minJaccard = 0.5)
      .collect()
    assert(jac.isEmpty)
  }

  test("winnowing: a shared >= k+w-1 token run guarantees a shared fingerprint") {
    val rng = new scala.util.Random(29)
    def filler(n: Int, tag: String) =
      Seq.fill(n)(tag + rng.nextInt(1000)).mkString(" ")
    // an 8-token run (> k+w-1 = 6) planted inside otherwise-disjoint docs
    val run = "shared tokens appear in this exact common run"
    val fx = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, s"${filler(20, "a")} $run ${filler(20, "b")}"),
        Row(2L, s"${filler(25, "c")} $run ${filler(15, "d")}"),
        Row(3L, filler(50, "e"))), 2),
      schema)
    val fps = Dedup.winnowedFingerprints(fx)
    val byDoc = fps.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // the Schleimer guarantee: docs 1 and 2 share at least one selected
    // fingerprint; the disjoint doc 3 shares none
    assert((byDoc(1L) & byDoc(2L)).nonEmpty)
    assert((byDoc(1L) & byDoc(3L)).isEmpty)
    assert((byDoc(2L) & byDoc(3L)).isEmpty)
    // density: the sketch keeps far fewer fingerprints than k-grams
    // (expected ~2/(w+1) of 46 grams; allow slack for local minima runs)
    assert(byDoc(1L).size < 46 / 2)
  }

  test("band recall report: S-curve ordering, hits bounded, no cartesian") {
    val report = Dedup.bandRecallReport(docs, minJaccard = 0.5)
    val rows = report.collect()
    // three configs back in band order, n_truth constant across rows
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 4L, 8L))
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).forall(_ == 16L))
    val nTruth = rows.map(_.getLong(2)).distinct
    assert(nTruth.length == 1 && nTruth.head >= 5,
      s"planted near-dups missing from truth: ${nTruth.toSeq}")
    rows.foreach { r =>
      val (cand, hits) = (r.getLong(3), r.getLong(4))
      assert(hits <= nTruth.head && hits <= cand, s"hit bounds: $r")
      assert(r.getDouble(5) >= 0 && r.getDouble(5) <= 1)
      assert(r.getDouble(6) >= 0 && r.getDouble(6) <= 1)
    }
    // the S-curve: more, narrower bands -> lower collision threshold ->
    // recall at the 0.5 bar is (weakly) monotone in the band count,
    // and the 8x2 split must surface the ~0.95-Jaccard plants
    val recallByBands = rows.map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(recallByBands(8L) >= recallByBands(4L) &&
      recallByBands(4L) >= recallByBands(2L), s"S-curve order: $recallByBands")
    assert(recallByBands(8L) >= 0.99, s"8x2 recall: ${recallByBands(8L)}")
    // scale guarantee: banded + truth joins only, never all-pairs — the
    // single BNLJ is the 1-row n_truth artifact broadcast (the repo's
    // bounded-crossJoin shape), not a pair join
    val plan = report.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1,
      s"pair-sized BNLJ in plan:\n$plan")
  }

  test("chooseBanding: cheapest split clearing the target, else max recall") {
    val rep = Dedup.bandRecallReport(docs, minJaccard = 0.5).collect()
    val chosen = Dedup.chooseBanding(docs, minJaccard = 0.5,
      targetRecall = 0.9).collect()
    assert(chosen.length == 1)
    val c = chosen.head
    assert(c.schema.fieldNames.last == "meets_target")
    val meets = rep.filter(_.getDouble(5) >= 0.9)
    if (meets.nonEmpty) {
      // highest precision among qualifiers, then fewest candidates,
      // then fewest bands
      val best = meets.maxBy(r =>
        (r.getDouble(6), -r.getLong(3), -r.getLong(0)))
      assert(c.getLong(0) == best.getLong(0) && c.getBoolean(7),
        s"chose $c over $best")
    } else {
      val best = rep.maxBy(r =>
        (r.getDouble(5), -r.getLong(3), -r.getLong(0)))
      assert(c.getLong(0) == best.getLong(0) && !c.getBoolean(7))
    }
  }

  test("jaccardOnCandidates certifies LSH candidates with true jaccard") {
    val cands = Dedup.minhashCandidates(docs, minEstJaccard = 0.5)
    val verified = Dedup.jaccardOnCandidates(docs, cands)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // one verdict per candidate pair, planted pairs certified high
    assert(verified.size == cands.count())
    (0L until 5L).foreach { i =>
      val j = verified.getOrElse((i, 100L + i),
        fail(s"planted pair ($i, ${100 + i}) not among candidates"))
      assert(j >= 0.8, s"planted pair ($i, ${100 + i}) verified at $j")
    }
  }

  test("precollapse dedup groups == full-corpus labeling when the cap doesn't bite") {
    // clone docs 0 and 1 three times each (exact dups), keep the planted
    // near-dups: far below the df cap, so the rep-level pair graph and
    // the full-corpus one see the same edges up to clone attachment
    val clones = (0L until 2L).flatMap { i =>
      val t = docs.filter(col("doc_id") === i).head.getString(1)
      (1 to 3).map(c => (1000L + i * 10 + c, t))
    }
    val all = docs.unionAll(spark.createDataFrame(
      spark.sparkContext.parallelize(clones.map(Row.fromTuple), 2), schema))

    val pre = Dedup.dedupGroupsPrecollapsed(all, minJaccard = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val full = Dedup.connectedComponents(
        Dedup.hashJaccardPairs(all, minJaccard = 0.6))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(pre == full,
      s"precollapse labeling diverged:\npre=$pre\nfull=$full")
    // clones attach to their representative's component
    assert(pre(1001L) == pre(0L) && pre(1011L) == pre(1L))
  }

  test("connected components: chains collapse to one cluster, min id wins") {
    // chain 1-2-3-4-5 needs multi-round label propagation (diameter 4);
    // 10-11 is an isolated pair; 20-21-22 a triangle
    val pairSchema = StructType(Seq(
      StructField("d1", LongType), StructField("d2", LongType)))
    val pairs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 2L), Row(2L, 3L), Row(3L, 4L), Row(4L, 5L),
        Row(10L, 11L),
        Row(20L, 21L), Row(21L, 22L), Row(20L, 22L)).reverse, 3),
      pairSchema)
    val comp = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(comp(_) == 1L), s"chain not collapsed: $comp")
    assert(comp(10L) == 10L && comp(11L) == 10L)
    assert((20L to 22L).forall(comp(_) == 20L))
    assert(comp.size == 10)
  }

  test("connected components match in-memory union-find on random graphs") {
    val pairSchema = StructType(Seq(
      StructField("d1", LongType), StructField("d2", LongType)))
    val rng = new scala.util.Random(41)
    (1 to 3).foreach { trial =>
      val n = 30
      val edges = Seq.fill(25)((rng.nextInt(n), rng.nextInt(n)))
        .filter(p => p._1 != p._2).distinct
      // reference: union-find, then min node id per component
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) => parent(find(a)) = find(b) }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val minOf = nodes.groupBy(find).map { case (_, ns) => ns.map(n => find(n)) -> ns.min }
      val expected = nodes.map(v => v.toLong -> minOf.collectFirst {
        case (reps, m) if reps.contains(find(v)) => m.toLong
      }.get).toMap
      val pairs = spark.createDataFrame(
        spark.sparkContext.parallelize(
          edges.map { case (a, b) => Row(a.toLong, b.toLong) }, 3),
        pairSchema)
      val got = Dedup.connectedComponents(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial: $got vs $expected")
    }
  }

  test("star contraction: chain of 1000 converges in O(log n) rounds") {
    val pairSchema = StructType(Seq(
      StructField("d1", LongType), StructField("d2", LongType)))
    // a 1000-node chain has diameter 999: min-label propagation would
    // need 999 rounds (and must now raise within its 20-round budget),
    // while large-star/small-star contracts it within the 15-round cap
    // given here — the O(log n) evidence the operator exists for
    val chain = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0L until 999L).map(i => Row(i, i + 1)), 4),
      pairSchema)
    val comp = Dedup.connectedComponentsStar(chain, maxIters = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 1000)
    assert(comp.values.forall(_ == 0L), "chain not fully contracted to min id")
    assertThrows[IllegalStateException] {
      Dedup.connectedComponents(chain)
    }
  }

  test("star contraction matches label propagation on random graphs") {
    val pairSchema = StructType(Seq(
      StructField("d1", LongType), StructField("d2", LongType)))
    val rng = new scala.util.Random(43)
    (1 to 2).foreach { trial =>
      val edges = Seq.fill(25)((rng.nextInt(30), rng.nextInt(30)))
        .filter(p => p._1 != p._2).distinct
      val pairs = spark.createDataFrame(
        spark.sparkContext.parallelize(
          edges.map { case (a, b) => Row(a.toLong, b.toLong) }, 3),
        pairSchema)
      val prop = Dedup.connectedComponents(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val star = Dedup.connectedComponentsStar(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star == prop, s"trial $trial: $star vs $prop")
    }
  }

  test("star contraction raises instead of returning unconverged labels") {
    val pairSchema = StructType(Seq(
      StructField("d1", LongType), StructField("d2", LongType)))
    val chain = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0L until 200L).map(i => Row(i, i + 1)), 2),
      pairSchema)
    assertThrows[IllegalStateException] {
      Dedup.connectedComponentsStar(chain, maxIters = 1)
    }
  }

  test("star contraction releases every storage block it creates") {
    val pairSchema = StructType(Seq(
      StructField("d1", LongType), StructField("d2", LongType)))
    val pairs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 2L), Row(2L, 3L), Row(3L, 4L), Row(4L, 5L),
        Row(10L, 11L)), 2),
      pairSchema)
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val cc = Dedup.connectedComponentsStar(pairs)
    val got = cc.collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    assert(leaked.isEmpty,
      s"connectedComponentsStar left persisted RDDs behind: $leaked")
    assert(got.length == 7)
  }

  test("connected components release every storage block they create") {
    val pairSchema = StructType(Seq(
      StructField("d1", LongType), StructField("d2", LongType)))
    val pairs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 2L), Row(2L, 3L), Row(3L, 4L), Row(4L, 5L),
        Row(10L, 11L)), 2),
      pairSchema)
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val cc = Dedup.connectedComponents(pairs)
    val got = cc.collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    assert(leaked.isEmpty,
      s"connectedComponents left persisted RDDs behind: $leaked")
    // the reliably-checkpointed result stays fully usable afterwards
    assert(got.length == 7)
    assert(cc.filter(col("comp") === 1L).count() == 5)
  }

  test("best-of-cluster picks the max-token member of every q56 component") {
    val sf = "/root/testdata/sf0.001"
    val reps = graft.queries.Registry.queries("q89_best_of_cluster")(spark, sf)
    val got = reps.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getInt(3))))
      .toMap
    assert(got.nonEmpty, "sf0.001 should have at least one near-dup cluster")
    // independent expectation from q56's labeling + per-doc token counts
    val comps = graft.queries.Registry.queries("q56_dedup_groups")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nt = graft.core.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), size(graft.llm.TextOps.tokens(col("text"))).as("nt"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expected = comps.groupBy(_._2).map { case (comp, ms) =>
      val members = ms.map(_._1).sorted
      val best = members.minBy(d => (-nt(d), d))
      comp -> ((best, nt(best), members.size))
    }
    assert(got == expected)
    // the argmax rides TopKPerKey, not a full per-comp sort
    val plan = reps.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("TopKPerKeyFinal"), s"no TopKPerKey in plan:\n$plan")
  }

  test("simhash banding catches exact duplicates") {
    val withExact = docs.unionAll(
      docs.filter(col("doc_id") === 3L)
        .select((col("doc_id") + 1000L).as("doc_id"), col("text")))
    val pairs = Dedup.simhashPairs(withExact, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 3L && p._2 == 1003L && p._3 == 0))
    // known-far pair stays out (independent docs sit > maxHamming —
    // the signature-level test pins their distance > 5): the q34
    // rows-only entry's behavioral negative
    assert(!pairs.exists(p => Set(p._1, p._2) == Set(10L, 20L)),
      s"independent docs paired: ${pairs.take(20).mkString(",")}")
  }

  test("pageRank: hand-checked path graph, mass conservation, hub centrality") {
    import spark.implicits._
    // path 1-2-3: after 3 damped iterations the exact ranks are
    // 0.2097 / 0.5805 / 0.2097 (verified by hand and by the recursive
    // oracle formulation)
    val path = Seq((1L, 2L), (2L, 3L)).toDF("d1", "d2")
    val r3 = Dedup.pageRank(path, iters = 3).collect()
      .map(r => r.getLong(0) ->
        BigDecimal(r.getDouble(1)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble).toMap
    assert(r3 == Map(1L -> 0.2097, 2L -> 0.5805, 3L -> 0.2097), s"$r3")
    // converged: mass conserved, the hub strictly outranks the leaves
    val r10 = Dedup.pageRank(path, iters = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(r10.values.sum - 1.0) < 1e-9,
      s"rank mass not conserved: ${r10.values.sum}")
    assert(r10(2L) > r10(1L) && r10(2L) > r10(3L))
    // star graph: the center's rank grows with the cluster size
    val star = (2L to 6L).map(i => (1L, i)).toDF("d1", "d2")
    val rs = Dedup.pageRank(star, iters = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert((2L to 6L).forall(i => rs(1L) > rs(i)))
  }

  test("pageRank: zero persisted-RDD delta and clique convergence exit") {
    import spark.implicits._
    // two disjoint cliques (the near-dup graph shape): uniform start IS
    // the fixpoint, so the L1 delta at the first compare (i=6 vs i=3)
    // is ~0 and the convergence exit fires well under the ceiling
    val cliques = (
      (for { a <- 1L to 5L; b <- (a + 1) to 5L } yield (a, b)) ++
      (for { a <- 11L to 13L; b <- (a + 1) to 13L } yield (a, b))
    ).toDF("d1", "d2")
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val early = Dedup.pageRank(cliques, iters = 200).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    assert(leaked.isEmpty, s"pageRank left persisted RDDs behind: $leaked")
    assert(Dedup.lastPageRankIters < 10,
      s"convergence exit did not fire: ran ${Dedup.lastPageRankIters} iters")
    // early-exit ranks equal the fixed-budget result within tolerance
    val fixed = Dedup.pageRank(cliques, iters = 10, tol = -1.0).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(Dedup.lastPageRankIters == 10)
    assert(early.keySet == fixed.keySet)
    early.foreach { case (id, r) =>
      assert(math.abs(r - fixed(id)) < 1e-9, s"node $id: $r vs ${fixed(id)}")
    }
    // the reliably-checkpointed result stays usable; mass conserved
    assert(math.abs(early.values.sum - 1.0) < 1e-9)
  }

  test("exact-substring spans: maximal planted runs at exact offsets, nothing else") {
    // unique filler tokens everywhere, so the ONLY >= 8-token shared
    // runs are the planted ones; minRun = 8 (the registry default)
    def toks(prefix: String, n: Int): Seq[String] =
      (1 to n).map(i => s"$prefix$i")
    val runS = toks("s", 12) // shared by docs 1, 2; docs 8 carries s1..s8
    val runR = toks("r", 9)  // shared by docs 4, 5
    val runT = toks("t", 8)  // shared by docs 4, 5 (second, separate run)
    val runShort = toks("q", 7) // shared by 6, 7 — UNDER minRun, no row
    val rows = Seq(
      (1L, (toks("fa", 4) ++ runS ++ toks("fb", 5)).mkString(" ")),
      (2L, (toks("fc", 7) ++ runS ++ toks("fd", 3)).mkString(" ")),
      (3L, toks("fe", 30).mkString(" ")),
      (4L, (toks("ff", 2) ++ runR ++ toks("fg", 3) ++ runT ++ toks("fh", 1)).mkString(" ")),
      (5L, (toks("fi", 1) ++ runR ++ toks("fj", 1) ++ runT ++ toks("fk", 2)).mkString(" ")),
      (6L, (toks("fl", 3) ++ runShort ++ toks("fm", 3)).mkString(" ")),
      (7L, (toks("fn", 5) ++ runShort ++ toks("fo", 2)).mkString(" ")),
      (8L, (toks("fp", 1) ++ runS.take(8)).mkString(" ")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromTuple), 2), schema)
    val spans = Dedup.exactSubstringSpans(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    // every maximal run, at its exact 1-based offsets, incl. the
    // 8-token prefix of runS that doc 8 shares with BOTH 1 and 2;
    // the 7-token run and all filler produce nothing
    assert(spans == Set(
      (1L, 2L, 5L, 8L, 12L),
      (1L, 8L, 5L, 2L, 8L),
      (2L, 8L, 8L, 2L, 8L),
      (4L, 5L, 3L, 2L, 9L),
      (4L, 5L, 15L, 12L, 8L)), s"got $spans")

    // coverage: per-doc interval UNION (doc 1's [5,12] from the doc-8
    // pair merges into its [5,16] from the doc-2 pair), ratio at 4 dp
    val cov = Dedup.exactSubstringCoverage(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(cov(1L) == ((21L, 12L, 0.5714)), s"doc1: ${cov(1L)}")
    assert(cov(2L) == ((22L, 12L, 0.5455)), s"doc2: ${cov(2L)}")
    assert(cov(4L) == ((23L, 17L, 0.7391)), s"doc4: ${cov(4L)}")
    assert(cov(5L) == ((21L, 17L, 0.8095)), s"doc5: ${cov(5L)}")
    assert(cov(8L) == ((9L, 8L, 0.8889)), s"doc8: ${cov(8L)}")
    Seq(3L, 6L, 7L).foreach(d =>
      assert(cov(d)._2 == 0L && cov(d)._3 == 0.0, s"doc$d: ${cov(d)}"))

    // removal: keep-first — d1 copies stay, d2-side intervals are cut.
    // Doc 1 is d1 in all its pairs (intact); doc 2 loses runS to doc 1
    // ([8,19]); doc 5 loses runR+runT to doc 4 ([2,10] ∪ [12,19]);
    // doc 8 keeps only its filler token ("fp1" — both pairs cut [2,9]).
    val rm = Dedup.exactSubstringRemove(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(rm(1L)._2 == 0L && rm(2L) == ((22L, 12L,
      (toks("fc", 7) ++ toks("fd", 3)).mkString(" "))), s"1/2: ${rm(2L)}")
    assert(rm(4L)._2 == 0L && rm(5L)._2 == 17L, s"4/5: ${rm(5L)}")
    assert(rm(8L) == ((9L, 8L, "fp1")), s"doc8: ${rm(8L)}")
    Seq(3L, 6L, 7L).foreach(d =>
      assert(rm(d)._2 == 0L, s"doc$d: ${rm(d)}"))
  }

  test("exact-substring precollapse == direct on a clone-heavy corpus") {
    // the q86/q134 equality contract for the substring operator: exact
    // clones of BOTH partial-overlap partners, a cloned doc with no
    // partner, and a short clone pair that must produce only its own
    // whole-doc span
    def toks(prefix: String, n: Int): Seq[String] =
      (1 to n).map(i => s"$prefix$i")
    val runS = toks("s", 10)
    val a = (toks("pa", 3) ++ runS ++ toks("pb", 2)).mkString(" ") // 15 toks
    val b = (toks("pc", 1) ++ runS ++ toks("pd", 4)).mkString(" ") // 15 toks
    val lone = toks("pe", 20).mkString(" ")
    val short = toks("pf", 9).mkString(" ") // 9 >= minRun: whole-doc span
    val rows = Seq(
      (1L, a), (2L, b), (3L, lone), (4L, short),
      (11L, a), (12L, b), (14L, short), (21L, a)) // clones: a x3, b x2, short x2
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromTuple), 2), schema)
    def rowsOf(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val direct = rowsOf(Dedup.exactSubstringSpans(df))
    val pre = rowsOf(Dedup.exactSubstringSpansPrecollapsed(df))
    assert(pre == direct, s"precollapse drifted:\n direct=$direct\n pre=$pre")
    // structure is the expected one: every a-clone x b-clone pair carries
    // the (4, 2, 10) run; clone pairs carry whole-doc spans; lone: none
    assert(direct.contains((1L, 2L, 4L, 2L, 10L)))
    assert(direct.contains((2L, 11L, 2L, 4L, 10L))) // orientation swap
    assert(direct.contains((1L, 11L, 1L, 1L, 15L))) // a-clone whole doc
    assert(direct.contains((4L, 14L, 1L, 1L, 9L)))  // short-clone whole doc
    assert(!direct.exists(p => p._1 == 3L || p._2 == 3L))
    // 3 a-clones x 2 b-clones = 6 cross spans + C(3,2)+C(2,2... ) intra:
    // 3 a-pairs + 1 b-pair + 1 short-pair = 11 rows total
    assert(direct.size == 11, s"got ${direct.size}: $direct")

    // coverage on the same corpus (computed via the linear rep route):
    // clone members are whole-doc covered, the lone doc untouched
    val cov = Dedup.exactSubstringCoverage(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    Seq(1L, 2L, 11L, 12L, 21L).foreach(d =>
      assert(cov(d) == ((15L, 15L, 1.0)), s"doc$d: ${cov(d)}"))
    Seq(4L, 14L).foreach(d =>
      assert(cov(d) == ((9L, 9L, 1.0)), s"doc$d: ${cov(d)}"))
    assert(cov(3L) == ((20L, 0L, 0.0)), s"doc3: ${cov(3L)}")

    // removal through the clone groups, pinned against the DIRECT
    // d2-side derivation row for row (the oracle's replay), plus the
    // expected shape: non-rep clones are emptied, the b-rep loses runS
    // to the a-rep, the a-rep / lone / short-rep stay intact
    val rm = Dedup.exactSubstringRemove(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    Seq(11L, 21L, 12L, 14L).foreach(d =>
      assert(rm(d)._3 == "" && rm(d)._1 == rm(d)._2, s"doc$d: ${rm(d)}"))
    assert(rm(2L) == ((15L, 10L,
      (toks("pc", 1) ++ toks("pd", 4)).mkString(" "))), s"doc2: ${rm(2L)}")
    Seq(1L, 3L, 4L).foreach(d =>
      assert(rm(d)._2 == 0L, s"doc$d: ${rm(d)}"))
    // direct replay: union d2-side intervals from the direct span list,
    // complement against the token stream — must equal the linear form
    val byDoc = direct.toSeq.flatMap { case (_, d2, _, p2, len) =>
      (p2 to (p2 + len - 1)).map(p => (d2, p)) }.toSet
    rows.foreach { case (id, text) =>
      val ts = text.split("\\s+").toSeq
      val keptDirect = ts.zipWithIndex.collect {
        case (t, i) if !byDoc.contains((id, (i + 1).toLong)) => t }
      assert(rm(id)._3 == keptDirect.mkString(" "),
        s"doc$id drifted from direct replay: ${rm(id)._3}")
    }
  }

  test("interval cut: native expression bit-equals the HOF form") {
    // r12 verdict #2: the span-cut hot path moved from the interpreted
    // filter/exists HOF pair to the compiled IntervalCut two-pointer.
    // Pin bit-equality on adversarial interval shapes: overlap,
    // containment, single-position, adjacency, past-end, whole-doc —
    // evaluated over the SAME merged+sorted ivs arrays both forms see.
    val rows = Seq(
      (1L, (1 to 20).map(i => s"t$i").mkString(" ")),
      (2L, (1 to 5).map(i => s"u$i").mkString(" ")),
      (3L, (1 to 12).map(i => s"v$i").mkString(" ")),
      (4L, (1 to 8).map(i => s"w$i").mkString(" "))) // no intervals
    val docsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromTuple), 2), schema)
    val cov = Seq(
      (1L, 3L, 7L), (1L, 5L, 9L),  // overlapping pair -> [3,9]
      (1L, 11L, 11L),              // single position
      (1L, 15L, 30L),              // runs past the end
      (2L, 1L, 5L),                // whole doc
      (3L, 2L, 4L), (3L, 5L, 5L), (3L, 8L, 11L)) // adjacent + disjoint
    val covDf = spark.createDataFrame(
      spark.sparkContext.parallelize(cov.map(Row.fromTuple), 2),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("s", LongType), StructField("e", LongType))))
    val native = Dedup.cutIntervals(docsDf, covDf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // independent replay: position-set complement of the raw intervals
    val covered = cov.flatMap { case (d, s, e) =>
      (s to e).map(p => (d, p)) }.toSet
    rows.foreach { case (id, text) =>
      val ts = text.split("\\s+").toSeq
      val kept = ts.zipWithIndex.collect {
        case (t, i) if !covered.contains((id, (i + 1).toLong)) => t }
      assert(native(id) == ((ts.size.toLong,
        (ts.size - kept.size).toLong, kept.mkString(" "))),
        s"doc$id: ${native(id)}")
    }
    // literal HOF-vs-native bit-equality on one materialized ivs column
    val ivsDf = docsDf
      .select(col("doc_id"),
        split(col("text"), "\\s+").as("ts"))
      .join(covDf.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(
          struct(col("s").as("mn"), col("e").as("mx")))).as("ivs")),
        Seq("doc_id"))
    val both = ivsDf.select(col("doc_id"),
      graft.functions.Fns.intervalCut(col("ts"), col("ivs")).as("nat"),
      filter(col("ts"), (t, i) =>
        !exists(col("ivs"), v =>
          (i + 1) >= v.getField("mn") && (i + 1) <= v.getField("mx")))
        .as("hof")).collect()
    both.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"doc${r.getLong(0)}: native=${r.getSeq[String](1)} " +
          s"hof=${r.getSeq[String](2)}")
    }
  }

  test("substring scale paths carry no forced-broadcast join hints") {
    // the membership maps (one row per UNIQUE text) are
    // corpus-cardinality — at 100 TB a forced broadcast() of them
    // would blow the 8 GB broadcast limit and the driver. Pin the
    // LOGICAL plan hint-free: AQE may still broadcast a side whose
    // runtime stats are tiny, but nothing in these operators may
    // DEMAND it (a hint forces the build regardless of size).
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.catalyst.plans.logical.BROADCAST
    val df = docs
    Seq(
      "spans-precollapse" -> Dedup.exactSubstringSpansPrecollapsed(df),
      "coverage" -> Dedup.exactSubstringCoverage(df),
      "remove" -> Dedup.exactSubstringRemove(df),
      "spans-direct" -> Dedup.exactSubstringSpans(df)).foreach {
      case (name, q) =>
        val forced = q.queryExecution.optimizedPlan.collect {
          case j: Join
              if j.hint.leftHint.exists(_.strategy.contains(BROADCAST)) ||
                j.hint.rightHint.exists(_.strategy.contains(BROADCAST)) => j
        }
        assert(forced.isEmpty,
          s"$name: forced broadcast hint on ${forced.size} join(s):\n" +
            forced.mkString("\n"))
    }
  }

  test("prefix-filtered jaccard == brute-force exact jaccard, no cartesian") {
    // the AllPairs exactness contract: every pair at the threshold,
    // over the FULL (uncapped) shingle space — verified against an
    // independent all-pairs Scala computation on shingle STRINGS
    val result = Dedup.prefixFilteredJaccardPairs(docs, minJaccard = 0.6)
    val got = result.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val local = docs.collect().map { r =>
      val ts = r.getString(1).trim.toLowerCase.split("\\s+")
      val sh = ts.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      r.getLong(0) -> sh
    }.toMap
    val want = (for {
      (d1, s1) <- local; (d2, s2) <- local if d1 < d2
      inter = (s1 & s2).size
      if s1.nonEmpty && s2.nonEmpty &&
        inter * 10000L >= 6000L * (s1.size + s2.size - inter)
    } yield {
      val j = inter.toDouble / (s1.size + s2.size - inter)
      (d1, d2,
        BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }).toSet
    assert(want.nonEmpty, "fixture produced no qualifying pairs")
    assert(got == want, s"prefix-filter drift:\n got=$got\n want=$want")

    // scale guarantee: candidate generation is an equi-join on the
    // prefix shingle key — never a cartesian / nested-loop product
    val plan = result.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in plan:\n$plan")
  }

  test("prefix-filter precollapse == direct on a clone-heavy corpus") {
    // exact clones of both near-dup partners, a lone cloned doc, and a
    // sub-3-token clone pair that must produce NO pair (no shingles)
    val base = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val clones = base.take(6).flatMap { case (i, t) =>
      Seq((1000L + i, t), (2000L + i, t)) // every early doc x3
    } ++ Seq((9001L, "just two"), (9002L, "just two"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (base ++ clones).map(Row.fromTuple), 4), schema)
    def rowsOf(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = rowsOf(Dedup.prefixFilteredJaccardPairs(df, minJaccard = 0.6))
    val pre = rowsOf(
      Dedup.prefixFilteredJaccardPairsPrecollapsed(df, minJaccard = 0.6))
    assert(pre == direct,
      s"precollapse drifted: only-direct=${direct -- pre} only-pre=${pre -- direct}")
    // structure: clone triples produce their intra pairs at jaccard 1.0,
    // the shingle-less pair produces nothing
    assert(direct.contains((0L, 1000L, 1.0)) && direct.contains((1000L, 2000L, 1.0)))
    assert(!direct.exists(p => p._1 == 9001L || p._2 == 9002L))
  }

  test("kCore: cycles survive, trees peel to empty, pendant fringe " +
      "drops, multi-round peel and the round budget both honored") {
    val pairSchema = StructType(Seq(
      StructField("d1", LongType), StructField("d2", LongType)))
    def pairsOf(rows: (Long, Long)*) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(Row.fromTuple)), pairSchema)
    def core(df: org.apache.spark.sql.DataFrame, rounds: Int = 6) =
      Dedup.kCore(df, k = 2, maxRounds = rounds).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 4-cycle: every node degree 2, nothing peels
    assert(core(pairsOf(1L -> 2L, 2L -> 3L, 3L -> 4L, 1L -> 4L)) ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
    // path a-b-c-d-e peels end-in: 3 rounds to empty (tests iteration)
    assert(core(pairsOf(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)).isEmpty)
    // triangle + pendant: the pendant and ONLY the pendant drops
    assert(core(pairsOf(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 9L)) ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // round budget: path of 5 after exactly ONE round keeps b-c-d
    assert(core(pairsOf(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L),
      rounds = 1) == Map(2L -> 1L, 3L -> 2L, 4L -> 1L))
    // two triangles joined by a bridge: everything is 2-core, bridge
    // endpoints carry degree 3
    assert(core(pairsOf(1L -> 2L, 2L -> 3L, 1L -> 3L,
      4L -> 5L, 5L -> 6L, 4L -> 6L, 3L -> 4L)) ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 3L, 5L -> 2L, 6L -> 2L))
  }
}
