package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.TextOps

/** Behavioral tests for the round-10 text operators: character
  * chunking (q94), adjacent-pair counting (q95), BPE tokenizer
  * training (the iterative driver loop q95's counting step feeds),
  * and char-entropy quality scoring (q97).
  */
class TextOpsSpec extends AnyFunSuite with TestSpark {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def docsOf(rows: (Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromTuple), 2), docSchema)

  test("chunkDocs: boundaries, overlap, tail, and empty-doc exclusion") {
    val out = TextOps.chunkDocs(
      docsOf(1L -> "abcdefghij", 2L -> ""), width = 4, stride = 3)
      .orderBy("doc_id", "chunk_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    // starts 0,3,6,9: the last window is the short tail; doc 2 is empty
    // and yields no chunks
    assert(out.toSeq === Seq(
      (1L, 0, "abcd"), (1L, 1, "defg"), (1L, 2, "ghij"), (1L, 3, "j")))
  }

  test("chunkDocs: stride == width is non-overlapping and loses no bytes") {
    val text = "0123456789abcdef" // 16 chars
    val chunks = TextOps.chunkDocs(docsOf(1L -> text), width = 5, stride = 5)
      .orderBy("chunk_id").collect().map(_.getString(2))
    assert(chunks.mkString === text)
  }

  test("adjacentPairCounts counts ordered pairs with multiplicity") {
    val out = TextOps.adjacentPairCounts(docsOf(1L -> "a b a b c", 2L -> "x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the single-token doc contributes no pairs
    assert(out === Map("a b" -> 2L, "b a" -> 1L, "b c" -> 1L))
  }

  test("bpeTrain reproduces the classic merge sequence") {
    // Sennrich et al. 2016's worked example: vocabulary
    // {low:5, lower:2, newest:6, widest:3} with </w> terminals merges
    // (e s) -> (es t) -> (est </w>) -> (l o) -> (lo w).
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val merges = TextOps.bpeTrain(docsOf(1L -> text), numMerges = 5)
    assert(merges === Seq(
      1 -> "e s", 2 -> "es t", 3 -> "est </w>", 4 -> "l o", 5 -> "lo w"))
  }

  test("bpeTrain stops early when no pair remains") {
    // one two-char word: after ("a b"), ("ab </w>") nothing is left
    val merges = TextOps.bpeTrain(docsOf(1L -> "ab"), numMerges = 10)
    assert(merges === Seq(1 -> "a b", 2 -> "ab </w>"))
  }

  test("bpeEncode replays training segmentation via merge ranks") {
    // the classic merge table (see bpeTrain test): encode greedily by
    // lowest rank — "lowest" becomes [low, est</w>], "newest" keeps its
    // unmerged head [n, e, w, est</w>] (no (n,e)/(e,w) merge in the
    // 5-step table), and an OOV word falls back to chars + </w>
    val merges = Seq("e s", "es t", "est </w>", "l o", "lo w")
    val out = TextOps.bpeEncodeTokens(
      docsOf(1L -> "lowest newest zap"), merges)
      .collect().head.getSeq[String](1)
    assert(out === Seq("low", "est</w>", "n", "e", "w", "est</w>",
      "z", "a", "p", "</w>"))
  }

  test("persisted BPE merges reload in rank order") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bpe").toString + "/merges"
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val merges = TextOps.bpeTrain(docsOf(1L -> text), numMerges = 5)
    TextOps.saveBpeMerges(spark, merges, dir)
    assert(TextOps.loadBpeMerges(spark, dir) === merges.map(_._2))
  }

  test("stored bigram LM scores == fresh q98 scoring on the train corpus") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lm").toString + "/lm"
    val docs = docsOf(
      1L -> "the cat sat on the mat",
      2L -> "the dog sat on the log",
      3L -> "a cat and a dog",
      4L -> "one")
    TextOps.saveBigramLm(docs, dir)
    val fresh = TextOps.bigramLogProb(docs)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val stored = TextOps.bigramLogProbStored(docs, dir)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    // same corpus => every bigram/unigram hits the stored tables; the
    // single-token doc 4 drops in both forms
    assert(stored.toSeq === fresh.toSeq)
    assert(fresh.map(_._1).toSeq === Seq(1L, 2L, 3L))
  }

  test("Kneser-Ney bigram scores match the hand-computed smoothing") {
    // corpus: "a b", "a b", "a c" — bigram counts (a,b)=2, (a,c)=1;
    // history a: ca=3, N1+(a,.)=2; continuations: N1+(.,b)=1,
    // N1+(.,c)=1; bigram types=2; D=0.75:
    //   P(b|a) = 1.25/3 + 0.75*2/3*(1/2) = 2/3
    //   P(c|a) = 0.25/3 + 0.75*2/3*(1/2) = 1/3
    val out = TextOps.knBigramLogProb(
        docsOf(1L -> "a b", 2L -> "a b", 3L -> "a c", 4L -> "solo"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out.map(_._1) === Seq(1L, 2L, 3L)) // <2-token doc drops
    assert(math.abs(out(0)._2 - math.log(2.0 / 3)) < 1e-4, s"$out")
    assert(math.abs(out(1)._2 - math.log(2.0 / 3)) < 1e-4)
    assert(math.abs(out(2)._2 - math.log(1.0 / 3)) < 1e-4)
    // KN's defining property: probabilities per history sum to 1
    // (2/3 + 1/3) — the discount mass is exactly redistributed
  }

  test("stored bigram LM backs off to the add-k floor on unseen bigrams") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lm2").toString + "/lm"
    TextOps.saveBigramLm(docsOf(1L -> "the cat sat"), dir)
    // "zz qq" has no unigram/bigram counts: p = k / (0 + k*V), V = 3
    val out = TextOps.bigramLogProbStored(docsOf(9L -> "zz qq"), dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val expected = math.log(0.5 / (0.5 * 3))
    assert(out.length === 1)
    assert(math.abs(out.head._2 - expected) < 1e-4)
  }

  test("prepCorpus: chunks cover every byte once and export is exactly-once") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_prep").toString
    val docs = docsOf(
      1L -> ("alpha beta gamma " * 20).trim, // 339 chars -> several chunks
      2L -> "short doc here")
    // stride == width: non-overlapping, so concatenating a doc's chunks
    // in chunk_id order must reproduce the exact text
    val r = TextOps.prepCorpus(docs, dir, width = 100, stride = 100,
      shards = 4)
    assert(r.nDocs === 2)
    val out = spark.read.parquet(r.shardsDir)
    assert(out.count() === r.nChunks)
    // exactly-once: every (doc_id, chunk_id) appears once
    assert(out.select("doc_id", "chunk_id").distinct().count() === r.nChunks)
    val rebuilt = out.filter(col("doc_id") === 1L)
      .orderBy("chunk_id").collect().map(_.getAs[String]("chunk")).mkString
    assert(rebuilt === ("alpha beta gamma " * 20).trim)
    // shard column covers the requested range
    val shardVals = out.select("shard").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(shardVals.subsetOf((0 until 4).toSet))
  }

  test("charEntropy: uniform text is 0, two equi-frequent chars are ln 2") {
    val out = docsOf(1L -> "aaaa", 2L -> "abab")
      .select(col("doc_id"), TextOps.charEntropy(col("text")).as("e"))
      .orderBy("doc_id").collect().map(_.getDouble(1))
    assert(out(0) === 0.0)
    assert(math.abs(out(1) - math.log(2.0)) < 1e-4)
  }

  test("heavyHitterTokens equals the naive full-vocab HAVING query") {
    // 100 tokens: 'hot' 5%, 'warm' 3%, everything else unique (1% each
    // is below the 2% confirm threshold)
    val hot = Seq.fill(5)("hot") ++ Seq.fill(3)("warm")
    val tail = (0 until 92).map(i => s"tok$i")
    val doc = (hot ++ tail).mkString(" ")
    val out = TextOps.heavyHitterTokens(docsOf(1L -> doc))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq(("hot", 5L, 0.05), ("warm", 3L, 0.03)))
  }

  test("heavyHitterTokens: sketch prefilter misses nothing at the confirm threshold") {
    // many partitions + interleaved placement: Misra-Gries merge must
    // still surface every >=2% token
    val rows = (0 until 50).map { i =>
      (i.toLong, (Seq("alpha") ++ Seq(s"u${i}a", s"u${i}b", s"u${i}c")).mkString(" "))
    }
    val out = TextOps.heavyHitterTokens(docsOf(rows: _*))
      .collect().map(_.getString(0))
    assert(out.toSeq === Seq("alpha")) // 50/200 = 25%
  }

  test("pmiCollocations: a glued pair outranks frequent-but-independent tokens") {
    // 'new york' always adjacent; 'the' frequent everywhere
    val docs = (0L until 30L).map { i =>
      (i, s"the w$i new york the v$i")
    }
    val out = TextOps.pmiCollocations(docsOf(docs: _*), minCount = 10, topK = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.head._1 == "new" && out.head._2 == "york",
      s"top collocation should be (new, york): ${out.toSeq}")
    // hand-checked PMI: c12=30, n_bi=150, c1(new)=c1(york)=30, n_uni=180
    // pmi = ln((30/150) / ((30/180)^2)) = ln(7.2)
    assert(math.abs(out.head._4 - math.log(7.2)) < 1e-3,
      s"pmi off: ${out.head._4} vs ${math.log(7.2)}")
    // the independent 'the ...' pairs score lower wherever they appear
    out.tail.foreach(p => assert(p._4 < out.head._4))
  }

  private val srcSchema = StructType(Seq(
    StructField("source", StringType), StructField("text", StringType)))

  private def srcDocsOf(rows: (String, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromTuple), 2), srcSchema)

  test("zipfFit: an exact 1/rank law fits slope -1") {
    // counts 12, 6, 4, 3 at ranks 1..4 are exactly cnt = 12/rank, so the
    // least-squares fit of ln(cnt) on ln(rank) is exact with slope -1
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    val out = TextOps.zipfFit(srcDocsOf("web" -> text), topV = 100).collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "web")
    assert(out.head.getLong(1) == 4L)
    assert(out.head.getDouble(2) == -1.0, s"slope: ${out.head.getDouble(2)}")
  }

  test("zipfFit: flat counts have undefined slope only via zero variance guard") {
    // two sources fit independently; the repetitive source's slope is 0
    // (all counts equal -> lc constant -> covar 0, var(lr) > 0)
    val out = TextOps.zipfFit(srcDocsOf(
      "flat" -> "p q r s", "web" -> "a a b"), topV = 100)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(out("flat") == 0.0)
    assert(out("web") < 0.0)
  }

  test("ngramDiversity: repetitive vs all-unique sources") {
    val out = TextOps.ngramDiversity(srcDocsOf(
      "rep" -> "x x x x", "uniq" -> "a b c d"), maxN = 3)
      .collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // rep: 4/1 unigrams, 3/1 bigrams, 2/1 trigrams
    assert(out(("rep", 1)) == ((4L, 1L, 0.25)))
    assert(out(("rep", 2)) == ((3L, 1L, 0.3333)))
    assert(out(("rep", 3)) == ((2L, 1L, 0.5)))
    // uniq: every gram distinct at every n
    assert(out(("uniq", 1))._3 == 1.0)
    assert(out(("uniq", 2))._3 == 1.0)
    assert(out(("uniq", 3))._3 == 1.0)
  }

  test("ngramDiversity: docs shorter than n contribute nothing at that n") {
    val out = TextOps.ngramDiversity(srcDocsOf("s" -> "only two"), maxN = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toMap
    assert(out == Map(1 -> 2L, 2 -> 1L)) // no n=3 row, never a negative range
  }

  test("codeSwitchReport counts docs whose token halves classify differently") {
    val langSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val rows = Seq(
      // en first half, es second half -> switched
      Row(1L, "the and of the el la de de", "en"),
      // consistent en halves
      Row(2L, "the and of the and of", "en"),
      // es both halves (tie-break: es >= de)
      Row(3L, "el la de el la de", "es"),
      // de first half, en second -> switched
      Row(4L, "der die und der the and of the", "de"),
      // single token -> excluded entirely
      Row(5L, "the", "en"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), langSchema)
    val got = TextOps.codeSwitchReport(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == Map(
      "en" -> ((2L, 1L, 0.5)),
      "es" -> ((1L, 0L, 0.0)),
      "de" -> ((1L, 1L, 1.0))), s"got $got")
  }

  test("ccnetBuckets == independent replay of the value-pinned tercile rule") {
    // mixed-language corpus with repeated + gibberish docs so the 4-dp
    // score grid has both ties and spread
    val langSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val rng = new scala.util.Random(11)
    val vocab = Vector("the", "cat", "sat", "on", "mat", "dog", "ran", "far")
    def sent(n: Int): String =
      Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    val rows =
      (0L until 12L).map(i => Row(i, sent(20), "en")) ++
      (12L until 20L).map(i => Row(i, sent(20), "de")) ++
      // exact clones -> tied scores at the cutoffs
      Seq(Row(20L, "the cat sat on mat", "en"),
          Row(21L, "the cat sat on mat", "en"),
          Row(22L, "zz qq vv ww xx yy", "de")) // gibberish tail
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), langSchema)

    val got = TextOps.ccnetBuckets(df).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap

    // independent replay: per-doc 4-dp scores from bigramLogProb, then
    // the tercile rule in plain Scala integers
    val lp = TextOps.bigramLogProb(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lang = rows.map(r => r.getLong(0) -> r.getString(2)).toMap
    val byLang = lp.toSeq.groupBy { case (id, _) => lang(id) }
    val want = byLang.flatMap { case (lg, docsScores) =>
      val vals = docsScores.map(_._2).sorted
      val n = vals.size
      def thrAt(k: Long): Double = {
        val grid = vals.groupBy(identity).view.mapValues(_.size).toSeq.sortBy(_._1)
        var cum = 0L
        grid.collectFirst {
          case (v, c) if { cum += c; cum >= k } => v
        }.getOrElse(Double.PositiveInfinity)
      }
      val t1 = thrAt(n / 3); val t2 = thrAt(2L * n / 3)
      docsScores.groupBy { case (_, s) =>
        if (s <= t1) "tail" else if (s <= t2) "middle" else "head"
      }.map { case (b, ds) =>
        val ss = ds.map(_._2)
        val sumBp = ss.map(v => math.round(v * 10000)).sum
        (lg, b) -> ((ss.size.toLong,
          BigDecimal(sumBp / (ss.size * 10000.0)).setScale(4,
            BigDecimal.RoundingMode.HALF_UP).toDouble,
          ss.min, ss.max))
      }
    }
    assert(got.keySet == want.keySet, s"buckets: ${got.keySet} vs ${want.keySet}")
    want.foreach { case (k, v) => assert(got(k) == v, s"$k: ${got(k)} vs $v") }
    // the planted tail doc is in de's tail bucket
    assert(got.contains(("de", "tail")))
  }

  test("rrfFuse: both-leg docs sum, single-leg docs score one term, " +
      "absent leg reports rank 0, ties break by doc_id") {
    val idSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("rank_s", IntegerType)))
    def ranked(name: String, rows: (Long, Int)*) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(Row.fromTuple)), idSchema)
        .withColumnRenamed("rank_s", name)
    // sparse: doc 10 rank1, doc 20 rank2; dense: doc 20 rank1, doc 30 rank2
    val out = TextOps.rrfFuse(
        ranked("rank_s", 10L -> 1, 20L -> 2),
        ranked("rank_d", 20L -> 1, 30L -> 2), kR = 60)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    def rrf(rs: Seq[Int]) = BigDecimal(rs.map(r => 1.0 / (60 + r)).sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 20 in BOTH legs outranks the two single-leg docs
    assert(out.head == ((20L, 2, 1, rrf(Seq(2, 1)))))
    // single-leg docs: 1/(60+1) > 1/(60+2); absent leg rank renders 0
    assert(out(1) == ((10L, 1, 0, rrf(Seq(1)))))
    assert(out(2) == ((30L, 0, 2, rrf(Seq(2)))))
    // equal ranks on opposite legs tie exactly -> doc_id ascending
    val tied = TextOps.rrfFuse(
        ranked("rank_s", 5L -> 1), ranked("rank_d", 3L -> 1), kR = 60)
      .collect().map(_.getLong(0))
    assert(tied.toSeq == Seq(3L, 5L))
  }

  // ---- packSequences (q260) ----------------------------------------

  /** text with exactly n whitespace tokens */
  private def words(n: Int): String = Seq.fill(n)("w").mkString(" ")

  test("packSequences: next-fit bin boundaries, oversized doc sits " +
      "alone, empty text counts zero tokens") {
    // shards=1 -> one shard, packing order = doc_id order
    val docs = docsOf(1L -> words(3), 2L -> words(2), 3L -> words(1),
      4L -> words(7), 5L -> words(2), 6L -> words(4), 7L -> "")
    val out = TextOps.packSequences(docs, shards = 1, capacity = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // fills: 3 | 3+2=5 | overflow->bin1 fill1 | 1+7>5 -> bin2 (7 alone,
    // oversized) | bin3 fill2 | 2+4>5 -> bin4 | 4+0=4 stays bin4
    assert(out.toSeq == Seq((1L, 3L, 0L), (2L, 2L, 0L), (3L, 1L, 1L),
      (4L, 7L, 2L), (5L, 2L, 3L), (6L, 4L, 4L), (7L, 0L, 4L)))
  }

  test("packSequences: equals a per-shard reference next-fit on a " +
      "pseudo-random corpus; bins restart at zero per shard") {
    val n = 60
    val sizes = (1 to n).map(i => (i * 37 % 11) + 1) // 1..11 tokens
    val docs = docsOf((1 to n).map(i => i.toLong -> words(sizes(i - 1))): _*)
    val shards = 3
    val cap = 16L
    val out = TextOps.packSequences(docs, shards, cap)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3))).toMap
    // reference: group by the same md5 shard, doc_id order, fold
    def shardOf(id: Long): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:pack".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16) % shards).toInt
    }
    val expect = (1 to n).map(i => (i.toLong, shardOf(i.toLong),
      sizes(i - 1).toLong)).groupBy(_._2).flatMap { case (sh, ds) =>
      var fill = 0L; var bin = -1L
      ds.sortBy(_._1).map { case (id, _, tk) =>
        if (bin < 0 || fill + tk > cap) { bin += 1; fill = tk }
        else fill += tk
        id -> ((sh, tk, bin))
      }
    }.toMap
    assert(out == expect)
    // every shard has a bin 0 and bins are contiguous from 0
    (0 until shards).foreach { sh =>
      val bins = out.values.filter(_._1 == sh).map(_._3).toSeq.sorted
      assert(bins.distinct == (0L to bins.max).toSeq,
        s"shard $sh bins not contiguous: $bins")
    }
  }
}
