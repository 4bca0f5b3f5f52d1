package graft

import java.security.MessageDigest

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Curation

/** Curation operators on constructed corpora where the expected answer
  * is computable in plain Scala: decontamination must count planted
  * cross-split duplicates, mixture sampling must match per-row hash
  * membership, repetition must reflect exact shingle arithmetic.
  */
class CurationSpec extends AnyFunSuite with TestSpark {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("text", StringType)))

  /** Mirror of the engine's md5-bucket rule (first 8 hex chars of
    * md5(decimal doc_id), as unsigned, % 100).
    */
  private def bucket(docId: Long, salt: String = ""): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest((docId.toString + salt).getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16) % 100
  }

  private def split(docId: Long): String = {
    val b = bucket(docId)
    if (b < 90) "train" else if (b < 95) "val" else "test"
  }

  test("decontamination counts planted train->test duplicates exactly") {
    // pick real ids per split from the hash rule itself
    val ids = (0L until 400L)
    val trainIds = ids.filter(split(_) == "train")
    val testIds = ids.filter(split(_) == "test")
    assert(trainIds.nonEmpty && testIds.size >= 3,
      s"split sample too small: ${testIds.size} test ids")
    val leaked = "this exact document leaked into the eval set"
    val rows =
      // one train doc whose text reappears (modulo whitespace/case) in
      // TWO test docs; every other doc is unique
      Seq(Row(trainIds.head, "en", leaked),
        Row(testIds(0), "en", leaked.toUpperCase),
        Row(testIds(1), "en", leaked.replace(" ", "   "))) ++
        (trainIds.tail.take(50).map(i => Row(i, "en", s"unique train doc $i")) :+
          Row(testIds(2), "en", "unique test doc"))
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val got = Curation.decontaminationCounts(docs).head()
    val expectedTest = rows.count(r => split(r.getLong(0)) == "test")
    assert(got.getLong(0) == expectedTest.toLong)
    assert(got.getLong(1) == 2L,
      s"expected exactly the 2 planted leaks, got ${got.getLong(1)}")
  }

  test("bloom decontamination equals the window form, even under FP pressure") {
    val ids = (0L until 600L)
    val trainIds = ids.filter(split(_) == "train")
    val testIds = ids.filter(split(_) == "test")
    assert(testIds.size >= 3)
    val leaked = "another document that leaked into the eval set"
    val rows =
      Seq(Row(trainIds.head, "en", leaked),
        Row(testIds(0), "en", leaked.toUpperCase),
        Row(testIds(1), "en", leaked.replace(" ", "  "))) ++
        trainIds.tail.take(120).map(i => Row(i, "en", s"unique train doc $i")) ++
        testIds.drop(2).take(10).map(i => Row(i, "en", s"unique test doc $i"))
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val expected = Curation.decontaminationCounts(docs).head()
    assert(expected.getLong(1) == 2L)

    val got = Curation.bloomDecontaminationCounts(docs).head()
    assert(got == expected)

    // Undersize the filter (capacity 2 for ~12 test fps, fpp 0.3) so the
    // saturated Bloom pushes false positives through the probe — the
    // exact confirm join must kill every one of them: same answer, more
    // candidate rows. This is the "filter only prunes" guarantee q80's
    // shared oracle depends on.
    val pressured = Curation
      .bloomDecontaminationCounts(docs, expectedItems = 2, fpp = 0.3)
      .head()
    assert(pressured == expected)
  }

  test("bloom filter ships by broadcast, not as plan-embedded bytes") {
    val ids = (0L until 400L)
    val rows = ids.take(200).map(i => Row(i, "en", s"plan pin doc $i"))
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val df = Curation.bloomDecontaminationCounts(docs)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_bloom_contains_bc"),
      s"expected the broadcast bloom probe in the plan:\n$plan")
    // a literal-carried filter renders as a multi-KB hex blob; the
    // broadcast handle renders as Broadcast(id) — no long hex runs
    assert("[0-9A-Fa-f]{512}".r.findFirstIn(plan).isEmpty,
      "plan embeds a long hex blob — the filter bytes leaked back into the plan")
  }

  test("bloom registry eviction: a plan analyzed after MaxEntries newer filters fails loudly") {
    import org.apache.spark.sql.functions.col
    import graft.functions.{BloomBroadcasts, Fns}
    def mkFilter(i: Int) = {
      val bf = org.apache.spark.util.sketch.BloomFilter.create(10, 0.01)
      bf.putBinary(s"item$i".getBytes("UTF-8"))
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      spark.sparkContext.broadcast(bos.toByteArray)
    }
    // a Column built against filter #0, analyzed only LATER
    val stale = Fns.bloomContainsBroadcast(mkFilter(0), col("s"))
    // MaxEntries newer registrations evict #0's token from the FIFO
    (1 to BloomBroadcasts.MaxEntries).foreach(i =>
      Fns.bloomContainsBroadcast(mkFilter(i), col("s")))
    import spark.implicits._
    val df = Seq("item0").toDF("s")
    // a column built BEFORE the churn but analyzed within the window
    // still resolves (tokens are evicted, not invalidated)
    val fresh = Fns.bloomContainsBroadcast(mkFilter(999), col("s"))
    assert(df.select(fresh.as("hit")).head().getBoolean(0) === false)
    // ... but the evicted one fails LOUDLY at analysis, pointing at the
    // rebuild path — never a silent wrong-filter probe
    val ex = intercept[Throwable] { df.select(stale.as("hit")).collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    val msgs = messages(ex)
    assert(msgs.exists(m => m.contains("no broadcast Bloom filter") &&
        m.contains("evicted FIFO")),
      s"evicted-token analysis did not fail with the pinned message: $msgs")
  }

  test("mixture sampling matches per-row hash membership computed independently") {
    val rows = (0L until 300L).map { i =>
      Row(i, if (i % 3 == 0) "en" else if (i % 3 == 1) "es" else "xx",
        s"doc $i")
    }
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val rates = Map("en" -> 100, "es" -> 50)
    val got = Curation.mixtureCounts(docs, rates, defaultRate = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expected = rows.groupBy(_.getString(1)).map { case (lang, rs) =>
      val rate = rates.getOrElse(lang, 10)
      lang -> (rs.size.toLong,
        rs.count(r => bucket(r.getLong(0), ":mix") < rate).toLong)
    }
    assert(got == expected)
    // en keeps everything; the others genuinely subsample
    assert(got("en")._1 == got("en")._2)
    assert(got("xx")._2 < got("xx")._1)
  }

  test("decontamination plan: one pass over the corpus, window on fp") {
    val rows = (0L until 100L).map(i => Row(i, "en", s"doc number $i text"))
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val q = Curation.decontaminationCounts(docs)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in plan:\n$plan")
    assert(plan.contains("fp"), s"fingerprint key missing from plan:\n$plan")
    // the join formulation read the corpus once per split branch; the
    // window formulation must keep it to a single source scan
    val scans = plan.split("\n").count(_.contains("Scan ExistingRDD"))
    assert(scans == 1, s"expected 1 source scan, saw $scans:\n$plan")
  }

  test("quality top-k rides the TopKPerKey operator, not a full Window sort") {
    val q = graft.queries.Registry.queries("q70_quality_topk")(
      spark, "/root/testdata/sf0.001")
    val rows = q.collect()
    assert(rows.nonEmpty)
    // at most 3 per language, rn consecutive from 1
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      assert(rs.length <= 3, s"$lang has ${rs.length} rows")
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to rs.length), s"$lang rns")
    }
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("TopKPerKeyFinal"), s"no TopKPerKey in plan:\n$plan")
    assert(plan.contains("TopKPerKeyPartial"), s"no partial phase:\n$plan")
  }

  test("stratified quota sampling: exact per-language quotas through TopKPerKey") {
    val q = graft.queries.Registry.queries("q81_stratified_quota")(
      spark, "/root/testdata/sf0.001")
    val rows = q.collect()
    assert(rows.nonEmpty)
    // exactly min(quota, stratum size) per language, rn consecutive, and
    // the selection matches an independently computed hash ranking
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def key(id: Long): Long = {
      val d = MessageDigest.getInstance("MD5")
        .digest((id.toString + ":strat").getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val expect = docs.toSeq.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
      ds.map(_._1).sortBy(id => (key(id), id)).take(20)
        .zipWithIndex.map { case (id, i) => (lang, id, i + 1) }
    }.toSet
    val got = rows.map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expect, s"selection diverged from independent ranking")
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("TopKPerKeyFinal") && plan.contains("TopKPerKeyPartial"),
      s"quota sampling not planned through TopKPerKey:\n$plan")
  }

  test("dup-ngram ratio: cross-doc shared shingles counted exactly") {
    val rows = Seq(
      Row(1L, "en", "a b c d"), // shingles {a b c, b c d}
      Row(2L, "en", "a b c x"), // shingles {a b c, b c x} — shares "a b c"
      Row(3L, "en", "p q r s")) // fully unique
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val got = Curation.dupNgramRatios(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(
      1L -> ((2L, 1L, 0.5)),
      2L -> ((2L, 1L, 0.5)),
      3L -> ((2L, 0L, 0.0))))
  }

  test("ngram decontamination flags shared passages, not shared vocabulary") {
    val ids = (0L until 400L)
    val trainIds = ids.filter(split(_) == "train")
    val testIds = ids.filter(split(_) == "test")
    val passage = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    val rows = Seq(
      Row(trainIds.head, "en", passage + " filler one two"),
      // test doc embedding the passage verbatim -> exactly one shared 8-gram
      Row(testIds(0), "en", "intro words go here then " + passage),
      // test doc reusing the VOCABULARY but never an 8-token run
      Row(testIds(1), "en",
        "alpha beta gamma delta epsilon zeta eta off theta on"))
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val got = Curation.ngramOverlapDecontamination(docs).head()
    assert(got.getLong(0) == 2L, s"n_test = ${got.getLong(0)}")
    assert(got.getLong(1) == 1L, s"n_contaminated = ${got.getLong(1)}")
    assert(got.getLong(2) == 1L, s"n_overlap_grams = ${got.getLong(2)}")
  }

  test("quality-tiered mixture: tier gate and keep rule match independent computation") {
    // doc text controls the stopword ratio: "the" repeated -> high tier,
    // no stopwords -> low tier; 12 tokens each (>= 10 gate)
    val hi = ("the " * 6 + "alpha beta gamma delta epsilon zeta").trim // 6/12 stop
    val lo = "alpha beta gamma delta epsilon zeta eta iota kappa mu nu xi"
    val rows = (0L until 200L).map(i =>
      Row(i, "en", if (i % 2 == 0) hi else lo))
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    import org.apache.spark.sql.functions._
    val toks = graft.llm.TextOps.tokens(col("text"))
    val t = docs.select(col("doc_id"), col("lang"), size(toks).as("nt"),
      graft.llm.TextOps.stopHits(toks, graft.llm.TextOps.EnglishStop).as("ns"))
    val tiers = t.select(col("doc_id"),
        when(col("ns") * 20 >= col("nt"), "high").otherwise("low").as("tier"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // independent expectation: even ids are high tier, odd low
    assert((0L until 200L).forall(i =>
      tiers(i) == (if (i % 2 == 0) "high" else "low")))
    // keep rule: high tier keeps everything; low tier keeps bucket<25
    val kept = (0L until 200L).map(i =>
      i -> (tiers(i) == "high" || this.bucket(i, ":qmix") < 25)).toMap
    assert(kept.count(_._2 == true) > 100 && kept.count(_._2 == false) > 50,
      "planted corpus should genuinely subsample the low tier")
  }

  test("repetition ratio is exact shingle arithmetic") {
    val rows = Seq(
      Row(1L, "en", "a b c a b c a b c"), // 9 tokens, 7 shingles, 3 distinct
      Row(2L, "en", "one two three four five"), // no repetition
      Row(3L, "en", "x y")) // < 3 tokens -> excluded
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val got = Curation.repetitionRatios(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == ((7, 3, BigDecimal(1.0 - 3.0 / 7).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got(2L) == ((3, 3, 0.0)))
  }

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("curateCorpus runs the whole funnel: dedup, best-rep, quality, redaction, shards") {
    // quality-passing base text: >= 30 tokens, ~1/3 stopwords, en
    def good(tag: String, extra: Int = 0): String =
      (Seq.fill(10)("the") ++ (0 until (20 + extra)).map(i => s"$tag$i"))
        .mkString(" ")
    val cloneA = good("alpha")
    val rows = Seq(
      // clone group: 3 exact copies; all tie on tokens -> min doc_id (10) survives
      Row(10L, "en", cloneA), Row(11L, "en", cloneA), Row(12L, "en", cloneA),
      // near-dup pair: 21 has MORE tokens -> best-of-cluster keeps 21, drops 20
      Row(20L, "en", good("beta")),
      Row(21L, "en", good("beta") + " beta20 beta21 beta22"),
      // unique survivors
      Row(30L, "en", good("gamma")),
      Row(31L, "en", "mail me at bob@example.org " + good("delta")),
      // quality failures: wrong lang, too short, no stopwords
      Row(40L, "de", good("eps")),
      Row(41L, "en", "short doc"),
      Row(42L, "en", (0 until 40).map(i => s"zeta$i").mkString(" ")))
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    val out = java.nio.file.Files.createTempDirectory("curate").toString
    val r = Curation.curateCorpus(docs, out, shards = 4)
    assert(r.nDocs == 10L)
    // dedup drops 11, 12 (clones of 10) and 20 (near-dup of richer 21)
    assert(r.nAfterDedup == 7L, s"report: $r")
    // quality drops 40 (de), 41 (short), 42 (no stopwords)
    assert(r.nExported == 4L, s"report: $r")
    val exported = spark.read.parquet(r.shardsDir)
    val byId = exported.collect()
      .map(x => x.getLong(x.fieldIndex("doc_id")) ->
        x.getString(x.fieldIndex("text"))).toMap
    assert(byId.keySet == Set(10L, 21L, 30L, 31L))
    // the PII span was scrubbed on the way out
    assert(byId(31L).contains("<EMAIL>") && !byId(31L).contains("bob@"),
      s"unredacted export: ${byId(31L)}")
    // shard column present and within range
    assert(exported.select("shard").collect()
      .map(_.getInt(0)).forall(s => s >= 0 && s < 4))
  }

  test("substring decontamination reports planted train->test quotes at exact offsets") {
    // pick real split members via the local md5-bucket mirror, then
    // plant a 9-token test passage quoted by two train docs (at
    // different offsets), by a val doc (must NOT report — neither
    // side), and a separate run shared by two train docs (must NOT
    // report — same split)
    val ids = 0L to 400L
    val tid = ids.find(split(_) == "test").get
    val vid = ids.find(split(_) == "val").get
    val trainIds = ids.filter(split(_) == "train")
    val Seq(tr1, tr2, tr3, tr4) = trainIds.take(4)
    def toks(p: String, n: Int) = (1 to n).map(i => s"$p$i")
    val quote = toks("qq", 9)
    val trainRun = toks("rr", 8)
    val rows = Seq(
      Row(tid, "en", (toks("fa", 3) ++ quote ++ toks("fb", 2)).mkString(" ")),
      Row(tr1, "en", (quote ++ toks("fc", 4)).mkString(" ")),
      Row(tr2, "en", (toks("fd", 5) ++ quote).mkString(" ")),
      Row(vid, "en", (toks("fe", 2) ++ quote).mkString(" ")),
      Row(tr3, "en", (trainRun ++ toks("ff", 3)).mkString(" ")),
      Row(tr4, "en", (toks("fg", 2) ++ trainRun).mkString(" ")))
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val got = Curation.substringDecontamination(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == Set(
      (tr1, tid, 1L, 4L, 9L),
      (tr2, tid, 6L, 4L, 9L)), s"got $got (tid=$tid tr1=$tr1 tr2=$tr2)")

    // the composed rewrite: quoted regions cut from the TRAIN docs
    // only; the train-train shared run survives (not contamination),
    // test/val docs are not in the output at all
    val cut = Curation.decontaminateCut(docs).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(cut.keySet == Set(tr1, tr2, tr3, tr4), s"got ${cut.keySet}")
    assert(cut(tr1) == toks("fc", 4).mkString(" "), s"tr1: ${cut(tr1)}")
    assert(cut(tr2) == toks("fd", 5).mkString(" "), s"tr2: ${cut(tr2)}")
    assert(cut(tr3) == (trainRun ++ toks("ff", 3)).mkString(" "))
    assert(cut(tr4) == (toks("fg", 2) ++ trainRun).mkString(" "))
  }

  test("cutDuplicateSpans removes a planted boilerplate header keep-first") {
    // a 10-token license header shared by three docs: the lowest doc_id
    // keeps it, the later two lose exactly the header, a doc that IS
    // only the header vanishes, untouched docs pass through unchanged
    val header = (1 to 10).map(i => s"license$i").mkString(" ")
    def body(tag: String): String = (1 to 15).map(i => s"$tag$i").mkString(" ")
    val rows = Seq(
      Row(1L, "en", header + " " + body("alpha")),
      Row(2L, "en", header + " " + body("beta")),
      Row(3L, "en", body("gamma") + " " + header),
      Row(4L, "en", header),          // nothing but boilerplate
      Row(5L, "en", body("delta")))   // untouched
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val out = Curation.cutDuplicateSpans(docs).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) ->
        r.getString(r.fieldIndex("text"))).toMap
    assert(out(1L) == header + " " + body("alpha"), s"doc1: ${out(1L)}")
    assert(out(2L) == body("beta"), s"doc2: ${out(2L)}")
    assert(out(3L) == body("gamma"), s"doc3: ${out(3L)}")
    assert(!out.contains(4L), s"doc4 should be cut to empty: $out")
    assert(out(5L) == body("delta"), s"doc5: ${out(5L)}")
    // non-text columns survive the rewrite
    assert(Curation.cutDuplicateSpans(docs).columns.toSet ==
      Set("doc_id", "lang", "text"))
  }

  test("pii redaction scrubs emails, phones, and ips with typed placeholders") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq(
      "mail bob.smith+x@corp.example.org now",
      "dial 555-0123 or 555-9876 twice",
      "node 10.0.42.7 peers with 192.168.1.255",
      "clean text with no pii at all",
      "mixed a@b.io 555-0000 127.0.0.1 end").toDF("t")
    val got = df.select(Curation.redactPii(col("t")).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq(
      "mail <EMAIL> now",
      "dial <PHONE> or <PHONE> twice",
      "node <IP> peers with <IP>",
      "clean text with no pii at all",
      "mixed <EMAIL> <PHONE> <IP> end"))
    val counts = df.select(
        Curation.piiCounts(col("t")).map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
    assert(counts == Seq((1, 0, 0), (0, 2, 0), (0, 0, 2), (0, 0, 0), (1, 1, 1)))
    // the scrub is a pure projection: no exchange anywhere in its plan
    val plan = df.select(Curation.redactPii(col("t")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"redaction shuffled:\n$plan")
  }

  test("line dedup drops corpus-duplicated lines and fingerprints the cleaned text") {
    // 3-token chunk-lines; "a b c" occurs in two docs -> all copies drop
    val rows = Seq(
      Row(1L, "en", "a b c d e f"), // lines: [a b c][d e f]
      Row(2L, "en", "a b c x y z"), // lines: [a b c][x y z]
      Row(3L, "en", "p q r s t u v"), // trailing "v" short of a chunk drops
      Row(4L, "en", "a b c"), // every line duplicated -> empty clean text
      Row(5L, "en", "x y")) // < 3 tokens -> no lines at all
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val q = Curation.lineDedup(docs)
    val got = q.collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3))))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(1L) == ((2, 1, md5hex("d e f").take(16))))
    assert(got(2L) == ((2, 1, md5hex("x y z").take(16))))
    assert(got(3L) == ((2, 2, md5hex("p q r s t u").take(16))))
    assert(got(4L) == ((1, 0, md5hex("").take(16))))
    // the q76 window shape: one source scan, no pair join
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"pair join in plan:\n$plan")
    val scans = plan.split("\n").count(_.contains("Scan ExistingRDD"))
    assert(scans == 1, s"expected 1 source scan, saw $scans:\n$plan")
  }

  test("temperature mixture: probabilities normalize, budget conserved") {
    val rows = graft.queries.Registry
      .queries("q104_temperature_mix")(spark, "/root/testdata/sf0.001")
      .collect()
    // each p_sample is rounded to 4 decimals, so the sum is 1 up to
    // nlang rounding steps; expected_docs likewise vs the 10k budget
    val pSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(pSum - 1.0) <= rows.length * 5e-5 + 1e-9,
      s"p_sample sums to $pSum over ${rows.length} langs")
    val eSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(eSum - 10000.0) <= rows.length * 0.005 + 1e-6,
      s"expected_docs sums to $eSum")
    // the temperature actually flattens: every language's sampled share
    // sits between its raw share and the uniform share
    val n = rows.map(_.getLong(1)).sum.toDouble
    val uniform = 1.0 / rows.length
    rows.foreach { r =>
      val raw = r.getLong(1) / n
      val p = r.getDouble(2)
      val lo = math.min(raw, uniform) - 1e-4
      val hi = math.max(raw, uniform) + 1e-4
      assert(p >= lo && p <= hi,
        s"${r.getString(0)}: p=$p outside [$lo, $hi] (raw=$raw)")
    }
  }

  test("derived temperature rates conserve the budget in expectation") {
    val docs = graft.core.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
    val budget = 50L
    val rates = graft.llm.Curation.deriveTemperatureRates(docs, budget)
      .collect()
    // expected kept = sum over langs of n_l * rate_l / 100; each rate is
    // rounded to an integer percent, so the error budget is
    // 0.5% of the corpus plus one doc (cap-free at this small budget)
    val expected = rates.map(r => r.getLong(1) * r.getLong(2) / 100.0).sum
    val n = rates.map(_.getLong(1)).sum
    assert(rates.forall(_.getLong(2) < 100),
      s"budget $budget should not saturate any language at sf0.001")
    assert(math.abs(expected - budget) <= 0.005 * n + 1.0,
      s"expected-kept $expected strays from budget $budget")
    // the rates implement the temperature flattening: sampled share of a
    // language grows with n^0.5, so rate (share/n) must fall as n grows
    val byN = rates.sortBy(_.getLong(1)).map(_.getLong(2))
    assert(byN.zip(byN.tail).forall { case (lo, hi) => lo >= hi },
      s"rates not monotone non-increasing in corpus size: ${byN.toSeq}")
  }

  test("dataset card: one corpus scan feeds lang, source, and overall rows") {
    val q = graft.queries.Registry
      .queries("q106_dataset_card")(spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = plan.split("\n")
      .count(l => l.contains("FileScan") || l.contains("Scan parquet"))
    assert(scans == 1, s"expected 1 corpus scan, saw $scans:\n$plan")
    assert(plan.contains("Expand"), s"no Expand (grouping sets):\n$plan")
    // the overall row must reconcile with the per-language rows
    val rows = q.collect()
    val all = rows.filter(_.getString(0) == "all")
    assert(all.length == 1)
    val langRows = rows.filter(_.getString(0) == "lang")
    assert(all.head.getLong(2) == langRows.map(_.getLong(2)).sum)
    assert(all.head.getLong(3) == langRows.map(_.getLong(3)).sum)
  }

  test("gopher rules: each rule trips on its planted violation, map-only plan") {
    val q = graft.queries.Registry
      .queries("q108_gopher_rules")(spark, "/root/testdata/sf0.001")
    // map-only gate: no exchange below the final TakeOrdered
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Exchange"),
      s"quality gate should be map-only before TakeOrdered:\n$plan")

    // planted corpus: one doc per violated rule + one clean keeper
    val keepText = (Seq("the", "a") ++ Seq.fill(48)("spark")).mkString(" ")
    val rows = Seq(
      (0L, keepText),                                    // keep = 1
      (1L, "the a spark"),                               // too few words
      (2L, (Seq("the", "a") ++ Seq.fill(48)("ab")).mkString(" ")),  // mean len < 3
      (3L, (Seq("the", "a") ++ Seq.fill(48)("#spark#")).mkString(" ")), // symbols
      (4L, (Seq("the", "a") ++ Seq.fill(10)("spark") ++
        Seq.fill(38)("123")).mkString(" ")),             // alpha frac <= 0.8
      (5L, Seq.fill(50)("spark").mkString(" ")))         // < 2 stop words
    // write a planted documents.parquet and run the PRODUCTION query on it
    val dir = java.nio.file.Files.createTempDirectory("gopher").toString
    val schema2 = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("text", StringType), StructField("n_chars", LongType)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map { case (i, t) => Row(i, "en", "web", t, t.length.toLong) },
          2), schema2)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.Registry.queries("q108_gopher_rules")(spark, dir)
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    assert(got.toSeq == Seq(0L -> 1, 1L -> 0, 2L -> 0, 3L -> 0, 4L -> 0,
      5L -> 0), s"rule outcomes wrong: ${got.mkString(",")}")
  }

  test("dsir weights: gram passes share one exchange; weight join broadcasts") {
    val q = graft.queries.Registry
      .queries("q109_dsir_weights")(spark, "/root/testdata/sf0.001")
    q.collect() // AQE stage reuse materializes at runtime
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"tokenize pass not reused between counting and scoring:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"256-bucket weight table should broadcast:\n$plan")
    // target-slice monotonicity on a planted corpus: a doc made of
    // target-only grams must outscore a doc of non-target-only grams
    val dir = java.nio.file.Files.createTempDirectory("dsir").toString
    val schema2 = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("text", StringType), StructField("n_chars", LongType)))
    val enText = Seq.fill(30)("alpha beta").mkString(" ")
    val deText = Seq.fill(30)("gamma delta").mkString(" ")
    val rows = (0L until 8L).map(i =>
      Row(i, if (i < 4) "en" else "de", "web",
        if (i < 4) enText else deText, 60L))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema2)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val scores = graft.queries.Registry.queries("q109_dsir_weights")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(0L) > scores(4L),
      s"target-domain doc should outscore off-domain doc: $scores")
  }

  test("sourceDivergence: identical sources diverge 0, disjoint sources ln 2") {
    val srcSchema = StructType(Seq(StructField("source", StringType),
      StructField("text", StringType)))
    def df(rows: (String, String)*) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromTuple), 2), srcSchema)
    // s1 and s2 share the exact unigram distribution; s3 is disjoint
    val docs = df(
      ("s1", "spark table row spark"), ("s2", "spark table row spark"),
      ("s3", "alpha beta gamma delta"))
    val out = Curation.sourceDivergence(docs)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
      .toMap
    assert(out(("s1", "s2")) == 0.0, s"identical dists: ${out(("s1", "s2"))}")
    val ln2 = BigDecimal(math.log(2.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(("s1", "s3")) == ln2 && out(("s2", "s3")) == ln2,
      s"disjoint dists should hit the JS maximum ln2=$ln2: $out")
    // symmetry of the underlying measure: both disjoint pairs agree
    assert(out.size == 3)
  }

  test("sourceDivergence: partial overlap lands strictly between 0 and ln 2") {
    val srcSchema = StructType(Seq(StructField("source", StringType),
      StructField("text", StringType)))
    def df(rows: (String, String)*) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromTuple), 2), srcSchema)
    val docs = df(("a", "x x y y"), ("b", "x x z z"))
    val js = Curation.sourceDivergence(docs).collect().head.getDouble(2)
    assert(js > 0.0 && js < math.log(2.0), s"partial overlap JS: $js")
    // hand-checked: p=(x:.5,y:.5), q=(x:.5,z:.5) -> co-term x contributes
    // 0, one-sided mass .5 each side -> JS = 0.5*ln2*(0.5+0.5) = ln2/2
    assert(math.abs(js - 0.5 * math.log(2.0)) < 1e-3, s"JS: $js")
  }

  test("sourceLangMi: independence gives MI 0, determinism gives MI = H(lang)") {
    val miSchema = StructType(Seq(StructField("source", StringType),
      StructField("lang", StringType)))
    def mi(rows: (String, String)*): (Double, Double, Double) = {
      val out = Curation.sourceLangMi(spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(Row.fromTuple), 2), miSchema))
        .collect().head
      (out.getDouble(2), out.getDouble(3), out.getDouble(4)) // h_lang, mi, nmi
    }
    // independent: every (source, lang) cell equally likely
    val indep = for (s <- Seq("s1", "s2"); l <- Seq("en", "de")) yield (s, l)
    val (_, mi0, _) = mi(indep: _*)
    assert(mi0 == 0.0, s"independent grid should give MI 0: $mi0")
    // deterministic: source fixes lang -> MI = H(lang), NMI = 1
    val (hLang, miD, nmiD) = mi(("s1", "en"), ("s1", "en"), ("s2", "de"),
      ("s2", "de"))
    assert(miD == hLang, s"deterministic mapping: MI=$miD H(lang)=$hLang")
    assert(nmiD == 1.0)
  }

  test("unimax: small language capped at epoch cap, rest split the level, budget conserved") {
    val sch = StructType(Seq(StructField("lang", StringType),
      StructField("n_chars", LongType)))
    def mk(rows: (String, Long)*) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromTuple), 2), sch)
    // caps (E=3): aa 30, bb 300, cc 300; budget 2x = 420. Waterfill by
    // hand: aa capped (30 <= (420-30)/2), level t = 195 for bb/cc.
    val out = Curation.unimaxAllocation(mk(("aa", 10L), ("bb", 100L),
      ("cc", 100L))).collect()
    val byLang = out.map(r => r.getString(0) ->
      (r.getDouble(3), r.getDouble(4), r.getInt(5))).toMap
    assert(byLang("aa") == ((30.0, 3.0, 1)), s"aa: ${byLang("aa")}")
    assert(byLang("bb") == ((195.0, 1.95, 0)))
    assert(byLang("cc") == ((195.0, 1.95, 0)))
    // allocations sum exactly to the budget
    assert(out.map(_.getDouble(3)).sum == 420.0)
    // budget below every cap: nobody capped, uniform level = B/n
    val low = Curation.unimaxAllocation(mk(("aa", 10L), ("bb", 10L)),
      epochCap = 3, budgetMult = 1).collect()
    assert(low.forall(_.getInt(5) == 0))
    assert(low.forall(_.getDouble(3) == 10.0)) // t = 20/2
    // budget above total capacity: everyone capped at the epoch cap
    val high = Curation.unimaxAllocation(mk(("aa", 10L), ("bb", 10L)),
      epochCap = 1, budgetMult = 2).collect()
    assert(high.forall(r => r.getInt(5) == 1 && r.getDouble(3) == 10.0 &&
      r.getDouble(4) == 1.0))
  }

  test("mixture realization: copies match the integer basis-point rule doc by doc") {
    val sch = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType), StructField("n_chars", LongType)))
    val docs = Seq((1L, "aa", 10L), (2L, "bb", 40L), (3L, "bb", 60L),
      (4L, "cc", 100L))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(docs.map(Row.fromTuple), 2), sch)
    // waterfill (E=3, B=2x420/2=420): aa capped at 30000 bp, bb/cc at
    // e_bp = (10000*390) div (2*100) = 19500 -> 1 full copy + 9500 bp
    val eBp = Map("aa" -> 30000L, "bb" -> 19500L, "cc" -> 19500L)
    def bkt10k(id: Long): Long = // q59's md5 bucket rule, mod 10000
      java.lang.Long.parseLong(MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString, 16) % 10000
    def copies(id: Long, lang: String): Long =
      eBp(lang) / 10000 + (if (bkt10k(id) < eBp(lang) % 10000) 1L else 0L)
    val expected = docs.groupBy(_._2).map { case (lang, ds) =>
      lang -> (ds.map(d => copies(d._1, lang)).sum,
        ds.map(d => d._3 * copies(d._1, lang)).sum)
    }
    val out = Curation.unimaxRealize(df).collect()
      .map(r => r.getString(0) -> r).toMap
    for ((lang, (nEmit, charsEmit)) <- expected) {
      assert(out(lang).getLong(1) == eBp(lang),
        s"$lang e_bp: ${out(lang).getLong(1)}")
      assert(out(lang).getLong(4) == nEmit,
        s"$lang n_emitted: ${out(lang).getLong(4)} vs $nEmit")
      assert(out(lang).getLong(6) == charsEmit)
    }
    assert(out("aa").getInt(2) == 1 && out("bb").getInt(2) == 0)
    assert(out("aa").getDouble(7) == 3.0) // capped lang achieves its cap exactly
  }

  test("boilerplate: cross-doc same-source lines flagged, within-doc repetition is not") {
    val sch = StructType(Seq(StructField("doc_id", LongType),
      StructField("source", StringType), StructField("text", StringType)))
    val rows = Seq(
      Row(1L, "s1", "a b c x y z"),   // "a b c" shared with doc 2 (s1)
      Row(2L, "s1", "a b c q r t"),
      Row(3L, "s1", "foo bar baz u v w"),
      Row(4L, "s2", "p q r p q r"))   // repeated WITHIN one doc only
    val out = Curation.boilerplateReport(spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), sch))
      .collect().map(r => r.getString(0) -> r).toMap
    val s1 = out("s1")
    assert(s1.getLong(1) == 5, s"s1 distinct lines: ${s1.getLong(1)}")
    assert(s1.getLong(2) == 1) // "a b c"
    assert(s1.getLong(3) == 6 && s1.getLong(4) == 2)
    assert(s1.getDouble(5) == 0.3333)
    assert(s1.getLong(6) == 2) // docs 1 and 2
    val s2 = out("s2")
    assert(s2.getLong(2) == 0 && s2.getLong(4) == 0 && s2.getLong(6) == 0,
      "within-doc repetition must not count as boilerplate")
    assert(s2.getLong(3) == 2) // two instances of the one line
  }

  test("blocklistHits: whole-token phrase matching, absent docs are the kept set") {
    val rows = Seq(
      // "slow" twice + the phrase "big vector" once; "slowly" must NOT hit
      Row(1L, "en", "slow query slow scan big vector slowly"),
      // phrase tokens present but NOT consecutive -> no phrase hit;
      // "vector big" is the wrong order -> no hit at all
      Row(2L, "en", "big scan vector big"),
      // clean doc -> absent from output
      Row(3L, "en", "fast table join"),
      // both phrases, one wrapping token boundary each
      Row(4L, "en", "merge batch big vector merge"),
      // term at the very start and very end
      Row(5L, "en", "slow table slow"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val got = Curation.blocklistHits(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> ((3L, 2L)),  // slow x2 + "big vector" -> 3 hits, 2 terms
      4L -> ((2L, 2L)),  // "merge batch" + "big vector"
      5L -> ((2L, 1L))), s"got $got")
    assert(!got.contains(2L) && !got.contains(3L))
    // broadcast term join: the corpus side must never be the build side
    // of a shuffle join, and nothing may go cartesian
    val plan = Curation.blocklistHits(df).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("crawlDelta: distinct-fingerprint carry-over between consecutive snapshots") {
    val s = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("text", StringType)))
    val rows = Seq(
      Row(1L, "src0", "alpha beta"),
      Row(2L, "src0", "gamma delta"),
      Row(3L, "src0", "gamma  delta"),   // same fp as 2 (whitespace-normalized)
      Row(4L, "src1", "gamma delta"),    // carried 0 -> 1
      Row(5L, "src1", "epsilon zeta"),
      Row(6L, "src2", "epsilon zeta"),   // carried 1 -> 2
      Row(7L, "src2", "eta theta"),
      Row(8L, "src2", "iota kappa"))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), s)
    val got = Curation.crawlDelta(df).collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    // src0 has TWO distinct fps (3 is a whitespace clone of 2)
    assert(got(0) == (("src0", "src1", 2L, 2L, 1L, 0.5)), s"k0: ${got(0)}")
    assert(got(1) == (("src1", "src2", 2L, 3L, 1L, 0.5)), s"k1: ${got(1)}")
    assert(got.size == 2)
  }

  test("madOutliers: value-pinned median/MAD, integer outlier gate") {
    val s = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val rows = Seq(
      Row(1L, "s", 10L), Row(2L, "s", 10L), Row(3L, "s", 12L),
      Row(4L, "s", 14L), Row(5L, "s", 100L), // med 12, mad 2, one outlier
      Row(6L, "t", 7L), Row(7L, "t", 7L))    // med 7, mad 0: any dev > 0 trips
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), s)
    val got = Curation.madOutliers(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("s") == ((5L, 12L, 2L, 1L)), s"s: ${got("s")}")
    assert(got("t") == ((2L, 7L, 0L, 0L)), s"t: ${got("t")}")
  }

  test("piiColumnProfile counts regex-flagged values per column") {
    val s = StructType(Seq(
      StructField("name", StringType), StructField("contact", StringType)))
    val rows = Seq(
      Row("alice", "alice@example.com"),
      Row("bob 10.0.0.1", "call 555-7421"),          // ip in name, phone in contact
      Row("carol", "no pii here"),
      Row(null, "b@x.io and 192.168.1.1"))           // null-safe; two patterns one value
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), s)
    val got = Curation.piiColumnProfile(df, Seq("name", "contact")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // (n_rows, n_email, n_phone, n_ip)
    assert(got("name") == ((4L, 0L, 0L, 1L)), s"name: ${got("name")}")
    assert(got("contact") == ((4L, 2L, 1L, 1L)), s"contact: ${got("contact")}")
  }

  test("filter overlap: pairwise counts and jaccard from planted flags") {
    import spark.implicits._
    // 4 docs: a={1,2}, b={1,4}, c={} — a∩b={1}
    val flags = Seq(
      (true, true, false), (true, false, false),
      (false, false, false), (false, true, false))
      .toDF("a", "b", "c")
    val got = Curation.filterOverlap(flags).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    assert(got(("a", "a")) == ((2L, 2L, 2L, Some(1.0))))
    assert(got(("a", "b")) == ((2L, 2L, 1L, Some(0.3333))))
    assert(got(("a", "c")) == ((2L, 0L, 0L, Some(0.0))))
    // an empty∩empty pair is NULL, not 0/0
    assert(got(("c", "c")) == ((0L, 0L, 0L, None)))
    assert(got.size == 6) // i <= j pairs only, no mirrored duplicates
  }
}
