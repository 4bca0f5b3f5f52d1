package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Q

/** Corpus-curation operators beyond dedup: test-set decontamination,
  * deterministic data-mixture sampling, and within-document repetition
  * scoring. All three are pure hash/column arithmetic shared by both
  * engines, so every entry is value-hash-checked against DuckDB.
  */
object Curation {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

  /** The q59 split rule: md5(doc_id) % 100 → 90/5/5 train/val/test. */
  def splitCol: org.apache.spark.sql.Column = {
    val bucket = pmod(
      conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(100))
    when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
  }

  /** SUBSTRING-level train/test decontamination — the verbatim-overlap
    * check the GPT-3 appendix ran with 13-grams and Lee et al. run at
    * arbitrary length: every MAXIMAL run of >= minRun tokens a TRAIN
    * doc shares verbatim with a TEST doc, as (train_doc, test_doc,
    * p_train, p_test, len). The n-gram form (q68 family) flags overlap
    * PRESENCE; this reports the exact quoted regions, the evidence to
    * cut surgically (the exactSubstringRemove interval machinery)
    * instead of dropping whole docs.
    *
    * Scale shape: both splits' positional grams ride ONE equi-join on
    * the 8-byte suffix key ([[graft.llm.Dedup]]'s reduction restricted
    * to cross-split pairs); the split label derives map-side from
    * doc_id (no membership join), the df cap guards boilerplate grams,
    * and the test side of the join — a benchmark suite, tiny next to
    * the corpus — is broadcast by AQE at runtime, never by hint.
    * Plan note: the split filters push BELOW the g-exchange, so the
    * cap pass shuffles the full gram stream once and each join side
    * shuffles only its own split's grams (~5% for test) — three linear
    * exchanges instead of one reused one, a bounded constant, never a
    * quadratic risk (pair fan-out per gram is capped at maxDf²).
    */
  def substringDecontamination(docsDf: DataFrame,
      minRun: Int = Dedup.ExactSubstringMinRun,
      maxDf: Int = Dedup.DefaultMaxShingleDf): DataFrame =
    substringDecontamination0(docsDf, minRun, maxDf)
      .orderBy(col("train_doc"), col("test_doc"), col("p_train"),
        col("p_test"))

  private def substringDecontamination0(docsDf: DataFrame, minRun: Int,
      maxDf: Int): DataFrame = {
    val grams = Dedup
      .positionalGrams(docsDf.select(col("doc_id"), col("text")), minRun)
      .withColumn("split", splitCol)
    val sh = grams.repartition(col("g"))
    val hot = sh.groupBy(col("g")).agg(count(lit(1)).as("dfc"))
      .filter(col("dfc") > maxDf)
      .select(col("g"))
    val idx = sh.join(hot, Seq("g"), "left_anti")
    val m = idx.filter(col("split") === "train")
      .select(col("doc_id").as("d1"), col("p").as("p1"), col("g"))
      .join(idx.filter(col("split") === "test")
        .select(col("doc_id").as("d2"), col("p").as("p2"), col("g")),
        Seq("g"))
      .select(col("d1"), col("d2"), col("p1"), col("p2"))
    Dedup.diagonalIslands(m, minRun)
      .select(col("d1").as("train_doc"), col("d2").as("test_doc"),
        col("p1").as("p_train"), col("p2").as("p_test"), col("len"))
  }

  /** Decontaminated TRAIN rewrite — compose [[substringDecontamination]]
    * with the q165 interval cut: every verbatim test-quoted region is
    * removed from the train docs (the test set stays untouched — it is
    * the benchmark), surviving tokens reassembled. Output is the train
    * split only: (doc_id, n_tokens, removed_tokens, clean_text) — what
    * a training-shard export would consume after the leakage audit.
    * Same linear shape as the decon report plus one doc_id-keyed cut
    * join; no pair expansion beyond the (tiny) contaminated span list.
    */
  def decontaminateCut(docsDf: DataFrame,
      minRun: Int = Dedup.ExactSubstringMinRun,
      maxDf: Int = Dedup.DefaultMaxShingleDf): DataFrame = {
    val spans = substringDecontamination0(docsDf, minRun, maxDf)
    val cov = spans.select(col("train_doc").as("doc_id"),
      col("p_train").as("s"), (col("p_train") + col("len") - 1).as("e"))
    Dedup.cutIntervals(
        docsDf.filter(splitCol === "train")
          .select(col("doc_id"), col("text")),
        cov)
      .orderBy(col("doc_id"))
  }

  /** (n_test, n_contaminated): test-split docs whose normalized content
    * fingerprint also appears in the train split — see q66.
    */
  def decontaminationCounts(docsDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // window max over the fingerprint, not train-distinct + probe-join:
    // the join form filters each split below the shared scan+fingerprint
    // subtree, scanning the corpus text twice (see
    // ngramOverlapDecontamination — same pushdown trap, same fix). One
    // scan, one exchange on fp, group cost = fp's duplicate count.
    val t = docsDf.select(
      col("doc_id"), splitCol.as("split"),
      TextOps.fingerprint(col("text")).as("fp"))
    val inTrain = max(when(col("split") === "train", 1).otherwise(0))
      .over(Window.partitionBy(col("fp")))
    t.select(col("split"), inTrain.as("in_train"))
      .filter(col("split") === "test")
      .agg(
        count(lit(1)).as("n_test"),
        sum(col("in_train")).as("n_contaminated"))
  }

  /** q66's answer via a broadcast-Bloom pre-join filter — the shape for
    * a corpus so large that shuffling every fingerprint (q66's window
    * form) is itself the bottleneck. Three steps, result EXACT:
    *
    *  1. Build a Bloom filter of the small side's (test split)
    *     fingerprints with a distributed treeAggregate — partial filters
    *     built map-side, OR-merged up a tree, never collected as rows.
    *  2. Probe the huge train side AGAINST THE SERIALIZED FILTER at the
    *     scan (BloomMightContain, codegen'd): only probable hits —
    *     ~|test| + fpp·|train| rows — reach the distinct's exchange,
    *     instead of the full train fingerprint set.
    *  3. Kill false positives with an exact equi-join on the surviving
    *     fingerprints; count per q66.
    *
    * Trades one extra corpus scan (train and test branches each scan;
    * fingerprinting is a cheap map-side projection) for an exchange
    * that no longer grows with the corpus — the right trade at 100 TB.
    * `expectedItems`/`fpp` size the filter for the test split;
    * `expectedItems <= 0` (the default) sizes it from a doc_id-only
    * count of the test split — one cheap extra job (the split hash
    * reads a single column; the text is never touched), so the filter
    * fits its load at any eval-set size instead of trusting a fixed
    * guess. An undersized filter only raises false positives (more rows
    * through the confirm join), never changes the answer.
    *
    * The serialized filter ships via `sparkContext.broadcast`, not a
    * plan literal: at 10⁷–10⁸ fingerprints the filter is 12–120 MB, and
    * a literal would ride every task binary and plan string
    * (CurationSpec pins the plan stays bytes-free).
    */
  def bloomDecontaminationCounts(docsDf: DataFrame,
      expectedItems: Long = 0L, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.util.sketch.BloomFilter
    val t = docsDf.select(
      col("doc_id"), splitCol.as("split"),
      TextOps.fingerprint(col("text")).as("fp"))
    val items =
      if (expectedItems > 0) expectedItems
      else math.max(
        docsDf.select(splitCol.as("split"))
          .filter(col("split") === "test").count(),
        1024L)
    val bf = t.filter(col("split") === "test").select(col("fp"))
      .rdd.treeAggregate(BloomFilter.create(items, fpp))(
        (f, row) => { f.putString(row.getString(0)); f },
        (a, b) => { a.mergeInPlace(b); a })
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val bc = docsDf.sparkSession.sparkContext.broadcast(bytes)
    val trainHits = t
      .filter(col("split") === "train" &&
        graft.functions.Fns.bloomContainsBroadcast(bc, col("fp")))
      .select(col("fp")).distinct()
    t.filter(col("split") === "test")
      .join(trainHits.withColumn("hit", lit(1)), Seq("fp"), "left")
      .agg(
        count(lit(1)).as("n_test"),
        sum(coalesce(col("hit"), lit(0))).as("n_contaminated"))
  }

  /** Per-language (n_docs, n_sampled) under deterministic salted-hash
    * mixture sampling — see q67. `rates` maps lang → keep percent.
    */
  def mixtureCounts(docsDf: DataFrame, rates: Map[String, Int],
      defaultRate: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (l, r)) =>
      when(col("lang") === l, r).otherwise(acc)
    }
    val bucket = pmod(
      conv(substring(
        md5(concat(col("doc_id").cast("string"), lit(":mix"))), 1, 8),
        16, 10).cast("long"), lit(100))
    docsDf
      .select(col("lang"), when(bucket < rate, 1).otherwise(0).as("keep"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("keep")).as("n_sampled"))
      .orderBy(col("lang"))
  }

  /** Per-language keep rates (integer percent) implementing the q104
    * temperature rule as an APPLYABLE artifact: sampling probability
    * p_l ∝ n_l^alpha, so a budget of B docs distributes E_l = B·p_l per
    * language and the hash-membership rate that realizes it is
    * rate_l = min(100, round(100·E_l / n_l)). Persist the result, then
    * [[mixtureCounts]] enforces it with the deterministic salted-hash
    * rule — derive once on corpus stats, apply reproducibly on any
    * engine, any corpus ordering (the `mix derive` / `mix apply` CLI).
    * Languages where the cap binds (E_l ≥ n_l) keep everything, so the
    * realized total lands at or just under B.
    *
    * 100 TB shape: identical to q104 — one scan collapsing map-side to
    * one row per language; the normalizer is a broadcast 1-row agg.
    */
  def deriveTemperatureRates(docsDf: DataFrame, budget: Long,
      alpha: Double = 0.5): DataFrame = {
    val counts = docsDf.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val z = counts.agg(sum(pow(col("n_docs"), alpha)).as("z"))
    counts.crossJoin(broadcast(z))
      .select(col("lang"), col("n_docs"),
        least(lit(100L),
          round(lit(100.0) * budget * pow(col("n_docs"), alpha)
            / col("z") / col("n_docs"), 0).cast("long")).as("rate"))
      .orderBy(col("lang"))
  }

  /** Per-doc 3-gram repetition: (n_shingles, n_distinct, rep_ratio) —
    * see q68.
    */
  def repetitionRatios(docsDf: DataFrame): DataFrame = {
    val t = docsDf
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= 3)
    t.select(col("doc_id"),
        (size(col("ts")) - 2).as("n_shingles"),
        size(Dedup.shingleArrayFromTokens(col("ts"))).as("n_distinct"))
      .withColumn("rep_ratio",
        round(lit(1.0) - col("n_distinct") / col("n_shingles"), 4))
  }

  /** Per-doc corpus-wide duplicated-n-gram ratio: the fraction of a
    * document's distinct 3-gram shingles that also occur in at least one
    * OTHER document — the n-gram-granularity form of exact-substring
    * dedup's "how much of this doc is duplicated text" statistic (the
    * curation signal for boilerplate-heavy or scraped-twice content;
    * cf. Lee et al. 2021, "Deduplicating Training Data Makes Language
    * Models Better", arXiv:2107.06499).
    *
    * 100 TB shape: one shuffle on the 16-hex md5 shingle key (slim rows:
    * doc_id + 16-byte key), then a window count over the key partition —
    * LINEAR in a hot key's group size (unlike the pair join in q32,
    * which is quadratic and needs the df cap). The per-doc rollup
    * shuffles bounded groups (<= doc length).
    */
  def dupNgramRatios(docsDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = Dedup.shingles(docsDf)
      .select(col("doc_id"), substring(md5(col("s")), 1, 16).as("k"))
    val dfreq = count(lit(1)).over(Window.partitionBy(col("k")))
    keyed
      .select(col("doc_id"), (dfreq >= 2).as("dup"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("dup"), 1).otherwise(0)).as("n_dup"))
      .withColumn("dup_ratio",
        round(col("n_dup") / col("n_shingles"), 4))
  }

  /** (doc_id, split, k) rows: each doc's DISTINCT n-gram shingles as
    * 16-hex md5 keys, tagged with the q59 hash split — the shared
    * projection behind batch ([[ngramOverlapDecontamination]]) and
    * streaming ([[graft.streaming.StreamingCuration]]) n-gram
    * decontamination. Docs shorter than n tokens emit nothing.
    */
  def gramKeys(docsDf: DataFrame, n: Int): DataFrame = {
    val t = docsDf
      .repartition(col("doc_id"))
      .select(col("doc_id"), splitCol.as("split"),
        TextOps.tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= n)
    val gram = array_distinct(
      transform(sequence(lit(1), size(col("ts")) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(j => element_at(col("ts"), i + j)): _*)))
    t.select(col("doc_id"), col("split"), explode(gram).as("g"))
      .select(col("doc_id"), col("split"),
        substring(md5(col("g")), 1, 16).as("k"))
  }

  /** N-gram-overlap decontamination (GPT-3 style, finer than q66's
    * whole-doc fingerprint): a test-split doc is contaminated if ANY of
    * its distinct n-gram shingles also appears in the train split.
    * Returns one row: (n_test, n_contaminated, n_overlap_grams), where
    * n_test counts test docs long enough to have an n-gram.
    *
    * n defaults to 8: long enough that overlap means genuinely shared
    * text (not vocabulary coincidence), the same reasoning as GPT-3's
    * 13-gram choice scaled to this corpus's ~50-token docs.
    *
    * 100 TB shape: both sides shuffle on the near-unique 16-hex md5 gram
    * key; the train-side distinct is a map-side-combined hash agg; the
    * per-doc hit rollup shuffles bounded groups. No broadcast assumed.
    */
  def ngramOverlapDecontamination(docsDf: DataFrame, n: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE tokenize+explode pass: a train-distinct + probe-join
    // formulation filters each split BELOW the shared subtree (pushdown
    // splits it into two full corpus scans — the q61 double-tokenize
    // trap, and repartition doesn't stop it because Filter pushes
    // through RepartitionByExpression). Instead, resolve "does any train
    // doc contain this gram" as a window max over the gram key: one
    // exchange on k, group cost linear in the gram's document frequency,
    // and the split filter CANNOT push below the window it depends on.
    val grams = gramKeys(docsDf, n)
    val inTrain = max(when(col("split") === "train", 1).otherwise(0))
      .over(Window.partitionBy(col("k")))
    grams
      .select(col("doc_id"), col("split"), inTrain.as("in_train"))
      .filter(col("split") === "test")
      .groupBy(col("doc_id"))
      .agg(sum(col("in_train")).as("n_hit"))
      .agg(
        count(lit(1)).as("n_test"),
        sum(when(col("n_hit") > 0, 1).otherwise(0)).as("n_contaminated"),
        sum(col("n_hit")).as("n_overlap_grams"))
  }

  /** PII patterns — the C4/Dolma-style scrub set (email, IPv4, and a
    * NANP-style phone shape), written in the conservative regex subset
    * (explicit character classes, bounded repetition, no \d/\w/\b) that
    * Java's engine and RE2-family engines interpret identically, so the
    * redaction is value-pinned cross-engine.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val PhoneRe = "555-[0-9]{4}"

  /** Scrub PII spans, each replaced by a typed placeholder. Replacement
    * ORDER is part of the contract (email first: an address contains
    * dot-separated alnum runs an IPv4 pattern could otherwise bite) and
    * the oracle applies the same order. Pure codegen'd regexp_replace —
    * at 100 TB this is a shuffle-free map-side projection.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Per-pattern match counts on the UNREDACTED text — the audit trail a
    * scrub pass must emit (how much PII, of which kind, per doc).
    */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_email" -> regexp_count(text, lit(EmailRe)).cast("int"),
    "n_phone" -> regexp_count(text, lit(PhoneRe)).cast("int"),
    "n_ip" -> regexp_count(text, lit(Ipv4Re)).cast("int"))

  /** (doc_id, pos, line) — a document's "lines" for line-granularity
    * dedup. The synthetic corpus has no newlines, so a line is a
    * NON-OVERLAPPING n-token chunk (documented deviation; on real data
    * swap the chunker for `split(text, '\n')` and everything downstream
    * is unchanged). Trailing tokens short of a full chunk are dropped —
    * both engines apply the same rule, so the chunk set is value-pinned.
    */
  def lineChunks(docsDf: DataFrame, n: Int = 3,
      extra: Seq[String] = Nil): DataFrame = {
    val t = docsDf
      // spread first: single-row-group parquet otherwise leaves the
      // whole tokenize+explode on one core (Dedup.spread rationale)
      .repartition(col("doc_id"))
      .select(col("doc_id") +: extra.map(col) :+
        TextOps.tokens(col("text")).as("ts"): _*)
      .filter(size(col("ts")) >= n)
    val lines = transform(
      sequence(lit(0), floor(size(col("ts")) / n).cast("int") - 1),
      i => concat_ws(" ", (1 to n).map(j => element_at(col("ts"), i * n + j)): _*))
    t.select(col("doc_id") +: extra.map(col) :+
      posexplode(lines).as(Seq("pos", "line")): _*)
  }

  /** CCNet-style line-level dedup (Wenzek et al. 2019, arXiv:1911.00359):
    * drop every line whose exact content occurs >= 2 times ACROSS THE
    * CORPUS (all copies go — the surviving doc keeps only its unique
    * lines), then report per doc (n_lines, n_kept) and a fingerprint of
    * the reassembled cleaned text, lines in original order.
    *
    * 100 TB shape: corpus frequency is a window count over the line's
    * 16-hex md5 key — one exchange, group cost LINEAR in a hot line's
    * frequency (the q76 dup-ngram shape, not a pair join); the per-doc
    * reassembly shuffles bounded groups (<= lines per doc). The window
    * partitions on the hash key, not the line text, so grouping is
    * binary-stable; the short line string rides only for reassembly.
    */
  def lineDedup(docsDf: DataFrame, n: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(substring(md5(col("line")), 1, 16))
    val kept = lineChunks(docsDf, n)
      .select(col("doc_id"), col("pos"), col("line"),
        (count(lit(1)).over(w) < 2).as("keep"))
    kept.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("int").as("n_lines"),
        sum(when(col("keep"), 1).otherwise(0)).cast("int").as("n_kept"),
        substring(md5(concat_ws(" ",
          transform(
            array_sort(collect_list(
              when(col("keep"), struct(col("pos"), col("line"))))),
            e => e.getField("line")))), 1, 16).as("clean_fp"))
  }

  final case class CurateReport(nDocs: Long, nAfterDedup: Long,
      nExported: Long, shardsDir: String)

  /** The END-TO-END curation funnel as one call, in the ordering the
    * scale rehearsal prescribes (SCALE.md: exact BEFORE near-dup, so
    * clone groups never inflate the pair graph):
    *
    *  1. exact-collapse + rep-level near-dup clusters
    *     ([[Dedup.dedupGroupsPrecollapsed]] — pair-graph cost pinned at
    *     representative scale under any clone multiplicity);
    *  2. best-of-cluster survivor selection (q89's rule: most tokens,
    *     doc_id tie-break). Docs with no duplicate relation survive
    *     as-is — and are windowed SEPARATELY from clustered docs: a
    *     single window with comp=null for the unique majority would
    *     drain the whole corpus through one partition;
    *  3. quality gate (q61's: lang=en, >= 30 tokens, 20*stop >= tokens
    *     — integer arithmetic, no float thresholds);
    *  4. PII scrub ([[redactPii]], map-side);
    *  5. deterministic shuffled-shard export
    *     ([[graft.etl.Writers.shuffledShards]]).
    *
    * Returns funnel counts. The nAfterDedup count re-evaluates the
    * survivor plan over slim columns (the CC labeling is reliably
    * checkpointed, so the graph work is not repeated — only the
    * tokenize scan is); pass `counts = false` to skip it at very large
    * scale and get -1.
    */
  /** Span-cut curation stage: rewrite each doc's text to the
    * [[graft.llm.Dedup.exactSubstringRemove]] cleaned token stream
    * (keep-first — the lowest-doc_id copy of every duplicated >= minRun
    * run survives, later copies are cut), drop docs left empty, keep
    * every other column. Runs BEFORE near-dup banding in the `curate
    * ... cut` CLI route, the Lee et al. ordering: verbatim spans are
    * removed surgically, then whole-doc near-dup dropping sees the
    * residue. The join back to the source is one shuffle on doc_id;
    * docs whose text was empty to begin with are dropped too (an empty
    * doc has no training value either way).
    */
  def cutDuplicateSpans(docsDf: DataFrame,
      minRun: Int = Dedup.ExactSubstringMinRun,
      maxDf: Int = Dedup.DefaultMaxShingleDf): DataFrame = {
    val cleaned = Dedup.exactSubstringRemove(docsDf, minRun, maxDf)
      .filter(length(col("clean_text")) > 0)
      .select(col("doc_id"), col("clean_text"))
    docsDf.drop("text")
      .join(cleaned, Seq("doc_id"))
      .withColumnRenamed("clean_text", "text")
  }

  def curateCorpus(docsDf: DataFrame, outDir: String, shards: Int = 16,
      minJaccard: Double = 0.6, counts: Boolean = true): CurateReport = {
    import org.apache.spark.sql.expressions.Window
    val spark = docsDf.sparkSession
    val toks = TextOps.tokens(col("text"))
    val scored = docsDf.select(
      col("doc_id"), col("lang"), col("text"),
      size(toks).as("nt"),
      TextOps.stopHits(toks, TextOps.EnglishStop).as("ns"))
    val groups = Dedup.dedupGroupsPrecollapsed(docsDf, minJaccard)
    val labeled = scored.join(groups, Seq("doc_id"), "left")
    val w = Window.partitionBy(col("comp"))
      .orderBy(col("nt").desc, col("doc_id"))
    val best = labeled.filter(col("comp").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "comp")
    val survivors = labeled.filter(col("comp").isNull).drop("comp")
      .unionByName(best)
    val quality = survivors.filter(col("lang") === "en" &&
      col("nt") >= 30 && col("ns") * 20 >= col("nt"))
    val redacted = quality
      .select(col("doc_id"), col("lang"), redactPii(col("text")).as("text"))
    val shardsDir = s"$outDir/shards"
    graft.etl.Writers.shuffledShards(redacted, "doc_id", shardsDir, shards)
    val nExported = spark.read.parquet(shardsDir).count()
    val nAfterDedup =
      if (counts) survivors.select(col("doc_id")).count() else -1L
    CurateReport(docsDf.count(), nAfterDedup, nExported, shardsDir)
  }

  /** q66's oracle, shared verbatim by the Bloom-prefilter form (q80):
    * the Bloom filter only PRUNES the train side before an exact
    * confirm join — it can never change the answer, so both entries
    * must hash-match the same SQL (the q74-reuses-q56 pattern).
    */
  private val DecontaminationOracle =
    """WITH t AS (
                SELECT doc_id,
                       CASE WHEN CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 90 THEN 'train'
                            WHEN CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 95 THEN 'val'
                            ELSE 'test'
                       END AS split,
                       SUBSTR(MD5(regexp_replace(LOWER(text), '\s+', ' ', 'g')), 1, 8) AS fp
                FROM documents),
              train AS (SELECT DISTINCT fp FROM t WHERE split = 'train')
              SELECT COUNT(*) AS n_test,
                     CAST(SUM(CASE WHEN tr.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
              FROM t LEFT JOIN train tr ON tr.fp = t.fp
              WHERE t.split = 'test'"""

  /** Default blocklist for [[blocklistHits]] — the registered q145
    * instance: two unigrams (one absent from the synthetic corpus, so
    * absent-term handling is exercised) and two 2-token phrases, the
    * shape of a real badwords list (C4's is ~400 terms of 1–4 tokens).
    */
  val DefaultBlocklist: Seq[String] =
    Seq("slow", "deprecated", "big vector", "merge batch")

  /** C4-style blocklist filtering (Raffel et al. 2020: a doc is dropped
    * if ANY term of a badwords list occurs; RefinedWeb/Dolma keep the
    * same primitive with bigger lists): per-doc occurrence counts of
    * every blocklist term, matched on WHOLE-TOKEN phrase boundaries —
    * "slow" never matches inside "slowly", and a 2-token phrase matches
    * only consecutive tokens. Docs with zero hits don't appear (the
    * kept set is the anti-join; callers drop `hits.doc_id`).
    *
    * Scale shape: for a list with phrases of ≤ P tokens, the corpus
    * emits its token n-grams for n = 1..P (map-side explodes off ONE
    * tokenize exchange both branches reuse) and BROADCAST-joins the
    * term list — corpus rows never shuffle; only matched (doc_id, term)
    * rows reach the per-doc aggregate, and hits are rare by
    * construction. P is bounded by the longest phrase (≤ 4 in public
    * lists), so the fan-out is a small constant on the scan. A 10⁵-term
    * list still broadcasts in KBs; the Aho–Corasick single-pass
    * automaton only becomes worth a custom expression when phrase
    * lengths explode, which public badwords lists don't.
    */
  def blocklistHits(docsDf: DataFrame,
      terms: Seq[String] = DefaultBlocklist): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docsDf.sparkSession
    import spark.implicits._
    val maxLen = terms.map(_.split(" ").length).max
    val termDf = terms.toDF("term")
    // gram generation stays COMPILED: positions explode once and each
    // phrase is the token plus its window leads — an interpreted
    // per-position transform() lambda here was the measured 10× knee
    // (111 s vs 9 s at the clone rehearsal); lead() reuses the doc_id
    // exchange and sorts within doc-bounded groups
    val toksPos = docsDf
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= 1)
      .repartition(col("doc_id"))
      .select(col("doc_id"), posexplode(col("ts")).as(Seq("p", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val leads = (1 until maxLen).map(o => lead(col("tok"), o).over(w).as(s"l$o"))
    val withLeads = toksPos.select(col("doc_id") +: col("tok") +: leads: _*)
    val gramCols: Seq[Column] = (1 to maxLen).map { n =>
      if (n == 1) col("tok")
      else when(col(s"l${n - 1}").isNotNull,
        concat_ws(" ", col("tok") +: (1 until n).map(o => col(s"l$o")): _*))
    }
    withLeads
      .select(col("doc_id"), explode(array(gramCols: _*)).as("g"))
      .filter(col("g").isNotNull)
      .join(broadcast(termDf), col("g") === col("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"),
        countDistinct(col("term")).as("n_terms"))
      .orderBy(col("doc_id"))
  }

  /** Column-level PII risk profile — the data-governance pass that runs
    * BEFORE redaction (q87 scrubs a known text column; this finds which
    * columns of an arbitrary table look like they hold emails, phone
    * numbers, or IPs at all, so a pipeline knows where to point the
    * scrubber). Pure map-side stack-and-match: each row emits one
    * (col_name, value) pair per profiled column, three RE2-safe regexes
    * flag matches, and the aggregate carries |columns| keys. Counts are
    * integer-exact across engines; no tokenizer, no floats.
    */
  def piiColumnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val stacked = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*))
      .as("kv"))
      .select(col("kv.col_name").as("col_name"), col("kv.v").as("v"))
    stacked.groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("v").rlike(EmailRe), 1L).otherwise(0L)).as("n_email"),
        sum(when(col("v").rlike(PhoneRe), 1L).otherwise(0L)).as("n_phone"),
        sum(when(col("v").rlike(Ipv4Re), 1L).otherwise(0L)).as("n_ip"))
      .orderBy(col("col_name"))
  }

  /** Snapshot carry-over (crawl delta) report — the incremental-crawl
    * question RefinedWeb-class pipelines answer before re-processing a
    * new dump: of snapshot k+1's distinct content fingerprints, how
    * many already existed in snapshot k (carry-over to skip), how many
    * are new? `source` stands in for the snapshot id (srcN → index N);
    * the content key is q31's normalized-text md5 fingerprint. Per
    * consecutive pair: sizes, carried count, carried fraction of the
    * OLD snapshot.
    *
    * Scale shape: one distinct (source, fp) projection of the corpus;
    * the carried count is a self-join on the near-unique fp key where a
    * key group is bounded by the snapshot count (≤ |sources| rows per
    * fp), so no skew; the size/pair scaffold is |sources|-row tiny.
    */
  def crawlDelta(docsDf: DataFrame): DataFrame = {
    // FULL 128-bit md5 as the carry-over key: a truncated prefix makes
    // birthday collisions between unrelated docs likely around 10^5
    // distinct texts per snapshot, silently inflating carried counts at
    // scale (truncation is only ever a display convention, q31)
    val f = docsDf.select(col("source"),
        expr("CAST(SUBSTRING(source, 4) AS INT)").as("k"),
        md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"))
      .distinct()
    val sizes = f.groupBy(col("source"), col("k"))
      .agg(count(lit(1)).as("n"))
    val carried = f.as("a")
      .join(f.as("b"),
        col("b.fp") === col("a.fp") && col("b.k") === col("a.k") + 1)
      .groupBy(col("a.k").as("k"))
      .agg(count(lit(1)).as("n_carried"))
    sizes.as("sa")
      .join(sizes.as("sb"), col("sb.k") === col("sa.k") + 1)
      .select(col("sa.k").as("k"), col("sa.source").as("src_old"),
        col("sb.source").as("src_new"),
        col("sa.n").as("n_old"), col("sb.n").as("n_new"))
      .join(carried, Seq("k"), "left")
      .select(col("k"), col("src_old"), col("src_new"),
        col("n_old"), col("n_new"),
        coalesce(col("n_carried"), lit(0L)).as("n_carried"),
        round(coalesce(col("n_carried"), lit(0L)).cast("double")
          / col("n_old"), 4).as("pct_carried"))
      .orderBy(col("k"))
  }

  /** Per-source VALUE-PINNED median of an integer column — smallest
    * grid value whose per-source cumulative count satisfies 2·cum ≥ n
    * (the q102/q144 integer rule: the true median for odd n, the lower
    * median for even, ties low, zero float arithmetic). The cumulative
    * pass runs on the bounded (source, value) grid.
    */
  private def pinnedMedian(v: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grid = v.groupBy(col("source"), col("v")).agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("source")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("source"))
    grid.select(col("source"), col("v"),
        sum(col("cnt")).over(wCum).as("cum"),
        sum(col("cnt")).over(wAll).as("n"))
      .groupBy(col("source"))
      .agg(min(when(col("cum") * 2 >= col("n"), col("v"))).as("med"))
  }

  /** Robust (median/MAD) outlier report per source over document
    * length — the length-anomaly detector mean/stddev gets wrong on
    * heavy-tailed corpora (one 10 MB doc drags a mean threshold past
    * every real outlier; the median absolute deviation doesn't move).
    * ENTIRELY integer arithmetic: both the median and the MAD are
    * value-pinned via [[pinnedMedian]], deviations are integer
    * differences, and the outlier gate is |x − med| > 3·mad — no float
    * ever enters, so the report hash-pins trivially. Two bounded-grid
    * passes + two broadcast |sources|-row joins.
    */
  def madOutliers(docsDf: DataFrame): DataFrame = {
    val v = docsDf.select(col("source"), col("n_chars").as("v"))
    val med = pinnedMedian(v)
    val mad = pinnedMedian(
      v.join(broadcast(med), "source")
        .select(col("source"), abs(col("v") - col("med")).as("v")))
      .withColumnRenamed("med", "mad")
    v.join(broadcast(med), "source").join(broadcast(mad), "source")
      .groupBy(col("source"), col("med"), col("mad"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(abs(col("v") - col("med")) > col("mad") * 3, 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col("source"), col("n_docs"), col("med").as("median"),
        col("mad"), col("n_outliers"))
      .orderBy(col("source"))
  }

  /** q213's matrix over any frame of boolean removal-flag columns
    * (one column per gate, column name = gate name): pairwise removed
    * counts and Jaccard, every pair from ONE aggregate pass. */
  def filterOverlap(flags: DataFrame): DataFrame = {
    val names = flags.columns.toSeq
    val k = names.length
    val pairs = for (i <- 0 until k; j <- i until k) yield (i, j)
    def cnt(i: Int, j: Int) =
      sum((col(names(i)) && col(names(j))).cast("long")).as(s"n_${i}_$j")
    val m = flags.agg(cnt(0, 0),
      pairs.tail.map { case (i, j) => cnt(i, j) }: _*)
    val stackArgs = pairs.map { case (i, j) =>
      s"'${names(i)}', '${names(j)}', n_${i}_$i, n_${j}_$j, n_${i}_$j"
    }.mkString(", ")
    m.selectExpr(
        s"stack(${pairs.length}, $stackArgs) AS (fa, fb, n_a, n_b, n_both)")
      .select(col("fa"), col("fb"), col("n_a"), col("n_b"), col("n_both"),
        when(col("n_a") + col("n_b") - col("n_both") === 0,
          lit(null).cast("double"))
          .otherwise(round(col("n_both").cast("double") /
            (col("n_a") + col("n_b") - col("n_both")), 4))
          .as("jaccard"))
      .orderBy(col("fa"), col("fb"))
  }

  /** Canonicalization ladder for dedup preprocessing: Unicode NFC
    * (native [[graft.functions.NfcNormalize]] — composed "é" and
    * decomposed "e<combining acute>" become one byte sequence) →
    * casefold (`lower`) → trim + collapse whitespace runs to a single
    * space. Exact/fingerprint dedup over un-canonicalized text
    * under-merges across sources that compose, case, or wrap
    * differently; every hash-keyed operator upstream of dedup should
    * consume this column. NFC is the only custom step — casefold and
    * collapse stay in Spark's own codegen'd `lower`/`regexp_replace`
    * so Catalyst folds and pushes them independently. Map-only.
    *
    * The collapse uses the EXPLICIT class [[CanonWs]] rather than
    * `\s`: Java's `\s` matches U+000B (vertical tab) while RE2's (the
    * oracle's) does not, so the two engines' canonical forms would
    * silently diverge on \x0B-bearing text — the committed corpus is
    * already canonical and can't catch it (FnsSpec plants the case).
    */
  /** Whitespace class shared verbatim by the Spark and DuckDB
    * canonicalization ladders — Java and RE2 read it identically. */
  val CanonWs = "[ \\t\\n\\x0B\\f\\r]+"

  def canonicalColumn(text: Column): Column =
    trim(regexp_replace(lower(graft.functions.Fns.nfc(text)), CanonWs, " "))

  def defs: Seq[Q] = Seq(
    // Text canonicalization (see [[canonicalColumn]]): per doc, the
    // md5 of the canonical form plus a changed flag. The testdata
    // corpus is already canonical (the oracle match pins byte-identity
    // of the two engines' NFC+casefold+collapse ladders on it);
    // FnsSpec pins the real semantics on planted Unicode — composed ==
    // decomposed, NFC-only (ligatures survive), ASCII fast path.
    Q("q237_canonicalize",
      (s, d) => docs(s, d)
        .select(col("doc_id"),
          md5(canonicalColumn(col("text"))).as("canon_md5"),
          (col("text") =!= canonicalColumn(col("text"))).as("changed"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
                     MD5(TRIM(REGEXP_REPLACE(LOWER(NFC_NORMALIZE(text)),
                       '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS canon_md5,
                     text <> TRIM(REGEXP_REPLACE(LOWER(NFC_NORMALIZE(text)),
                       '[ \t\n\x0B\f\r]+', ' ', 'g')) AS changed
              FROM documents ORDER BY doc_id""")),

    // Train/test DECONTAMINATION: count test-split docs whose normalized
    // content fingerprint also appears in the train split — the standard
    // leakage check before an eval set ships (a training pipeline that
    // can't answer this can't publish benchmarks). Composition of the
    // q59 hash split and the q31 fingerprint; the check is one
    // distinct + one join on the 8-hex fingerprint key. 100 TB shape:
    // both sides shuffle on fp (near-unique, no skew key), train-side
    // distinct is a map-side-combined hash agg — no broadcast assumed.
    Q("q66_decontamination",
      (s, d) => decontaminationCounts(docs(s, d)),
      Some(DecontaminationOracle)),

    // Deterministic DATA-MIXTURE sampling: per-language target rates
    // (en 100%, es 50%, de 25%, everything else 10%) enforced by hash
    // bucket membership, not RNG — any engine, any run, any corpus
    // subset keeps exactly the same documents, which is what makes a
    // training mixture reproducible (and is exactly what the oracle
    // verifies). The ":mix" salt decorrelates this hash from the q59
    // split hash. Fully map-side; the only shuffle is the per-language
    // aggregate.
    Q("q67_data_mixture",
      (s, d) => mixtureCounts(docs(s, d),
        Map("en" -> 100, "es" -> 50, "de" -> 25), defaultRate = 10),
      Some("""SELECT lang, COUNT(*) AS n_docs,
                     CAST(SUM(CASE WHEN
                       CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 8) AS BIGINT) % 100
                       < CASE WHEN lang = 'en' THEN 100
                              WHEN lang = 'es' THEN 50
                              WHEN lang = 'de' THEN 25
                              ELSE 10 END
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
              FROM documents GROUP BY lang ORDER BY lang""")),

    // Per-language QUALITY TOP-K — curation's "keep the best k examples
    // per stratum" selection: rank docs within each language by stopword
    // ratio (the natural-language signal) and keep the top 3. The
    // filtered row_number plans as the TopKPerKey whole-operator
    // extension, so <= k candidates per (partition, lang) reach the
    // shuffle instead of a full per-language sort — asserted in
    // CurationSpec. Ratio ordering is IEEE division of small ints,
    // identical across engines; doc_id breaks ties deterministically.
    Q("q70_quality_topk",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val toks = TextOps.tokens(col("text"))
        val scored = docs(s, d)
          .select(col("doc_id"), col("lang"),
            size(toks).as("nt"),
            TextOps.stopHits(toks, TextOps.EnglishStop).as("ns"))
          .filter(col("nt") >= 10)
        val ratio = col("ns").cast("double") / col("nt")
        val w = Window.partitionBy(col("lang"))
          .orderBy(ratio.desc, col("doc_id"))
        scored
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("lang"), col("doc_id"),
            round(ratio, 4).as("stop_ratio"), col("rn"))
          .orderBy(col("lang"), col("rn"))
      },
      Some("""WITH t AS (
                SELECT doc_id, lang,
                       LEN(regexp_split_to_array(TRIM(LOWER(text)), '\s+')) AS nt,
                       LEN(list_filter(regexp_split_to_array(TRIM(LOWER(text)), '\s+'),
                           x -> list_contains(['the','a','and','of','to','in','is'], x))) AS ns
                FROM documents),
              f AS (SELECT * FROM t WHERE nt >= 10),
              r AS (
                SELECT lang, doc_id, CAST(ns AS DOUBLE) / nt AS ratio,
                       CAST(ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY CAST(ns AS DOUBLE) / nt DESC, doc_id) AS INT) AS rn
                FROM f)
              SELECT lang, doc_id, ROUND(ratio, 4) AS stop_ratio, rn
              FROM r WHERE rn <= 3 ORDER BY lang, rn""")),

    // Within-document REPETITION ratio: 1 - distinct/total 3-gram
    // shingles — the boilerplate/looping-text quality signal (high
    // ratio = the doc repeats itself). Pure per-row column arithmetic
    // over the same shingle machinery as the dedup stack; no shuffle
    // except the ORDER BY.
    Q("q68_repetition",
      (s, d) => repetitionRatios(docs(s, d))
        .orderBy(col("doc_id"))
        .limit(200),
      Some("""WITH tok AS (
                SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS ts
                FROM documents),
              t AS (
                SELECT doc_id,
                       CAST(LEN(ts) - 2 AS INT) AS n_shingles,
                       CAST(LEN(list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                                               for i in generate_series(1, LEN(ts)-2)])) AS INT) AS n_distinct
                FROM tok WHERE LEN(ts) >= 3)
              SELECT doc_id, n_shingles, n_distinct,
                     ROUND(1.0 - CAST(n_distinct AS DOUBLE) / n_shingles, 4) AS rep_ratio
              FROM t ORDER BY doc_id LIMIT 200""")),

    // Corpus-wide DUPLICATED-N-GRAM ratio per doc — q68 measures a doc
    // repeating ITSELF; this measures a doc repeating the REST OF THE
    // CORPUS (the exact-substring-dedup curation signal at 3-gram
    // granularity). The engine joins/windows on a 16-hex md5 of the
    // shingle so the shuffle never carries shingle text; the oracle
    // recomputes the identical keys.
    Q("q76_dup_ngram_ratio",
      (s, d) => dupNgramRatios(docs(s, d))
        .orderBy(col("doc_id"))
        .limit(200),
      Some("""WITH tok AS (
                SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS ts
                FROM documents),
              sh AS (
                SELECT doc_id,
                       UNNEST(list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                                             for i in generate_series(1, LEN(ts)-2)])) AS s
                FROM tok WHERE LEN(ts) >= 3),
              k AS (SELECT doc_id, SUBSTR(MD5(s), 1, 16) AS k FROM sh),
              f AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY k) >= 2 AS dup FROM k)
              SELECT doc_id,
                     COUNT(*) AS n_shingles,
                     CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
                     ROUND(CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS DOUBLE)
                           / COUNT(*), 4) AS dup_ratio
              FROM f GROUP BY doc_id ORDER BY doc_id LIMIT 200""")),

    // N-GRAM-OVERLAP decontamination — the GPT-3-style check at 8-gram
    // granularity: q66 only catches whole-doc duplicates (identical
    // normalized fingerprint); this catches a test doc that SHARES A
    // PASSAGE with any train doc. Both engines hash the same 8-gram
    // strings to the same 16-hex keys, so counts are value-pinned.
    Q("q77_ngram_decontamination",
      (s, d) => ngramOverlapDecontamination(docs(s, d)),
      Some("""WITH t AS (
                SELECT doc_id,
                       CASE WHEN CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 90 THEN 'train'
                            WHEN CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 95 THEN 'val'
                            ELSE 'test'
                       END AS split,
                       regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS ts
                FROM documents),
              g AS (
                SELECT doc_id, split, SUBSTR(MD5(s), 1, 16) AS k
                FROM (SELECT doc_id, split,
                        UNNEST(list_distinct(
                          [ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3]
                                 || ' ' || ts[i+4] || ' ' || ts[i+5] || ' ' || ts[i+6]
                                 || ' ' || ts[i+7]
                           for i in generate_series(1, LEN(ts)-7)])) AS s
                      FROM t WHERE LEN(ts) >= 8)),
              train AS (SELECT DISTINCT k FROM g WHERE split = 'train'),
              o AS (
                SELECT g.doc_id,
                       SUM(CASE WHEN tr.k IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
                FROM g LEFT JOIN train tr ON tr.k = g.k
                WHERE g.split = 'test'
                GROUP BY g.doc_id)
              SELECT COUNT(*) AS n_test,
                     CAST(SUM(CASE WHEN n_hit > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
                     CAST(SUM(n_hit) AS BIGINT) AS n_overlap_grams
              FROM o""")),

    // Corpus VOCABULARY top-k: highest-frequency tokens with occurrence
    // and document counts — the tokenizer/vocab-construction statistic
    // (and the Zipf sanity check) every training pipeline computes before
    // fixing a tokenizer. Map-side partial agg on the token key; the
    // global top-k is a TakeOrdered over the already-aggregated rows, so
    // nothing corpus-sized crosses the final collect.
    Q("q78_vocab_topk",
      (s, d) => docs(s, d)
        // spread first: the single-row-group parquet otherwise puts the
        // whole tokenize+explode on one core (Dedup.spread rationale)
        .repartition(col("doc_id"))
        .select(col("doc_id"),
          explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n_occ"),
          countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n_occ").desc, col("token"))
        .limit(25),
      Some("""WITH t AS (
                SELECT doc_id,
                       UNNEST(regexp_split_to_array(TRIM(LOWER(text)), '\s+')) AS token
                FROM documents)
              SELECT token, COUNT(*) AS n_occ,
                     COUNT(DISTINCT doc_id) AS n_docs
              FROM t GROUP BY token ORDER BY n_occ DESC, token LIMIT 25""")),

    // QUALITY-TIERED mixture sampling — the q67 deterministic-hash rule
    // with the keep rate driven by a QUALITY signal instead of language
    // alone (the "sample high-quality text at a higher rate" knob, cf.
    // quality-weighted sampling in GPT-3/DoReMi-style mixtures): docs in
    // the high-stopword tier (20*ns >= nt, the q61 integer gate — no
    // float thresholds to disagree on) keep 100%, low tier keeps 25%,
    // membership by salted md5 bucket. Fully map-side except the final
    // small (lang, tier) rollup.
    Q("q79_quality_mixture",
      (s, d) => {
        val toks = TextOps.tokens(col("text"))
        val t = docs(s, d)
          .select(col("doc_id"), col("lang"),
            size(toks).as("nt"),
            TextOps.stopHits(toks, TextOps.EnglishStop).as("ns"))
          .filter(col("nt") >= 10)
        val tier = when(col("ns") * 20 >= col("nt"), "high").otherwise("low")
        val bucket = pmod(
          conv(substring(
            md5(concat(col("doc_id").cast("string"), lit(":qmix"))), 1, 8),
            16, 10).cast("long"), lit(100))
        val rate = when(tier === "high", 100).otherwise(25)
        t.select(col("lang"), tier.as("tier"),
            when(bucket < rate, 1).otherwise(0).as("keep"))
          .groupBy(col("lang"), col("tier"))
          .agg(count(lit(1)).as("n_docs"), sum(col("keep")).as("n_kept"))
          .orderBy(col("lang"), col("tier"))
      },
      Some("""WITH t AS (
                SELECT doc_id, lang,
                       LEN(regexp_split_to_array(TRIM(LOWER(text)), '\s+')) AS nt,
                       LEN(list_filter(regexp_split_to_array(TRIM(LOWER(text)), '\s+'),
                           x -> list_contains(['the','a','and','of','to','in','is'], x))) AS ns
                FROM documents),
              f AS (SELECT doc_id, lang,
                           CASE WHEN ns * 20 >= nt THEN 'high' ELSE 'low' END AS tier
                    FROM t WHERE nt >= 10)
              SELECT lang, tier, COUNT(*) AS n_docs,
                     CAST(SUM(CASE WHEN
                       CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR) || ':qmix'), 1, 8) AS BIGINT) % 100
                       < CASE WHEN tier = 'high' THEN 100 ELSE 25 END
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
              FROM f GROUP BY lang, tier ORDER BY lang, tier""")),

    // q66 through the broadcast-Bloom pre-join filter — the 100 TB shape
    // where even shuffling every train fingerprint is the bottleneck.
    // EXACT by construction (the filter only prunes the exchange; false
    // positives die in the confirm join), so it shares q66's oracle SQL
    // verbatim and must hash-match it.
    Q("q80_bloom_decontamination",
      (s, d) => bloomDecontaminationCounts(docs(s, d)),
      Some(DecontaminationOracle)),

    // EXACT-QUOTA stratified sampling: keep exactly min(quota, |stratum|)
    // docs per language, membership decided by a salted-hash ranking so
    // the selection is reproducible on any engine, any run, any corpus
    // ordering — the complement of q67/q79's RATE-based mixture rules
    // (a rate can't hit "exactly 20 eval docs per language"; a quota
    // can't express "50% of es"; a real mixture pipeline needs both).
    // The filtered row_number plans as the TopKPerKey whole-operator
    // extension: <= quota candidates per (partition, lang) reach the
    // exchange instead of a per-language full sort — the same plan that
    // survives a skewed 100 TB lang distribution (CurationSpec pins it).
    Q("q81_stratified_quota",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val key = conv(substring(
          md5(concat(col("doc_id").cast("string"), lit(":strat"))), 1, 8),
          16, 10).cast("long")
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("k"), col("doc_id"))
        docs(s, d)
          .select(col("doc_id"), col("lang"), key.as("k"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 20)
          .select(col("lang"), col("doc_id"), col("rn"))
          .orderBy(col("lang"), col("rn"))
      },
      Some("""WITH t AS (
                SELECT doc_id, lang,
                       CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR) || ':strat'), 1, 8) AS BIGINT) AS k
                FROM documents),
              r AS (
                SELECT lang, doc_id,
                       CAST(ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY k, doc_id) AS INT) AS rn
                FROM t)
              SELECT lang, doc_id, rn
              FROM r WHERE rn <= 20 ORDER BY lang, rn""")),

    // PII REDACTION (the C4/Dolma scrub step): replace email / IPv4 /
    // phone spans with typed placeholders and emit the per-doc audit
    // counts. The corpus is synthetic word-salad with no PII, so the
    // query PLANTS deterministic spans keyed on doc_id (both engines
    // build the identical string — the redaction machinery, not the
    // planting, is what the hash pins; Curation.redactPii is the
    // generic operator). Fully map-side: counts and the redacted-text
    // fingerprint are codegen'd regexp expressions over one scan; the
    // only shuffle is the final TakeOrdered.
    Q("q87_pii_redaction",
      (s, d) => {
        val planted = concat(
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(lit("contact user"), col("doc_id").cast("string"),
              lit("@example.com "))).otherwise(""),
          when(pmod(col("doc_id"), lit(5)) === 0,
            concat(lit("call 555-"),
              lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
              lit(" "))).otherwise(""),
          when(pmod(col("doc_id"), lit(7)) === 0,
            concat(lit("host 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
              lit("."), pmod(col("doc_id") * 7, lit(256)).cast("string"),
              lit(" "))).otherwise(""),
          col("text"))
        val t = docs(s, d).select(col("doc_id"), planted.as("t"))
        val counts = piiCounts(col("t")).map { case (n, c) => c.as(n) }
        t.select(
            (col("doc_id") +: counts :+
              substring(md5(redactPii(col("t"))), 1, 16).as("red_fp")): _*)
          .orderBy(col("doc_id"))
          .limit(200)
      },
      Some("""WITH p AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 3 = 0 THEN 'contact user' || CAST(doc_id AS VARCHAR) || '@example.com ' ELSE '' END
                    || CASE WHEN doc_id % 5 = 0 THEN 'call 555-' || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ' ELSE '' END
                    || CASE WHEN doc_id % 7 = 0 THEN 'host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) || ' ' ELSE '' END
                    || text AS t
                FROM documents)
              SELECT doc_id,
                     CAST(LEN(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
                     CAST(LEN(regexp_extract_all(t, '555-[0-9]{4}')) AS INT) AS n_phone,
                     CAST(LEN(regexp_extract_all(t, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS INT) AS n_ip,
                     SUBSTR(MD5(
                       regexp_replace(
                         regexp_replace(
                           regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                           '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
                         '555-[0-9]{4}', '<PHONE>', 'g')), 1, 16) AS red_fp
              FROM p ORDER BY doc_id LIMIT 200""")),

    // LINE-LEVEL dedup (CCNet-style): drop every "line" (non-overlapping
    // 3-token chunk — the corpus has no newlines; see lineChunks) that
    // occurs >= 2 times corpus-wide, and fingerprint each doc's cleaned,
    // reassembled text. Finer-grained than whole-doc dedup (q23/q27) and
    // coarser than n-gram ratios (q76): this one REWRITES the documents,
    // which is why the clean_fp hash — pinning the surviving lines AND
    // their order — is the value under test.
    Q("q88_line_dedup",
      (s, d) => lineDedup(docs(s, d))
        .orderBy(col("doc_id"))
        .limit(200),
      Some("""WITH tok AS (
                SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS ts
                FROM documents),
              ln AS (
                SELECT doc_id,
                       UNNEST([{'pos': i, 'line': ts[3*i+1] || ' ' || ts[3*i+2] || ' ' || ts[3*i+3]}
                               for i in generate_series(0, CAST(FLOOR(LEN(ts) / 3) AS BIGINT) - 1)]) AS e
                FROM tok WHERE LEN(ts) >= 3),
              l AS (SELECT doc_id, e.pos AS pos, e.line AS line FROM ln),
              d AS (
                SELECT doc_id, pos, line,
                       COUNT(*) OVER (PARTITION BY SUBSTR(MD5(line), 1, 16)) < 2 AS keep
                FROM l)
              SELECT doc_id,
                     CAST(COUNT(*) AS INT) AS n_lines,
                     CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS INT) AS n_kept,
                     SUBSTR(MD5(COALESCE(
                       string_agg(CASE WHEN keep THEN line END, ' ' ORDER BY pos),
                       '')), 1, 16) AS clean_fp
              FROM d GROUP BY doc_id ORDER BY doc_id LIMIT 200""")),

    // TEMPERATURE-scaled language mixture (the exponential-smoothing
    // sampling rule multilingual LMs train with, cf. XLM-R's alpha
    // smoothing): p_lang ∝ n_lang^0.5 flattens the language
    // distribution — high-resource languages down-weighted, low-resource
    // up — and the expected per-language doc counts for a 10k budget
    // fall out directly. Complements q67/q79/q81: those enforce GIVEN
    // rates/quotas; this one DERIVES the rates from corpus counts.
    // 100 TB shape: one scan collapsing map-side to one row per
    // language; the normalizer is a broadcast 1-row aggregate.
    Q("q104_temperature_mix",
      (s, d) => {
        val counts = docs(s, d).groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"))
        val z = counts.agg(sum(sqrt(col("n_docs"))).as("z"))
        counts.crossJoin(broadcast(z))
          .select(col("lang"), col("n_docs"),
            round(sqrt(col("n_docs")) / col("z"), 4).as("p_sample"),
            round(lit(10000.0) * sqrt(col("n_docs")) / col("z"), 2)
              .as("expected_docs"))
          .orderBy(col("lang"))
      },
      Some("""WITH c AS (
                SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
              z AS (SELECT SUM(SQRT(n_docs)) AS z FROM c)
              SELECT lang, n_docs,
                     ROUND(SQRT(n_docs) / z, 4) AS p_sample,
                     ROUND(10000.0 * SQRT(n_docs) / z, 2) AS expected_docs
              FROM c CROSS JOIN z ORDER BY lang""")),

    // ONE-SCAN dataset card — the corpus "datasheet" a dataset release
    // ships: per-language rows, per-source rows, and the overall row
    // from a single GROUPING SETS pass. One scan + one Expand + one
    // exchange where three separate reports would scan the corpus three
    // times (CurationSpec pins the single-scan plan). n_chars is the
    // stored length column, so the card is pure metadata arithmetic at
    // any scale.
    Q("q106_dataset_card",
      (s, d) =>
        docs(s, d)
          .groupingSets(
            Seq(Seq(col("lang")), Seq(col("source")), Seq.empty),
            col("lang"), col("source"))
          .agg(grouping(col("lang")).as("gl"),
            grouping(col("source")).as("gs"),
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            round(sum(col("n_chars")).cast("double") / count(lit(1)), 2)
              .as("avg_chars"))
          .select(
            when(col("gl") === 0, lit("lang"))
              .when(col("gs") === 0, lit("source"))
              .otherwise(lit("all")).as("dim"),
            coalesce(col("lang"), col("source"), lit("ALL")).as("grp"),
            col("n_docs"), col("total_chars"), col("avg_chars"))
          .orderBy(col("dim"), col("grp")),
      Some("""SELECT CASE WHEN GROUPING(lang) = 0 THEN 'lang'
                          WHEN GROUPING(source) = 0 THEN 'source'
                          ELSE 'all' END AS dim,
                     COALESCE(lang, source, 'ALL') AS grp,
                     COUNT(*) AS n_docs,
                     CAST(SUM(n_chars) AS BIGINT) AS total_chars,
                     ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 2) AS avg_chars
              FROM documents
              GROUP BY GROUPING SETS ((lang), (source), ())
              ORDER BY dim, grp""")),

    // Gopher-style RULE-BASED quality gate (Rae et al. 2021 §A1.1): the
    // standard pre-filter a pretraining pipeline runs before any learned
    // scoring — word-count bounds, mean-word-length band, symbol-to-word
    // ratio ('#' and '...'), alphabetic-word fraction, and the
    // ≥2-distinct-stopwords rule (stop list adapted to the corpus
    // vocabulary; the English default is a parameter in spirit). Every
    // feature is a codegen'd regex/length/translate expression over one
    // scan — no HOF lambdas, no shuffle before the final order — so the
    // gate is a map-only pass at any scale. Per-doc flags emitted so the
    // hash pins every rule, not just the conjunction.
    Q("q108_gopher_rules",
      (s, d) => {
        val toks = TextOps.tokens(col("text"))
        val nw = size(toks).cast("long")
        // integer feature counts, band rules as integer inequalities —
        // no ratio ever rounds, so the hash is engine-stable by
        // construction (mean-word-length in [3,10] ⟺ 3·nw ≤ chars ≤
        // 10·nw, symbol ratio < 0.1 ⟺ 10·sym < nw, alpha frac > 0.8 ⟺
        // 5·alpha > 4·nw)
        val nChars = length(regexp_replace(trim(col("text")), "\\s+", ""))
          .cast("long")
        val nHash = length(col("text")) -
          length(translate(col("text"), "#", ""))
        val nEllipsis = (length(col("text")) -
          length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3
        val nSym = (nHash + nEllipsis).cast("long")
        val nAlpha = size(regexp_extract_all(trim(col("text")),
          lit("\\S*[a-zA-Z]\\S*"), lit(0))).cast("long")
        val nStop = size(array_intersect(toks, array(lit("the"), lit("a"))))
        docs(s, d)
          .select(col("doc_id"), nw.as("n_words"), nChars.as("n_chars_ns"),
            nSym.as("n_symbols"), nAlpha.as("n_alpha_words"),
            nStop.as("n_stop"),
            (nw.between(50, 100000) &&
              nChars >= nw * 3 && nChars <= nw * 10 &&
              nSym * 10 < nw && nAlpha * 5 > nw * 4 && nStop >= 2)
              .cast("int").as("keep"))
          .orderBy(col("doc_id"))
          .limit(200)
      },
      Some("""WITH t AS (
                SELECT doc_id, text,
                       regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS toks
                FROM documents),
              f AS (
                SELECT doc_id,
                       CAST(LEN(toks) AS BIGINT) AS n_words,
                       CAST(LENGTH(REGEXP_REPLACE(TRIM(text), '\s+', '', 'g')) AS BIGINT) AS n_chars_ns,
                       CAST((LENGTH(text) - LENGTH(REPLACE(text, '#', '')))
                            + (LENGTH(text) - LENGTH(REPLACE(text, '...', ''))) // 3 AS BIGINT) AS n_symbols,
                       CAST(LEN(regexp_extract_all(TRIM(text), '\S*[a-zA-Z]\S*')) AS BIGINT) AS n_alpha_words,
                       CAST(LEN(list_intersect(list_distinct(toks), ['the','a'])) AS INT) AS n_stop
                FROM t)
              SELECT doc_id, n_words, n_chars_ns, n_symbols, n_alpha_words, n_stop,
                     CAST(n_words BETWEEN 50 AND 100000
                          AND n_chars_ns >= n_words * 3 AND n_chars_ns <= n_words * 10
                          AND n_symbols * 10 < n_words
                          AND n_alpha_words * 5 > n_words * 4
                          AND n_stop >= 2 AS INT) AS keep
              FROM f ORDER BY doc_id LIMIT 200""")),

    // DSIR-style importance weighting (Xie et al. 2023): hashed n-gram
    // (uni+bi, md5 % 256) bucket counts for a TARGET slice (lang='en' —
    // the high-quality-domain proxy) vs the full corpus give per-bucket
    // log-likelihood-ratio weights; a doc's importance score is the
    // mean weight of its gram instances — the score data-selection
    // samples against when matching a pretraining corpus to a target
    // domain. 100 TB shape: the gram stream is map-side explode+hash;
    // the 256-row weight table broadcasts at any corpus size; the two
    // gram passes (bucket counts, per-doc scoring) read ONE
    // repartition(doc_id) exchange through ReuseExchange (the q98
    // shape) and the per-doc avg is a map-side-combined hash agg.
    Q("q109_dsir_weights",
      (s, d) => {
        val nB = 256
        val ts = col("ts")
        val bi = when(size(ts) >= 2,
          transform(sequence(lit(1), size(ts) - 1),
            i => concat_ws(" ", element_at(ts, i), element_at(ts, i + 1))))
          .otherwise(array().cast("array<string>"))
        val t = docs(s, d)
          .select(col("doc_id"), (col("lang") === "en").as("is_t"),
            TextOps.tokens(col("text")).as("ts"))
          .repartition(col("doc_id"))
        val g = t
          .select(col("doc_id"), col("is_t"),
            explode(concat(ts, bi)).as("gram"))
          .select(col("doc_id"), col("is_t"),
            pmod(conv(substring(md5(col("gram")), 1, 8), 16, 10)
              .cast("long"), lit(nB)).as("b"))
        val byB = g.groupBy(col("b"))
          .agg(sum(when(col("is_t"), 1L).otherwise(0L)).as("n_t"),
            count(lit(1)).as("n_s"))
        val tot = byB.agg(sum(col("n_t")).as("tot_t"),
          sum(col("n_s")).as("tot_s"))
        val w = byB.crossJoin(broadcast(tot))
          .select(col("b"),
            (log((col("n_t") + 1).cast("double") / (col("tot_t") + nB)) -
              log((col("n_s") + 1).cast("double") / (col("tot_s") + nB)))
              .as("w"))
        g.join(broadcast(w), Seq("b"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_grams"),
            round(avg(col("w")), 4).as("dsir_score"))
          .orderBy(col("doc_id"))
          .limit(200)
      },
      Some("""WITH t AS (
                SELECT doc_id, lang = 'en' AS is_t,
                       regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS ts
                FROM documents),
              g0 AS (
                SELECT doc_id, is_t, UNNEST(ts) AS gram FROM t
                UNION ALL
                SELECT doc_id, is_t, ts[i] || ' ' || ts[i + 1] AS gram
                FROM t, UNNEST(generate_series(1, LEN(ts) - 1)) AS s(i)
                WHERE LEN(ts) >= 2),
              g AS (
                SELECT doc_id, is_t,
                       CAST('0x' || SUBSTR(MD5(gram), 1, 8) AS BIGINT) % 256 AS b
                FROM g0),
              byb AS (
                SELECT b, SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS n_t,
                       COUNT(*) AS n_s
                FROM g GROUP BY b),
              tot AS (SELECT SUM(n_t) AS tot_t, SUM(n_s) AS tot_s FROM byb),
              w AS (
                SELECT b, LN(CAST(n_t + 1 AS DOUBLE) / (tot_t + 256))
                          - LN(CAST(n_s + 1 AS DOUBLE) / (tot_s + 256)) AS w
                FROM byb CROSS JOIN tot)
              SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
                     ROUND(AVG(w), 4) AS dsir_score
              FROM g JOIN w USING (b)
              GROUP BY doc_id ORDER BY doc_id LIMIT 200""")),

    // Pairwise Jensen-Shannon divergence between per-source unigram
    // distributions — the "how different are my domains really" number
    // that justifies (or collapses) mixture buckets before q104/q109
    // weighting. The corpus-scale work is ONE (source, term) count with
    // map-side combine; everything after operates on the
    // sources×vocab distribution table, which is broadcast-sized at any
    // corpus scale. Terms present in only one source of a pair never
    // join — their JS mass has the closed form ln(2)·(missing p-mass +
    // missing q-mass), recovered from 1 − Σ p over co-occurring terms,
    // so no outer join is needed.
    Q("q114_source_divergence",
      (s, d) => sourceDivergence(docs(s, d)),
      Some("""WITH tok AS (
                SELECT source,
                       UNNEST(regexp_split_to_array(TRIM(LOWER(text)), '\s+')) AS term
                FROM documents),
              t2 AS (SELECT source, term FROM tok WHERE term <> ''),
              c AS (SELECT source, term, COUNT(*) AS cnt FROM t2 GROUP BY 1, 2),
              n AS (SELECT source, SUM(cnt) AS n_tok FROM c GROUP BY 1),
              dist AS (
                SELECT c.source, c.term,
                       CAST(c.cnt AS DOUBLE) / n.n_tok AS p
                FROM c JOIN n ON c.source = n.source),
              co AS (
                SELECT a.source AS src_a, b.source AS src_b,
                       SUM(0.5 * (a.p * LN(2 * a.p / (a.p + b.p))
                                + b.p * LN(2 * b.p / (a.p + b.p)))) AS js_co,
                       SUM(a.p) AS mass_a, SUM(b.p) AS mass_b
                FROM dist a JOIN dist b
                  ON a.term = b.term AND a.source < b.source
                GROUP BY 1, 2),
              pairs AS (
                SELECT x.source AS src_a, y.source AS src_b
                FROM n x JOIN n y ON x.source < y.source)
              SELECT p.src_a, p.src_b,
                     ROUND(COALESCE(co.js_co, 0)
                           + 0.5 * LN(2) * ((1 - COALESCE(co.mass_a, 0))
                                          + (1 - COALESCE(co.mass_b, 0))), 4)
                       AS js
              FROM pairs p
              LEFT JOIN co ON p.src_a = co.src_a AND p.src_b = co.src_b
              ORDER BY p.src_a, p.src_b""")),

    // Mutual information between source and lang over the document
    // contingency table — "does my domain axis secretly encode my
    // language axis?" (high MI means the q104/q114 mixture dimensions
    // are redundant). One corpus-scale (source, lang) count; entropies
    // and MI fold over the contingency table, which is
    // |sources|×|langs| rows at any corpus size. Also reports the
    // normalized MI / H(lang) share.
    Q("q117_source_lang_mi",
      (s, d) => sourceLangMi(docs(s, d)),
      Some("""WITH c AS (
                SELECT source, lang, COUNT(*) AS n
                FROM documents GROUP BY 1, 2),
              n AS (SELECT SUM(n) AS n_docs FROM c),
              ps AS (SELECT source, SUM(n) AS ns FROM c GROUP BY 1),
              pl AS (SELECT lang, SUM(n) AS nl FROM c GROUP BY 1),
              mi AS (
                SELECT SUM((CAST(c.n AS DOUBLE) / n.n_docs) *
                           LN((CAST(c.n AS DOUBLE) * n.n_docs) /
                              (CAST(ps.ns AS DOUBLE) * pl.nl))) AS mi
                FROM c JOIN ps USING (source) JOIN pl USING (lang)
                CROSS JOIN n),
              hs AS (
                SELECT -SUM((CAST(ns AS DOUBLE) / n.n_docs) *
                            LN(CAST(ns AS DOUBLE) / n.n_docs)) AS h_source
                FROM ps CROSS JOIN n),
              hl AS (
                SELECT -SUM((CAST(nl AS DOUBLE) / n.n_docs) *
                            LN(CAST(nl AS DOUBLE) / n.n_docs)) AS h_lang
                FROM pl CROSS JOIN n)
              SELECT CAST(n.n_docs AS BIGINT) AS n_docs,
                     ROUND(hs.h_source, 4) AS h_source,
                     ROUND(hl.h_lang, 4) AS h_lang,
                     ROUND(mi.mi, 4) AS mi,
                     ROUND(mi.mi / hl.h_lang, 4) AS nmi
              FROM n CROSS JOIN hs CROSS JOIN hl CROSS JOIN mi""")),

    // UniMax language-budget allocation (Chung et al. 2023,
    // arXiv:2304.09151): given per-language corpus sizes, a total
    // training budget (2x the corpus here) and a per-language epoch cap
    // (3), waterfill the budget — low-resource languages are capped at
    // `cap = 3·chars`, the rest split the remainder UNIFORMLY at level
    // t, chosen so allocations sum to the budget. Complements
    // q104/q67/q81: temperature scaling reweights smoothly; UniMax
    // gives every uncapped language the SAME char budget, bounding
    // low-resource repetition explicitly. The waterfill is closed-form
    // over the capacity table sorted ascending: the capped set is the
    // prefix of ranks r with cap_r·(n−r) ≤ B−S_r (prefix-closure:
    // a false predicate at r forces cap_{r+1} < cap_r for it to flip
    // back true, impossible under ascending sort), so the boundary k is
    // a MAX over integer-exact comparisons — no float enters until the
    // single division that defines t. 100 TB shape: one map-side
    // groupBy(lang) over stored n_chars metadata; every window/agg after
    // runs on the languages-sized table (the unpartitioned window is
    // bounded by |langs|, not the corpus).
    Q("q140_unimax_mixture",
      (s, d) => unimaxAllocation(docs(s, d)),
      Some("""WITH c AS (
                SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS chars
                FROM documents GROUP BY lang),
              tot AS (SELECT CAST(2 * SUM(chars) AS BIGINT) AS b,
                             COUNT(*) AS n FROM c),
              r AS (SELECT lang, chars, 3 * chars AS cap,
                           ROW_NUMBER() OVER (ORDER BY 3 * chars, lang) AS rk,
                           SUM(3 * chars) OVER (ORDER BY 3 * chars, lang
                             ROWS UNBOUNDED PRECEDING) AS s
                    FROM c),
              k AS (SELECT COALESCE(MAX(CASE WHEN cap * (n - rk) <= b - s
                                             THEN rk END), 0) AS k
                    FROM r CROSS JOIN tot),
              sk AS (SELECT COALESCE(MAX(CASE WHEN rk <= k THEN s END), 0) AS s_k
                     FROM r CROSS JOIN k),
              t AS (SELECT CASE WHEN k < n
                                THEN CAST(b - s_k AS DOUBLE) / (n - k) END AS t
                    FROM k CROSS JOIN sk CROSS JOIN tot)
              SELECT lang, chars, cap AS cap_chars,
                     ROUND(CASE WHEN rk <= k THEN CAST(cap AS DOUBLE)
                                ELSE t.t END, 2) AS alloc_chars,
                     ROUND(CASE WHEN rk <= k THEN 3.0
                                ELSE t.t / chars END, 4) AS epochs,
                     CAST(rk <= k AS INT) AS capped
              FROM r CROSS JOIN k CROSS JOIN t ORDER BY lang""")),

    // Within-source repeated-line (boilerplate) report — the
    // Dolma/RefinedWeb curation rule that q88's GLOBAL line dedup does
    // not express: a line repeated across >= 2 DISTINCT documents of
    // the SAME source is domain boilerplate (nav text, headers,
    // footers), and the per-source report (how many lines, what share
    // of line instances, how many docs touched) is what decides whether
    // a domain needs line-level scrubbing at all. Doc-frequency, not
    // instance-frequency: a line repeated WITHIN one doc is repetition
    // (q68/q103's axis), not boilerplate. 100 TB shape: chunk
    // explosion is map-side; the instance table collapses with map-side
    // combine on (source, line-key, doc_id); the doc-frequency window
    // partitions on (source, line-key) — group cost linear in a hot
    // line's doc count, the q88 rationale — and grouping is on the
    // 16-hex md5 key so only bounded keys shuffle, never line text.
    Q("q141_boilerplate_lines",
      (s, d) => boilerplateReport(docs(s, d)),
      Some("""WITH tok AS (
                SELECT doc_id, source,
                       regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS ts
                FROM documents),
              ln AS (
                SELECT doc_id, source,
                       UNNEST([ts[3*i+1] || ' ' || ts[3*i+2] || ' ' || ts[3*i+3]
                               for i in generate_series(0, CAST(FLOOR(LEN(ts) / 3) AS BIGINT) - 1)]) AS line
                FROM tok WHERE LEN(ts) >= 3),
              l1 AS (SELECT source, line, doc_id, COUNT(*) AS inst
                     FROM ln GROUP BY 1, 2, 3),
              l2 AS (SELECT source, line, doc_id, inst,
                            COUNT(*) OVER (PARTITION BY source, line) AS n_docs
                     FROM l1)
              SELECT source,
                     CAST(COUNT(DISTINCT line) AS BIGINT) AS n_lines_distinct,
                     CAST(COUNT(DISTINCT CASE WHEN n_docs >= 2 THEN line END) AS BIGINT) AS n_boiler_lines,
                     CAST(SUM(inst) AS BIGINT) AS n_instances,
                     CAST(SUM(CASE WHEN n_docs >= 2 THEN inst ELSE 0 END) AS BIGINT) AS boiler_instances,
                     ROUND(CAST(SUM(CASE WHEN n_docs >= 2 THEN inst ELSE 0 END) AS DOUBLE)
                           / SUM(inst), 4) AS pct_boiler,
                     CAST(COUNT(DISTINCT CASE WHEN n_docs >= 2 THEN doc_id END) AS BIGINT) AS n_docs_affected
              FROM l2 GROUP BY source ORDER BY source""")),

    // q140's allocation MATERIALIZED as a deterministic per-doc sampling
    // plan — the step that turns "language X gets 2.75 epochs" into an
    // executable copy list: floor(e) full copies per doc plus one more
    // iff the doc's md5 bucket (q59's split rule, mod 10000) falls under
    // the fractional share. Epochs are pinned as INTEGER basis points
    // via floor-division of the waterfill's exact integers, so the
    // whole plan — including the fractional-copy gate — is integer
    // arithmetic end to end; no float ever decides a copy. Reports per
    // language the emitted doc/char counts and the achieved epochs
    // against the target. 100 TB shape: |langs|-row plan broadcast into
    // a map-side join + one map-side-combined aggregate.
    Q("q142_mixture_realize",
      (s, d) => unimaxRealize(docs(s, d)),
      Some("""WITH c AS (
                SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS chars
                FROM documents GROUP BY lang),
              tot AS (SELECT CAST(2 * SUM(chars) AS BIGINT) AS b,
                             COUNT(*) AS n FROM c),
              r AS (SELECT lang, chars, 3 * chars AS cap,
                           ROW_NUMBER() OVER (ORDER BY 3 * chars, lang) AS rk,
                           SUM(3 * chars) OVER (ORDER BY 3 * chars, lang
                             ROWS UNBOUNDED PRECEDING) AS s
                    FROM c),
              k AS (SELECT COALESCE(MAX(CASE WHEN cap * (n - rk) <= b - s
                                             THEN rk END), 0) AS k
                    FROM r CROSS JOIN tot),
              sk AS (SELECT COALESCE(MAX(CASE WHEN rk <= k THEN s END), 0) AS s_k
                     FROM r CROSS JOIN k),
              plan AS (
                SELECT lang, chars,
                       CAST(CASE WHEN rk <= k THEN 30000
                                 ELSE (10000 * (b - s_k)) // ((n - k) * chars)
                            END AS BIGINT) AS e_bp,
                       CAST(rk <= k AS INT) AS capped
                FROM r CROSS JOIN k CROSS JOIN sk CROSS JOIN tot),
              d AS (
                SELECT p.lang, p.chars, p.e_bp, p.capped, doc.n_chars,
                       (p.e_bp // 10000)
                       + CASE WHEN CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10000
                                   < p.e_bp % 10000
                              THEN 1 ELSE 0 END AS copies
                FROM documents doc JOIN plan p USING (lang))
              SELECT lang, e_bp AS epochs_bp, capped,
                     CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(copies) AS BIGINT) AS n_emitted,
                     chars,
                     CAST(SUM(n_chars * copies) AS BIGINT) AS chars_emitted,
                     ROUND(CAST(SUM(n_chars * copies) AS DOUBLE) / chars, 4) AS achieved_epochs
              FROM d GROUP BY lang, e_bp, capped, chars ORDER BY lang""")),

    // C4 badwords filtering: per-doc whole-token-phrase hit counts
    // against the blocklist (docs absent from the output are the kept
    // set). Broadcast term join — corpus rows never shuffle.
    Q("q145_blocklist_filter",
      (s, d) => blocklistHits(docs(s, d)),
      Some("""WITH toks AS (
                SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS ts
                FROM documents
                WHERE LEN(regexp_split_to_array(TRIM(LOWER(text)), '\s+')) >= 1),
              uni AS (SELECT doc_id, UNNEST(ts) AS g FROM toks),
              bi AS (
                SELECT doc_id, ts[i] || ' ' || ts[i + 1] AS g
                FROM toks, UNNEST(generate_series(1, LEN(ts) - 1)) AS t(i)
                WHERE LEN(ts) >= 2),
              grams AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
              terms(term) AS (VALUES ('slow'), ('deprecated'),
                                     ('big vector'), ('merge batch'))
              SELECT doc_id, COUNT(*) AS n_hits,
                     COUNT(DISTINCT term) AS n_terms
              FROM grams JOIN terms ON g = term
              GROUP BY doc_id ORDER BY doc_id""")),

    // Column-level PII risk profile — which columns of a table look
    // like they hold emails / phone numbers / IPs, i.e. where to point
    // the q87 scrubber. The corpus is synthetic, so the query plants
    // q87's deterministic spans into `text` (the q87 convention: the
    // profiling machinery, not the planting, is what the hash pins);
    // lang/source profile to zero, the negative control.
    Q("q146_pii_profile",
      (s, d) => {
        val planted = concat(
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(lit("contact user"), col("doc_id").cast("string"),
              lit("@example.com "))).otherwise(""),
          when(pmod(col("doc_id"), lit(5)) === 0,
            concat(lit("call 555-"),
              lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
              lit(" "))).otherwise(""),
          when(pmod(col("doc_id"), lit(7)) === 0,
            concat(lit("host 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
              lit("."), pmod(col("doc_id") * 7, lit(256)).cast("string"),
              lit(" "))).otherwise(""),
          col("text"))
        piiColumnProfile(
          docs(s, d).select(planted.as("text"), col("lang"), col("source")),
          Seq("text", "lang", "source"))
      },
      Some("""WITH p AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 3 = 0 THEN 'contact user' || CAST(doc_id AS VARCHAR) || '@example.com ' ELSE '' END
                    || CASE WHEN doc_id % 5 = 0 THEN 'call 555-' || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ' ELSE '' END
                    || CASE WHEN doc_id % 7 = 0 THEN 'host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) || ' ' ELSE '' END
                    || text AS text,
                       lang, source
                FROM documents),
              vals AS (
                SELECT 'text' AS col_name, text AS v FROM p
                UNION ALL SELECT 'lang', lang FROM p
                UNION ALL SELECT 'source', source FROM p)
              SELECT col_name, COUNT(*) AS n_rows,
                     CAST(SUM(CASE WHEN regexp_matches(v, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}') THEN 1 ELSE 0 END) AS BIGINT) AS n_email,
                     CAST(SUM(CASE WHEN regexp_matches(v, '555-[0-9]{4}') THEN 1 ELSE 0 END) AS BIGINT) AS n_phone,
                     CAST(SUM(CASE WHEN regexp_matches(v, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}') THEN 1 ELSE 0 END) AS BIGINT) AS n_ip
              FROM vals GROUP BY col_name ORDER BY col_name""")),

    // Crawl snapshot delta: distinct-fingerprint carry-over between
    // consecutive snapshots (source = snapshot id), q31's fingerprint.
    Q("q148_crawl_delta",
      (s, d) => crawlDelta(docs(s, d)),
      Some("""WITH f AS (
                SELECT DISTINCT source,
                       CAST(SUBSTRING(source, 4) AS INT) AS k,
                       MD5(regexp_replace(LOWER(text), '\s+', ' ', 'g')) AS fp
                FROM documents),
              sz AS (SELECT source, k, COUNT(*) AS n FROM f GROUP BY 1, 2),
              ca AS (
                SELECT a.k AS k, COUNT(*) AS n_carried
                FROM f a JOIN f b ON b.fp = a.fp AND b.k = a.k + 1
                GROUP BY 1)
              SELECT sa.k AS k, sa.source AS src_old, sb.source AS src_new,
                     sa.n AS n_old, sb.n AS n_new,
                     CAST(COALESCE(n_carried, 0) AS BIGINT) AS n_carried,
                     ROUND(COALESCE(n_carried, 0) / CAST(sa.n AS DOUBLE), 4) AS pct_carried
              FROM sz sa
              JOIN sz sb ON sb.k = sa.k + 1
              LEFT JOIN ca ON ca.k = sa.k
              ORDER BY k""")),

    // Robust length outliers: per-source median/MAD over n_chars with
    // the integer gate |x - med| > 3*mad — zero float arithmetic.
    Q("q157_mad_outliers",
      (s, d) => madOutliers(docs(s, d)),
      Some("""WITH v AS (SELECT source, n_chars AS v FROM documents),
              g1 AS (SELECT source, v, COUNT(*) AS cnt FROM v GROUP BY 1, 2),
              c1 AS (
                SELECT source, v,
                       SUM(cnt) OVER (PARTITION BY source ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                       SUM(cnt) OVER (PARTITION BY source) AS n
                FROM g1),
              med AS (
                SELECT source, MIN(CASE WHEN cum * 2 >= n THEN v END) AS med
                FROM c1 GROUP BY 1),
              dv AS (
                SELECT v.source, ABS(v.v - med) AS v
                FROM v JOIN med USING (source)),
              g2 AS (SELECT source, v, COUNT(*) AS cnt FROM dv GROUP BY 1, 2),
              c2 AS (
                SELECT source, v,
                       SUM(cnt) OVER (PARTITION BY source ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                       SUM(cnt) OVER (PARTITION BY source) AS n
                FROM g2),
              mad AS (
                SELECT source, MIN(CASE WHEN cum * 2 >= n THEN v END) AS mad
                FROM c2 GROUP BY 1)
              SELECT v.source, COUNT(*) AS n_docs,
                     CAST(med AS BIGINT) AS median,
                     CAST(mad AS BIGINT) AS mad,
                     CAST(SUM(CASE WHEN ABS(v.v - med) > 3 * mad
                                   THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
              FROM v JOIN med USING (source) JOIN mad USING (source)
              GROUP BY v.source, med, mad ORDER BY source""")),

    // SUBSTRING decontamination (see [[substringDecontamination]]):
    // maximal verbatim train->test quoted regions under the q59 split
    // rule — the q137 suffix-key reduction restricted to cross-split
    // pairs, replayed in SQL gram for gram.
    Q("q166_substring_decontamination",
      (s, d) => substringDecontamination(docs(s, d)),
      Some(s"""WITH tok AS (
                SELECT doc_id,
                       regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS ts,
                       CASE WHEN CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 90 THEN 'train'
                            WHEN CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 95 THEN 'val'
                            ELSE 'test' END AS split
                FROM documents),
              g0 AS (
                SELECT doc_id, split, i AS p,
                       array_to_string(ts[i:i+${Dedup.ExactSubstringMinRun - 1}], ' ') AS g
                FROM tok, UNNEST(generate_series(1, LEN(ts)-${Dedup.ExactSubstringMinRun - 1})) AS u(i)
                WHERE LEN(ts) >= ${Dedup.ExactSubstringMinRun}),
              keep AS (SELECT g FROM g0 GROUP BY g
                       HAVING COUNT(*) <= ${Dedup.DefaultMaxShingleDf}),
              idx AS (SELECT g0.doc_id, g0.split, g0.p, g0.g
                      FROM g0 JOIN keep USING (g)),
              m AS (SELECT a.doc_id AS d1, b.doc_id AS d2, a.p AS p1, b.p AS p2
                    FROM idx a JOIN idx b ON a.g = b.g
                    WHERE a.split = 'train' AND b.split = 'test'),
              isl AS (SELECT d1, d2, p1, p2, p1 - p2 AS diag,
                             p1 - ROW_NUMBER() OVER (PARTITION BY d1, d2, p1 - p2 ORDER BY p1) AS grp
                      FROM m)
              SELECT d1 AS train_doc, d2 AS test_doc,
                     CAST(MIN(p1) AS BIGINT) AS p_train,
                     CAST(MIN(p2) AS BIGINT) AS p_test,
                     CAST(COUNT(*) + ${Dedup.ExactSubstringMinRun - 1} AS BIGINT) AS len
              FROM isl GROUP BY d1, d2, diag, grp
              ORDER BY train_doc, test_doc, p_train, p_test""")),

    // Decontaminated train rewrite (see [[decontaminateCut]]): q166's
    // spans cut out of the train docs, q165's interval-complement
    // reassembly — replayed end to end in SQL.
    Q("q167_decontaminate_cut",
      (s, d) => decontaminateCut(docs(s, d)),
      Some(s"""WITH tok AS (
                SELECT doc_id,
                       regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS ts,
                       CASE WHEN CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 90 THEN 'train'
                            WHEN CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 95 THEN 'val'
                            ELSE 'test' END AS split
                FROM documents),
              g0 AS (
                SELECT doc_id, split, i AS p,
                       array_to_string(ts[i:i+${Dedup.ExactSubstringMinRun - 1}], ' ') AS g
                FROM tok, UNNEST(generate_series(1, LEN(ts)-${Dedup.ExactSubstringMinRun - 1})) AS u(i)
                WHERE LEN(ts) >= ${Dedup.ExactSubstringMinRun}),
              keep AS (SELECT g FROM g0 GROUP BY g
                       HAVING COUNT(*) <= ${Dedup.DefaultMaxShingleDf}),
              idx AS (SELECT g0.doc_id, g0.split, g0.p, g0.g
                      FROM g0 JOIN keep USING (g)),
              m AS (SELECT a.doc_id AS d1, b.doc_id AS d2, a.p AS p1, b.p AS p2
                    FROM idx a JOIN idx b ON a.g = b.g
                    WHERE a.split = 'train' AND b.split = 'test'),
              isl AS (SELECT d1, d2, p1, p2, p1 - p2 AS diag,
                             p1 - ROW_NUMBER() OVER (PARTITION BY d1, d2, p1 - p2 ORDER BY p1) AS grp
                      FROM m),
              sp AS (SELECT d1, MIN(p1) AS p1,
                            COUNT(*) + ${Dedup.ExactSubstringMinRun - 1} AS len
                     FROM isl GROUP BY d1, d2, diag, grp),
              cut AS (SELECT d1 AS doc_id, p1 AS s, p1 + len - 1 AS e FROM sp),
              ord_ AS (SELECT doc_id, s, e,
                MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
                FROM cut),
              isl2 AS (SELECT doc_id, s, e,
                SUM(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS grp
                FROM ord_),
              merged AS (SELECT doc_id, grp, MIN(s) AS mn, MAX(e) AS mx
                         FROM isl2 GROUP BY 1, 2),
              toks AS (SELECT doc_id, i AS p, ts[i] AS tkn
                       FROM tok, UNNEST(generate_series(1, LEN(ts))) AS u(i)
                       WHERE split = 'train'),
              kept AS (SELECT tk.doc_id, tk.p, tk.tkn FROM toks tk
                       WHERE NOT EXISTS (SELECT 1 FROM merged m2
                         WHERE m2.doc_id = tk.doc_id AND tk.p BETWEEN m2.mn AND m2.mx))
              SELECT t.doc_id, CAST(LEN(t.ts) AS BIGINT) AS n_tokens,
                     CAST(LEN(t.ts) - COUNT(k.p) AS BIGINT) AS removed_tokens,
                     COALESCE(STRING_AGG(k.tkn, ' ' ORDER BY k.p), '') AS clean_text
              FROM tok t LEFT JOIN kept k USING (doc_id)
              WHERE t.split = 'train'
              GROUP BY t.doc_id, LEN(t.ts)
              ORDER BY doc_id""")),

    // POPULATION STABILITY INDEX per source — the model-monitoring
    // industry standard (the sibling of q114's Jensen-Shannon): each
    // source's n_chars distribution vs the whole corpus over a fixed
    // 10-bucket equi-width grid, PSI = Σ (p_s − p)·ln(p_s/p). The
    // conventional read: < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted.
    // Proportions are Laplace-smoothed ((n+1)/(N+10)) so empty buckets
    // never divide by zero and both engines smooth identically; bucket
    // ids are FLOOR over an integer-derived double, identical in both.
    // One scan → 10×|sources| integer grid; the PSI fold is a window
    // over ≤10 rows per source. Per-bucket contributions ride along so
    // the hash pins the whole decomposition, not just the total.
    Q("q194_psi",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
        val base = docs(s, d)
        val bounds = base.agg(min(col("n_chars")).as("mn"),
          max(col("n_chars")).as("mx"))
        val bucketed = base.crossJoin(broadcast(bounds))
          .select(col("source"),
            least(lit(9), floor((col("n_chars") - col("mn")) * 10 /
              (col("mx") - col("mn") + 1))).cast("int").as("bucket"))
        val grid = bucketed.groupBy(col("source"), col("bucket"))
          .agg(count(lit(1)).as("n_sb"))
        // densify: every (source, 0..9) cell, zeros included — the
        // smoothing needs absent buckets to exist
        val cells = grid.select(col("source")).distinct()
          .crossJoin(broadcast(s.range(0, 10).toDF("b")))
          .select(col("source"), col("b").cast("int").as("bucket"))
        val full = cells.join(grid, Seq("source", "bucket"), "left")
          .select(col("source"), col("bucket"),
            coalesce(col("n_sb"), lit(0L)).as("n_sb"))
        val nS = full.groupBy(col("source")).agg(sum(col("n_sb")).as("n_s"))
        val corp = full.groupBy(col("bucket")).agg(sum(col("n_sb")).as("n_b"))
        val nTot = full.agg(sum(col("n_sb")).as("n"))
        val scored = full
          .join(nS, Seq("source")).join(corp, Seq("bucket"))
          .crossJoin(broadcast(nTot))
          .withColumn("ps", (col("n_sb").cast("double") + 1.0) /
            (col("n_s") + 10))
          .withColumn("pc", (col("n_b").cast("double") + 1.0) /
            (col("n") + 10))
          .withColumn("contrib",
            (col("ps") - col("pc")) * log(col("ps") / col("pc")))
        scored
          .select(col("source"), col("bucket"), col("n_sb"),
            round(col("contrib"), 6).as("contrib"),
            round(sum(col("contrib")).over(
              w.partitionBy(col("source"))), 4).as("psi"))
          .orderBy(col("source"), col("bucket"))
      },
      Some("""WITH b AS (
                SELECT MIN(n_chars) AS mn, MAX(n_chars) AS mx FROM documents),
              bk AS (
                SELECT source,
                       CAST(LEAST(9, FLOOR((n_chars - b.mn) * 10
                         / (b.mx - b.mn + 1))) AS INT) AS bucket
                FROM documents, b),
              grid AS (SELECT source, bucket, COUNT(*) AS n_sb
                       FROM bk GROUP BY 1, 2),
              cells AS (
                SELECT s.source, CAST(g.b AS INT) AS bucket
                FROM (SELECT DISTINCT source FROM grid) s,
                     UNNEST(generate_series(0, 9)) AS g(b)),
              full_g AS (
                SELECT c.source, c.bucket, COALESCE(grid.n_sb, 0) AS n_sb
                FROM cells c LEFT JOIN grid
                  ON grid.source = c.source AND grid.bucket = c.bucket),
              ns AS (SELECT source, SUM(n_sb) AS n_s FROM full_g GROUP BY 1),
              corp AS (SELECT bucket, SUM(n_sb) AS n_b FROM full_g GROUP BY 1),
              nt AS (SELECT SUM(n_sb) AS n FROM full_g),
              sc AS (
                SELECT f.source, f.bucket, CAST(f.n_sb AS BIGINT) AS n_sb,
                       ((CAST(f.n_sb AS DOUBLE) + 1.0) / (ns.n_s + 10)) AS ps,
                       ((CAST(corp.n_b AS DOUBLE) + 1.0)
                         / ((SELECT n FROM nt) + 10)) AS pc
                FROM full_g f
                JOIN ns ON ns.source = f.source
                JOIN corp ON corp.bucket = f.bucket)
              SELECT source, bucket, n_sb,
                     ROUND((ps - pc) * LN(ps / pc), 6) AS contrib,
                     ROUND(SUM((ps - pc) * LN(ps / pc))
                       OVER (PARTITION BY source), 4) AS psi
              FROM sc ORDER BY source, bucket""")),

    // WEIGHTED sample without replacement, deterministic (Efraimidis &
    // Spirakis 2006): each row draws u from a reproducible md5-derived
    // uniform (the q59/q152 addressing rule) and ranks by
    // key = -ln(u) / w — the top-k by ascending key is an exact
    // weight-proportional sample-without-replacement. Here w = n_chars:
    // "sample long documents proportionally more", the
    // length-proportional pick used when token budgets, not doc counts,
    // define the mixture. Seeded hashing (not rand()) keeps the sample
    // IDENTICAL across engines, retries, and partitionings — the
    // reproducibility contract every published pipeline wants but
    // rand()-based sampling can't give.
    //
    // Scale: key computation is map-side arithmetic on the scan;
    // TakeOrderedAndProject keeps per-partition top-k partials — no
    // global sort, no shuffle beyond k rows per partition. The ln() is
    // the one float op; ordering uses the 6-dp ROUNDED key (+doc_id
    // tie-break) so a 1-ulp libm divergence can't flip engine order.
    Q("q178_weighted_sample",
      (s, d) => {
        val v = conv(substring(md5(col("doc_id").cast("string")), 1, 8),
          16, 10).cast("long")
        val u = (v.cast("double") + lit(0.5)) / lit(4294967296.0)
        docs(s, d)
          .select(col("doc_id"), col("n_chars"),
            round(-log(u) / col("n_chars"), 6).as("key"))
          .orderBy(col("key"), col("doc_id"))
          .limit(100)
      },
      Some("""SELECT doc_id, n_chars,
                     ROUND(-LN((CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) + 0.5)
                               / 4294967296.0) / n_chars, 6) AS key
              FROM documents
              ORDER BY key, doc_id LIMIT 100""")),

    // FILTER-OVERLAP MATRIX — the quality-stack ablation artifact:
    // four removal gates (short, long, low-stopword, low-diversity)
    // evaluated in ONE scan, reported as the pairwise overlap matrix
    // (n removed by each, by both, Jaccard of the removed sets). This
    // is the decision report for ORDERING and PRUNING a filter stack:
    // a pair at Jaccard ~1 is a redundant gate (drop one); a pair at
    // ~0 means both earn their scan. The gates are the compact C4/
    // Gopher-style rules the corpus supports (tiny synthetic vocab —
    // see q108 for the full rule set); the PATTERN is rule-agnostic.
    //
    // Scale shape: flags are map-side column arithmetic; the matrix is
    // one global aggregate of 10 partial sums (every pair in the same
    // pass), then a 10-row stack on the driver-side single row — the
    // corpus is scanned ONCE for the whole matrix, vs once per filter
    // pair for the naive ablation.
    Q("q213_filter_overlap",
      (s, d) => {
        val toks = split(col("text"), " ")
        filterOverlap(docs(s, d).select(
          (length(col("text")) < 150).as("short"),
          (length(col("text")) > 450).as("long"),
          (size(filter(toks, t => t.isin("the", "a"))).cast("double") /
            size(toks) < 0.02).as("stopword"),
          (size(array_distinct(toks)).cast("double") /
            size(toks) < 0.45).as("diversity")))
      },
      Some("""WITH f AS (
                SELECT
                  LENGTH(text) < 150 AS f0,
                  LENGTH(text) > 450 AS f1,
                  length(list_filter(string_split(text, ' '),
                      t -> t IN ('the', 'a')))::DOUBLE
                    / length(string_split(text, ' ')) < 0.02 AS f2,
                  length(list_distinct(string_split(text, ' ')))::DOUBLE
                    / length(string_split(text, ' ')) < 0.45 AS f3
                FROM documents),
              m AS (
                SELECT
                  CAST(SUM((f0 AND f0)::INT) AS BIGINT) AS n_0_0,
                  CAST(SUM((f0 AND f1)::INT) AS BIGINT) AS n_0_1,
                  CAST(SUM((f0 AND f2)::INT) AS BIGINT) AS n_0_2,
                  CAST(SUM((f0 AND f3)::INT) AS BIGINT) AS n_0_3,
                  CAST(SUM((f1 AND f1)::INT) AS BIGINT) AS n_1_1,
                  CAST(SUM((f1 AND f2)::INT) AS BIGINT) AS n_1_2,
                  CAST(SUM((f1 AND f3)::INT) AS BIGINT) AS n_1_3,
                  CAST(SUM((f2 AND f2)::INT) AS BIGINT) AS n_2_2,
                  CAST(SUM((f2 AND f3)::INT) AS BIGINT) AS n_2_3,
                  CAST(SUM((f3 AND f3)::INT) AS BIGINT) AS n_3_3
                FROM f),
              rows_ AS (
                SELECT 'short' AS fa, 'short' AS fb, n_0_0 AS n_a, n_0_0 AS n_b, n_0_0 AS n_both FROM m
                UNION ALL SELECT 'short', 'long', n_0_0, n_1_1, n_0_1 FROM m
                UNION ALL SELECT 'short', 'stopword', n_0_0, n_2_2, n_0_2 FROM m
                UNION ALL SELECT 'short', 'diversity', n_0_0, n_3_3, n_0_3 FROM m
                UNION ALL SELECT 'long', 'long', n_1_1, n_1_1, n_1_1 FROM m
                UNION ALL SELECT 'long', 'stopword', n_1_1, n_2_2, n_1_2 FROM m
                UNION ALL SELECT 'long', 'diversity', n_1_1, n_3_3, n_1_3 FROM m
                UNION ALL SELECT 'stopword', 'stopword', n_2_2, n_2_2, n_2_2 FROM m
                UNION ALL SELECT 'stopword', 'diversity', n_2_2, n_3_3, n_2_3 FROM m
                UNION ALL SELECT 'diversity', 'diversity', n_3_3, n_3_3, n_3_3 FROM m)
              SELECT fa, fb, n_a, n_b, n_both,
                     CASE WHEN n_a + n_b - n_both = 0 THEN NULL
                          ELSE ROUND(CAST(n_both AS DOUBLE)
                                 / (n_a + n_b - n_both), 4) END AS jaccard
              FROM rows_ ORDER BY fa, fb"""))
  )

  /** Mutual information (nats) between `source` and `lang`, with the
    * marginal entropies and MI / H(lang). The corpus-scale work is one
    * (source, lang) count with map-side combine; everything else folds
    * over the broadcast-sized contingency table.
    */
  def sourceLangMi(docsDf: DataFrame): DataFrame = {
    val c = docsDf.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"))
    val n = c.agg(sum(col("n")).as("n_docs"))
    val ps = c.groupBy(col("source")).agg(sum(col("n")).as("ns"))
    val pl = c.groupBy(col("lang")).agg(sum(col("n")).as("nl"))
    val joint = c.join(broadcast(ps), "source").join(broadcast(pl), "lang")
      .crossJoin(broadcast(n))
    val mi = joint.agg(
      sum((col("n").cast("double") / col("n_docs")) *
        log((col("n").cast("double") * col("n_docs")) /
          (col("ns").cast("double") * col("nl")))).as("mi"))
    val hs = ps.crossJoin(broadcast(n)).agg(
      (-sum((col("ns").cast("double") / col("n_docs")) *
        log(col("ns").cast("double") / col("n_docs")))).as("h_source"))
    val hl = pl.crossJoin(broadcast(n)).agg(
      (-sum((col("nl").cast("double") / col("n_docs")) *
        log(col("nl").cast("double") / col("n_docs")))).as("h_lang"))
    n.crossJoin(broadcast(hs)).crossJoin(broadcast(hl))
      .crossJoin(broadcast(mi))
      .select(col("n_docs"),
        round(col("h_source"), 4).as("h_source"),
        round(col("h_lang"), 4).as("h_lang"),
        round(col("mi"), 4).as("mi"),
        round(col("mi") / col("h_lang"), 4).as("nmi"))
  }

  /** Pairwise Jensen-Shannon divergence (nats) between the unigram
    * distributions of every source pair. One corpus-scale (source, term)
    * aggregate; then self-join of the tiny distribution table on term
    * (inner — one-sided terms contribute the closed-form
    * `0.5·ln2·missing-mass` recovered from the co-occurring mass), and a
    * pair scaffold from the per-source totals so even disjoint-vocabulary
    * pairs appear (at the JS maximum, ln 2).
    */
  def sourceDivergence(docsDf: DataFrame): DataFrame = {
    val tok = docsDf
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
    val c = tok.groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val n = c.groupBy(col("source")).agg(sum(col("cnt")).as("n_tok"))
    val dist = c.join(broadcast(n), "source")
      .select(col("source"), col("term"),
        (col("cnt").cast("double") / col("n_tok")).as("p"))
    val a = dist.as("a")
    val b = dist.as("b")
    val pa = col("a.p"); val pb = col("b.p")
    val co = a.join(b,
        col("a.term") === col("b.term") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(
        sum(lit(0.5) * (pa * log(lit(2) * pa / (pa + pb))
          + pb * log(lit(2) * pb / (pa + pb)))).as("js_co"),
        sum(pa).as("mass_a"),
        sum(pb).as("mass_b"))
    val x = n.select(col("source").as("src_a"))
    val y = n.select(col("source").as("src_b"))
    val pairs = x.crossJoin(y).filter(col("src_a") < col("src_b"))
    pairs.join(broadcast(co), Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        round(coalesce(col("js_co"), lit(0.0))
          + lit(0.5) * lit(math.log(2.0)) *
            ((lit(1.0) - coalesce(col("mass_a"), lit(0.0)))
              + (lit(1.0) - coalesce(col("mass_b"), lit(0.0)))), 4).as("js"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** UniMax waterfill (Chung et al. 2023): per-language char budgets
    * under a total budget of `budgetMult`× the corpus and a per-language
    * `epochCap`. Languages sorted ascending by capacity `cap = epochCap·
    * chars`; the capped set is the prefix of ranks with
    * `cap_r·(n−r) ≤ B−S_r` (integer-exact — see the q140 registry note
    * for the prefix-closure argument), everyone else gets the uniform
    * level `t = (B−S_k)/(n−k)`. One corpus-scale groupBy(lang) over the
    * stored n_chars column; all downstream windows/aggs run on the
    * languages-sized table, so the unpartitioned window is bounded by
    * |langs| at any corpus size.
    */
  /** The q140 waterfill's per-language table with the boundary solved:
    * (lang, chars, cap, rk, s) plus broadcast (b, n, k, s_k) — every
    * column an exact integer, so downstream formatting (q140) and plan
    * realization (q142) share one integer-exact core.
    */
  private def waterfillTable(docsDf: DataFrame, epochCap: Int,
      budgetMult: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = docsDf.groupBy(col("lang"))
      .agg(sum(col("n_chars")).cast("long").as("chars"))
    val tot = c.agg((lit(budgetMult) * sum(col("chars"))).cast("long").as("b"),
      count(lit(1)).as("n"))
    val ord = Window.orderBy(col("cap"), col("lang"))
    val r = c.select(col("lang"), col("chars"),
        (col("chars") * epochCap).as("cap"))
      .withColumn("rk", row_number().over(ord).cast("long"))
      .withColumn("s", sum(col("cap")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val rt = r.crossJoin(broadcast(tot))
    val k = rt.agg(coalesce(
      max(when(col("cap") * (col("n") - col("rk")) <= col("b") - col("s"),
        col("rk"))), lit(0L)).as("k"))
    val sk = rt.crossJoin(broadcast(k))
      .agg(coalesce(max(when(col("rk") <= col("k"), col("s"))), lit(0L))
        .as("s_k"))
    rt.crossJoin(broadcast(k)).crossJoin(broadcast(sk))
  }

  def unimaxAllocation(docsDf: DataFrame, epochCap: Int = 3,
      budgetMult: Int = 2): DataFrame = {
    val wf = waterfillTable(docsDf, epochCap, budgetMult)
    val r = wf.withColumn("t",
      when(col("k") < col("n"),
        (col("b") - col("s_k")).cast("double") / (col("n") - col("k"))))
    r.select(col("lang"), col("chars"), col("cap").as("cap_chars"),
        round(when(col("rk") <= col("k"), col("cap").cast("double"))
          .otherwise(col("t")), 2).as("alloc_chars"),
        round(when(col("rk") <= col("k"), lit(epochCap.toDouble))
          .otherwise(col("t") / col("chars")), 4).as("epochs"),
        (col("rk") <= col("k")).cast("int").as("capped"))
      .orderBy(col("lang"))
  }

  /** Materialize the q140 waterfill into a deterministic per-doc
    * sampling plan: every doc of a language with epoch share e gets
    * floor(e) full copies, plus one more iff its md5 bucket (q59's
    * rule, mod 10000) falls under the fractional share — so the
    * realized char counts converge on the allocation without any
    * randomness. Epochs are pinned in integer BASIS POINTS
    * (`e_bp = 10000·(B−S_k) div ((n−k)·chars)`, a floor-division of
    * exact integers) so the per-doc copy rule never touches a float —
    * the plan is reproducible bit-for-bit on any engine. 100 TB shape:
    * the plan table is |langs| rows broadcast to a map-side join; the
    * report is one map-side-combined aggregate.
    */
  def unimaxRealize(docsDf: DataFrame, epochCap: Int = 3,
      budgetMult: Int = 2): DataFrame = {
    val plan = waterfillTable(docsDf, epochCap, budgetMult)
      .select(col("lang"), col("chars"),
        when(col("rk") <= col("k"), lit(10000L * epochCap))
          .otherwise(expr("(10000 * (b - s_k)) div ((n - k) * chars)"))
          .as("e_bp"),
        (col("rk") <= col("k")).cast("int").as("capped"))
    val bkt = pmod(
      conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(10000))
    docsDf.select(col("doc_id"), col("lang"), col("n_chars"))
      .join(broadcast(plan), Seq("lang"))
      .withColumn("copies",
        expr("e_bp div 10000") +
          when(bkt < col("e_bp") % 10000, 1L).otherwise(0L))
      .groupBy(col("lang"), col("chars"), col("e_bp"), col("capped"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("copies")).as("n_emitted"),
        sum(col("n_chars") * col("copies")).as("chars_emitted"),
        round(sum(col("n_chars") * col("copies")).cast("double")
          / col("chars"), 4).as("achieved_epochs"))
      .select(col("lang"), col("e_bp").as("epochs_bp"), col("capped"),
        col("n_docs"), col("n_emitted"), col("chars"),
        col("chars_emitted"), col("achieved_epochs"))
      .orderBy(col("lang"))
  }

  /** Per-source repeated-line boilerplate report: a line (q88's n-token
    * chunk) appearing in ≥ `minDocs` distinct documents of the same
    * source is boilerplate; reports per source the distinct/boiler line
    * counts, the instance share, and the affected-doc count.
    * Doc-frequency (not instance-frequency) is the gate, so
    * within-document repetition never trips it. Grouping rides the
    * 16-hex md5 line key — bounded-width shuffle keys, binary-stable
    * grouping (the q88 rationale); the line text itself never shuffles.
    */
  def boilerplateReport(docsDf: DataFrame, n: Int = 3,
      minDocs: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l1 = lineChunks(docsDf, n, extra = Seq("source"))
      .groupBy(col("source"), substring(md5(col("line")), 1, 16).as("lk"),
        col("doc_id"))
      .agg(count(lit(1)).as("inst"))
    val boiler = count(lit(1))
      .over(Window.partitionBy(col("source"), col("lk"))) >= minDocs
    l1.withColumn("is_b", boiler)
      .groupBy(col("source"))
      .agg(
        countDistinct(col("lk")).as("n_lines_distinct"),
        countDistinct(when(col("is_b"), col("lk"))).as("n_boiler_lines"),
        sum(col("inst")).as("n_instances"),
        sum(when(col("is_b"), col("inst")).otherwise(0L))
          .as("boiler_instances"),
        round(sum(when(col("is_b"), col("inst")).otherwise(0L)).cast("double")
          / sum(col("inst")), 4).as("pct_boiler"),
        countDistinct(when(col("is_b"), col("doc_id"))).as("n_docs_affected"))
      .orderBy(col("source"))
  }
}
