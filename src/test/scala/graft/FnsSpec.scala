package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Fns, HyperplaneBuckets, MinHashSig}
import graft.llm.TextOps

/** Native Catalyst expressions vs their higher-order-function reference
  * formulations, on real testdata: values must be IDENTICAL (the HOFs
  * fold in the same element order), not merely close — the DuckDB
  * oracle hash-compares rendered values, so any drift would show there.
  */
class FnsSpec extends AnyFunSuite with TestSpark {

  private val sf = "/root/testdata/sf0.001"

  private def embPairs = {
    val e = graft.core.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    e.as("a").join(e.as("b"), col("a.vec_id") + 1 === col("b.vec_id"))
      .select(col("a.v").as("x"), col("b.v").as("y"))
  }

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  test("native dot == HOF fold, bit-identical on real embeddings") {
    val bad = embPairs
      .select(Fns.dotProduct(col("x"), col("y")).as("n"), hofDot(col("x"), col("y")).as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(bad == 0)
  }

  test("native l2sq == dot over zip_with difference, bit-identical") {
    // the exact HOF form l2sqDist replaced in sqTopK/sqRecallReport
    // (r13 verdict #8): diff array then sequential-fold dot
    val hofL2 = aggregate(
      zip_with(col("x"), col("y"), (x, y) => x - y), lit(0.0),
      (acc, v) => acc + v * v)
    val bad = embPairs
      .select(Fns.l2sqDist(col("x"), col("y")).as("n"), hofL2.as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(bad == 0)
  }

  test("native matProject == per-row dotProduct calls, bit-identical; " +
      "exact on a hand matrix") {
    // parity: one MatProject pass == k separate DotProduct folds (same
    // ascending element order), on real embeddings
    val mat = graft.llm.Similarity.jlMatrix(k = 4, d = 64)
    val matSeq = mat.map(_.toSeq).toSeq
    val e = graft.core.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val perRow = array(matSeq.map(row =>
      Fns.dotProduct(col("v"), typedlit(row))): _*)
    val bad = e.select(Fns.matProject(col("v"), matSeq).as("n"),
        perRow.as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(bad == 0)
    // exact values on a hand case: (1,2,3) through ((1,0,0),(0,1,0),
    // (0.5,0.5,0.5)) = (1, 2, 3)
    import spark.implicits._
    val got = Seq(Seq(1.0, 2.0, 3.0)).toDF("v")
      .select(Fns.matProject(col("v"),
        Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0),
          Seq(0.5, 0.5, 0.5))).as("p"))
      .head.getSeq[Double](0)
    assert(got == Seq(1.0, 2.0, 3.0))
    // dimension mismatch fails loudly, not silently truncated
    val err = intercept[Exception] {
      Seq(Seq(1.0, 2.0)).toDF("v")
        .select(Fns.matProject(col("v"), Seq(Seq(1.0, 0.0, 0.0))))
        .collect()
    }
    assert(err.getMessage != null)
  }

  test("native cosine == dot/(norm*norm) HOF formulation, bit-identical") {
    val hofCos = hofDot(col("x"), col("y")) /
      (sqrt(hofDot(col("x"), col("x"))) * sqrt(hofDot(col("y"), col("y"))))
    val bad = embPairs
      .select(Fns.cosineSim(col("x"), col("y")).as("n"), hofCos.as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(bad == 0)
  }

  test("native shingle hashes == xxhash64 over HOF shingle array (as sets)") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= 3)
    val hof = array_sort(transform(
      graft.llm.Dedup.shingleArrayFromTokens(col("ts")), s => xxhash64(s)))
    val bad = docs
      .select(array_sort(Fns.shingleHashes(col("ts"))).as("n"), hof.as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(bad == 0)
  }

  test("native minhash sig == per-slot array_min(transform) with same mixers") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= 3)
      .select(col("doc_id"), Fns.shingleHashes(col("ts")).as("hs"))
    val hofSig = array((0 until MinHashSig.K).map { i =>
      array_min(transform(col("hs"),
        h => h * lit(MinHashSig.mixA(i)) + lit(MinHashSig.mixB(i))))
    }: _*)
    val bad = docs.select(Fns.minhashSig(col("hs")).as("n"), hofSig.as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(bad == 0)
  }

  test("native md5 hash32 == conv(substring(md5(s),1,8),16,10) per element") {
    val sh = graft.core.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= 3)
      .select(graft.llm.Dedup.shingleArrayFromTokens(col("ts")).as("sh"))
    val hof = transform(col("sh"), s =>
      conv(substring(md5(s), 1, 8), 16, 10).cast("long"))
    val bad = sh.select(Fns.md5Hash32(col("sh")).as("n"), hof.as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(bad == 0)
  }

  test("native md5 minhash sig == per-slot array_min(transform) with same mixers") {
    import graft.functions.MinHashSigMd5
    val hv = graft.core.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= 3)
      .select(col("doc_id"),
        transform(graft.llm.Dedup.shingleArrayFromTokens(col("ts")), sh =>
          conv(substring(md5(sh), 1, 8), 16, 10).cast("long")).as("hv"))
    val hofSig = array((0 until MinHashSigMd5.K).map { i =>
      array_min(transform(col("hv"), h =>
        (h * lit(MinHashSigMd5.mixA(i)) + lit(MinHashSigMd5.mixB(i)))
          % MinHashSigMd5.Mod))
    }: _*)
    val bad = hv.select(Fns.md5MinhashSig(col("hv")).as("n"), hofSig.as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(bad == 0)
  }

  test("native simhash64 == explode + 64-column majority-vote aggregation") {
    val docs = graft.core.Tables.load(spark, sf, "documents").limit(50)
    val native = docs
      .select(col("doc_id"), Fns.simhash64(TextOps.tokens(col("text"))).as("sig"))
    // reference formulation: one row per token, 64 conditional sums
    val toks = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i")
    }
    val agg = toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val refSig = (0 until 64).map { i =>
      when(col(s"b$i") >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
    val ref = agg.select(col("doc_id"), refSig.as("sig"))
    val bad = native.as("n").join(ref.as("r"), "doc_id")
      .filter(col("n.sig") =!= col("r.sig")).count()
    assert(bad == 0)
  }

  test("native LSH buckets == per-plane HOF projections with same planes") {
    val vecs = graft.core.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    def planeLit(p: Int) = typedlit(HyperplaneBuckets.planes(p).toSeq)
    def hofBucket(t: Int) = (0 until HyperplaneBuckets.BitsPerTable).map { b =>
      val proj = aggregate(
        zip_with(col("v"), slice(planeLit(t * HyperplaneBuckets.BitsPerTable + b),
          lit(1), size(col("v"))), (x, w) => x * w),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1), b)).otherwise(lit(0))
    }.reduce((a, c) => a.bitwiseOR(c))
    val hof = array((0 until HyperplaneBuckets.Tables).map(hofBucket): _*)
    val bad = vecs.select(Fns.lshBuckets(col("v")).as("n"), hof.as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(bad == 0)
  }

  test("native stop-hits == HOF filter/array_contains count") {
    val words = TextOps.EnglishStop
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .select(TextOps.tokens(col("text")).as("ts"))
    val hof = size(filter(col("ts"),
      t => array_contains(array(words.map(lit): _*), t)))
    val bad = docs
      .select(Fns.stopHits(col("ts"), words).as("n"), hof.as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(bad == 0)
  }

  test("native char entropy == HOF distinct-fold, bit-identical on real text") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .filter(length(col("text")) > 0)
    val bad = docs
      .select(Fns.charEntropy(col("text")).as("n"),
        TextOps.charEntropyHof(col("text")).as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(bad == 0)
    // surrogate-pair and repeated-char edges
    val r = spark.sql(
      "SELECT graft_char_entropy('aaaa') AS a, graft_char_entropy('ab') AS b," +
        " graft_char_entropy('😀😀x') AS c").collect().head
    assert(r.getDouble(0) === 0.0)
    assert(math.abs(r.getDouble(1) - math.log(2.0)) < 1e-15)
    // two emoji code points + one ascii: p = (2/3, 1/3)
    val expected = -(2.0 / 3) * math.log(2.0 / 3) - (1.0 / 3) * math.log(1.0 / 3)
    assert(math.abs(r.getDouble(2) - expected) < 1e-15)
  }

  test("native winnowed minima == HOF distinct window-min, identical on real text") {
    val grams = transform(
      sequence(lit(1), size(col("ts")) - 2),
      i => concat_ws(" ", element_at(col("ts"), i),
        element_at(col("ts"), i + 1), element_at(col("ts"), i + 2)))
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .select(TextOps.tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= 6)
      .select(Fns.md5Hash32(grams).as("hs"))
    val bad = docs
      .select(Fns.winnowedMinima(col("hs"), 4).as("n"),
        graft.llm.Dedup.winnowedMinimaHof(col("hs"), 4).as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(bad == 0)
  }

  test("graft_interval_cut rejects un-cast int interval bounds at analysis") {
    // compute() reads interval fields as longs; a struct<int,int> input
    // (which the replaced HOF form accepted) must fail at analysis time
    // with the cast spelled out, not ClassCastException at runtime
    val df = spark.range(1).select(
      split(lit("a b c d"), " ").as("ts"),
      array(struct(lit(2).as("mn"), lit(3).as("mx"))).as("ivs"))
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(Fns.intervalCut(col("ts"), col("ivs"))).collect()
    }
    assert(err.getMessage.contains("BIGINT"), err.getMessage)
    // the documented contract (long bounds) still evaluates
    val ok = df.select(Fns.intervalCut(col("ts"),
        array(struct(lit(2L).as("mn"), lit(3L).as("mx")))).as("out"))
      .head.getSeq[String](0)
    assert(ok == Seq("a", "d"))
  }

  test("expressions are SQL-callable via GraftExtensions registration") {
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 2.0d), array(1.0d, 2.0d)) AS c," +
        " graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d," +
        " graft_simhash64(array('a','b','a')) AS s").collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 11.0)
  }

  test("null array elements are skipped, not NPEs (public SQL surface)") {
    val r = spark.sql(
      "SELECT graft_simhash64(array('a', CAST(NULL AS STRING), 'b')) AS s," +
        " graft_simhash64(array('a', 'b')) AS s2," +
        " graft_shingle_hashes(array('a', CAST(NULL AS STRING), 'b', 'c'), 3) AS sh," +
        " graft_shingle_hashes(array('a', 'b', 'c'), 3) AS sh2")
      .collect().head
    // a null token casts no vote / forms no shingle: results equal the
    // null-free formulation
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getSeq[Long](2) == r.getSeq[Long](3))
    val hits = graft.functions.Fns.stopHits(
      array(lit("the"), lit(null).cast("string"), lit("zzz")), Seq("the", "a"))
    val n = spark.range(1).select(hits.as("n")).collect().head.getInt(0)
    assert(n == 1)
  }

  test("native cosine stays inside a whole-stage-codegen span") {
    val df = embPairs.select(Fns.cosineSim(col("x"), col("y")).as("c"))
    df.collect() // AQE only materializes codegen stages in the FINAL plan
    val plan = df.queryExecution.executedPlan.toString
    // the project carrying graft_cosine must print as "*(n) Project"
    assert("\\*\\(\\d+\\) Project \\[graft_cosine".r.findFirstIn(plan).isDefined,
      s"graft_cosine not inside a codegen stage:\n$plan")
  }

  test("graft_damerau: true Damerau-Levenshtein (Lowrance-Wagner), not OSA") {
    import org.apache.spark.sql.functions._
    val cases = Seq(
      // the discriminator: OSA gives 3, true DL gives 2
      ("ca", "abc", 2),
      ("abc", "ca", 2),
      ("kitten", "sitting", 3),
      ("abcd", "acbd", 1), // one adjacent swap
      ("ab", "ba", 1),
      ("recieve", "receive", 1), // the typo class the metric exists for
      ("same", "same", 0),
      ("", "abc", 3), ("abc", "", 3))
    val df = spark.createDataFrame(cases).toDF("a", "b", "want")
      .withColumn("got", Fns.damerau(col("a"), col("b")))
    val bad = df.filter(col("got") =!= col("want")).collect()
    assert(bad.isEmpty, s"wrong distances: ${bad.mkString(", ")}")
    // DL <= plain levenshtein always (transposition only adds a move)
    val rng = new scala.util.Random(11)
    val words = Seq.fill(200)(Seq.fill(rng.nextInt(8) + 1)(
      ('a' + rng.nextInt(4)).toChar).mkString)
    val pairs = words.zip(words.reverse)
    val chk = spark.createDataFrame(pairs).toDF("a", "b")
      .select(Fns.damerau(col("a"), col("b")).as("dl"),
        levenshtein(col("a"), col("b")).as("lev"))
      .filter(col("dl") > col("lev")).collect()
    assert(chk.isEmpty, s"DL exceeded levenshtein: ${chk.mkString(", ")}")
  }

  test("native ewma == HOF left fold, bit-identical on real embeddings") {
    // the reference formulation: seed with x_1, fold the tail with the
    // SAME (1.0 - alpha) IEEE construction compute() uses at runtime
    val e = graft.core.Tables.load(spark, sf, "embeddings")
      .select(col("embedding").cast("array<double>").as("v"))
    val hof = aggregate(
      slice(col("v"), lit(2), size(col("v")) - 1), element_at(col("v"), 1),
      (acc, x) => lit(0.3) * x + (lit(1.0) - lit(0.3)) * acc)
    val bad = e.select(Fns.ewma(col("v"), 0.3).as("n"), hof.as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(bad == 0)
  }

  test("graft_ewma: fold semantics, null skip, and analysis-time guards") {
    // E_1 = 1, E_2 = .5*2+.5*1 = 1.5, E_3 = .5*3+.5*1.5 = 2.25
    val r = spark.sql(
      "SELECT graft_ewma(array(1.0d, 2.0d, 3.0d), 0.5d) AS a," +
        " graft_ewma(array(7.5d), 0.5d) AS single," +
        // null elements contribute nothing (the SQL-surface convention):
        // fold reduces to ewma([1, 3]) = 2.0
        " graft_ewma(array(1.0d, CAST(NULL AS DOUBLE), 3.0d), 0.5d) AS sk," +
        " graft_ewma(CAST(NULL AS ARRAY<DOUBLE>), 0.5d) AS n")
      .collect().head
    assert(r.getDouble(0) == 2.25)
    assert(r.getDouble(1) == 7.5)
    assert(r.getDouble(2) == 2.0)
    assert(r.isNullAt(3))
    // un-cast int array: analysis-time failure, not garbage bytes
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_ewma(array(1, 2), 0.5d)").collect()
    }
    assert(err.getMessage.contains("DOUBLE"), err.getMessage)
    // alpha must be a literal in (0, 1]
    intercept[Exception] {
      spark.range(1)
        .selectExpr("graft_ewma(array(1.0d), CAST(id AS DOUBLE))").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT graft_ewma(array(1.0d), 1.5d)").collect()
    }
  }

  test("graft_holt: fold semantics, null skip, analysis-time guards") {
    // [1, 2, 3] with alpha=.5, beta=.5:
    // l1=1 b1=0; l2=.5*2+.5*1=1.5, b2=.5*.5+.5*0=.25;
    // l3=.5*3+.5*1.75=2.375, b3=.5*.875+.5*.25=.5625
    val r = spark.sql(
      "SELECT graft_holt(array(1.0d, 2.0d, 3.0d), 0.5d, 0.5d) AS h," +
        " graft_holt(array(7.5d), 0.5d, 0.5d) AS single," +
        " graft_holt(array(1.0d, CAST(NULL AS DOUBLE), 3.0d), 0.5d, 0.5d)" +
        "   AS sk," +
        " graft_holt(CAST(NULL AS ARRAY<DOUBLE>), 0.5d, 0.5d) AS n")
      .collect().head
    assert(r.getStruct(0).getDouble(0) == 2.375)
    assert(r.getStruct(0).getDouble(1) == 0.5625)
    assert(r.getStruct(1).getDouble(0) == 7.5 &&
      r.getStruct(1).getDouble(1) == 0.0)
    // null element skipped: fold over [1, 3] -> l=2, b=0.5
    assert(r.getStruct(2).getDouble(0) == 2.0)
    assert(r.getStruct(2).getDouble(1) == 0.5)
    assert(r.isNullAt(3))
    val e1 = intercept[Exception] {
      spark.sql("SELECT graft_holt(array(1, 2), 0.5d, 0.5d)").collect()
    }
    assert(e1.getMessage.contains("array<DOUBLE>"))
    val e2 = intercept[Exception] {
      spark.range(1)
        .selectExpr("graft_holt(array(1.0d), CAST(id AS DOUBLE), 0.5d)")
        .collect()
    }
    assert(e2.getMessage.toLowerCase.contains("literal"))
  }

  test("native holt backtest: hand-computed errors, null skip, " +
      "single element yields zero forecasts, naive sum independent") {
    import spark.implicits._
    def bt(xs: Seq[java.lang.Double]): (Long, Double, Double) = {
      val r = Seq(Tuple1(xs)).toDF("xs")
        .select(Fns.holtBacktest(col("xs"), 0.3, 0.2).as("b"))
        .collect().head.getStruct(0)
      (r.getLong(0), r.getDouble(1), r.getDouble(2))
    }
    // xs = [1, 2, 4]: forecast_2 = 1 (err 1), after update l = 0.3*2 +
    // 0.7*1, b = 0.2*(l-1); forecast_3 = l+b, naive errs = 1 + 2
    val l2 = 0.3 * 2 + (1.0 - 0.3) * 1.0
    val b2 = 0.2 * (l2 - 1.0) + (1.0 - 0.2) * 0.0
    val (nf, serr, nerr) = bt(Seq(1.0, 2.0, 4.0))
    assert(nf == 2L)
    assert(serr == 1.0 + math.abs(4.0 - (l2 + b2)))
    assert(nerr == 3.0)
    // nulls neither score nor update (HoltFold's skip rule)
    assert(bt(Seq(1.0, null, 2.0, null, 4.0)) == ((nf, serr, nerr)))
    // a single observation has nothing to forecast
    assert(bt(Seq(7.0)) == ((0L, 0.0, 0.0)))
    // wrong element type fails at analysis, not execution
    val e = intercept[Exception] {
      spark.sql("SELECT graft_holt_backtest(array('a'), 0.3d, 0.2d)")
        .collect()
    }
    assert(e.getMessage.contains("array<DOUBLE>"))
  }

  test("native nfc: composed == decomposed, NFC-only (ligature survives), " +
      "ASCII fast-path identity, null passthrough") {
    import spark.implicits._
    val composed = "café"              // é as U+00E9
    val decomposed = "café"           // e + combining acute
    val ligature = "ﬁle"               // ﬁle — NFKC would expand, NFC must NOT
    val ascii = "plain ascii text"
    val df = Seq((1L, composed), (2L, decomposed), (3L, ligature),
      (4L, ascii), (5L, null.asInstanceOf[String]))
      .toDF("id", "s")
      .select(col("id"), Fns.nfc(col("s")).as("n"), col("s"))
      .orderBy("id").collect()
    // composed and decomposed normalize to the same bytes (the composed form)
    assert(df(0).getString(1) == composed)
    assert(df(1).getString(1) == composed)
    // NFC is canonical-only: the compatibility ligature is untouched
    assert(df(2).getString(1) == ligature)
    // ASCII is returned unchanged (quick-check fast path)
    assert(df(3).getString(1) == ascii)
    assert(df(4).isNullAt(1))
    // ground truth: java.text.Normalizer agrees on every non-null row
    df.take(4).foreach { r =>
      assert(r.getString(1) == java.text.Normalizer.normalize(
        r.getString(2), java.text.Normalizer.Form.NFC))
    }
  }

  test("canonicalColumn ladder: case, whitespace runs, and composition " +
      "variants converge to one canonical form") {
    import spark.implicits._
    val variants = Seq(
      "  The   CAFÉ menu ",            // case + padding + runs
      "the café menu",                // decomposed, already lower
      "THE\tCAFÉ\n\nMENU")             // tabs/newlines as whitespace
    val out = variants.toDF("text")
      .select(graft.llm.Curation.canonicalColumn(col("text")).as("c"))
      .collect().map(_.getString(0)).toSet
    assert(out == Set("the café menu"))
  }

  test("canonicalColumn collapses U+000B (vertical tab) — the char " +
      "where Java \\s and RE2 \\s disagree — on BOTH engines' ladders") {
    import spark.implicits._
    // Java's \s matches \x0B, RE2's does not: the ladder pins an
    // explicit class (Curation.CanonWs) so Spark and the DuckDB oracle
    // agree on \x0B-bearing text; the committed corpus is already
    // canonical and can't exercise this.
    val vt = '\u000B'.toString
    val out = Seq("a" + vt + "b", "a " + vt + " b").toDF("text")
      .select(graft.llm.Curation.canonicalColumn(col("text")).as("c"))
      .collect().map(_.getString(0)).toSet
    assert(out == Set("a b"))
    // the shared class itself names \x0B explicitly
    assert(graft.llm.Curation.CanonWs.contains("\\x0B"))
  }
}
