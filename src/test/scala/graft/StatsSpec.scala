package graft

import java.security.MessageDigest
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Stats

/** Planted-data semantics for the Stats module: KMV sketch exact/
  * estimate regimes and duplication invariance, Kaplan-Meier survival
  * conventions (censored-at-death-time still at risk, all-die -> 0,
  * censor at last observed ts), jackknife degenerate and
  * independently-recomputed cases, and the exact closed-form OLS fit.
  */
class StatsSpec extends AnyFunSuite with TestSpark {

  import spark.implicits._

  private val evSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType)))

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events(rows: (Long, String, Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, t, u, e) =>
        Row(id, ts(t), u, e) }),
      evSchema)

  // The same md5 32-bit addressing the engine and the oracle use.
  private def h32(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16)
  }

  // ---- KMV --------------------------------------------------------

  test("kmv: exact below k, estimated above k, within 3/sqrt(k)") {
    val df = (0 until 2000).map(i => ("big", i.toLong)) ++
      (0 until 10).map(i => ("small", 100000L + i))
    val out = Stats.kmvReport(df.toDF("g", "k"), col("g"), col("k"), 64)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val (nS, nhS, estS, errS) = out("small")
    assert(nS == 10 && nhS == 10 && estS == 10.0 && errS == 0.0)
    val (nB, _, estB, errB) = out("big")
    assert(nB == 2000)
    // KMV standard error is ~1/sqrt(k-2); 3 sigma at k=64 is ~38%
    assert(errB < 0.38, s"KMV error $errB (est $estB) beyond 3 sigma")
  }

  test("kmv: estimate is invariant to input duplication") {
    val once = (0 until 500).map(i => ("g", i.toLong))
    val five = (0 until 5).flatMap(_ => once)
    val a = Stats.kmvReport(once.toDF("g", "k"), col("g"), col("k"), 64)
      .collect().head
    val b = Stats.kmvReport(five.toDF("g", "k"), col("g"), col("k"), 64)
      .collect().head
    assert(a == b)
  }

  test("kmv: the min-k selection plans as bounded-heap TopKPerKey") {
    val q = graft.queries.Registry.queries("q247_kmv_distinct")(
      spark, "/root/testdata/sf0.001")
    assert(q.collect().nonEmpty)
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("TopKPerKeyFinal"), s"no TopKPerKey in plan:\n$plan")
    assert(plan.contains("TopKPerKeyPartial"), s"no partial phase:\n$plan")
  }

  // ---- Kaplan-Meier ----------------------------------------------

  test("kmvOverlap: exact path below k reads the true hash-level " +
      "overlap; estimator path lands within 3 sigma; duplication-" +
      "invariant") {
    import spark.implicits._
    // groups A (keys 0..99), B (50..149): |A∩B| = 50, |A∪B| = 150
    val small = ((0 until 100).map(i => ("A", i.toLong)) ++
      (50 until 150).map(i => ("B", i.toLong))).toDF("g", "k")
    val ex = Stats.kmvOverlap(small, col("g"), col("k"), k = 256)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val r = ex(("A", "B"))
    // union 150 < k: the k-min set IS the union — everything exact
    assert(r.getAs[Long]("n_union_hash") == 150L)
    assert(r.getAs[Long]("n_inter_hash") == 50L)
    assert(r.getAs[Long]("est_union") == 150L)
    assert(r.getAs[Long]("n_both") == 50L)
    // jacc = 50/150 -> e6 half-up = 333333
    assert(r.getAs[Long]("jacc_e6") == 333333L)
    assert(r.getAs[Long]("est_inter") == 50L)
    // estimator path: 6000-key union, half shared, k = 256
    val big = ((0 until 4000).map(i => ("A", i.toLong)) ++
      (2000 until 6000).map(i => ("B", i.toLong))).toDF("g", "k")
    val eb = Stats.kmvOverlap(big, col("g"), col("k"), k = 256)
      .collect().head
    val estU = eb.getAs[Long]("est_union").toDouble
    val jac = eb.getAs[Long]("jacc_e6").toDouble / 1e6
    // true union 6000, true jaccard 2000/6000; 3/sqrt(254) ~ 19%
    assert(math.abs(estU - 6000.0) / 6000.0 < 0.19, s"est_union $estU")
    assert(math.abs(jac - 1.0 / 3.0) < 0.19, s"jaccard $jac")
    // sketches see SETS: feeding every row five times changes nothing
    val dup = big.union(big).union(big).union(big).union(big)
    assert(Stats.kmvOverlap(dup, col("g"), col("k"), k = 256)
      .collect().head.toSeq == eb.toSeq)
  }

  test("kaplan-meier: hand-checked curve, censored-at-death still at risk") {
    // u1 dies day 0; u2 dies day 2; u4 dies day 3 (and defines the
    // stream max); u3 never purchases -> censored at day 3 alongside
    // u4's death. N=4:
    //   day 0: n=4 d=1        S = 3/4            = 0.75
    //   day 2: n=3 d=1        S = 0.75 * 2/3     = 0.5
    //   day 3: n=2 d=1 c=1    S = 0.5 * 1/2      = 0.25  (c at risk)
    val ev = events(
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (2L, "2024-01-01 05:00:00", 1L, "purchase"),
      (3L, "2024-01-01 00:00:00", 2L, "view"),
      (4L, "2024-01-03 01:00:00", 2L, "purchase"),
      (5L, "2024-01-01 00:00:00", 3L, "view"),
      (6L, "2024-01-01 00:00:00", 4L, "view"),
      (7L, "2024-01-04 00:00:00", 4L, "purchase"))
    val out = Stats.kaplanMeier(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq(
      (0L, 4L, 1L, 0L, 0.75),
      (2L, 3L, 1L, 0L, 0.5),
      (3L, 2L, 1L, 1L, 0.25)))
  }

  test("kaplan-meier: survival hits exact 0 when the last at-risk die") {
    val ev = events(
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (2L, "2024-01-02 00:00:00", 1L, "purchase"),
      (3L, "2024-01-01 00:00:00", 2L, "view"),
      (4L, "2024-01-02 00:00:00", 2L, "purchase"))
    val out = Stats.kaplanMeier(ev).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4))
      == ((1L, 2L, 2L, 0.0)))
  }

  // ---- Jackknife --------------------------------------------------

  test("jackknife: identical users give zero variance and a point CI") {
    // every user has exactly 2 purchases -> both arm means are 2,
    // every leave-one-out estimate is 0 -> se = 0, lo = hi = theta = 0
    val rows = (1L to 40L).flatMap { u =>
      Seq((u * 10, "2024-01-01 10:00:00", u, "purchase"),
        (u * 10 + 1, "2024-01-02 10:00:00", u, "purchase"))
    }
    val out = Stats.jackknifeLift(events(rows: _*), spark, 32).collect().head
    assert(out.getAs[Long]("n_blocks") == 32L)
    assert(out.getAs[Double]("theta") == 0.0)
    assert(out.getAs[Double]("se") == 0.0)
    assert(out.getAs[Double]("lo") == 0.0)
    assert(out.getAs[Double]("hi") == 0.0)
  }

  test("jackknife: matches an independent Scala recomputation") {
    // users with differing purchase counts; recompute theta and se
    // from first principles with the same md5 addressing and the same
    // e9 pseudo-value grid
    val rows = (1L to 60L).flatMap { u =>
      (0 until (u % 7).toInt).map(i =>
        (u * 100 + i, "2024-01-01 10:00:00", u, "purchase"))
    } ++ (1L to 60L).map(u => (u * 100 + 90, "2024-01-01 09:00:00", u, "view"))
    val out = Stats.jackknifeLift(events(rows: _*), spark, 32).collect().head

    val users = (1L to 60L).map { u =>
      val y = (u % 7).toInt
      val a = h32(s"$u:ab") % 2
      val b = h32(s"$u:jk") % 32
      (u, y, a, b)
    }
    def stats(f: ((Long, Int, Long, Long)) => Boolean) = {
      val s = users.filter(f)
      (s.size.toLong, s.map(_._2.toLong).sum)
    }
    val (na, sa) = stats(_._3 == 0)
    val (nb, sb) = stats(_._3 == 1)
    val theta = sb.toDouble / nb - sa.toDouble / na
    val zs = (0L until 32L).map { blk =>
      val (nab, sab) = stats(u => u._3 == 0 && u._4 == blk)
      val (nbb, sbb) = stats(u => u._3 == 1 && u._4 == blk)
      val th = (sb - sbb).toDouble / (nb - nbb) -
        (sa - sab).toDouble / (na - nab)
      math.round(th * 1e9)
    }
    val szd = zs.map(BigInt(_)).sum.toDouble
    val sz2d = zs.map(z => BigInt(z) * BigInt(z)).sum.toDouble
    val se = math.sqrt(math.max(0.0,
      31.0 / 32.0 * (sz2d - szd * szd / 32.0) / 1e18))
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getAs[Long]("n_a") == na && out.getAs[Long]("n_b") == nb)
    assert(out.getAs[Double]("theta") == r6(theta))
    assert(out.getAs[Double]("se") == r6(se))
    assert(out.getAs[Double]("lo") == r6(theta - 1.959964 * se))
    assert(out.getAs[Double]("hi") == r6(theta + 1.959964 * se))
  }

  // ---- OLS --------------------------------------------------------

  test("ols2: recovers an exact linear relation with r2 = 1") {
    val pts = Seq((1L, 1L), (2L, 1L), (1L, 2L), (3L, 5L), (4L, 2L),
      (7L, 3L), (2L, 6L))
      .map { case (x1, x2) => (3 + 2 * x1 + 5 * x2, x1, x2) }
    val out = Stats.ols2(pts.toDF("y", "x1", "x2"),
      col("y"), col("x1"), col("x2")).collect().head
    assert(out.getAs[Long]("n_rows") == 7L)
    assert(out.getAs[Double]("b0") == 3.0)
    assert(out.getAs[Double]("b1") == 2.0)
    assert(out.getAs[Double]("b2") == 5.0)
    assert(out.getAs[Double]("r2") == 1.0)
  }

  test("ols2: rows with NULL features are dropped before the moments") {
    val df = Seq((10L, 1L, 1L), (20L, 2L, 3L), (30L, 3L, 2L),
      (40L, 4L, 7L)).toDF("y", "x1", "x2")
      .union(Seq((99L, 1L, 1L)).toDF("y", "x1", "x2")
        .select(col("y"), lit(null).cast("long").as("x1"), col("x2")))
    val out = Stats.ols2(df, col("y"), col("x1"), col("x2"))
      .collect().head
    assert(out.getAs[Long]("n_rows") == 4L)
  }

  // ---- BH-FDR / mSPRT / power -------------------------------------

  /** First `n` user ids landing in arm `a` under the ":ab" hash. */
  private def armUsers(a: Long, n: Int): Seq[Long] =
    (1L to 10000L).filter(u => h32(s"$u:ab") % 2 == a).take(n)

  test("bhFdr: a one-sided planted effect is significant, balanced " +
      "and everyone-converts types are not; p-values ordered by rank") {
    val a0 = armUsers(0, 10)
    val a1 = armUsers(1, 10)
    val rows =
      // every user has a 'base' event (everyone converts -> se=0, p=1)
      (a0 ++ a1).zipWithIndex.map { case (u, i) =>
        (i.toLong, "2024-01-01 10:00:00", u, "base") } ++
      // only arm-1 users emit 'hot' (pa=0, pb=1 -> |z| = sqrt(20)/1..)
      a1.zipWithIndex.map { case (u, i) =>
        (1000L + i, "2024-01-01 11:00:00", u, "hot") } ++
      // 'meh' is perfectly balanced: 5 users of each arm -> z = 0
      (a0.take(5) ++ a1.take(5)).zipWithIndex.map { case (u, i) =>
        (2000L + i, "2024-01-01 12:00:00", u, "meh") }
    val out = Stats.bhFdr(events(rows: _*)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(4), r.getLong(5), r.getBoolean(6)))).toMap
    val (hxa, hxb, hp, hk, hs) = out("hot")
    assert(hxa == 0L && hxb == 10L && hs && hk == 1L,
      s"hot should be rank-1 significant: ${out("hot")}")
    assert(hp < 0.001)
    // pa == pb -> z = 0 -> p rounds to 1.0; neither survives BH
    assert(out("meh")._3 == 1.0 && !out("meh")._5)
    // everyone converts -> se = 0 -> declared null result, p = 1
    assert(out("base")._3 == 1.0 && !out("base")._5)
  }

  test("bhFdr: z, p, and the step-up cut match an independent " +
      "recomputation on three planted strengths") {
    // three planted strengths: strong, medium, null; recompute the
    // whole table from first principles with the same A&S polynomial
    val a0 = armUsers(0, 20)
    val a1 = armUsers(1, 20)
    var eid = 0L
    def ev(u: Long, t: String): (Long, String, Long, String) = {
      eid += 1; (eid, "2024-01-01 10:00:00", u, t)
    }
    val rows =
      (a0 ++ a1).map(ev(_, "base")) ++
      a1.map(ev(_, "strong")) ++                       // 0/20 vs 20/20
      (a0.take(3) ++ a1.take(12)).map(ev(_, "med")) ++ // 3/20 vs 12/20
      (a0.take(8) ++ a1.take(9)).map(ev(_, "nul"))     // 8/20 vs 9/20
    val out = Stats.bhFdr(events(rows: _*)).collect()
      .map(r => r.getString(0) -> ((r.getDouble(3), r.getDouble(4),
        r.getLong(5), r.getBoolean(6)))).toMap
    // independent recomputation
    def pv(xa: Long, xb: Long, na: Long, nb: Long): (Double, Double) = {
      val pp = (xa + xb).toDouble / (na + nb)
      val se = math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb))
      if (se == 0) (0.0, 1.0) else {
        val z = (xb.toDouble / nb - xa.toDouble / na) / se
        val x = math.abs(z) * 0.7071067811865476
        val t = 1.0 / (1.0 + 0.3275911 * x)
        val p = ((((1.061405429 * t - 1.453152027) * t + 1.421413741)
          * t - 0.284496736) * t + 0.254829592) * t * math.exp(-x * x)
        (z, p)
      }
    }
    def r(x: Double, s: Int) = BigDecimal(x)
      .setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = Map("base" -> pv(20, 20, 20, 20), "strong" -> pv(0, 20, 20, 20),
      "med" -> pv(3, 12, 20, 20), "nul" -> pv(8, 9, 20, 20))
    exp.foreach { case (k, (z, p)) =>
      assert(out(k)._1 == r(z, 4), s"$k z: ${out(k)._1} vs $z")
      assert(out(k)._2 == r(p, 6), s"$k p: ${out(k)._2} vs $p")
    }
    // BH at alpha=.05, m=4: strong (k=1) and med (k=2) reject, the
    // rest don't; med's own threshold is 2*.05/4=.025 and its p ~.003
    assert(out("strong")._4 && out("med")._4)
    assert(!out("nul")._4 && !out("base")._4)
  }

  test("msprt: cumulative entry/conversion bookkeeping is exact; the " +
      "always-valid p is monotone and matches the closed form") {
    val a0 = armUsers(0, 2)
    val a1 = armUsers(1, 2)
    // day 0 (epoch day 19723 = 2024-01-01): everyone enters, no sales;
    // day 1: both arm-1 users purchase
    val rows =
      (a0 ++ a1).zipWithIndex.map { case (u, i) =>
        (i.toLong, "2024-01-01 10:00:00", u, "view") } ++
      a1.zipWithIndex.map { case (u, i) =>
        (100L + i, "2024-01-02 10:00:00", u, "purchase") }
    val out = Stats.msprt(events(rows: _*)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(6), r.getBoolean(7)))
    assert(out.length == 2)
    val d0 = out(0); val d1 = out(1)
    assert(d1._1 == d0._1 + 1)
    assert((d0._2, d0._3, d0._4, d0._5) == ((2L, 2L, 0L, 0L)))
    assert(d0._6 == 1.0 && !d0._7) // no conversions -> no evidence
    assert((d1._2, d1._3, d1._4, d1._5) == ((2L, 2L, 0L, 2L)))
    // closed form at na=nb=2, xa=0, xb=2: pp=.5, V=.25, dl=1
    val vv = 0.25; val lnl = 0.5 * math.log(vv / (vv + 0.01)) +
      1.0 * 0.01 / (2.0 * vv * (vv + 0.01))
    val expP = BigDecimal(math.min(1.0, math.exp(-lnl)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(d1._6 == expP, s"${d1._6} vs $expP")
    assert(d1._6 <= d0._6)
  }

  test("msprt: a strong persistent effect rejects and stays rejected") {
    val a0 = armUsers(0, 40)
    val a1 = armUsers(1, 40)
    // everyone enters day 0; arm-1 users purchase spread over days 1-4
    val rows =
      (a0 ++ a1).zipWithIndex.map { case (u, i) =>
        (i.toLong, "2024-01-01 00:30:00", u, "view") } ++
      a1.zipWithIndex.map { case (u, i) =>
        val day = 2 + (i % 4)
        (1000L + i, f"2024-01-0$day%d 12:00:00", u, "purchase") }
    val out = Stats.msprt(events(rows: _*)).collect()
      .map(r => (r.getDouble(6), r.getBoolean(7)))
    // p never increases
    out.sliding(2).foreach { case Array(a, b) => assert(b._1 <= a._1) }
    assert(out.last._2, s"expected rejection by the final day: ${out.toSeq}")
    // once rejected, every later day stays rejected
    val firstRej = out.indexWhere(_._2)
    assert(out.drop(firstRej).forall(_._2))
  }

  test("powerMde: exact moments on a hand-built distribution; absent " +
      "users count zero through the shared denominator") {
    val a0 = armUsers(0, 2)
    val a1 = armUsers(1, 2)
    val us = a0 ++ a1 // 4 users, na = nb = 2
    // type x: counts 1,1,3,3 -> mean 2, var 4/3; type y: one user has
    // 2 events, the other three have none -> s1=2, s2=4
    var eid = 0L
    def ev(u: Long, t: String): (Long, String, Long, String) = {
      eid += 1; (eid, "2024-01-01 10:00:00", u, t)
    }
    val rows = Seq(ev(us(0), "x"), ev(us(1), "x")) ++
      (1 to 3).map(_ => ev(us(2), "x")) ++ (1 to 3).map(_ => ev(us(3), "x")) ++
      (1 to 2).map(_ => ev(us(0), "y"))
    val out = Stats.powerMde(events(rows: _*)).collect()
      .map(r => r.getString(0) -> r).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val zs = 2.801585
    val x = out("x")
    assert(x.getAs[Long]("n_users") == 4L)
    assert(x.getAs[Double]("mean") == 2.0)
    val varX = 4.0 / 3.0
    assert(x.getAs[Double]("sd") == r6(math.sqrt(varX)))
    val mdeX = zs * math.sqrt(varX * (0.5 + 0.5))
    assert(x.getAs[Double]("mde_abs") == r6(mdeX))
    assert(x.getAs[Double]("mde_rel") == r6(mdeX / 2.0))
    assert(x.getAs[Long]("n_per_arm_2pct") ==
      math.ceil(2.0 * varX * zs * zs / (0.02 * 2.0 * 0.02 * 2.0)).toLong)
    val y = out("y")
    // s1=2, s2=4, n=4 -> mean .5, var (4 - 1)/3 = 1
    assert(y.getAs[Double]("mean") == 0.5)
    assert(y.getAs[Double]("sd") == 1.0)
  }
}
