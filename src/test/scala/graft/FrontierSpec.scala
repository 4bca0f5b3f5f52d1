package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Frontier
import graft.llm.Dedup

/** Planted-input semantics for the Frontier family: the 2-D skyline's
  * domination contract (duplicates, one-axis ties, cross-block
  * domination, brute-force equivalence), rolling-distinct window
  * clipping, the exact Pearson fold, and degree assortativity on
  * hand-computable graphs.
  */
class FrontierSpec extends AnyFunSuite with TestSpark {

  // ---- skyline2d ----------------------------------------------------

  private val ptSchema = StructType(Seq(
    StructField("g", StringType), StructField("id", LongType),
    StructField("mn", LongType), StructField("mx", LongType)))

  private def pts(rows: (String, Long, Long, Long)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (g, i, a, b) =>
        Row(g, i, a, b) }),
      ptSchema)

  private def sky(df: org.apache.spark.sql.DataFrame): Set[Long] =
    Frontier.skyline2d(df, "g", col("mn"), col("mx"))
      .select(col("id")).collect().map(_.getLong(0)).toSet

  test("skyline: dominated chain, duplicates both kept, equal-mn tie " +
      "keeps only the max-mx point") {
    val df = pts(
      // frontier: (10, 100) and (20, 200)
      ("a", 1L, 10L, 100L), ("a", 2L, 20L, 200L),
      // strictly dominated by id=2 on both axes
      ("a", 3L, 30L, 150L),
      // equal mn=20, smaller mx -> dominated by id=2 (strict on mx)
      ("a", 4L, 20L, 180L),
      // exact duplicate of id=1: dominates neither way, BOTH survive
      ("a", 5L, 10L, 100L),
      // equal mx=200 at higher mn -> dominated by id=2 (strict on mn)
      ("a", 6L, 25L, 200L))
    assert(sky(df) == Set(1L, 2L, 5L))
  }

  test("skyline: groups are independent; cross-block domination (wide " +
      "value range forces points into different 256-blocks)") {
    val df = pts(
      // group a spans a huge mn range -> the two points land in
      // different blocks of the 256-grid; domination must still see
      // across blocks through the prefix-max offsets
      ("a", 1L, 0L, 50L), ("a", 2L, 1000000L, 40L),
      ("a", 3L, 2000000L, 60L),
      // group b: same coordinates as a's dominated point, but alone in
      // its group -> survives
      ("b", 4L, 1000000L, 40L))
    assert(sky(df) == Set(1L, 3L, 4L))
  }

  test("skyline: equals brute-force NOT EXISTS on a pseudo-random set") {
    val rnd = new scala.util.Random(42)
    val rows = (1L to 400L).map(i =>
      ("g" + (i % 3), i, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val df = pts(rows: _*)
    val brute = rows.filter { case (g, _, mn, mx) =>
      !rows.exists { case (g2, _, mn2, mx2) =>
        g2 == g && mn2 <= mn && mx2 >= mx && (mn2 < mn || mx2 > mx) }
    }.map(_._2).toSet
    assert(sky(df) == brute)
  }

  test("skyline: NULL on either axis drops the row") {
    val df = pts(("a", 1L, 5L, 5L))
      .unionByName(spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          Row("a", 2L, null, 99L), Row("a", 3L, 0L, null))),
        ptSchema))
    assert(sky(df) == Set(1L))
  }

  // ---- marketBasket ---------------------------------------------------

  test("market basket: hand-computed lift on a 3-order corpus; repeat " +
      "lines collapse; sub-support pairs drop; ordering is total") {
    import spark.implicits._
    // orders: 1:{A,B} 2:{A,B} 3:{A,C} (A listed twice in order 3 —
    // the distinct must collapse it); N=3, n_A=3, n_B=2, n_C=1
    val li = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 10L), (3L, 30L))
      .toDF("l_orderkey", "l_partkey")
    val out = graft.queries.Frontier.marketBasket(li).collect()
    // only (10,20) reaches minSupport=2: lift = 2*3/(3*2) = 1 -> 1e6
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((10L, 20L, 3L, 2L, 2L, 1000000L)))
    // lower the support gate: (10,30) appears with lift 3/(3*1)=1
    val all = graft.queries.Frontier.marketBasket(li, minSupport = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(5))
      .toMap
    assert(all((10L, 30L)) == 1000000L)
    // (20,30) never co-occur -> absent even at support 1
    assert(!all.contains((20L, 30L)))
  }

  // ---- rollingDistinctUsers -----------------------------------------

  private val evSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("ts", TimestampType)))

  private def ev(rows: (Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (u, t) =>
        Row(u, Timestamp.valueOf(t)) }),
      evSchema)

  test("rolling distinct: window counts each user once, only observed " +
      "days emit, gap days roll forward") {
    val df = ev(
      // day 01: users 1,2 (user 1 twice — deduped)
      (1L, "2024-01-01 01:00:00"), (1L, "2024-01-01 02:00:00"),
      (2L, "2024-01-01 03:00:00"),
      // day 03: user 1 again (still ONE distinct over any window)
      (1L, "2024-01-03 01:00:00"),
      // day 10: outside day-03's 7-day reach, inside nothing else
      (3L, "2024-01-10 01:00:00"))
    val out = Frontier.rollingDistinctUsers(df, 7).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // observed days only: 01, 03, 10 — no rows for 02, 04..09
    assert(out.keySet == Set("2024-01-01", "2024-01-03", "2024-01-10"))
    assert(out("2024-01-01") == 2L) // users 1,2
    assert(out("2024-01-03") == 2L) // users 1,2 (user 1 NOT double-counted)
    // day 10: day 03 is 7 days back (outside [04,10]); only user 3
    assert(out("2024-01-10") == 1L)
  }

  test("rolling distinct: a user-day reaches exactly windowDays ends") {
    val df = ev((1L, "2024-01-01 00:00:00"), (2L, "2024-01-07 00:00:00"))
    val out = Frontier.rollingDistinctUsers(df, 7).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // day 07 is the LAST window that still sees day 01 (inclusive span)
    assert(out == Map("2024-01-01" -> 1L, "2024-01-07" -> 2L))
  }

  // ---- pearsonExact / degreeAssortativity ---------------------------

  private val xySchema = StructType(Seq(
    StructField("x", LongType), StructField("y", LongType)))

  private def xy(rows: (Long, Long)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (a, b) =>
        Row(a, b) }),
      xySchema)

  test("pearsonExact: +1 on a perfect line, -1 on a perfect anti-line, " +
      "NULL on zero variance") {
    def r(df: org.apache.spark.sql.DataFrame): (Long, Any) = {
      val row = Frontier.pearsonExact(df, col("x"), col("y"), "r")
        .collect().head
      (row.getLong(0), if (row.isNullAt(1)) null else row.getDouble(1))
    }
    assert(r(xy((1L, 2L), (2L, 4L), (3L, 6L))) == ((3L, 1.0)))
    assert(r(xy((1L, 6L), (2L, 4L), (3L, 2L))) == ((3L, -1.0)))
    assert(r(xy((1L, 5L), (2L, 5L), (3L, 5L))) == ((3L, null)))
  }

  private val pairSchema = StructType(Seq(
    StructField("d1", LongType), StructField("d2", LongType)))

  private def pairs(rows: (Long, Long)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (a, b) =>
        Row(a, b) }),
      pairSchema)

  test("assortativity: a star is maximally disassortative (-1); a " +
      "clique plus a disjoint edge is computed exactly") {
    // star 0-{1,2,3}: every directed edge pairs degree 3 with degree 1
    val star = Dedup.degreeAssortativity(pairs((0L, 1L), (0L, 2L), (0L, 3L)))
      .collect().head
    assert(star.getLong(0) == 6L)
    assert(star.getDouble(1) == -1.0)
    // triangle {1,2,3} plus edge {4,5}: degrees 2,2,2,1,1.
    // Directed xy pairs: six (2,2), two (1,1) ->
    // n=8 sx=sy=14 sxy=26 sxx=syy=26; r = (208-196)/(208-196) = 1? No:
    // n*sxy - sx*sy = 8*26 - 196 = 12; n*sxx - sx^2 = 12 -> r = 1.0
    // (two perfectly degree-homogeneous components ARE assortative).
    val tri = Dedup.degreeAssortativity(
      pairs((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L))).collect().head
    assert(tri.getLong(0) == 8L)
    assert(tri.getDouble(1) == 1.0)
    // break the symmetry: path 1-2-3 (degrees 1,2,1) plus edge 4-5 —
    // hand-computed: xy = {(1,2),(2,1),(2,1),(1,2),(1,1),(1,1)} ->
    // n=6 sx=sy=8 sxy=10 sxx=syy=12; r=(60-64)/((72-64)) = -0.5
    val path = Dedup.degreeAssortativity(
      pairs((1L, 2L), (2L, 3L), (4L, 5L))).collect().head
    assert(path.getLong(0) == 6L)
    assert(path.getDouble(1) == -0.5)
  }

  // ---- cusumDaily -----------------------------------------------------

  private val evtSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("ts", TimestampType),
    StructField("event_type", StringType)))

  test("cusum: constant rate stays at zero, a spike alarms, a quiet " +
      "grid day zero-fills and decays the statistic") {
    // 3 observed days; type a: 1,1,7 (N=3, sum=9, dev=3x-9: -6,-6,12)
    // type b: 2,2,2 (dev 0 everywhere); type c: 3,absent,absent
    // (sum=3, dev: 6,-3,-3 -> S: 6 alarm, 3 quiet, 0)
    val rows = Seq.tabulate(1)(_ => ()).flatMap { _ =>
      def on(day: Int, n: Int, t: String) = Seq.fill(n)(
        (1L, Timestamp.valueOf(f"2024-01-0$day%d 10:00:00"), t))
      on(1, 1, "a") ++ on(2, 1, "a") ++ on(3, 7, "a") ++
        on(1, 2, "b") ++ on(2, 2, "b") ++ on(3, 2, "b") ++
        on(1, 3, "c")
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromTuple)), evtSchema)
    val out = Frontier.cusumDaily(df).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(("a", "2024-01-01")) == ((0L, false)))
    assert(out(("a", "2024-01-02")) == ((0L, false)))
    assert(out(("a", "2024-01-03")) == ((12L, true)))   // 12 > 9
    Seq("2024-01-01", "2024-01-02", "2024-01-03").foreach(day =>
      assert(out(("b", day)) == ((0L, false))))
    assert(out(("c", "2024-01-01")) == ((6L, true)))    // 6 > 3
    assert(out(("c", "2024-01-02")) == ((3L, false)))   // 3 > 3 is false
    assert(out(("c", "2024-01-03")) == ((0L, false)))
    assert(out.size == 9)                               // dense 3x3 grid
  }

  // ---- giniExact ------------------------------------------------------

  test("gini: hand-computed values, perfect equality pins zero, " +
      "single-holder concentration approaches (n-1)/n") {
    val giniSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("x4", DecimalType(38, 0))))
    def g(xs: Long*): (Long, Double) = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(xs.zipWithIndex.map { case (x, i) =>
          Row(i.toLong, new java.math.BigDecimal(x)) }),
        giniSchema)
      val r = Frontier.giniExact(df).collect().head
      (r.getLong(0), r.getDouble(2))
    }
    // [1,2,3,4]: G = (2*(1+4+9+16) - 5*10) / (4*10) = 10/40 = 0.25
    assert(g(1L, 2L, 3L, 4L) == ((4L, 0.25)))
    // perfect equality -> 0 at any n
    assert(g(7L, 7L, 7L, 7L, 7L) == ((5L, 0.0)))
    // one holder of everything: G = (n-1)/n = 0.75 at n=4
    assert(g(0L, 0L, 0L, 100L) == ((4L, 0.75)))
  }

  // ---- q234/q235/q236 planted star schemas --------------------------

  /** Writes the given tables as `<name>.parquet` under a temp sfDir so
    * the registry fns (which read via Tables.load) run on planted data.
    */
  private def plantedDir(tables: (String, org.apache.spark.sql.DataFrame)*)
      : String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-frontier-sf").toString
    tables.foreach { case (name, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    dir
  }

  private def ts(s: String): Timestamp = Timestamp.valueOf(s + " 00:00:00")

  test("q234 (Q13 shape): zero-order customers survive the outer join; " +
      "urgent-only customers count as zero") {
    import spark.implicits._
    val customer = Seq(1L, 2L, 3L).toDF("c_custkey")
    val orders = Seq(
      (10L, 1L, "5-LOW"), (11L, 1L, "3-MEDIUM"),  // c1: 2 qualifying
      (12L, 2L, "1-URGENT")                        // c2: urgent only -> 0
    ).toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val d = plantedDir("customer" -> customer, "orders" -> orders)
    val out = graft.queries.Registry.queries("q234_tpch_q13")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // custdist DESC, c_count DESC: two zero-order customers, one with 2
    assert(out == Seq((0L, 2L), (2L, 1L)))
  }

  test("q235 (Q15 shape): revenue ties at the max keep BOTH suppliers; " +
      "out-of-window lines are ignored") {
    import spark.implicits._
    // s1: one line 100.00 at 10% discount -> 90.00
    // s2: two lines 50.00 at 10% -> 45.00 + 45.00 = 90.00 (exact tie)
    // s3: 80.00 at 0% -> 80.00 (loser); s1 also has an out-of-window
    // line that would win if counted.
    val lineitem = Seq(
      (1L, 100.0, 0.10, ts("1996-02-01")),
      (2L, 50.0, 0.10, ts("1996-02-02")),
      (2L, 50.0, 0.10, ts("1996-02-03")),
      (3L, 80.0, 0.00, ts("1996-03-01")),
      (1L, 999.0, 0.00, ts("1997-01-01"))
    ).toDF("l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    val supplier = Seq((1L, "s1"), (2L, "s2"), (3L, "s3"))
      .toDF("s_suppkey", "s_name")
    val d = plantedDir("lineitem" -> lineitem, "supplier" -> supplier)
    val out = graft.queries.Registry.queries("q235_tpch_q15")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, "s1", 90.0), (2L, "s2", 90.0)))
  }

  test("q236 (Q21 shape): unique last-shipper on a multi-supplier F " +
      "order is charged; ties, single-supplier and non-F orders are not") {
    import spark.implicits._
    val lineitem = Seq(
      // order 1 (F): s1 ships last uniquely -> s1 charged
      (1L, 1L, ts("2000-01-03")), (1L, 2L, ts("2000-01-02")),
      // order 2 (F): s1 and s2 tie at the max -> nobody charged
      (2L, 1L, ts("2000-02-01")), (2L, 2L, ts("2000-02-01")),
      // order 3 (F): single supplier -> not charged
      (3L, 1L, ts("2000-03-01")),
      // order 4 (O, not finished): s2 last -> not charged
      (4L, 1L, ts("2000-04-01")), (4L, 2L, ts("2000-04-02")),
      // order 5 (F): s2's LATEST line is the order max, but s2 also
      // has an earlier line — per-supplier max must dedup first
      (5L, 2L, ts("2000-05-01")), (5L, 2L, ts("2000-05-03")),
      (5L, 1L, ts("2000-05-02"))
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val orders = Seq((1L, "F"), (2L, "F"), (3L, "F"), (4L, "O"),
      (5L, "F")).toDF("o_orderkey", "o_orderstatus")
    val supplier = Seq((1L, "s1"), (2L, "s2"))
      .toDF("s_suppkey", "s_name")
    val d = plantedDir("lineitem" -> lineitem, "orders" -> orders,
      "supplier" -> supplier)
    val out = graft.queries.Registry.queries("q236_tpch_q21")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // numwait DESC, s_suppkey: s2 charged on order 5, s1 on order 1
    assert(out.toSet == Set((1L, "s1", 1L), (2L, "s2", 1L)))
  }

  test("blockRank == global row_number on a cross-block spread; q241's " +
      "NTILE formula == Spark's ntile at n=7 and n=12") {
    import spark.implicits._
    // values span a huge range so the 256-block grid actually splits
    val vals = Seq(5L, 999999L, 17L, 123456L, 5L, 0L, 777L)
    val df = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("cid", "x")
    val got = Frontier.blockRank(df, "x", "cid")
      .select(col("cid"), col("rank")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = vals.zipWithIndex.map { case (v, i) => (v, i.toLong) }
      .sorted.zipWithIndex
      .map { case ((_, cid), r) => cid -> (r + 1L) }.toMap
    assert(got == want)
    // NTILE(5) integer formula vs Spark's own ntile over the rank order
    for (n <- Seq(7, 12)) {
      val ranks = (1 to n).map(_.toLong).toDF("rank")
        .crossJoin(broadcast(Seq(n.toLong).toDF("n")))
      val formula = ranks.selectExpr("rank",
        "CASE WHEN rank <= (n % 5) * (n DIV 5 + 1) " +
        "THEN (rank - 1) DIV (n DIV 5 + 1) + 1 " +
        "ELSE (n % 5) + (rank - 1 - (n % 5) * (n DIV 5 + 1)) " +
        "DIV (n DIV 5) + 1 END AS q")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaNtile = (1 to n).map(_.toLong).toDF("rank")
        .select(col("rank"), ntile(5).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("rank")))
          .cast("long").as("q"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(formula == viaNtile, s"ntile mismatch at n=$n")
    }
  }

  test("q241 RFM: five strictly-ordered customers land on the diagonal " +
      "segments; recency score inverts the rank") {
    import spark.implicits._
    // customer N: N orders, more recent last order and more spend as N
    // grows -> r_score = f_score = m_score = N, one customer per cell
    val rows = for {
      c <- 1 to 5
      o <- 1 to c
    } yield (c.toLong * 100 + o, c.toLong,
      ts(f"2024-01-${10 + c}%02d"), 10.0 * c)
    val orders = rows.toDF("o_orderkey", "o_custkey", "o_orderdate",
      "o_totalprice")
    val d = plantedDir("orders" -> orders)
    val out = graft.queries.Registry.queries("q241_rfm")(spark, d)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(out.toSeq ==
      (1 to 5).map(n => (n, n, n, 1L)))
  }

  test("q238 (Q16 shape): NOT IN excludes the complaint supplier; a NULL " +
      "in the exclusion list empties the result (NOT IN, not NOT " +
      "EXISTS); plans as a null-aware anti join, not a nested loop") {
    import spark.implicits._
    val li = Seq((1L, 10L), (1L, 11L), (2L, 10L))
      .toDF("l_partkey", "l_suppkey")
    val part = Seq((1L, "Brand#2", "t", 1), (2L, "Brand#2", "t", 4))
      .toDF("p_partkey", "p_brand", "p_type", "p_size")
    val suppOk = Seq((11L, -5.0), (12L, 3.0))
      .toDF("s_suppkey", "s_acctbal")
    val d1 = plantedDir("lineitem" -> li, "part" -> part,
      "supplier" -> suppOk)
    val q = graft.queries.Registry.queries("q238_tpch_q16")
    val out1 = q(spark, d1).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
    // supplier 11 (negative balance) excluded everywhere
    assert(out1.toSet ==
      Set(("Brand#2", "t", 1, 1L), ("Brand#2", "t", 4, 1L)))
    // a NULL key in the exclusion subquery makes every NOT IN UNKNOWN
    val suppNull = Seq((Option(11L), -5.0), (Option.empty[Long], -2.0))
      .toDF("s_suppkey", "s_acctbal")
    val d2 = plantedDir("lineitem" -> li, "part" -> part,
      "supplier" -> suppNull)
    assert(q(spark, d2).count() == 0)
    // plan pin: the Or(EqualTo, IsNull(EqualTo)) condition must hit
    // ExtractSingleColumnNullAwareAntiJoin's broadcast hash path —
    // BroadcastHashJoinExec prints isNullAwareAntiJoin as the trailing
    // boolean: `BroadcastHashJoin [...], [...], LeftAnti, BuildRight, true`
    val plan = q(spark, d1).queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti, BuildRight, true"),
      s"expected a null-aware broadcast anti join in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "NOT IN fell back to the nested-loop join")
  }

  test("q251 (Q2 shape): an exact price tie at the per-part min keeps " +
      "BOTH suppliers; off-brand parts and repeat lines are excluded") {
    import spark.implicits._
    val part = Seq((1L, "Brand#1"), (2L, "Brand#1"), (3L, "Brand#2"))
      .toDF("p_partkey", "p_brand")
    val lineitem = Seq(
      // part 1: s1 and s2 tie at 5.00 (exact cents), s3 loses at 5.01
      (1L, 1L, 5.00), (1L, 2L, 5.00), (1L, 3L, 5.01),
      // s1 sells part 1 at the min TWICE -> DISTINCT keeps one row
      (1L, 1L, 5.00),
      // part 2: only s3
      (2L, 3L, 9.99),
      // part 3 is Brand#2 -> never appears even at a lower price
      (3L, 1L, 0.01)
    ).toDF("l_partkey", "l_suppkey", "l_extendedprice")
    val supplier = Seq((1L, "s1"), (2L, "s2"), (3L, "s3"))
      .toDF("s_suppkey", "s_name")
    val d = plantedDir("part" -> part, "lineitem" -> lineitem,
      "supplier" -> supplier)
    val out = graft.queries.Registry.queries("q251_tpch_q2")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq ==
      Seq((1L, "s1", 5.0), (1L, "s2", 5.0), (2L, "s3", 9.99)))
  }

  test("q252 (Q11 shape): the 1/1000 gate is strict and exact — a part " +
      "sitting exactly ON the boundary is excluded, one cent over is in") {
    import spark.implicits._
    // total = 1000.00 = 100000 cents. part 1 holds exactly 100 cents
    // (= total/1000, excluded by strict >); part 2 holds 101 cents
    // (included); part 3 holds the rest.
    val lineitem = Seq(
      (1L, 1.00), (2L, 1.01), (3L, 997.99)
    ).toDF("l_partkey", "l_extendedprice")
    val d = plantedDir("lineitem" -> lineitem)
    val out = graft.queries.Registry.queries("q252_tpch_q11")(spark, d)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq == Seq((3L, 997.99), (2L, 1.01)))
  }

  test("q253 (Q20 shape): the 30% quantity gate is strict exact " +
      "integers — exactly 30% is out, just over is in; parts count " +
      "per supplier across their multi-line per-part totals") {
    import spark.implicits._
    val lineitem = Seq(
      // part 1, total 10: s1 has 3 (exactly 30% -> out), s2 has 7 (in)
      (1L, 1L, 3.0), (2L, 1L, 7.0),
      // part 2, total 10: s1 has 4 split over two lines (2+2 -> in)
      (1L, 2L, 2.0), (1L, 2L, 2.0), (2L, 2L, 6.0)
    ).toDF("l_suppkey", "l_partkey", "l_quantity")
    val supplier = Seq((1L, "s1"), (2L, "s2")).toDF("s_suppkey", "s_name")
    val d = plantedDir("lineitem" -> lineitem, "supplier" -> supplier)
    val out = graft.queries.Registry.queries("q253_tpch_q20")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // s1: part 2 only (exactly-30% on part 1 excluded); s2: both parts
    assert(out.toSeq == Seq(("s1", 1L), ("s2", 2L)))
  }

  test("q261 seasonal decomposition: a purely additive weekly pattern " +
      "recovers EXACTLY — constant trend, the planted dow effects as " +
      "seasonal, zero residual; edges without a full frame emit NULL") {
    import spark.implicits._
    // x(day) = 10 + p(dow), p sums to 0 over the week -> the centered
    // 7-day MA is exactly 10, seasonal is exactly p, residual exactly 0
    val p = Map(0 -> 0, 1 -> 1, 2 -> 2, 3 -> 3, 4 -> -1, 5 -> -2, 6 -> -3)
    val d0 = java.time.LocalDate.of(2024, 1, 1)
    var eid = 0L
    val evs = (0 until 21).flatMap { i =>
      val day = d0.plusDays(i)
      val dow = (day.toEpochDay % 7).toInt
      (0 until (10 + p(dow))).map { _ =>
        eid += 1
        (eid, Timestamp.valueOf(s"$day 10:00:00"), eid, "e")
      }
    }.toDF("event_id", "ts", "user_id", "event_type")
    val dir = plantedDir("events" -> evs)
    val out = graft.queries.Registry
      .queries("q261_seasonal_decompose")(spark, dir)
      .collect().map(r => (r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        r.getDouble(4),
        Option(r.get(5)).map(_.asInstanceOf[Double])))
    assert(out.length == 21)
    out.zipWithIndex.foreach { case ((dayS, x, trend, seasonal, resid), i) =>
      val day = d0.plusDays(i)
      val dow = (day.toEpochDay % 7).toInt
      assert(dayS == day.toString && x == 10L + p(dow))
      assert(seasonal == p(dow).toDouble, s"$dayS seasonal")
      if (i < 3 || i >= 18) assert(trend.isEmpty && resid.isEmpty,
        s"$dayS edge should be NULL")
      else {
        assert(trend.contains(10.0), s"$dayS trend $trend")
        assert(resid.contains(0.0), s"$dayS resid $resid")
      }
    }
  }

  test("q255 (Q6): all three predicates reach the parquet scan as " +
      "PushedFilters; q256 (Q12 shape) never falls back to a " +
      "nested-loop join") {
    val p255 = graft.queries.Registry.queries("q255_tpch_q6")(
      spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val pushed = p255.linesIterator
      .filter(_.contains("PushedFilters")).mkString
    Seq("l_shipdate", "l_discount", "l_quantity").foreach { c =>
      assert(pushed.contains(c),
        s"predicate on $c not pushed to the scan:\n$p255")
    }
    // the scan-side projection must be pruned to the referenced columns
    assert(!p255.contains("l_comment") && !p255.contains("l_tax"))
    val p256 = graft.queries.Registry.queries("q256_tpch_q12")(
      spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p256.contains("BroadcastNestedLoopJoin") &&
      !p256.contains("CartesianProduct"),
      s"Q12 shape fell off the hash-join path:\n$p256")
  }

  test("q254 (Q9 shape): profit lands on the cent grid per line before " +
      "the DECIMAL sum; non-matching part names are pruned; attribution " +
      "follows the SUPPLIER's nation and the ORDER year") {
    import spark.implicits._
    val part = Seq((1L, "large red box"), (2L, "plain blue cap"))
      .toDF("p_partkey", "p_name")
    val lineitem = Seq(
      // order 10, part 1, s1: 100.00 at 10% -> 90.00
      (10L, 1L, 1L, 100.0, 0.10),
      // order 11, part 1, s2: 33.33 at 0% -> 33.33 (different year)
      (11L, 1L, 2L, 33.33, 0.00),
      // order 10, part 2 (no 'red') -> pruned even on the same order
      (10L, 2L, 1L, 999.0, 0.00)
    ).toDF("l_orderkey", "l_partkey", "l_suppkey",
      "l_extendedprice", "l_discount")
    val supplier = Seq((1L, 100L), (2L, 200L))
      .toDF("s_suppkey", "s_nationkey")
    val nation = Seq((100L, "PERU"), (200L, "JAPAN"))
      .toDF("n_nationkey", "n_name")
    val orders = Seq((10L, ts("1995-06-01")), (11L, ts("1996-06-01")))
      .toDF("o_orderkey", "o_orderdate")
    val d = plantedDir("part" -> part, "lineitem" -> lineitem,
      "supplier" -> supplier, "nation" -> nation, "orders" -> orders)
    val out = graft.queries.Registry.queries("q254_tpch_q9")(spark, d)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("JAPAN", 1996, 33.33), ("PERU", 1995, 90.0)))
  }
}
