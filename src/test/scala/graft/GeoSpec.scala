package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Geo

/** Geo family semantics: haversine on a known equator distance, the
  * track report and proximity pairs against independent brute-force
  * recomputations (the banded join must find EXACTLY the pairs the
  * all-pairs scan finds — the spatial-banding completeness claim), and
  * cell-density bookkeeping.
  */
class GeoSpec extends AnyFunSuite with TestSpark {

  import spark.implicits._

  private def h32(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16)
  }

  /** The engine's position derivation, recomputed independently. */
  private def pos(eventId: Long, userId: Long): (Long, Long) = (
    h32(s"$userId:blat") % 500000 + h32(s"$eventId:jlat") % 10000 - 5000,
    h32(s"$userId:blon") % 500000 + h32(s"$eventId:jlon") % 10000 - 5000)

  private def hav(la1: Long, lo1: Long, la2: Long, lo2: Long): Double = {
    val k = 1.7453292519943295e-8
    val h = math.sin((la2 - la1) * k / 2) * math.sin((la2 - la1) * k / 2) +
      math.cos(la1 * k) * math.cos(la2 * k) *
        math.sin((lo2 - lo1) * k / 2) * math.sin((lo2 - lo1) * k / 2)
    2.0 * 6371000.0 * math.asin(math.sqrt(h))
  }

  private def ts(sec: Long): Timestamp =
    new Timestamp(1700000000000L + sec * 1000)

  private def events(rows: (Long, Long, Long)*) = // (event_id, user_id, sec)
    rows.map { case (e, u, s) => (e, u, ts(s), "ping") }
      .toDF("event_id", "user_id", "ts", "event_type")

  test("haversineM: two equator points 0.01 degrees apart are ~1112 m; " +
      "zero distance for identical points") {
    val df = Seq((0L, 0L, 0L, 10000L), (5L, 7L, 5L, 7L))
      .toDF("la1", "lo1", "la2", "lo2")
      .select(round(Geo.haversineM(col("la1"), col("lo1"),
        col("la2"), col("lo2"))).cast("long").as("m"))
      .collect().map(_.getLong(0))
    assert(df.toSeq == Seq(1112L, 0L))
  }

  test("trackReport == independent per-user fold: leg meters, exact " +
      "total, impossible-speed flags (incl. the zero-dt repeat fix)") {
    // user 1: three legs 60 s apart (jitter-scale moves, all possible);
    // user 2: two events with the SAME timestamp -> dt 0, any movement
    // is impossible; user 3: single event -> no legs, absent
    val evs = events((101L, 1L, 0L), (102L, 1L, 60L), (103L, 1L, 120L),
      (104L, 1L, 180L), (201L, 2L, 0L), (202L, 2L, 0L), (301L, 3L, 0L))
    val out = Geo.trackReport(evs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    def expect(uid: Long, evIds: Seq[(Long, Long)]): (Long, Long, Long) = {
      val legs = evIds.sliding(2).collect {
        case Seq((e1, t1), (e2, t2)) =>
          val (a1, o1) = pos(e1, uid); val (a2, o2) = pos(e2, uid)
          val m = math.round(hav(a1, o1, a2, o2))
          (m, t2 - t1)
      }.toSeq
      (legs.size.toLong, legs.map(_._1).sum,
        legs.count { case (m, dt) => m > 20L * math.max(dt, 0L) }.toLong)
    }
    assert(out(1L) == expect(1L,
      Seq((101L, 0L), (102L, 60L), (103L, 120L), (104L, 180L))))
    assert(out(2L) == expect(2L, Seq((201L, 0L), (202L, 0L))))
    // the zero-dt pair moved (md5 jitter is nonzero) -> impossible
    assert(out(2L)._3 == 1L, s"zero-dt moving fix must flag: ${out(2L)}")
    assert(!out.contains(3L))
  }

  test("proximityPairs == brute-force all-pairs within the radius " +
      "(banding completeness); pairs straddling a cell border are " +
      "still found; n_hours accumulates") {
    // enough users that some bases land within 500 m of each other;
    // two hours of pings per user
    val users = (1L to 120L)
    val evs = events(users.flatMap(u =>
      Seq((u * 10, u, 0L), (u * 10 + 1, u, 3600L))): _*)
    val out = Geo.proximityPairs(evs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // brute force: rep point per (user, hour) = min event_id = the
    // first ping; all pairs, exact haversine, integer-meter gate
    val byHour = Seq(0L, 1L).map { h =>
      h -> users.map { u =>
        val eid = u * 10 + h
        val (la, lo) = pos(eid, u)
        (u, la, lo)
      }
    }
    val brute = collection.mutable.Map
      .empty[(Long, Long), List[Long]].withDefaultValue(Nil)
    byHour.foreach { case (_, pts) =>
      for {
        (u1, a1, o1) <- pts; (u2, a2, o2) <- pts if u1 < u2
        m = math.round(hav(a1, o1, a2, o2)) if m <= 500L
      } brute((u1, u2)) ::= m
    }
    val expect = brute.map { case (k, ms) =>
      k -> ((ms.size.toLong, ms.min)) }.toMap
    assert(expect.nonEmpty, "planted population produced no pairs — " +
      "grow the user count")
    assert(out == expect,
      s"banded=${out.size} brute=${expect.size}; " +
        s"missing=${expect.keySet -- out.keySet} " +
        s"extra=${out.keySet -- expect.keySet}")
  }

  test("coTravel == brute-force pair-hours run through an independent " +
      "islands fold: gaps over the tolerance split episodes, " +
      "within-tolerance gaps chain, lone encounters drop") {
    // hours 0,1,2 and 4 (hour 3 missing): at maxGapHours=1 a pair
    // within radius in all four hours yields episode [0,2] and the
    // lone hour 4 drops (minHours=2); at the default week tolerance
    // the same pair chains into ONE 4-encounter episode
    val users = (1L to 120L)
    val hours = Seq(0L, 1L, 2L, 4L)
    val evs = events(users.flatMap(u =>
      hours.map(h => (u * 10 + h, u, h * 3600L))): _*)
    val out = Geo.coTravel(evs, maxGapHours = 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // brute force: per hour, all pairs within 500 m of the hour's rep
    // points; then islands per pair over encounter hours
    val baseHour = 1700000000L / 3600  // ts(0) epoch-seconds / 3600
    val pairHours = collection.mutable.Map
      .empty[(Long, Long), List[(Long, Long)]].withDefaultValue(Nil)
    hours.foreach { h =>
      val pts = users.map { u => val eid = u * 10 + h
        val (la, lo) = pos(eid, u); (u, la, lo) }
      for {
        (u1, a1, o1) <- pts; (u2, a2, o2) <- pts if u1 < u2
        m = math.round(hav(a1, o1, a2, o2)) if m <= 500L
      } pairHours((u1, u2)) ::= (baseHour + h, m)
    }
    val expect = pairHours.flatMap { case ((u1, u2), hm) =>
      val sorted = hm.sortBy(_._1)
      // islands: run id = hour - index over the sorted encounter hours
      sorted.zipWithIndex.groupBy { case ((h, _), i) => h - i }.values
        .map { grp =>
          val hs = grp.map(_._1._1); val ms = grp.map(_._1._2)
          (u1, u2, hs.min) -> ((hs.max, hs.size.toLong, ms.min))
        }
        .filter(_._2._2 >= 2L)
    }.toMap
    assert(expect.nonEmpty, "planted population produced no episodes")
    // the planted gap must have split at least one pair's episodes
    assert(expect.exists(_._2._2 == 3L),
      "no 3-hour episode — the hour-3 gap case is vacuous")
    assert(out == expect,
      s"episodes=${out.size} brute=${expect.size}; " +
        s"missing=${expect.keySet -- out.keySet} " +
        s"extra=${out.keySet -- expect.keySet}")
    // default week tolerance: the hour-3 gap is within tolerance, so
    // every pair with >= 2 encounter hours chains into ONE episode
    val dflt = Geo.coTravel(evs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(4)))
    val multi = pairHours.filter(_._2.size >= 2)
    assert(dflt.length == multi.size)
    assert(dflt.toMap == multi.map { case (k, hm) =>
      k -> hm.size.toLong }.toMap)
  }

  test("hot-cell salting engaged everywhere (hotOccupancy=0) returns " +
      "EXACTLY the unsalted pairs — the lanes repartition the verify, " +
      "never the pair set") {
    val users = (1L to 120L)
    val evs = events(users.flatMap(u =>
      Seq((u * 10, u, 0L), (u * 10 + 1, u, 3600L))): _*)
    def pairs(hot: Long, buckets: Int) =
      Geo.proximityPairs(evs, 500L, hotOccupancy = hot,
          saltBuckets = buckets).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3)))).toMap
    val unsalted = pairs(Long.MaxValue, 16) // no cell ever hot
    assert(unsalted.nonEmpty)
    // every cell hot, several lane widths: identical output
    assert(pairs(0L, 4) == unsalted)
    assert(pairs(0L, 16) == unsalted)
    // default engagement threshold on this small population: no-op
    assert(pairs(1024L, 16) == unsalted)
  }

  test("poison-cell cap: cells above maxCellOccupancy are excluded " +
      "from pairing and reported by poisonCells; the default cap is " +
      "a no-op on plausible data") {
    val users = (1L to 400L)
    val evs = events(users.map(u => (u * 10, u, 0L)): _*)
    val hour = 1700000000L / 3600
    // independent occupancy per 5,000-µdeg band cell (single hour)
    val ptsLocal = users.map { u =>
      val (la, lo) = pos(u * 10, u)
      (u, la, lo, (la + 5000) / 5000, (lo + 5000) / 5000)
    }
    val occ = ptsLocal.groupBy(p => (p._4, p._5))
      .view.mapValues(_.size.toLong).toMap
    val occMax = occ.values.max
    assert(occMax >= 2, "no colliding cell — grow the population")
    val thr = occMax - 1 // every max-occupancy cell is poison
    val poison = occ.filter(_._2 > thr).keySet
    // the audit reports exactly the over-cap cells with their occupancy
    val rep = Geo.poisonCells(evs, thr).collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(rep == poison.map(c => c -> occ(c)).toMap)
    assert(Geo.poisonCells(evs).collect().isEmpty, // default: healthy
      "default cap flagged a plausible cell")
    def brute(pts: Seq[(Long, Long, Long, Long, Long)]) = (for {
      (u1, a1, o1, _, _) <- pts; (u2, a2, o2, _, _) <- pts if u1 < u2
      m = math.round(hav(a1, o1, a2, o2)) if m <= 500L
    } yield (u1, u2) -> ((1L, m))).toMap
    def engine(cap: Long) =
      Geo.proximityPairs(evs, 500L, maxCellOccupancy = cap).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3)))).toMap
    // capped == brute force over the SURVIVING points only
    val kept = ptsLocal.filterNot(p => poison((p._4, p._5)))
    assert(kept.size < ptsLocal.size) // the cap really dropped points
    assert(engine(thr) == brute(kept))
    // default cap: nothing excluded, the full pair set
    assert(engine(Geo.DefaultMaxCellOccupancy) == brute(ptsLocal))
  }

  test("the band join plans as an equi-join on (hour, cell, salt) — " +
      "never a nested-loop/cartesian (pinned on bandedPairs itself, " +
      "so the pin survives any caller-side materialization)") {
    val ev = graft.core.Tables.load(spark, "/root/testdata/sf0.001",
      "events")
    val pts = Geo.bandedPoints(ev)
    val plan = Geo.bandedPairs(pts, pts, 500L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"proximity join fell off the equi-join path:\n$plan")
    // r19 envelope fix: the band join is a SHUFFLED HASH join with the
    // build on the un-replicated index side — sort-merge sorted the
    // 9x-replicated probe side per task, a buffer growing linearly
    // with fleet size (SCALE.md r19: 3.39 GB at users 30x, vs ~50 MB
    // hash-build after)
    assert(plan.contains("ShuffledHashJoin"),
      s"band join fell back off the shuffled-hash path:\n$plan")
    // and the checkpointed registry form still executes with rows>=0
    assert(graft.queries.Registry.queries("q264_proximity_pairs")(
      spark, "/root/testdata/sf0.001").count() >= 0)
  }

  test("q277's zone attribution compiles into the PROJECTION: the " +
      "visits plan contains NO join of any kind — the literal zone " +
      "registry costs zero shuffle and zero broadcast per fix") {
    val ev = graft.core.Tables.load(spark, "/root/testdata/sf0.001",
      "events")
    val plan = Geo.zoneVisits(ev).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"zone attribution fell off the projection path:\n$plan")
  }

  test("leak accounting: the r17 queries (q264/q269/q270/q271) leave " +
      "ZERO persisted-RDD delta (the Bench leak gate fails these loud)") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    Seq("q264_proximity_pairs", "q269_co_travel", "q270_market_basket",
      "q271_kmv_overlap").foreach { n =>
      graft.queries.Registry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
    }
    val leaked = sc.getPersistentRDDs.keySet.toSet -- before
    assert(leaked.isEmpty, s"persisted blocks leaked: $leaked")
  }

  test("stopReport: everything-stationary collapses to one stop per " +
      "user; everything-moving yields none; a moderate threshold " +
      "matches an independent islands fold") {
    val evs = events(
      (11L, 1L, 0L), (12L, 1L, 1000L), (13L, 1L, 2500L), (14L, 1L, 4000L),
      (21L, 2L, 0L), (22L, 2L, 900L))
    // every leg stationary -> one stop per user spanning the stream
    val all = Geo.stopReport(evs, maxLegM = 1000000000L, minDwellS = 0L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(all.length == 2)
    assert(all(0)._1 == 1L && all(0)._4 == 4L && all(0)._5 == 4000L)
    assert(all(1)._1 == 2L && all(1)._4 == 2L && all(1)._5 == 900L)
    // every leg moving -> no stops
    assert(Geo.stopReport(evs, maxLegM = -1L, minDwellS = 0L).count() == 0)
    // moderate threshold == independent gaps-and-islands recomputation
    val users = (1L to 30L)
    val evs2 = events(users.flatMap(u =>
      (0L to 6L).map(i => (u * 100 + i, u, i * 600))): _*)
    val out = Geo.stopReport(evs2, maxLegM = 300L, minDwellS = 0L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3),
        r.getLong(4))).toSet
    val expect = users.flatMap { u =>
      val fixes = (0L to 6L).map { i =>
        val (la, lo) = pos(u * 100 + i, u)
        (i * 600, la, lo)
      }
      val legs = fixes.sliding(2).map { case Seq((t1, a1, o1), (t2, a2, o2)) =>
        (t1, t2, math.round(hav(a1, o1, a2, o2)), t2 - t1)
      }.toSeq
      // islands over stationary legs
      var run = 0L
      val tagged = legs.map { case (t1, t2, m, dt) =>
        val moving = m > 300L
        if (moving) run += 1
        (run, moving, t1, t2, dt)
      }
      tagged.filter(!_._2).groupBy(_._1).values.map { g =>
        (u, g.map(_._3).min, g.size.toLong + 1, g.map(_._5).sum)
      }
    }.map { case (u, startSec, nf, dw) =>
      val t = ts(startSec).toLocalDateTime
      val pad = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss")
      (u, t.format(pad), nf, dw)
    }.toSet
    assert(out == expect,
      s"missing=${expect -- out} extra=${out -- expect}")
  }

  test("odMatrix == independent stops-then-trips recomputation; " +
      "single-stop users contribute no trips") {
    val users = (1L to 40L)
    val evs = events(users.flatMap(u =>
      (0L to 7L).map(i => (u * 100 + i, u, i * 600))): _*)
    val out = Geo.odMatrix(evs, maxLegM = 300L, minDwellS = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)) -> r.getLong(4)).toMap
    val expect = users.flatMap { u =>
      val fixes = (0L to 7L).map { i =>
        val eid = u * 100 + i
        val (la, lo) = pos(eid, u)
        (i * 600, eid, la, lo)
      }
      val legs = fixes.sliding(2).map {
        case Seq((t1, e1, a1, o1), (t2, e2, a2, o2)) =>
          (t1, e1, a1, o1, math.round(hav(a1, o1, a2, o2)) > 300L)
      }.toSeq
      var run = 0L
      val tagged = legs.map { case (t1, e1, a1, o1, moving) =>
        if (moving) run += 1
        (run, moving, t1, e1, a1, o1)
      }
      // stop representative = first leg's START fix (min (pts, peid))
      val stops = tagged.filter(!_._2).groupBy(_._1).values.toSeq
        .map(g => g.minBy(x => (x._3, x._4)))
        .sortBy(x => (x._3, x._4))
        .map(x => ((x._5 + 5000) / 10000, (x._6 + 5000) / 10000))
      stops.sliding(2).collect { case Seq((fy, fx), (ty, tx)) =>
        (fy, fx, ty, tx) }.toSeq
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(expect.values.sum > 0, "planted population produced no trips")
    assert(out == expect,
      s"missing=${expect.keySet -- out.keySet} " +
        s"extra=${out.keySet -- expect.keySet}")
  }

  test("zonesFor pins the ray-cast boundary convention: left/bottom " +
      "edges and the bottom-left vertex are INSIDE, right/top edges " +
      "and the other vertices OUTSIDE; interior in, exterior out") {
    // unit square in (lon=x, lat=y), CCW
    val square = Seq((9L, "sq",
      Seq((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L))))
    val pts = Seq(
      ("center", 5L, 5L), ("outside", 15L, 5L), ("far", -3L, -3L),
      ("left_edge", 0L, 5L), ("bottom_edge", 5L, 0L),
      ("right_edge", 10L, 5L), ("top_edge", 5L, 10L),
      ("bl_vertex", 0L, 0L), ("br_vertex", 10L, 0L),
      ("tl_vertex", 0L, 10L), ("tr_vertex", 10L, 10L))
      .toDF("tag", "px", "py")
    val in = Geo.zonesFor(pts, "px", "py", Seq("tag"), square)
      .collect().map(_.getString(0)).toSet
    assert(in == Set("center", "left_edge", "bottom_edge", "bl_vertex"))
    // a triangle with slanted edges: interior/exterior still exact
    val tri = Seq((7L, "tri", Seq((0L, 0L), (8L, 0L), (0L, 8L))))
    val tpts = Seq(("in", 2L, 2L), ("hyp_out", 5L, 5L), ("hyp_on", 4L, 4L),
      ("out", 9L, 1L)).toDF("tag", "px", "py")
    val tin = Geo.zonesFor(tpts, "px", "py", Seq("tag"), tri)
      .collect().map(_.getString(0)).toSet
    // the hypotenuse runs top-right: ON it is OUT (the half-open rule)
    assert(tin == Set("in"))
    // overlapping zones: one row per containing zone
    val two = square ++ Seq((8L, "big",
      Seq((-5L, -5L), (20L, -5L), (20L, 20L), (-5L, 20L))))
    val both = Geo.zonesFor(Seq(("c", 5L, 5L)).toDF("tag", "px", "py"),
      "px", "py", Seq("tag"), two)
      .collect().map(r => r.getLong(1)).toSet
    assert(both == Set(9L, 8L))
  }

  test("zoneStops: overlapping zones count a stop once per CONTAINING " +
      "zone (the zonesFor contract, preserved by the r21 zero-join " +
      "projection); no-zone stops roll up under (-1, open_sea)") {
    val evs = events((1L to 80L).flatMap(u =>
      Seq((u * 10, u, 0L), (u * 10 + 1, u, 600L),
        (u * 10 + 2, u, 4000L))): _*)
    // a box covering the whole synthetic operating range
    val box = Seq((-1000000L, -1000000L), (1000000L, -1000000L),
      (1000000L, 1000000L), (-1000000L, 1000000L))
    val one = Geo.zoneStops(evs, zones = Seq((1L, "a", box)))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(one.length == 1 && one.head._1 == 1L && one.head._3 > 0,
      s"single-zone fixture vacuous: ${one.toSeq}")
    // two fully overlapping zones: every stop lands in BOTH
    val two = Geo.zoneStops(evs,
        zones = Seq((1L, "a", box), (2L, "b", box)))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(two.toSeq == Seq(
      (1L, "a", one.head._3, one.head._4, one.head._5),
      (2L, "b", one.head._3, one.head._4, one.head._5)),
      s"overlap multi-count drifted: ${two.toSeq}")
    // a zone far outside the box: everything is open sea
    val far = Seq((3L, "far",
      Seq((9000000L, 9000000L), (9000010L, 9000000L),
        (9000010L, 9000010L), (9000000L, 9000010L))))
    val sea = Geo.zoneStops(evs, zones = far)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(sea.toSeq == Seq((-1L, "open_sea", one.head._3)),
      s"open-sea fallback drifted: ${sea.toSeq}")
  }

  test("trackInterpolate: grid instants exactly in (t1, t2], legs " +
      "over maxGap interpolate NOTHING, positions are the half-up " +
      "exact integers") {
    // leg A: 1800 s (3 grid instants incl. the on-grid endpoint if it
    // lands); leg B: 38,200 s gap > 6 h -> nothing; leg C: 500 s
    val evs = events((11L, 1L, 0L), (12L, 1L, 1800L),
      (13L, 1L, 40000L), (14L, 1L, 40500L))
    val out = Geo.trackInterpolate(evs).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    def hu(lo: Long, hi: Long, num: Long, den: Long): Long =
      if (hi >= lo) lo + (2 * (hi - lo) * num + den) / (2 * den)
      else lo - (2 * (lo - hi) * num + den) / (2 * den)
    val base = 1700000000L
    val expect = (for {
      (e1, t1s, e2, t2s) <- Seq((11L, 0L, 12L, 1800L),
        (13L, 40000L, 14L, 40500L))
      t1 = base + t1s; t2 = base + t2s
      gs = t1 - t1 % 600 + 600; ge = t2 - t2 % 600
      g <- gs to ge by 600
      (la1, lo1) = pos(e1, 1L); (la2, lo2) = pos(e2, 1L)
    } yield g -> ((hu(la1, la2, g - t1, t2 - t1),
      hu(lo1, lo2, g - t1, t2 - t1)))).toMap
    assert(expect.size >= 3, s"vacuous plant: ${expect.size} instants")
    assert(out == expect)
    // nothing interpolated across the 38,200 s gap
    assert(!out.keys.exists(g => g > base + 1800 && g <= base + 40000))
  }

  private def inZone(px: Long, py: Long, vs: Seq[(Long, Long)]): Boolean = {
    var cnt = 0
    (vs :+ vs.head).sliding(2).foreach {
      case Seq((x1, y1), (x2, y2)) =>
        if ((y1 > py) != (y2 > py)) {
          val num = (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)
          if (if (y2 > y1) num > 0 else num < 0) cnt += 1
        }
      case _ => ()
    }
    cnt % 2 == 1
  }

  test("zoneTransitions == independent stops-zones-lag recomputation " +
      "(local ray cast over the same Zones registry, lowest-id tie " +
      "rule, open-sea flows kept)") {
    val users = (1L to 40L)
    val evs = events(users.flatMap(u =>
      (0L to 7L).map(i => (u * 100 + i, u, i * 600))): _*)
    val out = Geo.zoneTransitions(evs, maxLegM = 300L, minDwellS = 0L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expect = users.flatMap { u =>
      val fixes = (0L to 7L).map { i =>
        val eid = u * 100 + i
        val (la, lo) = pos(eid, u)
        (i * 600, eid, la, lo)
      }
      val legs = fixes.sliding(2).map {
        case Seq((t1, e1, a1, o1), (t2, e2, a2, o2)) =>
          (t1, e1, a1, o1, math.round(hav(a1, o1, a2, o2)) > 300L)
      }.toSeq
      var run = 0L
      val tagged = legs.map { case (t1, e1, a1, o1, moving) =>
        if (moving) run += 1
        (run, moving, t1, e1, a1, o1)
      }
      val zids = tagged.filter(!_._2).groupBy(_._1).values.toSeq
        .map(g => g.minBy(x => (x._3, x._4)))
        .sortBy(x => (x._3, x._4))
        .map { x =>
          val las = x._5; val lo = x._6
          Geo.Zones.filter(z => inZone(lo, las, z._3)).map(_._1)
            .minOption.getOrElse(-1L)
        }
      zids.sliding(2).collect { case Seq(f, t0) => (f, t0) }.toSeq
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(expect.values.sum > 0, "planted population produced no trips")
    assert(expect.keys.exists(_._1 >= 0) || expect.keys.exists(_._2 >= 0),
      "no zoned endpoint — zones never exercised")
    assert(out == expect,
      s"missing=${expect.keySet -- out.keySet} " +
        s"extra=${out.keySet -- expect.keySet}")
  }

  test("resampledDensity == independent interpolation + cell counts " +
      "(cadence-equalized: the readout is exposure, not ping rate)") {
    val users = (1L to 30L)
    // irregular cadences: user u pings every (u % 3 + 1) * 400 s
    val evs = events(users.flatMap { u =>
      val step = (u % 3 + 1) * 400
      (0L to 6L).map(i => (u * 100 + i, u, i * step))
    }: _*)
    val out = Geo.resampledDensity(evs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def hu(lo: Long, hi: Long, num: Long, den: Long): Long =
      if (hi >= lo) lo + (2 * (hi - lo) * num + den) / (2 * den)
      else lo - (2 * (lo - hi) * num + den) / (2 * den)
    val base = 1700000000L
    val samples = users.flatMap { u =>
      val step = (u % 3 + 1) * 400
      val fixes = (0L to 6L).map { i =>
        val eid = u * 100 + i
        val (la, lo) = pos(eid, u)
        (base + i * step, la, lo)
      }
      fixes.sliding(2).flatMap { case Seq((t1, a1, o1), (t2, a2, o2)) =>
        val gs = t1 - t1 % 600 + 600; val ge = t2 - t2 % 600
        (gs to ge by 600).map(g =>
          (u, hu(a1, a2, g - t1, t2 - t1), hu(o1, o2, g - t1, t2 - t1)))
      }
    }
    val expect = samples
      .map { case (u, la, lo) => ((la + 5000) / 10000, (lo + 5000) / 10000, u) }
      .groupBy(c => (c._1, c._2))
      .map { case ((cy, cx), g) =>
        (cy, cx, g.size.toLong, g.map(_._3).distinct.size.toLong) }
      .toSeq
      .sortBy(t => (-t._3, t._1, t._2))
      .take(20)
    assert(expect.nonEmpty && out.length == expect.length)
    assert(out.toSeq == expect, s"got=${out.toSeq.take(5)} " +
      s"want=${expect.take(5)}")
  }

  test("fleets == local union-find over the brute-force encounter " +
      "graph: membership, edge/episode counts, exact pair-hours") {
    val users = (1L to 300L)
    val evs = events(users.flatMap(u =>
      Seq((u * 10, u, 0L), (u * 10 + 1, u, 3600L))): _*)
    val out = Geo.fleets(evs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    // brute-force pair-hours (the q264 construction), minHours=1 and
    // the week tolerance -> one episode per pair, hours = |encounters|
    val byHour = Seq(0L, 1L).map { h =>
      users.map { u =>
        val (la, lo) = pos(u * 10 + h, u)
        (u, la, lo)
      }
    }
    val pairHours = collection.mutable.Map
      .empty[(Long, Long), Long].withDefaultValue(0L)
    byHour.foreach { pts =>
      for {
        (u1, a1, o1) <- pts; (u2, a2, o2) <- pts if u1 < u2
        if math.round(hav(a1, o1, a2, o2)) <= 500L
      } pairHours((u1, u2)) += 1L
    }
    assert(pairHours.nonEmpty, "no encounters — grow the population")
    // local union-find
    val parent = collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairHours.keys.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val comps = pairHours.keys.flatMap(k => Seq(k._1, k._2)).toSet
      .groupBy(find)
    val expect = comps.map { case (root, mem) =>
      val prs = pairHours.filter(p => find(p._1._1) == root)
      root -> ((mem.size.toLong, prs.size.toLong, prs.size.toLong,
        prs.values.sum))
    }
    assert(out == expect,
      s"missing=${expect.keySet -- out.keySet} " +
        s"extra=${out.keySet -- expect.keySet}")
  }

  test("cellDensity: counts and distinct vessels recompute; ordering " +
      "is (count desc, cell)") {
    val evs = events((1L to 200L).map(e => (e, e % 40 + 1, e)): _*)
    val out = Geo.cellDensity(evs, top = 20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val cells = (1L to 200L).map { e =>
      val u = e % 40 + 1
      val (la, lo) = pos(e, u)
      ((la + 5000) / 10000, (lo + 5000) / 10000, u)
    }
    val agg = cells.groupBy(c => (c._1, c._2)).map { case ((cy, cx), g) =>
      (cy, cx, g.size.toLong, g.map(_._3).distinct.size.toLong)
    }.toSeq.sortBy(t => (-t._3, t._1, t._2)).take(20)
    assert(out.toSeq == agg)
  }

  test("episodeZones == independent pair-hours + islands + local ray " +
      "cast: each qualifying episode-hour lands in the smaller " +
      "vessel's zone (lowest id on overlap, -1 open sea), per-zone " +
      "hours/pairs/episodes/min_m recompute exactly") {
    // 300 users: encounter-hours spread over zones 1/2/3 AND open sea
    val users = (1L to 300L)
    val hours = Seq(0L, 1L, 2L, 4L)
    val evs = events(users.flatMap(u =>
      hours.map(h => (u * 10 + h, u, h * 3600L))): _*)
    val baseHour = 1700000000L / 3600
    // brute pair-hours with u1's rep position (the smaller vessel)
    val pairHours = collection.mutable.Map
      .empty[(Long, Long), List[(Long, Long, Long, Long)]]
      .withDefaultValue(Nil) // (hour, m, la1, lo1)
    hours.foreach { h =>
      val pts = users.map { u => val eid = u * 10 + h
        val (la, lo) = pos(eid, u); (u, la, lo) }
      for {
        (u1, a1, o1) <- pts; (u2, a2, o2) <- pts if u1 < u2
        m = math.round(hav(a1, o1, a2, o2)) if m <= 500L
      } pairHours((u1, u2)) ::= (baseHour + h, m, a1, o1)
    }
    def brute(minHours: Long, maxGap: Long) = {
      val rows = pairHours.toSeq.flatMap { case ((u1, u2), hmRaw) =>
        val hm = hmRaw.sortBy(_._1)
        var run = 0L; var prev = Long.MinValue
        val tagged = hm.map { case (h, m, la, lo) =>
          if (prev != Long.MinValue && h - prev > maxGap) run += 1
          prev = h
          (h, m, la, lo, run)
        }
        val sizes = tagged.groupBy(_._5).view.mapValues(_.size).toMap
        tagged.filter(t => sizes(t._5) >= minHours).map {
          case (_, m, la, lo, r) =>
            val zid = Geo.Zones.sortBy(_._1)
              .find(z => inZone(lo, la, z._3)).map(_._1).getOrElse(-1L)
            (zid, (u1, u2), r, m)
        }
      }
      rows.groupBy(_._1).map { case (zid, rs) =>
        zid -> ((rs.size.toLong, rs.map(_._2).distinct.size.toLong,
          rs.map(t => (t._2, t._3)).distinct.size.toLong,
          rs.map(_._4).min))
      }
    }
    def engine(minHours: Long, maxGap: Long) =
      Geo.episodeZones(evs, 500L, minHours, maxGap).collect()
        .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))).toMap
    val expectDflt = brute(2L, 168L)
    assert(expectDflt.nonEmpty, "no episode-hours — the plant is vacuous")
    assert(expectDflt.keySet.size >= 2,
      "all encounter-hours in one zone — attribution untested")
    assert(engine(2L, 168L) == expectDflt)
    // gap=1 splits at hour 3, minHours=1 keeps the singletons:
    // episodes multiply and every hour still lands in its zone
    val expectSplit = brute(1L, 1L)
    assert(expectSplit.values.map(_._3).sum >
      expectDflt.values.map(_._3).sum, "split plant vacuous")
    assert(engine(1L, 1L) == expectSplit)
    // zone names ride the ids (engine side)
    val names = Geo.episodeZones(evs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    names.foreach { case (id, nm) =>
      val exp = Geo.Zones.find(_._1 == id).map(_._2).getOrElse("open_sea")
      assert(nm == exp, s"zone $id named $nm, want $exp")
    }
  }

  test("loadZones: a JSON-lines (and parquet) registry loads, " +
      "validates, and drives q273/q277 to the EXACT literal-registry " +
      "results; malformed registries fail loudly") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-zones").toString
    // the literal registry, serialized as the documented JSON shape
    val json = Geo.Zones.map { case (id, nm, vs) =>
      s"""{"zone_id":$id,"zone_name":"$nm","vertices":[${
        vs.map(v => s"[${v._1},${v._2}]").mkString(",")}]}"""
    }
    val jf = s"$dir/zones.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(jf),
      json.mkString("\n").getBytes("UTF-8"))
    val loaded = Geo.loadZones(spark, jf)
    assert(loaded == Geo.Zones.sortBy(_._1))
    // parquet route: same rows, same registry
    val pf = s"$dir/zones_pq"
    Geo.Zones.map { case (id, nm, vs) =>
      (id, nm, vs.map(v => Seq(v._1, v._2))) }
      .toDF("zone_id", "zone_name", "vertices")
      .write.mode("overwrite").parquet(pf)
    assert(Geo.loadZones(spark, pf) == Geo.Zones.sortBy(_._1))
    // file-loaded registry == literal on the zone queries
    val evs = events((1L to 80L).flatMap(u =>
      Seq((u * 10, u, 0L), (u * 10 + 1, u, 600L),
        (u * 10 + 2, u, 4000L))): _*)
    assert(Geo.zoneStops(evs, zones = loaded).collect().toSeq ==
      Geo.zoneStops(evs).collect().toSeq)
    assert(Geo.zoneVisits(evs, loaded).collect().toSeq ==
      Geo.zoneVisits(evs).collect().toSeq)
    // malformed: a 2-vertex polygon, then a duplicate id
    val bad = s"$dir/bad.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(bad),
      """{"zone_id":1,"zone_name":"x","vertices":[[0,0],[1,1]]}"""
        .getBytes("UTF-8"))
    assertThrows[IllegalArgumentException](Geo.loadZones(spark, bad))
    val dup = s"$dir/dup.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(dup),
      (json :+ json.head).mkString("\n").getBytes("UTF-8"))
    assertThrows[IllegalArgumentException](Geo.loadZones(spark, dup))
    // a null vertex element must fail at LOAD, not silently unbox to
    // coordinate 0 (ADVICE r18)
    val nul = s"$dir/nul.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(nul),
      """{"zone_id":1,"zone_name":"x","vertices":[[null,5],[1,1],[2,2]]}"""
        .getBytes("UTF-8"))
    assertThrows[IllegalArgumentException](Geo.loadZones(spark, nul))
  }

  test("encounterHeatmap == independent pair-hours + cell fold: each " +
      "verified pair-hour lands in the smaller vessel's 0.01-degree " +
      "cell; counts/pairs/min_m and the top-20 order recompute") {
    val users = (1L to 300L)
    val hours = Seq(0L, 1L, 2L)
    val evs = events(users.flatMap(u =>
      hours.map(h => (u * 10 + h, u, h * 3600L))): _*)
    val out = Geo.encounterHeatmap(evs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val rows = hours.flatMap { h =>
      val pts = users.map { u => val eid = u * 10 + h
        val (la, lo) = pos(eid, u); (u, la, lo) }
      for {
        (u1, a1, o1) <- pts; (u2, a2, o2) <- pts if u1 < u2
        m = math.round(hav(a1, o1, a2, o2)) if m <= 500L
      } yield ((a1 + 5000) / 10000, (o1 + 5000) / 10000, u1, u2, m)
    }
    val expect = rows.groupBy(r => (r._1, r._2)).map { case ((cy, cx), g) =>
      (cy, cx, g.size.toLong,
        g.map(r => (r._3, r._4)).distinct.size.toLong, g.map(_._5).min)
    }.toSeq.sortBy(t => (-t._3, t._1, t._2)).take(20)
    assert(expect.nonEmpty, "no encounters — plant vacuous")
    assert(out == expect, s"got=${out.take(3)} want=${expect.take(3)}")
  }

  test("darkGaps == independent per-user fold: only gaps >= minGapS " +
      "emit, dark-leg meters are the shared re-gridded haversine, " +
      "speed is the half-up integer mm/s") {
    // user 1: 1800 s (quiet), 28,200 s (DARK), 600 s (quiet);
    // user 2: one 50,000 s gap (DARK); user 3: single fix (no legs)
    val evs = events((11L, 1L, 0L), (12L, 1L, 1800L), (13L, 1L, 30000L),
      (14L, 1L, 30600L), (21L, 2L, 0L), (22L, 2L, 50000L), (31L, 3L, 0L))
    val out = Geo.darkGaps(evs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    def render(sec: Long): String = fmt.format(ts(sec))
    def gap(uid: Long, e1: Long, t1: Long, e2: Long, t2: Long) = {
      val (a1, o1) = pos(e1, uid); val (a2, o2) = pos(e2, uid)
      val m = math.round(hav(a1, o1, a2, o2))
      val s = t2 - t1
      (uid, render(t1), render(t2), s, m, (2 * 1000 * m + s) / (2 * s))
    }
    val expect = Seq(gap(1L, 12L, 1800L, 13L, 30000L),
      gap(2L, 21L, 0L, 22L, 50000L))
    assert(out == expect, s"got=$out want=$expect")
    // threshold knob: every one of the 4 legs is a gap at minGapS=1
    assert(Geo.darkGaps(evs, minGapS = 1L).count() == 4L)
  }

  test("darkRendezvous == independent gaps + per-hour brute force + " +
      "local ray cast: gap endpoints probe the hour-representative " +
      "index, n_ends counts near endpoints, zone follows the closest " +
      "endpoint (start wins distance ties)") {
    // every user: one fix in hour 0, then a ~30,000 s dark gap, then
    // two fixes 120 s apart (no second gap) — 300 users (the r18
    // multi-zone plant rule) so endpoints land across several zones
    // and some bases sit within the 500 m radius of each other
    val users = (1L to 300L)
    def fixes(u: Long): Seq[(Long, Long)] = Seq(
      (u * 100, (u % 5) * 60L),
      (u * 100 + 1, 30000L + (u % 7) * 60L),
      (u * 100 + 2, 30120L + (u % 7) * 60L))
    val evs = events(users.flatMap(u =>
      fixes(u).map { case (e, s) => (e, u, s) }): _*)
    val out = Geo.darkRendezvous(evs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)) ->
        ((r.getLong(5), r.getLong(6), r.getString(7), r.getLong(8))))
      .toMap
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    def render(sec: Long): String = fmt.format(ts(sec))
    val base = 1700000000L
    // the q264 index: one representative (min event_id) per (user, hour)
    val rep = users.flatMap { u =>
      fixes(u).groupBy { case (_, s) => (base + s) / 3600 }
        .map { case (h, fs) =>
          val (la, lo) = pos(fs.minBy(_._1)._1, u)
          (u, h, la, lo)
        }
    }
    def zidOf(lo: Long, la: Long): Long =
      Geo.Zones.sortBy(_._1).find(z => inZone(lo, la, z._3))
        .map(_._1).getOrElse(-1L)
    def znameOf(z: Long): String =
      Geo.Zones.find(_._1 == z).map(_._2).getOrElse("open_sea")
    val hits = users.flatMap { u =>
      // the plant's only >= 21,600 s gap: fix 1 -> fix 2
      val Seq((e1, t1), (e2, t2), _) = fixes(u)
      val (a1, o1) = pos(e1, u); val (a2, o2) = pos(e2, u)
      val eps = Seq((0L, (base + t1) / 3600, a1, o1),
        (1L, (base + t2) / 3600, a2, o2))
      for {
        (ep, h, la, lo) <- eps
        (v, hh, la2, lo2) <- rep if hh == h && v != u
        m = math.round(hav(la, lo, la2, lo2)) if m <= 500L
      } yield ((u, render(t1), render(t2), t2 - t1, v),
        (m, ep, zidOf(lo, la)))
    }
    val expect = hits.groupBy(_._1).map { case (k, g) =>
      val best = g.map(_._2).minBy(x => (x._1, x._2))
      k -> ((g.size.toLong, best._3, znameOf(best._3), best._1))
    }
    assert(expect.nonEmpty, "no rendezvous — plant vacuous")
    assert(expect.values.map(_._2).toSet.size >= 2,
      "single-zone plant — zone attribution untested")
    assert(expect.values.exists(_._1 == 2L),
      "no two-endpoint rendezvous — the argmin/count path untested")
    assert(out == expect,
      s"missing=${expect.keySet -- out.keySet} " +
        s"extra=${out.keySet -- expect.keySet}")
  }

  test("zoneExposure == independent interpolation + local ray cast: " +
      "each grid instant carries stepS seconds into its zone, " +
      "exposure sums exactly, open sea keeps the total") {
    val users = (1L to 300L)
    val evs = events(users.flatMap(u =>
      Seq((u * 10, u, 0L), (u * 10 + 1, u, 1800L))): _*)
    val out = Geo.zoneExposure(evs).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def hu(lo: Long, hi: Long, num: Long, den: Long): Long =
      if (hi >= lo) lo + (2 * (hi - lo) * num + den) / (2 * den)
      else lo - (2 * (lo - hi) * num + den) / (2 * den)
    val base = 1700000000L
    val samples = users.flatMap { u =>
      val (la1, lo1) = pos(u * 10, u); val (la2, lo2) = pos(u * 10 + 1, u)
      val (t1, t2) = (base, base + 1800)
      val gs = t1 - t1 % 600 + 600; val ge = t2 - t2 % 600
      (gs to ge by 600).map { g =>
        (u, hu(la1, la2, g - t1, t2 - t1), hu(lo1, lo2, g - t1, t2 - t1))
      }
    }
    val expect = samples.groupBy { case (_, la, lo) =>
      Geo.Zones.sortBy(_._1).find(z => inZone(lo, la, z._3))
        .map(z => (z._1, z._2)).getOrElse((-1L, "open_sea"))
    }.map { case (k, g) =>
      k -> ((g.size.toLong, g.map(_._1).distinct.size.toLong,
        g.size.toLong * 600L))
    }
    assert(expect.keySet.size >= 2, "single-zone plant — vacuous")
    assert(out == expect,
      s"missing=${expect.keySet -- out.keySet} " +
        s"extra=${out.keySet -- expect.keySet}")
    // total exposure == total grid instants x step, zones partition it
    assert(out.values.map(_._3).sum == samples.size.toLong * 600L)
  }

  test("oracle-scope guard: the pairing oracles (q264/q269/q278/q279/" +
      "q283) " +
      "do not model the poison-cell cap, so the oracle datasets MUST " +
      "be poison-free — any future mega-cell fails HERE as an audit " +
      "hit, not as a mysterious hash mismatch") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { sf =>
      val p = Geo.poisonCells(
        graft.core.Tables.load(spark, sf, "events")).collect()
      assert(p.isEmpty,
        s"$sf holds ${p.length} over-cap cell-hour(s): the pairing " +
          "oracles diverge from the engine on poisoned data — " +
          "regenerate the dataset or exclude it from hash checks")
    }
  }
}
