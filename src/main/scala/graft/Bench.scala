package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.core.Session

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * emits ONE bare JSON line on stdout (plus a copy at target/bench.json so
  * sbt's log decorator can't corrupt the driver's parse — VERDICT r1).
  *
  * Each query is materialized through a `noop` write: full execution of
  * the physical plan (LIMIT-shaped queries included) without collect() or
  * disk I/O skewing the timing. Failures are recorded per-query instead of
  * being swallowed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    def build(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.extensions", "graft.functions.GraftExtensions")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      Session.tune(s)
      s.sparkContext.setLogLevel("WARN")
      s
    }
    var spark = build()

    // Accretion-vs-environment diagnostic (VERDICT r15 #4): with
    // SPARK_GRAFT_BENCH_RECYCLE=N the session (and its codegen/catalog/
    // broadcast state) is torn down and rebuilt every N timed queries.
    // OFF by default — the official number stays the long-lived-session
    // behavior. If a suite-wide slowdown flattens under recycling, the
    // cause is in-JVM accretion; if it persists, the box itself drifted.
    val recycleEvery = sys.env.get("SPARK_GRAFT_BENCH_RECYCLE")
      .map(_.toInt).getOrElse(0)
    var sinceRecycle = 0
    def maybeRecycle(): Unit = if (recycleEvery > 0) {
      sinceRecycle += 1
      if (sinceRecycle >= recycleEvery) {
        sinceRecycle = 0
        spark.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        spark = build()
      }
    }

    /** Cumulative stop-the-world GC seconds across all collectors —
      * per-pass deltas land in the artifact so a growing GC share
      * (accretion) is distinguishable from uniform box slowness. */
    def gcSec(): Double = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum / 1e3
    }

    val names = SparkEntry.queries.keys.toSeq.sorted

    // Diagnostic hygiene knob (r9 verdict #7): with SPARK_GRAFT_BENCH_HYGIENE=1
    // every query runs against a swept session — cached relations cleared and
    // any persisted RDD a query leaked dropped before the next timing starts.
    // OFF by default: the official number measures the long-lived-session
    // behavior users get, and a leak should SHOW UP there (it did in r9 —
    // pageRank's pinned checkpoint blocks degraded ~100 downstream queries
    // by 35%). Turning the knob on isolates whether a regression is
    // session-state contamination (hygiene run flat vs official run
    // inflated) or a real per-query plan change (both inflated).
    val hygiene = sys.env.get("SPARK_GRAFT_BENCH_HYGIENE").contains("1")
    def sweep(): Unit = if (hygiene) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    // STANDING zero-persisted-RDD-delta assertion (r10 verdict #6, no
    // longer opt-in): a query that returns with more persisted RDDs than
    // it started with has leaked checkpoint/cache blocks — the r9
    // pageRank leak class, which silently degraded ~100 downstream
    // queries 35% and cost a full round of bench signal. Leaks fail
    // LOUD: the query lands in the artifact's `leaked` list and counts
    // into `nfailed` in the compact headline line. The leaked blocks are
    // then dropped so one offender can't poison every query behind it.
    val leaked = collection.mutable.Set.empty[String]
    def assertNoLeak(name: String): Unit = {
      val now = spark.sparkContext.getPersistentRDDs
      if (now.nonEmpty) {
        if (leaked.add(name))
          System.err.println(
            s"[bench] HYGIENE VIOLATION: $name leaked persisted RDDs ${now.keys.toSeq.sorted}")
        now.values.foreach(_.unpersist(blocking = false))
      }
    }

    def runOnce(name: String): Boolean =
      try {
        sweep()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        assertNoLeak(name)
        true
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
      }

    // Warm-up pass: JIT + codegen-cache + page-cache the inputs so the
    // timed pass measures steady-state query cost, not JVM startup (the
    // first query otherwise absorbs ~4 s of warmup).
    names.foreach(runOnce)

    // Median of 3 timed passes per query, run PASS-MAJOR (all queries
    // pass 1, then pass 2, then pass 3) instead of query-major: a
    // sustained contention window on the box poisons back-to-back
    // samples, so with query-major sampling one burst inflated all three
    // samples of a single query and the median kept it (r5's official
    // artifact showed q61 at 7.79 s vs 3.21 s clean). Interleaving puts
    // the burst on DIFFERENT queries in different passes, so each
    // query's median still sees >= 2 quiet samples. Median is immune to
    // the one poisoned sample; total = sum of per-query medians.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    var failed = List.empty[String]
    val samples = collection.mutable.Map
      .empty[String, List[(Double, Boolean)]].withDefaultValue(Nil)
    // Per-pass wall + GC telemetry (VERDICT r15 #4): pass totals that
    // grow monotonically WITHIN one JVM point at accretion; flat passes
    // under a slow total point at the environment.
    val passSec = Array.fill(passes)(0.0)
    val passGc = Array.fill(passes)(0.0)
    for (p <- 1 to passes) {
      val pt0 = System.nanoTime(); val pg0 = gcSec()
      for (name <- names) {
        val t0 = System.nanoTime()
        val ok = runOnce(name)
        val sec = (System.nanoTime() - t0) / 1e9
        samples(name) ::= (sec, ok)
        maybeRecycle()
      }
      passSec(p - 1) = (System.nanoTime() - pt0) / 1e9
      passGc(p - 1) = gcSec() - pg0
    }
    // Per-query MEDIAN (comparable with earlier rounds) and MIN (the
    // honest steady-state statistic: box contention is strictly additive
    // noise, so min-of-passes is the least contaminated sample — VERDICT
    // r6 asked for both after three rounds of driver-box contamination).
    val times = names.map { name =>
      val s = samples(name)
      if (s.exists(!_._2)) failed ::= name
      // Timing stats over SUCCESSFUL passes only: a fast-failing pass
      // would understate min (the statistic the compact line headlines).
      // Only when every pass failed do all samples count, so the entry
      // still reports a number next to its `failed` flag.
      val oks = s.collect { case (sec, true) => sec }
      val sorted = (if (oks.nonEmpty) oks else s.map(_._1)).sorted
      name -> (sorted(sorted.size / 2), sorted.head)
    }

    def qmap(f: ((Double, Double)) => Double): String =
      times.map { case (k, v) => "\"" + k + "\":" + f"${f(v)}%.3f" }
        .mkString("{", ",", "}")
    // hygiene violations are failures: a leaking query's own timing may
    // be fine, but its leaked blocks taxed everything after it
    failed = (failed ++ leaked).distinct
    val fails = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val leaks = leaked.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = times.map(_._2._1).sum
    val totalMin = times.map(_._2._2).sum
    val passSecJson = passSec.map(s => f"$s%.2f").mkString("[", ",", "]")
    val passGcJson = passGc.map(s => f"$s%.2f").mkString("[", ",", "]")
    val full =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":${qmap(_._1)},"queries_min":${qmap(_._2)},"total_min":${f"$totalMin%.3f"},"failed":$fails,"leaked":$leaks,"hygiene":$hygiene,"recycle":$recycleEvery,"pass_sec":$passSecJson,"pass_gc_sec":$passGcJson,"sf":"$sfDir"}"""
    // Compact line: the r6 official artifact recorded parsed:null
    // because the 79-entry per-query line outgrew the driver's stdout
    // tail window (measured from BENCH_r20.json: the window keeps the
    // LAST 2000 chars, and sbt's trailing "[success]" line costs ~80 of
    // them). Print the full line FIRST, then this line LAST so any tail
    // window ends on one complete, parseable JSON line. Only a failure
    // COUNT here — the unbounded failed list would regrow this line
    // past the tail window exactly when the build is broken and the
    // artifact matters most; the full list stays in the full line and
    // target/bench.json.
    //
    // r21 (VERDICT r20 #2/#7): the driver's PERF artifact was per-query
    // BLIND — parsed.queries was {}, so a one-window phantom regression
    // (r20's q197 "14.9 s") was indistinguishable from a real one. A
    // keyed 286-entry map cannot fit 2000 chars even with short keys
    // (and qNNN prefixes are not unique: q19/q22), so the compact line
    // carries:
    //   - "qmin": the per-query MIN seconds as a bare ARRAY in sorted
    //     query-name order (the same order as the full line's maps and
    //     CORRECTNESS_rN.json's keys — zip to recover the mapping),
    //     2 decimals, ~1.6 KB for 286 queries. Degrades to 1 decimal,
    //     then to [] (full line still has everything), if a pathological
    //     value set would push the line past the window.
    //   - "noisy": true when the per-pass walls spread by >1.3x
    //     (max/min) — the artifact's own credibility flag: a noisy
    //     window poisons medians 3-6x (r18/r19/r20 all documented it).
    // "queries" stays {} so the driver's existing parse is unchanged.
    val noisy = passSec.max > passSec.min * 1.3
    def qminArr(dec: Int): String =
      times.map(t => String.format(s"%.${dec}f", Double.box(t._2._2)))
        .mkString("[", ",", "]")
    def compactWith(qmin: String): String =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":{},"qmin":$qmin,"noisy":$noisy,"total_min":${f"$totalMin%.3f"},"nq":${names.size},"nfailed":${failed.size},"sf":"$sfDir"}"""
    val compact = Seq(qminArr(2), qminArr(1), "[]")
      .map(compactWith).find(_.length <= 1880)
      .getOrElse(compactWith("[]"))
    Files.createDirectories(Paths.get("target"))
    Files.writeString(Paths.get("target/bench.json"), full + "\n")
    // Committed per-query history (VERDICT r11 #6): target/bench.json is
    // build-dir-only and overwritten per run, and the driver's BENCH_rN
    // tail truncates — append every full line (epoch-stamped) to a
    // repo-root JSONL so round-over-round per-query trends survive
    // without archaeology. The driver commits uncommitted files at
    // round end, so its official run lands here too.
    // History path anchored to the repo root, not the process cwd
    // (ADVICE r12): a run launched elsewhere would otherwise scatter
    // history files or die on a read-only cwd. Resolution order:
    // GRAFT_BENCH_HISTORY env var > nearest ancestor dir holding
    // build.sbt > target/ fallback. Append failures must never fail
    // the bench itself — the stdout artifact is the primary channel.
    val hist = sys.env.get("GRAFT_BENCH_HISTORY").map(Paths.get(_))
      .orElse {
        Iterator.iterate(Paths.get("").toAbsolutePath)(_.getParent)
          .takeWhile(_ != null)
          .find(d => Files.exists(d.resolve("build.sbt")))
          .map(_.resolve("bench_history.jsonl"))
      }
      .getOrElse(Paths.get("target/bench_history.jsonl"))
    try Files.writeString(hist,
      s"""{"ts":${System.currentTimeMillis() / 1000},"line":$full}""" + "\n",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench] history append to $hist failed: $e")
    }
    // Bare lines on stdout for the driver's tail-parse: full first,
    // compact LAST.
    println(full)
    println(compact)
    spark.stop()
  }
}
