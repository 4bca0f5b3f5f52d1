package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Versioned

/** Versioned-table semantics: append vs replace commits, time-travel
  * reads, the latest-pointer fallback after a mid-commit crash, orphan
  * reclamation, and vacuum retention.
  */
class VersionedSpec extends AnyFunSuite with TestSpark {

  import spark.implicits._

  private def dirOf(): String = java.nio.file.Files
    .createTempDirectory("graft-vtable").toString

  private def rows(dir: String, v: Long = -1L): Set[Long] =
    Versioned.read(spark, dir, v).collect().map(_.getLong(0)).toSet

  test("append commits accumulate, replace resets, every old version " +
      "stays readable (time travel)") {
    val dir = dirOf()
    assert(Versioned.latestVersion(spark, dir) == -1L)
    val v0 = Versioned.commitAppend(Seq(1L, 2L).toDF("id"), dir)
    val v1 = Versioned.commitAppend(Seq(3L).toDF("id"), dir)
    val v2 = Versioned.commitReplace(Seq(9L).toDF("id"), dir)
    assert((v0, v1, v2) == ((0L, 1L, 2L)))
    assert(rows(dir, 0) == Set(1L, 2L))
    assert(rows(dir, 1) == Set(1L, 2L, 3L))
    assert(rows(dir, 2) == Set(9L))
    assert(rows(dir) == Set(9L)) // latest
    assert(Versioned.log(spark, dir).map(_._2) == Seq(1, 2, 1))
  }

  test("crash states: unreferenced data dir is invisible; manifest " +
      "without pointer swap reads as the new version (fallback); " +
      "vacuum reclaims orphans") {
    val dir = dirOf()
    Versioned.commitAppend(Seq(1L).toDF("id"), dir)
    // crash point 1: data written, no manifest -> readers see v0 only
    Seq(99L).toDF("id").write
      .parquet(s"$dir/data/c-orphan-${java.util.UUID.randomUUID()}")
    assert(rows(dir) == Set(1L))
    assert(Versioned.latestVersion(spark, dir) == 0L)
    // crash point 2: manifest v1 written but _latest still says 0 ->
    // fallback resolves the newest DURABLE manifest
    val sub = new java.io.File(s"$dir/data").listFiles()
      .map(_.getName).filter(_.startsWith("c-")).sorted.head
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_versions", "v00000001.txt"), sub)
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "_latest"))
    assert(Versioned.latestVersion(spark, dir) == 1L)
    assert(rows(dir) == Set(1L)) // v1 references the same subdir
    // a new commit heals the pointer and the orphan stays invisible
    Versioned.commitAppend(Seq(2L).toDF("id"), dir)
    assert(rows(dir) == Set(1L, 2L))
    // vacuum(keep=1) drops old manifests AND the orphan dir
    val (dropped, deleted) = Versioned.vacuum(spark, dir, keep = 1)
    assert(dropped == 2 && deleted >= 1, s"($dropped, $deleted)")
    assert(rows(dir) == Set(1L, 2L)) // latest untouched
    // the orphan is gone from disk
    val left = new java.io.File(s"$dir/data").listFiles().map(_.getName)
    assert(!left.exists(_.contains("orphan")), left.toSeq.toString)
  }

  test("readPruned skips whole commits by manifest stats, never skips " +
      "a stats-less commit, and equals the filtered full read") {
    val dir = dirOf()
    Versioned.commitAppend((1L to 100L).toDF("id"), dir, Seq("id"))
    Versioned.commitAppend((1000L to 1100L).toDF("id"), dir, Seq("id"))
    // a legacy commit WITHOUT stats — must always be read
    Versioned.commitAppend(Seq(55L).toDF("id"), dir)
    val (df, kept, skipped) =
      Versioned.readPruned(spark, dir, "id", 40L, 60L)
    assert(kept == 2 && skipped == 1, s"($kept, $skipped)")
    val got = df.collect().map(_.getLong(0)).toSet
    val full = Versioned.read(spark, dir)
      .filter(col("id") >= 40L && col("id") <= 60L)
      .collect().map(_.getLong(0)).toSet
    assert(got == full && got == ((40L to 60L).toSet + 55L))
    // the pruned scan's input files span exactly the 2 kept subdirs —
    // the skipped commit's files are never listed, let alone read
    val subdirsTouched = df.inputFiles
      .map(f => f.split("/data/")(1).split("/")(0)).toSet
    assert(subdirsTouched.size == 2, subdirsTouched.toString)
    // a range hitting nothing still reads the stats-less commit only
    val (df2, kept2, skipped2) =
      Versioned.readPruned(spark, dir, "id", 5000L, 6000L)
    assert(kept2 == 1 && skipped2 == 2 && df2.count() == 0)
  }

  test("commitAppendAt is idempotent at its version id and heals a " +
      "lagging pointer; streaming waves become exactly-once versions") {
    val dir = dirOf()
    assert(Versioned.commitAppendAt(Seq(1L).toDF("id"), dir, 0L, Seq("id")))
    assert(Versioned.commitAppendAt(Seq(2L).toDF("id"), dir, 2L, Seq("id")))
    // replay of batch 2: manifest durable -> no-op, no new data
    assert(!Versioned.commitAppendAt(Seq(99L).toDF("id"), dir, 2L))
    assert(rows(dir) == Set(1L, 2L))
    assert(Versioned.log(spark, dir).map(_._1) == Seq(0L, 2L))
    // crash between manifest and pointer: pointer deleted, replay heals
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "_latest"))
    assert(!Versioned.commitAppendAt(Seq(99L).toDF("id"), dir, 2L))
    assert(Versioned.latestVersion(spark, dir) == 2L)
    // a NEW commit at a stale id (no durable manifest, behind latest)
    // fails loudly instead of rewriting history
    val e = intercept[IllegalArgumentException](
      Versioned.commitAppendAt(Seq(3L).toDF("id"), dir, 1L))
    assert(e.getMessage.contains("not ahead"))

    // the streaming sink: two waves -> v0 and v1, re-drain no-ops
    import graft.streaming.StreamingVtable
    val landing = java.nio.file.Files
      .createTempDirectory("graft-vt-in").toString
    val tdir = dirOf()
    def land(name: String, ids: Seq[Long]): Unit = {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-vt-wave").toString
      ids.toDF("id").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(landing, name))
    }
    val schema = Seq(1L).toDF("id").schema
    def drain(): Unit = StreamingVtable
      .start(spark, landing, schema, tdir, Seq("id")).awaitTermination()
    land("w1.parquet", Seq(10L, 20L)); drain()
    land("w2.parquet", Seq(30L)); drain()
    drain() // nothing new
    assert(Versioned.log(spark, tdir).map(_._1) == Seq(0L, 1L))
    assert(rows(tdir) == Set(10L, 20L, 30L))
    assert(rows(tdir, 0L) == Set(10L, 20L)) // time travel under ingest
    // stats landed: a pruned read skips the wave that can't match
    val (_, kept, skipped) = Versioned.readPruned(spark, tdir, "id", 25L, 35L)
    assert(kept == 1 && skipped == 1)
  }

  test("interleaved concurrent commits serialize on the manifest lock: " +
      "distinct versions, both writers' rows survive, no silent loss") {
    val dir = dirOf()
    Versioned.commitReplace(Seq(0L).toDF("id"), dir)
    // two writers, 6 appends each, barrier-released to maximize
    // overlap: without the create-exclusive manifest lock a loser's
    // clobber at v(N+1) silently drops the winner's subdir from every
    // later lineage
    val perWriter = 6
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val versions = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val threads = (0 until 2).map { w =>
      new Thread(() => {
        barrier.await()
        (1 to perWriter).foreach { i =>
          versions.add(Versioned.commitAppend(
            Seq(w * 100L + i).toDF("id"), dir))
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val vs = versions.asScala.toSeq
    // every commit won a UNIQUE version id (the lock serialized them)
    assert(vs.size == 2 * perWriter && vs.distinct.size == vs.size)
    assert(Versioned.latestVersion(spark, dir) == perWriter * 2L)
    // the final lineage holds EVERY writer's every row — nothing lost
    val want = Set(0L) ++
      (1 to perWriter).flatMap(i => Seq(i.toLong, 100L + i)).toSet
    assert(rows(dir) == want)
  }

  test("additive schema evolution: a wider append reads old subdirs " +
      "as NULL in the new column; each retained version keeps ITS " +
      "OWN schema; a type conflict fails loudly") {
    val dir = dirOf()
    Versioned.commitAppend(Seq(1L, 2L).toDF("id"), dir)
    // append a frame with a NEW column
    Versioned.commitAppend(
      Seq((3L, "x")).toDF("id", "tag"), dir)
    val latest = Versioned.read(spark, dir).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(latest == Map(1L -> None, 2L -> None, 3L -> Some("x")))
    // time travel: v0's schema has no tag column at all
    assert(Versioned.read(spark, dir, 0).columns.toSeq == Seq("id"))
    // dropping a column on append keeps it (old subdirs still hold it)
    Versioned.commitAppend(Seq(4L).toDF("id"), dir)
    val v2 = Versioned.read(spark, dir).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(v2 == Map(1L -> None, 2L -> None, 3L -> Some("x"), 4L -> None))
    // same-name dataType conflict is refused, not silently coerced
    val e = intercept[IllegalArgumentException](
      Versioned.commitAppend(Seq((5L, 9L)).toDF("id", "tag"), dir))
    assert(e.getMessage.contains("schema conflict"))
  }

  test("appending to a LEGACY table (manifest without a #schema " +
      "header) derives the previous schema from its files — prior " +
      "columns survive and type conflicts still refuse") {
    val dir = dirOf()
    Versioned.commitAppend(Seq((1L, "x")).toDF("id", "tag"), dir)
    // simulate a pre-#schema manifest: strip the header line
    val vpath = java.nio.file.Paths.get(dir, "_versions", "v00000000.txt")
    val legacy = java.nio.file.Files.readString(vpath).linesIterator
      .filterNot(_.startsWith("#")).mkString("\n")
    java.nio.file.Files.writeString(vpath, legacy)
    // a NARROWER append must not drop 'tag' from the snapshot
    Versioned.commitAppend(Seq(2L).toDF("id"), dir)
    val out = Versioned.read(spark, dir).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out == Map(1L -> Some("x"), 2L -> None))
    // and a type conflict against the legacy columns still refuses
    val dir2 = dirOf()
    Versioned.commitAppend(Seq((1L, "x")).toDF("id", "tag"), dir2)
    val v2 = java.nio.file.Paths.get(dir2, "_versions", "v00000000.txt")
    java.nio.file.Files.writeString(v2,
      java.nio.file.Files.readString(v2).linesIterator
        .filterNot(_.startsWith("#")).mkString("\n"))
    val e = intercept[IllegalArgumentException](
      Versioned.commitAppend(Seq((2L, 9L)).toDF("id", "tag"), dir2))
    assert(e.getMessage.contains("schema conflict"))
  }

  test("compact racing an append never silently drops the append's " +
      "rows: compact commits at EXACTLY read-version+1, so losing the " +
      "race fails loudly (and every appended row survives)") {
    val dir = dirOf()
    Versioned.commitAppend(Seq(0L).toDF("id"), dir)
    val appended = collection.mutable.Set(0L)
    var compactFailures = 0
    (1 to 5).foreach { i =>
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      var compactErr: Throwable = null
      val tCompact = new Thread(() => {
        barrier.await()
        try Versioned.compact(spark, dir)
        catch { case e: Throwable => compactErr = e }
      })
      val tAppend = new Thread(() => {
        barrier.await()
        Versioned.commitAppend(Seq(100L + i).toDF("id"), dir)
      })
      tCompact.start(); tAppend.start()
      tCompact.join(); tAppend.join()
      appended += (100L + i)
      if (compactErr != null) {
        compactFailures += 1
        // the ONLY acceptable compact failure is the loud explicit-id
        // refusal — anything else is a real bug
        val m = Option(compactErr.getMessage).getOrElse("")
        assert(m.contains("concurrent commit") || m.contains("not ahead"),
          s"unexpected compact failure: $compactErr")
      }
      // the invariant the explicit id exists to protect: no append's
      // rows ever vanish, win or lose
      assert(rows(dir) == appended.toSet,
        s"round $i lost rows: ${appended.toSet -- rows(dir)}")
    }
    // informational: races that made compact refuse (either outcome ok)
    info(s"compact loud refusals under race: $compactFailures of 5")
  }

  test("compact folds the snapshot into one data subdir as a new " +
      "version; rows identical, time travel intact until vacuum") {
    val dir = dirOf()
    (1L to 4L).foreach(i => Versioned.commitAppend(Seq(i).toDF("id"), dir))
    assert(Versioned.log(spark, dir).last == ((3L, 4)))
    val v = Versioned.compact(spark, dir)
    assert(v == 4L)
    assert(Versioned.log(spark, dir).last == ((4L, 1))) // ONE subdir
    assert(rows(dir) == Set(1L, 2L, 3L, 4L))
    assert(rows(dir, 3) == Set(1L, 2L, 3L, 4L)) // pre-compact snapshot
    assert(rows(dir, 1) == Set(1L, 2L))
  }

  test("compact interleaved with a streaming writer: the batch whose " +
      "id the compact consumed still lands (marker-based replay " +
      "detection), its replay no-ops, out-of-order stays loud") {
    val dir = dirOf()
    // the stream's first two micro-batches
    assert(Versioned.commitAppendAt(Seq(1L).toDF("id"), dir, 0L))
    assert(Versioned.commitAppendAt(Seq(2L).toDF("id"), dir, 1L))
    // maintenance compact consumes version id 2 — the NEXT batch id
    assert(Versioned.compact(spark, dir) == 2L)
    // batch 2 arrives: an id-based replay check would silently drop
    // it; the marker scan sees v2 is a compact and commits at v3
    assert(Versioned.commitAppendAt(Seq(3L).toDF("id"), dir, 2L))
    assert(rows(dir) == Set(1L, 2L, 3L))
    assert(Versioned.log(spark, dir).map(_._1) == Seq(0L, 1L, 2L, 3L))
    // crash-replay of batch 2 finds its marker at v3 -> exactly-once
    assert(!Versioned.commitAppendAt(Seq(99L).toDF("id"), dir, 2L))
    assert(rows(dir) == Set(1L, 2L, 3L))
    // replay of a pre-compact batch (marker at v1) also no-ops
    assert(!Versioned.commitAppendAt(Seq(97L).toDF("id"), dir, 1L))
    assert(rows(dir) == Set(1L, 2L, 3L))
  }

  test("a fresh stream (batch ids restarting at 0) against a table " +
      "whose markerless v0 was a PLAIN append fails loudly when the " +
      "table is marker-aware — never a silent batch drop; a PURE " +
      "legacy stream table still honors id-as-batch replay") {
    import org.apache.spark.sql.functions.col
    def stripMarkers(dir: String, v: Long): Unit = {
      val p = java.nio.file.Paths.get(dir, "_versions",
        f"v$v%08d.txt")
      java.nio.file.Files.writeString(p,
        java.nio.file.Files.readString(p).linesIterator
          .filterNot(_.startsWith("#writer")).mkString("\n"))
    }
    // marker-aware table: markerless v0 (pre-marker plain append) +
    // a marker-era maintenance append at v1
    val dir = dirOf()
    Versioned.commitAppend(Seq(1L).toDF("id"), dir)
    stripMarkers(dir, 0L)
    Versioned.commitAppend(Seq(2L).toDF("id"), dir)
    val e = intercept[RuntimeException](
      Versioned.commitAppendAt(Seq(3L).toDF("id"), dir, 0L))
    assert(e.getMessage.contains("markerless"),
      s"wrong failure: ${e.getMessage}")
    assert(rows(dir) == Set(1L, 2L)) // nothing dropped, nothing landed
    // PURE legacy table (no marker anywhere): version id WAS the
    // batch id — replay at an existing id no-ops, the next id lands
    val leg = dirOf()
    Versioned.commitAppendAt(Seq(1L).toDF("id"), leg, 0L)
    Versioned.commitAppendAt(Seq(2L).toDF("id"), leg, 1L)
    stripMarkers(leg, 0L); stripMarkers(leg, 1L)
    assert(!Versioned.commitAppendAt(Seq(99L).toDF("id"), leg, 1L))
    assert(Versioned.commitAppendAt(Seq(3L).toDF("id"), leg, 2L))
    assert(rows(leg) == Set(1L, 2L, 3L))
    // MIGRATED table (ADVICE r18, documented corollary): legacy
    // stream batches 0/1 (markerless), then the stream continues
    // marker-aware (batch 2). Replaying a PRE-migration batch id —
    // reachable only via checkpoint rollback past the migration —
    // refuses via the out-of-order rule rather than no-op replay:
    // a markerless manifest on a marker-aware table is not replay
    // evidence. Nothing dropped, nothing landed.
    val mig = dirOf()
    Versioned.commitAppendAt(Seq(1L).toDF("id"), mig, 0L)
    Versioned.commitAppendAt(Seq(2L).toDF("id"), mig, 1L)
    stripMarkers(mig, 0L); stripMarkers(mig, 1L)
    assert(Versioned.commitAppendAt(Seq(3L).toDF("id"), mig, 2L))
    val em = intercept[RuntimeException](
      Versioned.commitAppendAt(Seq(99L).toDF("id"), mig, 0L))
    assert(em.getMessage.contains("out-of-order"),
      s"wrong failure: ${em.getMessage}")
    assert(rows(mig) == Set(1L, 2L, 3L))
    // sanity: the scan never relies on reading manifests below the
    // decisive marker — a replay of the NEWEST batch stays one read
    val f = dirOf()
    (0L to 3L).foreach(i =>
      assert(Versioned.commitAppendAt(Seq(i).toDF("id"), f, i)))
    assert(!Versioned.commitAppendAt(Seq(99L).toDF("id"), f, 3L))
    assert(Versioned.read(spark, f).select(col("id")).collect()
      .map(_.getLong(0)).toSet == Set(0L, 1L, 2L, 3L))
  }

  test("vacuum keeps the newest k versions readable and makes older " +
      "reads fail loudly") {
    val dir = dirOf()
    (1L to 4L).foreach(i => Versioned.commitAppend(Seq(i).toDF("id"), dir))
    Versioned.vacuum(spark, dir, keep = 2)
    assert(Versioned.log(spark, dir).map(_._1) == Seq(2L, 3L))
    assert(rows(dir, 3) == Set(1L, 2L, 3L, 4L))
    assert(rows(dir, 2) == Set(1L, 2L, 3L))
    val e = intercept[IllegalArgumentException](rows(dir, 0))
    assert(e.getMessage.contains("no version"))
  }
}
