package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal versioned (time-travel) parquet table — the manifest-swap
  * core of a lakehouse table format (Iceberg/Delta's snapshot model,
  * re-expressed on nothing but parquet files and two atomic renames),
  * for pipelines that need "read the table AS OF the version my
  * training run started from" while writers keep appending.
  *
  * Layout under `dir`:
  *   data/<commit-uuid>/part-*.parquet   immutable data files
  *   _versions/vNNNNNNNN.txt             manifest: a `#schema` header
  *                                       (the snapshot's schema as
  *                                       JSON — additive evolution,
  *                                       no footer merging on read)
  *                                       plus one data subdir per line
  *   _latest                             pointer file: current version id
  *
  * Commit protocol:
  *   1. write the new data subdir (invisible to readers: nothing
  *      references it),
  *   2. write manifest v(N+1) to a temp name, rename into _versions
  *      with CREATE-EXCLUSIVE semantics (refuse an existing target) —
  *      the rename is both the atomicity point AND the commit lock:
  *      a second writer racing the same v(N+1) loses the rename,
  *      re-reads the winner's manifest, and retries at v(N+2), so
  *      concurrent commits serialize and neither's data is dropped,
  *   3. rename-swap the _latest pointer (a listing shortcut only —
  *      [[latestVersion]] takes the max of pointer and manifests, so
  *      an out-of-order pointer swap cannot move the table backwards).
  * A crash at ANY point leaves the table readable at vN: steps 1-2
  * leave orphans that [[vacuum]] reclaims, never a torn table. Readers
  * never list `data/` — they read exactly the subdirs their manifest
  * names, so concurrent commits and un-vacuumed orphans are invisible.
  * EXPLICIT-id commits ([[commitAppendAt]], the streaming sink) stay
  * single-writer by contract: losing the v(id) race there fails
  * loudly instead of retrying.
  *
  * Append commits reference the previous manifest's subdirs PLUS the
  * new one — at 100 TB an append costs only its delta (no rewrite, no
  * copy); replace commits reference only the new subdir (the full-
  * refresh form). [[vacuum]] deletes data subdirs referenced by NO
  * kept manifest and drops the pruned manifests — retention is the
  * caller's knob, exactly like a lakehouse VACUUM.
  */
object Versioned {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def vname(v: Long): String = f"v$v%08d.txt"

  private def readSmall(spark: SparkSession, p: Path): String = {
    val f = fs(spark, p.toString)
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }

  /** Best-effort pointer swap. The _latest pointer is ONLY a listing
    * shortcut — [[latestVersion]] takes max(pointer, manifests) — so a
    * swap that loses to a concurrent committer (delete/rename
    * interleavings on no-clobber filesystems) must NOT fail the
    * already-durable commit: a failed caller would re-append the same
    * frame as a duplicate version. Failures clean their temp and
    * return; the next successful commit heals the pointer. */
  private def writePointer(spark: SparkSession, target: Path,
      content: String): Unit = {
    val f = fs(spark, target.toString)
    val tmp = new Path(target.getParent,
      s".${target.getName}.tmp-${java.util.UUID.randomUUID()}")
    try {
      val out = f.create(tmp, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
      if (f.exists(target)) f.delete(target, false)
      f.rename(tmp, target)
    } catch {
      case _: java.io.IOException => // stale/absent pointer is harmless
    } finally {
      scala.util.Try(if (f.exists(tmp)) f.delete(tmp, false))
    }
  }

  /** Current version id: the MAX of the _latest pointer and the
    * newest manifest id. The manifests are the source of truth — a
    * crash between manifest rename and pointer swap, or two concurrent
    * committers whose pointer swaps land out of order, can leave the
    * pointer one behind; taking the max makes both harmless (the
    * pointer is only a listing shortcut, never authoritative).
    * Returns -1 on an empty table. */
  def latestVersion(spark: SparkSession, dir: String): Long = {
    val f = fs(spark, dir)
    val ptr = new Path(dir, "_latest")
    val fromPtr =
      if (f.exists(ptr))
        scala.util.Try(readSmall(spark, ptr).toLong).getOrElse(-1L)
      else -1L
    val vd = new Path(dir, "_versions")
    val fromManifests =
      if (!f.exists(vd)) -1L
      else f.listStatus(vd).map(_.getPath.getName)
        .filter(n => n.startsWith("v") && n.endsWith(".txt"))
        .map(n => n.stripPrefix("v").stripSuffix(".txt").toLong)
        .foldLeft(-1L)(math.max)
    math.max(fromPtr, fromManifests)
  }

  /** One manifest line: the data subdir plus its (immutable) per-
    * column long min/max stats — a data subdir's stats are computed
    * once at its commit and copied verbatim into every later manifest
    * that references it, exactly like the data. */
  final case class Entry(sub: String, stats: Map[String, (Long, Long)])

  private def parseLine(line: String): Entry = {
    val parts = line.split("\t")
    val stats = parts.drop(1).flatMap { s =>
      s.split(":") match {
        case Array(c, lo, hi) => Some(c -> (lo.toLong, hi.toLong))
        case _                => None
      }
    }.toMap
    Entry(parts.head, stats)
  }

  private def renderLine(e: Entry): String =
    (e.sub +: e.stats.toSeq.sortBy(_._1).map { case (c, (lo, hi)) =>
      s"$c:$lo:$hi" }).mkString("\t")

  private def manifestText(spark: SparkSession, dir: String,
      v: Long): String = {
    val p = new Path(new Path(dir, "_versions"), vname(v))
    require(fs(spark, dir).exists(p), s"no version $v at $dir")
    readSmall(spark, p)
  }

  private def manifestEntries(spark: SparkSession, dir: String,
      v: Long): Seq[Entry] =
    manifestText(spark, dir, v).split("\n").map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map(parseLine).toSeq

  /** The snapshot schema committed into the manifest's `#schema` line
    * (absent on manifests written before schema lines existed). The
    * schema rides the MANIFEST, not the parquet footers, so reading a
    * many-commit table costs zero footer merging and an old subdir
    * missing a later-added column reads as NULL (the parquet reader
    * fills requested-but-absent columns). */
  private[etl] def manifestSchema(spark: SparkSession, dir: String,
      v: Long): Option[org.apache.spark.sql.types.StructType] =
    manifestText(spark, dir, v).split("\n").map(_.trim)
      .find(_.startsWith("#schema\t"))
      .map(l => org.apache.spark.sql.types.DataType
        .fromJson(l.stripPrefix("#schema\t"))
        .asInstanceOf[org.apache.spark.sql.types.StructType])

  private def manifestDirs(spark: SparkSession, dir: String,
      v: Long): Seq[String] = manifestEntries(spark, dir, v).map(_.sub)

  /** The manifest's `#writer` header: WHICH writer committed this
    * version (`append` / `replace` / `compact` /
    * `stream-batch=<id>`). Replay detection for streaming commits
    * keys on THIS, not on the version id — a compact interleaved
    * with a stream shifts ids, and an id-based replay check would
    * silently drop the batch that lands on a compact-consumed id.
    * Absent on manifests written before writer markers existed. */
  private[etl] def writerMarker(spark: SparkSession, dir: String,
      v: Long): Option[String] =
    manifestText(spark, dir, v).split("\n").map(_.trim)
      .find(_.startsWith("#writer\t"))
      .map(_.stripPrefix("#writer\t"))

  /** Create-exclusive manifest write: temp file + a publish that
    * REFUSES an existing target — the commit lock. On HDFS/object
    * stores the publish is `rename`, which by API contract does not
    * clobber an existing destination; on the local filesystem (whose
    * POSIX rename silently overwrites) it is `link(2)` via
    * Files.createLink — atomic O_EXCL semantics, no check-then-act
    * window. Returns false when a concurrent writer already committed
    * this version id. */
  private def writeExclusive(spark: SparkSession, target: Path,
      content: String): Boolean = {
    val f = fs(spark, target.toString)
    if (f.exists(target)) false
    else {
      val tmp = new Path(target.getParent,
        s".${target.getName}.tmp-${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
      val scheme = Option(f.getUri).map(_.getScheme).orNull
      val ok =
        if (scheme == null || scheme == "file")
          try {
            java.nio.file.Files.createLink(
              java.nio.file.Paths.get(target.toUri.getPath),
              java.nio.file.Paths.get(tmp.toUri.getPath))
            true
          } catch {
            case _: java.nio.file.FileAlreadyExistsException => false
          }
        else !f.exists(target) && f.rename(tmp, target)
      // link leaves the source in place; rename leaves it on failure
      if (f.exists(tmp)) f.delete(tmp, false)
      // false must mean LOST RACE (the target exists), or the caller's
      // retry loop would spin forever re-attempting a publish the
      // filesystem keeps refusing (permissions, quota, transient
      // object-store error). Fail that mode loudly instead.
      if (!ok && !f.exists(target))
        sys.error(s"manifest publish failed with no winner at $target " +
          "— filesystem refused the rename (not a lost commit race)")
      ok
    }
  }

  private def commit(df: DataFrame, dir: String, keepPrevious: Boolean,
      statsCols: Seq[String], explicit: Option[Long] = None,
      marker: String = "append"): Long = {
    val spark = df.sparkSession
    val f = fs(spark, dir)
    val sub = s"c-${java.util.UUID.randomUUID()}"
    val subPath = new Path(new Path(dir, "data"), sub)
    df.write.mode("errorifexists")
      .option("compression", Writers.DefaultCompression)
      .parquet(subPath.toString)
    // per-column long min/max for the NEW subdir only (prior subdirs
    // keep their committed stats) — computed from the JUST-WRITTEN
    // files, not df's lineage: the manifest must describe the bytes on
    // disk even when df is non-deterministic (rand, a source that
    // changed between actions), or readPruned could skip a subdir that
    // holds matches; it also runs the input plan exactly once.
    val stats: Map[String, (Long, Long)] =
      if (statsCols.isEmpty) Map.empty
      else {
        val written = spark.read.parquet(subPath.toString)
        val aggs = statsCols.flatMap(c => Seq(
          org.apache.spark.sql.functions.min(
            org.apache.spark.sql.functions.col(c).cast("long")),
          org.apache.spark.sql.functions.max(
            org.apache.spark.sql.functions.col(c).cast("long"))))
        val r = written.agg(aggs.head, aggs.tail: _*).head
        statsCols.zipWithIndex.flatMap { case (c, i) =>
          (Option(r.get(2 * i)), Option(r.get(2 * i + 1))) match {
            case (Some(lo), Some(hi)) =>
              Some(c -> (lo.asInstanceOf[Long], hi.asInstanceOf[Long]))
            case _ => None // all-NULL column: no stats, never pruned
          }
        }.toMap
      }
    val vdir = new Path(dir, "_versions")
    if (!f.exists(vdir)) f.mkdirs(vdir)
    // the manifest rename is the COMMIT LOCK: a racing writer loses
    // the exclusive write, re-reads the winner's manifest (so the
    // winner's subdirs join its own on an append), and retries at the
    // next id — neither writer's data is ever silently dropped. An
    // EXPLICIT id (the streaming exactly-once contract) never retries:
    // losing that race is a contract violation and fails loudly.
    var committed = -1L
    while (committed < 0) {
      val prev = latestVersion(spark, dir)
      val next = explicit.getOrElse(prev + 1)
      require(prev < next,
        s"version $next is not ahead of the table's v$prev")
      val prevEntries =
        if (keepPrevious && prev >= 0) manifestEntries(spark, dir, prev)
        else Seq.empty
      // snapshot schema for the manifest header: ADDITIVE evolution —
      // an append keeps every previous field (old subdirs still hold
      // it) and adds the new frame's new fields; a same-name dataType
      // conflict fails loudly (rewriting types needs a replace).
      // Everything is marked nullable: a subdir written before a
      // column existed reads it as NULL.
      val prevSchema =
        if (keepPrevious && prev >= 0)
          manifestSchema(spark, dir, prev)
            // legacy manifest (pre-#schema): derive the previous
            // snapshot's schema from its files ONCE — ignoring it
            // would narrow the table to df.schema (silently dropping
            // prior columns) and skip the type-conflict check
            .orElse(Some(read(spark, dir, prev).schema))
        else None
      val schema = prevSchema match {
        case Some(ps) =>
          df.schema.foreach { f =>
            ps.find(_.name == f.name).foreach { pf =>
              require(pf.dataType == f.dataType,
                s"schema conflict on '${f.name}': table has " +
                  s"${pf.dataType}, commit has ${f.dataType}")
            }
          }
          val have = ps.fieldNames.toSet
          org.apache.spark.sql.types.StructType(
            ps.fields ++ df.schema.fields.filterNot(f => have(f.name)))
        case None => df.schema
      }
      val nullable = org.apache.spark.sql.types.StructType(
        schema.fields.map(_.copy(nullable = true)))
      val manifest =
        (Seq(s"#schema\t${nullable.json}", s"#writer\t$marker") ++
          (prevEntries :+ Entry(sub, stats)).map(renderLine))
          .mkString("\n")
      if (writeExclusive(spark, new Path(vdir, vname(next)), manifest))
        committed = next
      else if (explicit.isDefined)
        sys.error(s"concurrent commit: version $next already exists at " +
          s"$dir — explicit-id commits (streaming sink, compact) refuse " +
          "to retry; re-run against the new latest")
    }
    writePointer(spark, new Path(dir, "_latest"), committed.toString)
    committed
  }

  /** Append `df` as a new version (previous versions' files are
    * referenced, never rewritten). `statsCols` names long-castable
    * columns whose min/max land in the manifest for [[readPruned]]'s
    * subdir skipping. Returns the new version id. */
  def commitAppend(df: DataFrame, dir: String,
      statsCols: Seq[String] = Seq.empty): Long =
    commit(df, dir, keepPrevious = true, statsCols, marker = "append")

  /** Replace the table contents with `df` as a new version (old
    * versions stay readable until vacuumed). */
  def commitReplace(df: DataFrame, dir: String,
      statsCols: Seq[String] = Seq.empty): Long =
    commit(df, dir, keepPrevious = false, statsCols, marker = "replace")

  /** Idempotent append for a Structured Streaming micro-batch,
    * identified by its BATCH id. The manifest rename is the commit
    * point; the manifest records `#writer stream-batch=<id>`, and
    * replay detection keys on that MARKER, not on the version id:
    * maintenance commits (compact, a manual append) interleaved with
    * the stream consume version ids, so the batch's version is
    * `max(batchId, latest+1)` — always >= batchId, which bounds the
    * replay scan to manifests [batchId, latest]. A crash-replayed
    * batch finds its marker durable and becomes a no-op (returns
    * false; the pointer is healed if the crash hit between manifest
    * and pointer swap); a batch whose id was consumed by a compact
    * commits at the next free id instead of being silently dropped.
    * A replay that crashed BEFORE the manifest landed leaves only an
    * orphan data subdir (vacuum reclaims it) and recommits cleanly.
    * Single stream writer, monotone batch ids (the micro-batch
    * contract).
    *
    * The replay scan walks manifests from LATEST downward and STOPS at
    * the first stream-batch marker whose id is <= this batch: batch
    * ids are monotone in commit order (single writer), so that marker
    * decides — equal = replay, smaller = genuinely new (and a larger
    * NEWEST marker over a non-replay is an out-of-order rewrite,
    * refused loudly). The normal path — committing the next batch, or
    * crash-replaying the newest — therefore reads O(commits since the
    * last stream batch), typically ONE manifest, not O(every
    * maintenance commit the table ever took), which on an object store
    * would grow each micro-batch's exists+read RPC count without bound
    * over a long-lived stream; only a replay of an OLDER batch walks
    * deeper, down to that batch's own marker.
    *
    * Pre-marker LEGACY tables (manifests with no `#writer` header,
    * where the version id WAS the batch id) are honored ONLY when the
    * table holds no marker manifests at all — on a marker-aware table a
    * markerless manifest is a plain pre-marker append, and treating an
    * id collision with it as "already committed" would silently drop a
    * fresh stream's batch (new checkpoint restarting at 0 against a
    * legacy table); that collision fails loudly instead.
    *
    * Corollary (deliberate, pinned in VersionedSpec): on a legacy
    * table MIGRATED mid-stream (markerless manifests below, marker
    * commits above), replaying a PRE-marker-era batch id — reachable
    * only via checkpoint rollback past the migration point — does not
    * no-op as it would have before the migration; it trips the
    * out-of-order refusal above, because a markerless manifest on a
    * marker-aware table is not replay evidence (previous paragraph)
    * and the batch id sits behind the newest marker. Roll the
    * checkpoint forward past the migration point (or re-land the data
    * as a fresh batch id); silent drop is never on the menu. */
  def commitAppendAt(df: DataFrame, dir: String, version: Long,
      statsCols: Seq[String] = Seq.empty): Boolean = {
    val spark = df.sparkSession
    val f = fs(spark, dir)
    val vdir = new Path(dir, "_versions")
    val marker = s"stream-batch=$version"
    val latest = latestVersion(spark, dir)
    var replayed = false
    var newestBatch = -1L // newest committed stream batch id (1st found)
    var sawMarked = false // any marker-era manifest seen in the scan
    var legacyAtId = false // markerless manifest at exactly v==version
    var legacyNewest = -1L // newest markerless id treated as a batch id
    // downward scan, stopping at the first stream marker whose batch
    // id is <= this batch: monotone batch ids make that decisive
    // (== replay, < genuinely-new), so the NORMAL path reads exactly
    // the manifests since the last stream batch; markers ABOVE the
    // batch id only occur on an old-batch replay, where the scan
    // keeps walking down to that batch's own marker
    var v = latest
    var stop = false
    while (v >= 0 && !stop) {
      if (f.exists(new Path(vdir, vname(v))))
        writerMarker(spark, dir, v) match {
          case Some(m) if m.startsWith("stream-batch=") =>
            val b = m.stripPrefix("stream-batch=").toLong
            if (newestBatch < 0) newestBatch = b // the table's newest
            sawMarked = true
            if (b == version) { replayed = true; stop = true }
            else if (b < version) stop = true
          case Some(_) => sawMarked = true // maintenance: consumed an id
          case None =>
            if (v == version) legacyAtId = true
            else if (v > version) legacyNewest = math.max(legacyNewest, v)
        }
      v -= 1
    }
    if (!replayed && newestBatch < 0 && legacyAtId) {
      // no stream marker anywhere the scan reached: pre-marker layout
      // applies only on a TRUE legacy table (no marker manifests at
      // all); a markerless id collision on a marker-aware table is a
      // foreign commit, never replay evidence
      require(!sawMarked,
        s"batch $version collides with a markerless (pre-#writer) " +
          s"manifest v$version at $dir, but the table also holds " +
          "marker-era commits — cannot distinguish a legacy replay " +
          "from a foreign append; refusing to silently drop the batch")
      replayed = true
    } else if (newestBatch < 0 && !sawMarked)
      newestBatch = legacyNewest // pure legacy: version id was batch id
    if (replayed) {
      // already committed: heal the pointer if a crash left it behind
      if (latest >= 0) writePointer(spark, new Path(dir, "_latest"),
        latest.toString)
      false
    } else {
      // a NON-replay batch behind an already-committed batch is not
      // maintenance interleaving — it is out-of-order history rewrite
      // (checkpoint corruption, two streams on one table): fail loudly
      require(newestBatch < version,
        s"batch $version is not ahead of the table's newest committed " +
          s"stream batch $newestBatch at $dir — out-of-order non-replay " +
          "commit refused (single stream writer, monotone batch ids)")
      commit(df, dir, keepPrevious = true, statsCols,
        explicit = Some(math.max(version, latest + 1)), marker = marker)
      true
    }
  }

  /** Read the table at `version` (negative = latest). Readers touch
    * only the subdirs the manifest names — never a data/ listing —
    * and take the SNAPSHOT SCHEMA from the manifest (no footer
    * merging; subdirs predating a later-added column read it as
    * NULL — additive schema evolution, each retained version keeping
    * ITS OWN schema for time travel). */
  def read(spark: SparkSession, dir: String, version: Long = -1L): DataFrame = {
    val v = if (version < 0) latestVersion(spark, dir) else version
    require(v >= 0, s"empty versioned table at $dir")
    val dirs = manifestDirs(spark, dir, v)
      .map(sub => new Path(new Path(dir, "data"), sub).toString)
    manifestSchema(spark, dir, v) match {
      case Some(schema) => spark.read.schema(schema).parquet(dirs: _*)
      case None         => spark.read.parquet(dirs: _*)
    }
  }

  /** Rewrite the CURRENT snapshot as one consolidated data subdir,
    * committed as a new version — the table-level small-files compact
    * (a long-lived append table accretes one subdir per commit; this
    * folds them without losing time travel: older versions stay
    * readable until [[vacuum]]). Cost is one full snapshot
    * read+write — O(table), the price every lakehouse compact pays —
    * so run it on the cadence the subdir count demands, not per
    * commit.
    *
    * Commits at EXACTLY read-version + 1: a concurrent commit landing
    * mid-compact makes the exclusive write fail LOUDLY (retry the
    * compact), because a replace-retry here would silently replay the
    * stale pre-append snapshot and drop the racer's rows — compaction
    * is maintenance and must never supersede data. Safe to run against
    * a [[graft.streaming.StreamingVtable]]-ingested table: the compact
    * consumes a version id, but the stream's replay detection keys on
    * its `#writer stream-batch=<id>` marker, so the next micro-batch
    * lands at the next free id instead of being mistaken for a replay.
    * Returns the new version id. */
  def compact(spark: SparkSession, dir: String,
      statsCols: Seq[String] = Seq.empty): Long = {
    val v = latestVersion(spark, dir)
    require(v >= 0, s"empty versioned table at $dir")
    commit(read(spark, dir, v), dir, keepPrevious = false, statsCols,
      explicit = Some(v + 1), marker = "compact")
  }

  /** Manifest-level data skipping: read only the subdirs whose
    * committed [min, max] for `col` intersects [lo, hi] — the
    * lakehouse skip a flat parquet dir cannot do (parquet row-group
    * stats prune WITHIN a file; this prunes whole commits before any
    * footer is opened). Subdirs without stats for `col` are always
    * read (never an incorrect skip), and the predicate is re-applied
    * to the surviving rows, so the result is exactly
    * `read(...).filter(lo <= col <= hi)` regardless of stats
    * coverage. Returns (pruned DataFrame, subdirs read, subdirs
    * skipped). */
  def readPruned(spark: SparkSession, dir: String, colName: String,
      lo: Long, hi: Long, version: Long = -1L): (DataFrame, Int, Int) = {
    val v = if (version < 0) latestVersion(spark, dir) else version
    require(v >= 0, s"empty versioned table at $dir")
    val entries = manifestEntries(spark, dir, v)
    val (keep, skip) = entries.partition { e =>
      e.stats.get(colName) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None           => true
      }
    }
    val c = org.apache.spark.sql.functions.col(colName)
    val df =
      if (keep.isEmpty)
        read(spark, dir, v).filter(org.apache.spark.sql.functions.lit(false))
      else {
        val base = manifestSchema(spark, dir, v) match {
          case Some(schema) => spark.read.schema(schema)
          case None         => spark.read
        }
        base.parquet(keep.map(e =>
            new Path(new Path(dir, "data"), e.sub).toString): _*)
          .filter(c.cast("long") >= lo && c.cast("long") <= hi)
      }
    (df, keep.size, skip.size)
  }

  /** (version, n_data_dirs) log, oldest first. */
  def log(spark: SparkSession, dir: String): Seq[(Long, Int)] = {
    val f = fs(spark, dir)
    val vd = new Path(dir, "_versions")
    if (!f.exists(vd)) Seq.empty
    else f.listStatus(vd).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".txt"))
      .map(n => n.stripPrefix("v").stripSuffix(".txt").toLong)
      .sorted.map(v => v -> manifestDirs(spark, dir, v).size).toSeq
  }

  /** Keep the newest `keep` versions: delete older manifests, then
    * every data subdir no kept manifest references (which also
    * reclaims orphans from crashed commits). Returns (versions
    * dropped, data dirs deleted). Runs under the single-writer
    * contract — like compact, not concurrent with a commit. */
  def vacuum(spark: SparkSession, dir: String, keep: Int): (Int, Int) = {
    require(keep >= 1, "must keep at least the latest version")
    val f = fs(spark, dir)
    val versions = log(spark, dir).map(_._1)
    val (drop, hold) = versions.splitAt(math.max(0, versions.size - keep))
    val keptDirs = hold.flatMap(manifestDirs(spark, dir, _)).toSet
    drop.foreach(v =>
      f.delete(new Path(new Path(dir, "_versions"), vname(v)), false))
    val dataDir = new Path(dir, "data")
    val gone =
      if (!f.exists(dataDir)) 0
      else f.listStatus(dataDir).map(_.getPath)
        .filter(p => !keptDirs.contains(p.getName))
        .map { p => f.delete(p, true); 1 }.sum
    (drop.size, gone)
  }
}
