package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sinks (SURVEY.md §2A OP-05/06/07).
  *
  * The reference writes one Brotli parquet file per table
  * (`notebooks/preprocessing_with_polars.ipynb:4036-4042`) and routes
  * ingested files under `{prefix}/{YYYY}/{MM}/{DD}/`
  * (`lambda_handler.py:273,280-281`). Spark-side: zstd parquet (brotli
  * codec jar absent in this image — declared deviation, SURVEY §7.4) and
  * `partitionBy` on a derived ingest_date column. Multipart/commit
  * mechanics (OP-02/03) are Hadoop committer territory — configured, not
  * reimplemented.
  */
object Writers {

  val DefaultCompression = "zstd"

  /** OP-02/03: the reference's hand-rolled S3 multipart protocol
    * (create -> buffered >=5 MB parts -> complete, abort on error) maps to
    * Hadoop S3A's transparent multipart + the job-commit protocol. These
    * are the settings that reproduce the reference's tuning
    * (S3_PART_MB=50, abort-on-error, magic committer for atomic commits
    * without rename): apply via `SparkSession.builder.config(...)` or
    * core-site when the warehouse is s3a://.
    */
  val s3aMultipartConf: Map[String, String] = Map(
    "spark.hadoop.fs.s3a.multipart.size" -> (50L * 1024 * 1024).toString,
    "spark.hadoop.fs.s3a.multipart.purge" -> "true",
    "spark.hadoop.fs.s3a.committer.name" -> "magic",
    "spark.sql.sources.commitProtocolClass" ->
      "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol",
    "spark.sql.parquet.output.committer.class" ->
      "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter")

  /** OP-05: compressed parquet sink. */
  def parquet(df: DataFrame, path: String,
      compression: String = DefaultCompression): Unit =
    df.write.mode("overwrite")
      .option("compression", compression)
      .parquet(path)

  /** OP-07: dated partition layout — one partition dir per ingest date
    * (UTC, from the session timezone pinned in Session). Readers prune
    * on ingest_date for free (partition pruning).
    */
  def datePartitioned(df: DataFrame, path: String,
      compression: String = DefaultCompression): Unit =
    df.withColumn("ingest_date", current_date())
      .write.mode("append")
      .option("compression", compression)
      .partitionBy("ingest_date")
      .parquet(path)

  /** OP-06: quarantine/audit sink — same parquet path shape as the
    * reference's `problematic_rows.parquet`, kept separate from the
    * optimized output so the cleaning step leaves an audit trail.
    */
  def quarantine(df: DataFrame, path: String): Unit =
    parquet(df, path)

  /** The deterministic pseudorandom ordering key behind
    * [[shuffledShards]]: 60 bits of md5(id || seed) as a long — the
    * repo's salted-md5 convention (q59/q67/q81), so any engine (and the
    * DuckDB oracle, q90) reproduces the identical shuffle from the ids
    * alone. No RNG, no state: re-running the export on any cluster
    * layout yields the same shard membership and the same within-shard
    * order.
    */
  def shuffleKey(idCol: org.apache.spark.sql.Column,
      seed: String = ":shuf"): org.apache.spark.sql.Column =
    conv(substring(md5(concat(idCol.cast("string"), lit(seed))), 1, 15),
      16, 10).cast("long")

  /** Rendezvous (highest-random-weight) shard assignment (Thaler &
    * Ravishankar 1998): shard = argmax over s < n of md5(id ++ ":hrw:"
    * ++ s). Unlike [[shuffledShards]]'s mod-hash (where growing the
    * shard count remaps ~(1 − 1/new) of the corpus), HRW moves ONLY the
    * rows whose new-shard weight beats their old max — expected
    * (new − old)/new, and every moved row lands in a NEW shard;
    * surviving shards never exchange rows (q207 reports both policies'
    * movement side by side; EtlSpec pins the invariant). The weight is
    * the hex md5 compared lexicographically — identical in any engine,
    * so membership is a pure function of (id, n), no ring state to
    * store or replicate. Ties (md5 collisions) break to the larger
    * shard id; cost is n hashes per row, map-side, no shuffle.
    */
  def hrwShard(id: org.apache.spark.sql.Column,
      n: Int): org.apache.spark.sql.Column = {
    require(n >= 1, s"need at least one shard, got $n")
    val scored = transform(sequence(lit(0), lit(n - 1)), s =>
      struct(
        md5(concat(id.cast("string"), lit(":hrw:"), s.cast("string")))
          .as("w"),
        s.cast("int").as("shard")))
    sort_array(scored, asc = false)(0).getField("shard")
  }

  /** Reshard-movement report (q207, `reshard` CLI): per (policy,
    * new_shard), the population and how many rows change shard when
    * the count grows `oldN` → `newN`, under mod-hash ([[shuffledShards]]'s
    * layout, via [[shuffleKey]]) vs rendezvous ([[hrwShard]]) side by
    * side. One id-only columnar scan; both policies are computed in
    * the same map-side projection (explode of a 2-element array — no
    * second scan, no join); the exchange carries ≤ 2 × newN rows.
    */
  def reshardReport(df: DataFrame, idCol: String,
      oldN: Int, newN: Int): DataFrame = {
    val h = shuffleKey(col(idCol))
    df.select(
        explode(array(
          struct(lit("mod").as("policy"),
            pmod(h, lit(oldN)).cast("int").as("old_shard"),
            pmod(h, lit(newN)).cast("int").as("new_shard")),
          struct(lit("hrw").as("policy"),
            hrwShard(col(idCol), oldN).as("old_shard"),
            hrwShard(col(idCol), newN).as("new_shard"))))
          .as("m"))
      .select(col("m.policy").as("policy"),
        col("m.old_shard").as("old_shard"),
        col("m.new_shard").as("new_shard"))
      .groupBy(col("policy"), col("new_shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("old_shard") =!= col("new_shard")).cast("long"))
          .as("n_moved"))
      .orderBy(col("policy"), col("new_shard"))
  }

  /** Shuffled-shard training-data export — the last step of the curation
    * funnel: write the corpus in a deterministic pseudorandom order,
    * split into `shards` files a trainer can stream round-robin.
    *
    * shard = hash % shards (membership is a pure function of the id, so
    * it survives re-runs, engine changes, and corpus re-partitioning);
    * within a shard, rows sort by (hash, id). `repartition(col(shard))`
    * puts each shard's rows in exactly one task, so the dynamic
    * partition write emits one file per shard and the local sort IS the
    * file order. 100 TB shape: one map pass + one exchange hash-keyed on
    * the uniform shard id (no skew, no range-boundary sampling job, no
    * global sort); shard count bounds file size, not memory — the local
    * sort spills if a shard outgrows a task.
    */
  def shuffledShards(df: DataFrame, idCol: String, path: String,
      shards: Int, seed: String = ":shuf",
      compression: String = DefaultCompression): Unit = {
    require(shards >= 1, s"need at least one shard, got $shards")
    df.withColumn("__h", shuffleKey(col(idCol), seed))
      .withColumn("shard", pmod(col("__h"), lit(shards)).cast("int"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("__h"), col(idCol))
      .drop("__h")
      .write.mode("overwrite")
      .option("compression", compression)
      .partitionBy("shard")
      .parquet(path)
  }

  /** Per-shard MANIFEST of a [[shuffledShards]] export: (shard, n_rows,
    * content_sig) with the signature an ORDER-INDEPENDENT sum of
    * xxhash64(id) — two exports carry the same manifest iff every shard
    * holds the same id set, regardless of file layout or row order.
    * The reproducibility receipt a training run stores next to the
    * data: re-running the manifest after any re-shard/compaction/copy
    * verifies content identity in one scan, without a row-level diff.
    * (Engine-specific hash — verified behaviorally, like the other
    * xxhash64 surfaces.)
    */
  def shardManifest(spark: org.apache.spark.sql.SparkSession, dir: String,
      idCol: String = "doc_id"): DataFrame =
    spark.read.parquet(dir)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(xxhash64(col(idCol))).as("content_sig"))
      .orderBy(col("shard"))

  /** Write the manifest beside the export (underscore path: ignored by
    * parquet dir scans, the _SUCCESS convention). */
  def writeShardManifest(spark: org.apache.spark.sql.SparkSession,
      dir: String, idCol: String = "doc_id"): Unit =
    shardManifest(spark, dir, idCol).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/_manifest")

  /** Compact a parquet directory's accumulated small files into
    * ~`targetMB` outputs — the maintenance step every streaming append
    * sink (Incremental, StreamingDedup) eventually needs: micro-batches
    * write a few small files each, and at 100 TB a scan's task count and
    * footer-read overhead are driven by FILE count, not byte count.
    *
    * Output file count = ceil(current bytes / targetMB), rows preserved.
    * The swap is write-to-temp + rename-aside + rename-in (the
    * [[upsert]] scheme: a crash at any point leaves a complete readable
    * copy under `dir`, `.compact-old`, or `.compact-tmp`); on object
    * stores run it against a quiesced table or use a table format with
    * commit logs — the compaction itself is the same coalesce+write.
    * Refuses PARTITIONED layouts: reading them through
    * `spark.read.parquet(dir)` would fold the partition columns into
    * the data files and flatten the layout — use [[compactFiles]],
    * which compacts partition-by-partition.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
      targetMB: Int = 512): Int = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = partitionDirs(fs, path)
    require(parts.isEmpty,
      s"compact: $dir holds partition directories (${parts.take(3)
        .mkString(", ")}…) — in-place compaction would flatten the " +
        "layout; use compactFiles, which preserves it partition-by-" +
        "partition")
    val bytes = fs.getContentSummary(path).getLength
    val n = math.max(1, math.ceil(bytes / (targetMB * 1024.0 * 1024.0)).toInt)
    val tmp = new org.apache.hadoop.fs.Path(dir + ".compact-tmp")
    spark.read.parquet(dir)
      // coalesce, not repartition: a narrow concat of input partitions —
      // compaction has no reason to pay a full re-exchange of the table
      // (same rule as [[compactFiles]], the to-a-new-dir sibling)
      .coalesce(n)
      .write.mode("overwrite")
      .option("compression", DefaultCompression)
      .parquet(tmp.toString)
    // guarantee the completeness marker compactRecover keys off (same
    // rule as upsertInto — the write just returned, so the stage IS
    // complete even if the committer skips markers)
    val cMarker = new org.apache.hadoop.fs.Path(tmp, "_SUCCESS")
    if (!fs.exists(cMarker)) fs.createNewFile(cMarker)
    val old = new org.apache.hadoop.fs.Path(dir + ".compact-old")
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(path, old))
      throw new java.io.IOException(s"compact: rename $path -> $old failed")
    if (!fs.rename(tmp, path)) {
      fs.rename(old, path)
      throw new java.io.IOException(s"compact: rename $tmp -> $path failed")
    }
    fs.delete(old, true)
    n
  }

  /** Compact a BUCKETED external table's accumulated small files,
    * preserving the bucket layout (a plain [[compact]] would strip the
    * bucket ids from the file names and silently demote every later
    * bucketed join to a re-shuffle). Crash-safe: the compacted copy is
    * written beside the original first — reading the old table while
    * writing a new one needs no snapshot — then swapped in with
    * directory renames, so a complete copy of the data exists on disk
    * at every instant (the old dir survives as `<path>.__pre_compact`
    * until the swap completes). The catalog entry is re-created over
    * the swapped files via DDL, as EXTERNAL (a managed input becomes
    * external at its same location). Returns the new file count.
    *
    * Callers must quiesce writers to the table first — see
    * [[graft.streaming.StreamingCuration.compactState]]'s lock for the
    * streaming case. As a backstop against a writer that slipped past
    * that contract, the table dir's file listing is re-verified
    * immediately before the swap: if it changed since the snapshot
    * read, the compaction ABORTS loudly (temp copy deleted, original
    * untouched) instead of silently dropping the concurrent append.
    *
    * Crash recovery — what survives at each step and how to resume:
    *  - during step 1 (temp write): the original table and its files
    *    are untouched; delete `<path>__compact_tmp` and the
    *    `<table>_compact_tmp` catalog entry, re-run.
    *  - between the DROPs and the first rename: all data still at
    *    `path`, but no catalog entry — re-register with
    *    [[registerBucketedTable]] (or the DDL in its doc), then re-run.
    *  - between the two renames: the original is at
    *    `<path>.__pre_compact` and the compacted copy at
    *    `<path>__compact_tmp` — rename either back to `path`, then
    *    re-register.
    *  - after the swap, before the CREATE: compacted data is live at
    *    `path` with no catalog entry — just re-register (done; a
    *    re-run would also work).
    */
  /** Latest-wins UPSERT (merge-on-write, SCD type 1) without a table
    * format: after the merge exactly one row per key survives — the one
    * with the highest `versionCol` across the existing table and the
    * incoming delta, the delta winning version ties (the newest write
    * is the truth a CDC feed expects). Replaying the same delta is a
    * no-op by construction.
    *
    * Swap + crash guarantee (exact, r12 verdict #3): the merged table
    * is staged at `<dir>.upsert-tmp`, the original renamed aside to
    * `<dir>.upsert-old`, the staged copy renamed in, then the old copy
    * deleted. Readers CAN observe a brief no-table-at-`dir` window —
    * two metadata renames wide, not a recursive delete wide — and a
    * crash at ANY point leaves at least one complete, readable copy of
    * the table on disk under a deterministic name:
    *  - before the first rename: original at `dir` (tmp is garbage);
    *  - between the renames: old data at `.upsert-old` AND merged data
    *    at `.upsert-tmp`;
    *  - after the second rename: merged data live at `dir`
    *    (`.upsert-old` garbage).
    * [[upsertRecover]] inspects those states and restores a readable
    * table at `dir` (preferring the merged copy); ExportSpec walks
    * every interleaving point through it. On a true object store,
    * rename is copy+delete — use a commit-log table format there; the
    * merge reduction carries over unchanged.
    *
    * Scale shape: the keep-latest reduction is ONE exchange on the key
    * and a per-key top-1 (the TopKPerKey rewrite turns the filtered
    * row_number into bounded map-side heaps — no full per-key sort).
    * The rewrite itself is table-sized: at 100 TB use
    * [[upsertPartitioned]] against the dated layout — it merges and
    * swaps only the partitions the delta touches — or move to a
    * commit-log table format; the merge reduction carries over
    * unchanged in both.
    *
    * Returns the merged row count.
    */
  def upsert(spark: org.apache.spark.sql.SparkSession, dir: String,
      delta: DataFrame, keyCols: Seq[String], versionCol: String,
      compression: String = DefaultCompression): Long =
    upsertInto(spark, new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + ".upsert-tmp"),
      new org.apache.hadoop.fs.Path(dir + ".upsert-old"),
      delta, keyCols, versionCol, compression)

  /** The merge + rename-aside swap core shared by [[upsert]] (tmp/old
    * beside the table dir) and [[upsertPartitioned]] (tmp/old as
    * dot-prefixed SIBLINGS inside the table root, hidden from readers).
    */
  private def upsertInto(spark: org.apache.spark.sql.SparkSession,
      path: org.apache.hadoop.fs.Path, tmp: org.apache.hadoop.fs.Path,
      old: org.apache.hadoop.fs.Path, delta: DataFrame,
      keyCols: Seq[String], versionCol: String,
      compression: String): Long = {
    import org.apache.spark.sql.expressions.Window
    require(keyCols.nonEmpty, "upsert: at least one key column")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val incoming = delta.withColumn("_src", lit(1))
    val merged =
      if (fs.exists(path))
        spark.read.parquet(path.toString).withColumn("_src", lit(0))
          .unionByName(incoming)
      else incoming
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col("_src").desc)
    val kept = merged
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_src")
    kept.write.mode("overwrite")
      .option("compression", compression)
      .parquet(tmp.toString)
    // recovery keys "stage is complete" off the _SUCCESS marker; the
    // write above just returned, so the stage IS complete — stamp the
    // marker ourselves if the committer was configured not to
    // (mapreduce.fileoutputcommitter.marksuccessfuljobs=false would
    // otherwise make upsertRecover discard a complete merged copy,
    // ADVICE r13)
    val marker = new org.apache.hadoop.fs.Path(tmp, "_SUCCESS")
    if (!fs.exists(marker)) fs.createNewFile(marker)
    val n = spark.read.parquet(tmp.toString).count()
    // rename-aside swap: never delete before the replacement is in
    // place — see the crash-state table in the Scaladoc
    if (fs.exists(old)) fs.delete(old, true)
    val hadTable = fs.exists(path)
    if (hadTable && !fs.rename(path, old))
      throw new java.io.IOException(s"upsert: rename $path -> $old failed")
    if (!fs.rename(tmp, path)) {
      // restore the original before failing — no state is lost
      if (hadTable) fs.rename(old, path)
      throw new java.io.IOException(s"upsert: rename $tmp -> $path failed")
    }
    if (hadTable) fs.delete(old, true)
    n
  }

  /** PARTITION-SCOPED [[upsert]] (r13 verdict #4): against a
    * hive-layout table (`dir/partCol=value/...`, the OP-07 dated
    * layout), merge + swap ONLY the partitions the delta touches —
    * untouched partitions' files are never read, never rewritten, and
    * stay byte-identical (EtlSpec pins it). This is the 100 TB form:
    * [[upsert]]'s whole-table rewrite costs the full corpus per delta,
    * this costs only the touched partitions (for a dated CDC feed,
    * typically today's).
    *
    * Contract:
    *  - `partCol` is the table's physical partition column and must be
    *    carried by the delta; its values must be non-null and render as
    *    safe dir names (`[A-Za-z0-9._-]+` — dates, hours, shard ids).
    *  - Keys never MIGRATE partitions: a delta row upserts the key
    *    within the partition the row itself carries. If the same key
    *    can legitimately appear under different partition values over
    *    time (partCol not functionally dependent on the key), this
    *    operator would keep both rows — use the table-wide [[upsert]]
    *    (or a commit-log table format) there.
    *
    * Crash safety is [[upsert]]'s rename-aside per partition, with the
    * staging dirs as DOT-PREFIXED siblings inside the table root
    * (`.upsert-tmp-partCol=v` / `.upsert-old-partCol=v`): hidden dirs
    * are skipped by Spark/Hadoop file listings, so a reader scanning
    * the whole table mid-upsert never double-counts a staged copy, and
    * a crash leaves every untouched partition live plus a complete
    * copy of the in-flight one under a deterministic hidden name —
    * [[upsertRecoverPartitions]] restores it. Partitions are processed
    * sequentially; a mid-sequence crash leaves earlier partitions
    * merged (each delta partition's merge is idempotent — replaying
    * the same delta is a no-op, so re-running after recovery is safe).
    *
    * Returns the merged row count across touched partitions.
    */
  def upsertPartitioned(spark: org.apache.spark.sql.SparkSession,
      dir: String, delta: DataFrame, partCol: String, keyCols: Seq[String],
      versionCol: String,
      compression: String = DefaultCompression): Long = {
    require(keyCols.nonEmpty, "upsertPartitioned: at least one key column")
    require(!keyCols.contains(partCol) && versionCol != partCol,
      s"upsertPartitioned: $partCol is the partition column")
    require(delta.columns.contains(partCol),
      s"upsertPartitioned: delta must carry $partCol")
    // touched partitions: bounded by the delta's distinct partition
    // values (a dated feed touches a handful), never the table's
    val touched = delta.select(col(partCol).cast("string").as("p"))
      .distinct().collect().map(r => Option(r.getString(0)))
    val safe = "[A-Za-z0-9._-]+".r
    touched.foreach { p =>
      require(p.exists(v => safe.pattern.matcher(v).matches()),
        s"upsertPartitioned: partition value ${p.orNull} is not a safe " +
          "dir name — NULL or characters needing hive escaping; route " +
          "those rows through the table-wide upsert")
    }
    touched.map { p =>
      val part = s"$partCol=${p.get}"
      val slice = delta
        .filter(col(partCol).cast("string") === p.get).drop(partCol)
      upsertInto(spark,
        new org.apache.hadoop.fs.Path(dir, part),
        new org.apache.hadoop.fs.Path(dir, s".upsert-tmp-$part"),
        new org.apache.hadoop.fs.Path(dir, s".upsert-old-$part"),
        slice, keyCols, versionCol, compression)
    }.sum
  }

  /** Restore a readable table at `dir` after a crashed [[upsert]]:
    * prefers the staged MERGED copy (`.upsert-tmp`), falls back to
    * the set-aside original (`.upsert-old`), and clears whichever
    * leftovers remain. Returns the state it found:
    * "clean" (table present, no leftovers), "promoted-tmp",
    * "restored-old", or "missing" (no copy anywhere — nothing staged
    * before the crash and no table existed).
    *
    * "Stage is complete" is keyed off the `_SUCCESS` marker. [[upsert]]
    * guarantees the marker on its own stages (it stamps one if the
    * committer was configured with
    * `mapreduce.fileoutputcommitter.marksuccessfuljobs=false` — ADVICE
    * r13); a marker-less tmp dir is therefore always a TORN stage and
    * is discarded in favor of the set-aside original.
    */
  def upsertRecover(spark: org.apache.spark.sql.SparkSession,
      dir: String): String =
    recoverSwap(spark, new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + ".upsert-tmp"),
      new org.apache.hadoop.fs.Path(dir + ".upsert-old"))

  /** [[upsertRecover]]'s sibling for a crashed in-place [[compact]],
    * whose swap leaves the same two-suffix states (`.compact-tmp` /
    * `.compact-old` — ADVICE r13: the window existed with no recover
    * counterpart). Same preference order: a COMPLETE compacted copy is
    * promoted, else the set-aside original is restored.
    */
  def compactRecover(spark: org.apache.spark.sql.SparkSession,
      dir: String): String =
    recoverSwap(spark, new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + ".compact-tmp"),
      new org.apache.hadoop.fs.Path(dir + ".compact-old"))

  /** Recover every partition of a hive-layout table after a crashed
    * [[upsertPartitioned]]: scans the table root for the dot-prefixed
    * staging leftovers (`.upsert-tmp-partCol=v` / `.upsert-old-…`) and
    * runs the swap recovery per touched partition. Returns
    * (partition dir name → state) for every partition that had
    * leftovers — empty map means the table was clean.
    */
  def upsertRecoverPartitions(spark: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, String] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Map.empty
    val names = fs.listStatus(root).toSeq.map(_.getPath.getName)
    val touched = names.collect {
      case n if n.startsWith(".upsert-tmp-") =>
        n.stripPrefix(".upsert-tmp-")
      case n if n.startsWith(".upsert-old-") =>
        n.stripPrefix(".upsert-old-")
    }.distinct
    touched.map { part =>
      part -> recoverSwap(spark,
        new org.apache.hadoop.fs.Path(root, part),
        new org.apache.hadoop.fs.Path(root, s".upsert-tmp-$part"),
        new org.apache.hadoop.fs.Path(root, s".upsert-old-$part"))
    }.toMap
  }

  private def recoverSwap(spark: org.apache.spark.sql.SparkSession,
      path: org.apache.hadoop.fs.Path, tmp: org.apache.hadoop.fs.Path,
      old: org.apache.hadoop.fs.Path): String = {
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def complete(p: org.apache.hadoop.fs.Path): Boolean =
      fs.exists(p) && fs.exists(
        new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
    if (fs.exists(path)) {
      if (fs.exists(tmp)) fs.delete(tmp, true)
      if (fs.exists(old)) fs.delete(old, true)
      "clean"
    } else if (complete(tmp)) {
      if (!fs.rename(tmp, path))
        throw new java.io.IOException(s"recover: rename $tmp -> $path failed")
      if (fs.exists(old)) fs.delete(old, true)
      "promoted-tmp"
    } else if (fs.exists(old)) {
      if (fs.exists(tmp)) fs.delete(tmp, true) // incomplete stage
      if (!fs.rename(old, path))
        throw new java.io.IOException(s"recover: rename $old -> $path failed")
      "restored-old"
    } else "missing"
  }

  def compactBucketedTable(spark: org.apache.spark.sql.SparkSession,
      table: String, path: String, keyCol: String, buckets: Int,
      compression: String = DefaultCompression): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.catalog.refreshTable(table)
    val snap = spark.table(table)
    val schemaDdl = snap.schema.toDDL
    val tmpTbl = s"${table}_compact_tmp"
    val tmpPath = new org.apache.hadoop.fs.Path(path + "__compact_tmp")
    spark.sql(s"DROP TABLE IF EXISTS `$tmpTbl`")
    if (fs.exists(tmpPath)) fs.delete(tmpPath, true)
    val listing0 = dataListing(fs, p)
    // 1. durable compacted copy beside the original (a bucketed scan
    // yields one partition per bucket, so the write emits one file per
    // bucket without an extra repartition)
    snap.write.mode("overwrite")
      .option("compression", compression)
      .option("path", tmpPath.toString)
      .bucketBy(buckets, keyCol).sortBy(keyCol)
      .format("parquet")
      .saveAsTable(tmpTbl)
    // concurrent-writer backstop: the temp copy was derived from the
    // listing as of `listing0`; any change since means an append raced
    // the compaction and the swap could drop its files — abort with the
    // original intact rather than lose data
    val listing1 = dataListing(fs, p)
    if (listing0 != listing1) {
      spark.sql(s"DROP TABLE IF EXISTS `$tmpTbl`")
      fs.delete(tmpPath, true)
      throw new IllegalStateException(
        s"compact: $path changed while the compacted copy was being " +
          "written (a concurrent append?) — aborting with the original " +
          "table untouched; quiesce writers and re-run")
    }
    // 2. swap directories; the old dir survives until the new one is in
    // place (a MANAGED original is deleted by its drop — its rows are
    // already durable in the temp copy)
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    spark.sql(s"DROP TABLE IF EXISTS `$tmpTbl`")
    val pre = new org.apache.hadoop.fs.Path(path + ".__pre_compact")
    if (fs.exists(pre)) fs.delete(pre, true)
    if (fs.exists(p) && !fs.rename(p, pre))
      throw new java.io.IOException(s"compact: could not move $p aside")
    if (!fs.rename(tmpPath, p))
      throw new java.io.IOException(
        s"compact: could not move $tmpPath into place " +
          s"(previous data preserved at $pre)")
    // 3. re-register the catalog entry over the swapped files (bucket
    // ids live in the file names, so DDL keeps the layout live)
    registerBucketedTable(spark, table, p.toString, keyCol, buckets,
      Some(schemaDdl))
    fs.delete(pre, true)
    fs.listStatus(p)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
  }

  /** Sorted (name, length) of the data files directly under `p` — the
    * fingerprint [[compactBucketedTable]] compares to detect a writer
    * that raced the compaction.
    */
  private def dataListing(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Seq[(String, Long)] =
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      .map(s => (s.getPath.getName, s.getLen))
      .sortBy(_._1)

  /** (Re-)create the catalog entry for a bucketed EXTERNAL parquet table
    * over files already on disk. This is BOTH the maintenance path for a
    * fresh session whose in-memory catalog forgot the table, AND the
    * crash-recovery path when a failure between
    * [[compactBucketedTable]]'s DROP and CREATE leaves the data durable
    * at `path` with no catalog entry. Schema comes from the files unless
    * supplied. Equivalent manual DDL:
    * {{{
    * CREATE TABLE `t` (<schema>) USING PARQUET
    *   CLUSTERED BY (key) SORTED BY (key) INTO n BUCKETS LOCATION 'path'
    * }}}
    * `keyCol`/`buckets` MUST match the layout the files were written
    * with (bucket ids live in the file names; a wrong declared count
    * mis-routes bucketed reads).
    */
  def registerBucketedTable(spark: org.apache.spark.sql.SparkSession,
      table: String, path: String, keyCol: String, buckets: Int,
      schemaDdl: Option[String] = None): Unit = {
    val ddl = schemaDdl.getOrElse(spark.read.parquet(path).schema.toDDL)
    spark.sql(
      s"""CREATE TABLE `$table` ($ddl) USING PARQUET
          CLUSTERED BY ($keyCol) SORTED BY ($keyCol) INTO $buckets BUCKETS
          LOCATION '$path'""")
  }

  /** Bucketed managed table: rows are hash-partitioned into `buckets`
    * files per partition ON WRITE, so joins/aggregations between tables
    * bucketed on the same key skip the shuffle entirely — the
    * co-located-join layout for fact-to-fact joins too large to
    * broadcast (BucketSpec pins the no-Exchange plan).
    */
  def bucketedTable(df: DataFrame, table: String, bucketCols: Seq[String],
      buckets: Int, compression: String = DefaultCompression): Unit = {
    // With the in-memory catalog the table registration dies with the JVM
    // but its warehouse directory survives; a later session's saveAsTable
    // then refuses with LOCATION_ALREADY_EXISTS. Clear both.
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // saveAsTable lowercases identifiers for the warehouse location; a
    // mixed-case `table` would otherwise delete a nonexistent path and
    // leave the LOCATION_ALREADY_EXISTS failure in place
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .option("compression", compression)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** ORC sink (zlib default) — format parity with the parquet sink so
    * pipelines can target either columnar store.
    */
  def orc(df: DataFrame, path: String, compression: String = "zlib"): Unit =
    df.write.mode("overwrite").option("compression", compression).orc(path)

  /** Z-order (Morton) interleave of two discretized non-negative int
    * columns — `bits` bits each, alternating (a even positions, b odd).
    * Pure bit-op column expressions, fully codegen'd.
    */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      bits: Int = 10): org.apache.spark.sql.Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(1), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(1), 2 * i + 1))
    }.reduce(_.bitwiseOR(_)).cast("long")

  /** Z-ORDER layout: cluster a table on TWO dimensions at once so
    * row-group min/max stats prune on EITHER predicate — the
    * multi-dimensional data-skipping layout a single-column sort can't
    * give (sorting by a makes b's per-file ranges as wide as the whole
    * table; the space-filling curve keeps BOTH narrow). Each column is
    * min/max-discretized to `bits` bits (one tiny bounds aggregate),
    * rows range-partition on the interleaved Morton value and sort by
    * it within files, so every parquet file covers a compact rectangle
    * of (c1, c2) space. At 100 TB this is the difference between a
    * selective 2-D filter reading a few row groups and reading the
    * corpus; the write costs one exchange, same as any sort.
    */
  def zorderParquet(df: DataFrame, c1: String, c2: String, path: String,
      files: Int = 16, bits: Int = 10,
      compression: String = DefaultCompression): Unit = {
    val b = df.agg(
      min(col(c1)).cast("double").as("lo1"), max(col(c1)).cast("double").as("hi1"),
      min(col(c2)).cast("double").as("lo2"), max(col(c2)).cast("double").as("hi2"))
      .head()
    // an empty table, an all-null column, or a non-numeric column whose
    // cast-to-double nulls out all yields null bounds — fail with the
    // offending column named instead of an NPE from getDouble
    Seq(c1 -> 0, c2 -> 2).foreach { case (c, i) =>
      require(!b.isNullAt(i) && !b.isNullAt(i + 1),
        s"zorder: no numeric min/max bounds for column '$c' " +
          "(empty input, all-null, or non-numeric column?)")
    }
    val (lo1, hi1, lo2, hi2) =
      (b.getDouble(0), b.getDouble(1), b.getDouble(2), b.getDouble(3))
    val m = (1 << bits) - 1
    def disc(c: String, lo: Double, hi: Double) =
      if (hi == lo) lit(0)
      else floor((col(c).cast("double") - lo) * m / (hi - lo)).cast("int")
    df.withColumn("__z", zValue(disc(c1, lo1, hi1), disc(c2, lo2, hi2), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite")
      .option("compression", compression)
      .parquet(path)
  }

  /** Range-clustered parquet layout: rows repartitioned into contiguous
    * key ranges (Spark's sampling RangePartitioner — one pass + a
    * sample scan) and sorted within each file, so parquet min/max
    * row-group stats prune key-range predicates to the few files whose
    * [lo, hi] overlap. The 1-D complement of [[zorderParquet]] (one hot
    * range dimension vs two), and the layout whose EXACT equi-depth
    * boundary report is q209 — the sampler approximates those
    * boundaries; q209 is the audit that says how well.
    */
  def rangeParquet(df: DataFrame, key: String, tiebreak: String,
      path: String, files: Int = 16,
      compression: String = DefaultCompression): Unit =
    df.repartitionByRange(files, col(key), col(tiebreak))
      .sortWithinPartitions(col(key), col(tiebreak))
      .write.mode("overwrite")
      .option("compression", compression)
      .parquet(path)

  /** All data files under `dir`, RECURSIVELY — partitioned layouts
    * (`shard=N` exports, `batch=N` streaming sinks: the layouts this
    * repo's own sinks produce) keep their parquet files in
    * subdirectories, so a top-level-only listing reports an empty
    * table (ADVICE r12: fileStats said totalBytes=0 and compactFiles
    * collapsed a partitioned table into ONE file).
    */
  private def listParquetFiles(fs: org.apache.hadoop.fs.FileSystem,
      path: org.apache.hadoop.fs.Path)
      : Seq[org.apache.hadoop.fs.LocatedFileStatus] = {
    val out = Seq.newBuilder[org.apache.hadoop.fs.LocatedFileStatus]
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && name.endsWith(".parquet") &&
          !name.startsWith("_") && !name.startsWith("."))
        out += f
    }
    out.result()
  }

  /** Top-level `key=value` partition directory names under `dir`
    * (empty for a flat layout). */
  private def partitionDirs(fs: org.apache.hadoop.fs.FileSystem,
      path: org.apache.hadoop.fs.Path): Seq[String] =
    fs.listStatus(path).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map(_.getPath.getName)

  /** Per-file size stats of a parquet dir — the SMALL-FILES smell
    * check: (n_files, total_bytes, avg_mb, n_under_half_target). At
    * scale, thousands of KB-sized files turn a scan into a
    * task-scheduling and NameNode/listing problem long before it is an
    * IO problem; this is the number that says when [[compactFiles]] is
    * due. Listing is recursive, so partitioned layouts (shard=N,
    * batch=N, ingest_date=D) report their true file population.
    */
  def fileStats(spark: org.apache.spark.sql.SparkSession, dir: String,
      targetMb: Int = 128): (Long, Long, Double, Long) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = listParquetFiles(fs, path)
    val n = files.length.toLong
    val total = files.map(_.getLen).sum
    val avgMb = if (n == 0) 0.0 else total / 1e6 / n
    val small = files.count(_.getLen < targetMb.toLong * 1000000 / 2).toLong
    (n, total, avgMb, small)
  }

  /** Compact a fragmented parquet dir into ~targetMb files, writing to
    * a NEW directory — the read-side sibling of the in-place [[compact]]
    * (use that for a live table you own; use this when the caller wants
    * the original preserved, e.g. compact-while-validating). The file
    * count comes from the ACTUAL on-disk bytes (so compression is
    * already accounted for), and the merge is a `coalesce` — a
    * NO-SHUFFLE narrow dependency that concatenates input partitions,
    * which is what makes compaction affordable at 100 TB (a
    * `repartition` would re-exchange the whole table for nothing).
    * The trade-off — merged files inherit input-partition locality
    * rather than perfect size balance — is the standard one every
    * table-maintenance service makes.
    *
    * PARTITIONED layouts are compacted partition-by-partition: each
    * top-level `key=value` directory coalesces to its OWN byte-derived
    * file count and lands under the same relative path in `outDir`, so
    * the partition layout (and partition pruning, and the batch=N
    * idempotency contracts of the streaming sinks) survives — never
    * the whole table into one giant single-task file (ADVICE r12).
    * Returns (files_before, files_after).
    */
  def compactFiles(spark: org.apache.spark.sql.SparkSession, inDir: String,
      outDir: String, targetMb: Int = 128,
      compression: String = DefaultCompression): (Long, Long) = {
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = partitionDirs(fs, path)
    def compactOne(in: String, out: String): (Long, Long) = {
      val (nBefore, totalBytes, _, _) = fileStats(spark, in, targetMb)
      if (nBefore == 0) return (0L, 0L)
      val nAfter = math.max(1L, math.ceil(
        totalBytes.toDouble / (targetMb.toLong * 1000000)).toLong)
      spark.read.parquet(in)
        .coalesce(nAfter.toInt)
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(out)
      (nBefore, nAfter)
    }
    if (parts.isEmpty) compactOne(inDir, outDir)
    else {
      // MIXED layout (partition dirs PLUS loose top-level data files,
      // ADVICE r13): the partition recursion would silently drop the
      // loose files from outDir and from the counts — fail loudly
      // (the in-place compact's require rule) instead of losing data
      val loose = fs.listStatus(path).toSeq.filter { s =>
        val n = s.getPath.getName
        s.isFile && n.endsWith(".parquet") &&
          !n.startsWith("_") && !n.startsWith(".")
      }
      require(loose.isEmpty,
        s"compactFiles: $inDir mixes partition directories " +
          s"(${parts.take(3).mkString(", ")}…) with ${loose.length} " +
          s"top-level data files (${loose.take(3).map(_.getPath.getName)
            .mkString(", ")}…) — a partition-by-partition compaction " +
          "would drop the loose files; clean the layout first")
      parts // recurse: multi-level layouts (date=D/hour=H) keep every level
        .map(p => compactFiles(spark, s"$inDir/$p", s"$outDir/$p",
          targetMb, compression))
        .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    }
  }
}
