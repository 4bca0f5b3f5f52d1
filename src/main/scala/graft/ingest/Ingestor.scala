package graft.ingest

import java.io.{BufferedOutputStream, FileOutputStream, InputStream}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}
import java.time.format.DateTimeFormatter
import java.time.{ZoneOffset, ZonedDateTime}
import java.util.concurrent.atomic.{AtomicBoolean, LongAdder}
import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}

import scala.concurrent.duration.{Duration, MILLISECONDS}
import scala.concurrent.{Await, ExecutionContext, Future}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** HTTP→landing-dir streaming ingest (SURVEY.md §2A OP-01/02/03/07/09/
  * 36–40), the Spark-side successor of the reference Lambda
  * (`dubai-dataset/lambdas/data-ingestion/lambda_handler.py`).
  *
  * Design mapping:
  *  - chunked streaming (`:194-209`): fixed-size buffer copy from the
  *    HTTP body stream — memory is O(chunk), never O(file);
  *  - progress events with percent from Content-Length
  *    (`:171-174,205-215`): `file_progress` at each 10% boundary when the
  *    server declares a length;
  *  - MB/s accounting (`:107,237`): per-file mbps in each FileResult and
  *    an aggregate in the Report;
  *  - bounded concurrency (`:266-291`, Semaphore(CONCURRENCY)): a fixed
  *    thread pool of the same width;
  *  - hard timeouts (the Lambda runs under a 15-minute cap,
  *    `dubai_dataset_stack.py:98-107`): connect timeout on the client,
  *    response timeout on the request, and a per-file watchdog that
  *    closes the body stream mid-read — a stalled server fails the FILE
  *    in bounded time, never the batch;
  *  - op counters (`:35-59`): LongAdders, snapshotted into the summary;
  *  - error recovery (`:251-264`): per-file status records, partial
  *    success — one failed URL never aborts the batch;
  *  - dated key layout (`:273,280-281`): {landing}/{yyyy/MM/dd}/{name};
  *  - zero-byte edge (`:217-225`): an empty object is still written.
  *
  * At cluster scale the same per-URL task body runs inside
  * `spark.range(n).foreachPartition` — the logic is a pure function of
  * (url, dest), so driver-pool vs executor-task is a deployment choice.
  */
object Ingestor {

  final case class FileResult(
      url: String,
      dest: String,
      bytes: Long,
      millis: Long,
      mbps: Double,
      status: String, // "success" | "error"
      error: String)

  final case class Counters(
      requests: Long, chunks: Long, files: Long, errors: Long, bytes: Long)

  final case class Report(results: Seq[FileResult], counters: Counters) {
    def succeeded: Seq[FileResult] = results.filter(_.status == "success")
    def failed: Seq[FileResult] = results.filter(_.status == "error")
    /** Aggregate throughput over successful files (sum bytes / sum time —
      * the per-strategy MB/s figure the reference's profiling notebook
      * publishes).
      */
    def totalMbps: Double = {
      val ok = succeeded
      val ms = ok.map(_.millis).sum
      if (ms <= 0) 0.0 else roundMbps(ok.map(_.bytes).sum, ms)
    }
    /** GB-seconds consumed (memory-footprint proxy × wall time summed
      * per file) — the unit of the reference's per-strategy ingest cost
      * model: multiply by the platform's $/GB-s to price a run.
      */
    def gbSeconds(memoryGb: Double = 0.5): Double = {
      val s = results.map(_.millis).sum / 1000.0
      math.round(s * memoryGb * 10000.0) / 10000.0
    }
    /** Per-file status as a DataFrame (the Lambda's JSON summary). */
    def toDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      results.toDF()
    }
  }

  private def roundMbps(bytes: Long, ms: Long): Double =
    if (ms <= 0) 0.0
    else math.round((bytes / 1e6) / (ms / 1000.0) * 1000.0) / 1000.0

  /** The reference's default URL→file-name routing table
    * (`dubai-dataset/lambdas/data-ingestion/lambda_handler.py:72-79`):
    * any URL containing a table key lands under that table's file name.
    */
  val DefaultSuffixMap: Map[String, String] = Map(
    "rent_contracts" -> "rent_contracts.csv",
    "transactions" -> "transactions.csv",
    "projects" -> "projects.csv",
    "units" -> "units.csv",
    "developers" -> "developers.csv",
    "buildings" -> "buildings.csv")

  /** Dated bulk-ingest URL list: substitute `{date}` in `template` for
    * each day in [startDate, startDate + days), formatted with
    * `pattern` — the reference's profiling notebook enumerates
    * `AIS_{YYYY_MM_DD}.zip` URLs exactly this way
    * (`notebooks/data_ingestion_with_profiling.ipynb:764-775`).
    */
  def datedUrls(template: String, startDate: String, days: Int,
      pattern: String = "yyyy_MM_dd"): Seq[String] = {
    val fmt = DateTimeFormatter.ofPattern(pattern)
    val start = java.time.LocalDate.parse(startDate)
    (0 until days).map(d => template.replace("{date}", start.plusDays(d).format(fmt)))
  }

  /** OP-09: route a URL to a destination file name — lowercase substring
    * match over a suffix map, falling back to the URL basename.
    */
  def suffixFromUrl(url: String,
      suffixMap: Map[String, String] = Map()): String = {
    val lower = url.toLowerCase
    suffixMap.collectFirst { case (k, v) if lower.contains(k) => v }
      .getOrElse {
        val path = URI.create(url).getPath
        val base = path.split('/').lastOption.filter(_.nonEmpty)
        base.getOrElse("data.csv")
      }
  }

  /** OP-07: dated landing path `{landing}/{yyyy/MM/dd}/{name}` (UTC). */
  def datedPath(landingDir: String, name: String): String = {
    val day = ZonedDateTime.now(ZoneOffset.UTC)
      .format(DateTimeFormatter.ofPattern("yyyy/MM/dd"))
    s"$landingDir/$day/$name"
  }

  private def log(event: String, fields: (String, Any)*): Unit = {
    // OP-38: structured one-line JSON events, same names as the
    // reference's log catalog (file_progress/file_complete/file_error).
    val kv = fields.map { case (k, v) => s""""$k":"${v.toString}"""" }
    System.err.println(s"""{"event":"$event",${kv.mkString(",")}}""")
  }

  /** Recursive best-effort delete for a partial zip extraction dir
    * (the OP-40 abort semantics applied to the multi-file case). */
  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).forEach(c => deleteRecursively(c))
    try Files.deleteIfExists(p) catch { case _: Throwable => () }
  }

  /** Stream one URL to a local file in fixed-size chunks; with
    * `unzip` set, a `.zip` body is instead extracted ON THE CHUNK
    * STREAM (java.util.zip reads local entry headers, so no seek and
    * no buffering of the archive — memory stays O(chunk)) into a
    * directory named after the archive, one file per entry. */
  private def streamOne(
      client: HttpClient,
      url: String,
      dest: String,
      chunkBytes: Int,
      fileTimeoutMs: Long,
      watchdog: ScheduledExecutorService,
      counters: (LongAdder, LongAdder, LongAdder, LongAdder, LongAdder),
      unzip: Boolean = false): FileResult = {
    val (reqs, chunks, files, errors, bytesTotal) = counters
    val t0 = System.nanoTime()
    val timedOut = new AtomicBoolean(false)
    val zipped = unzip && dest.toLowerCase.endsWith(".zip")
    val outPath = if (zipped) dest.dropRight(4) else dest
    try {
      val req = HttpRequest.newBuilder(URI.create(url)).GET()
        .timeout(java.time.Duration.ofMillis(fileTimeoutMs))
        .build()
      reqs.increment()
      val resp: HttpResponse[InputStream] =
        client.send(req, HttpResponse.BodyHandlers.ofInputStream())
      if (resp.statusCode() / 100 != 2)
        throw new RuntimeException(s"HTTP ${resp.statusCode()}")
      // total size if the server declares one (-1 for chunked bodies)
      val total = resp.headers().firstValueAsLong("Content-Length").orElse(-1L)
      Files.createDirectories(Paths.get(dest).getParent)
      val in = resp.body()
      // HttpRequest.timeout only covers time-to-response-headers; a body
      // that stalls MID-stream would block read() forever. The watchdog
      // closes the stream at the deadline, failing this file in bounded
      // time (the reference gets the same guarantee from the Lambda cap).
      val kill = watchdog.schedule(new Runnable {
        override def run(): Unit = {
          timedOut.set(true)
          try in.close() catch { case _: Throwable => () }
        }
      }, fileTimeoutMs, TimeUnit.MILLISECONDS)
      var written = 0L
      try {
        val buf = new Array[Byte](chunkBytes)
        if (zipped) {
          // OP-01 parity on the reference's ACTUAL drop format: the
          // profiled NOAA AIS archives are `.zip`
          // (notebooks/data_ingestion_with_profiling.ipynb:764-775) and
          // Spark cannot scan zip natively (gzip yes, zip no) — each
          // entry lands as a plain file under {archive-name}/, directly
          // readable by the CSV scan. ZipInputStream reads local entry
          // headers off the chunk stream — no seek, no archive
          // buffering, memory stays O(chunk). Counted bytes are the
          // DECOMPRESSED bytes written (the landing-side truth), so the
          // percent-progress events (compressed-total-based) are
          // skipped on this path.
          Files.createDirectories(Paths.get(outPath))
          val zin = new java.util.zip.ZipInputStream(in)
          var entry = zin.getNextEntry
          while (entry != null) {
            if (!entry.isDirectory) {
              val name = entry.getName
              // zip-slip guard: refuse entries escaping the landing dir
              require(!name.contains("..") && !name.startsWith("/"),
                s"zip entry escapes extraction dir: $name")
              val target = Paths.get(outPath, name)
              Option(target.getParent).foreach(p =>
                Files.createDirectories(p))
              val out = new BufferedOutputStream(
                new FileOutputStream(target.toFile), chunkBytes)
              var eb = 0L
              try {
                var n = zin.read(buf)
                while (n >= 0) {
                  if (n > 0) {
                    out.write(buf, 0, n); eb += n; chunks.increment()
                  }
                  n = zin.read(buf)
                }
              } finally out.close()
              written += eb
              log("zip_entry", "url" -> url, "entry" -> name,
                "bytes" -> eb)
            }
            entry = zin.getNextEntry
          }
        } else {
          val out = new BufferedOutputStream(new FileOutputStream(dest),
            chunkBytes)
          try {
            var nextPct = 10L
            var n = in.read(buf)
            while (n >= 0) {
              if (n > 0) {
                out.write(buf, 0, n)
                written += n
                chunks.increment()
                if (total > 0) {
                  val pct = written * 100 / total
                  if (pct >= nextPct) {
                    while (nextPct <= pct) nextPct += 10
                    log("file_progress", "url" -> url,
                      "percent" -> (nextPct - 10), "bytes" -> written,
                      "total" -> total)
                  }
                }
              }
              n = in.read(buf)
            }
          } finally out.close()
        }
      } finally {
        kill.cancel(false)
        try in.close() catch { case _: Throwable => () }
      }
      if (timedOut.get())
        throw new RuntimeException(s"timeout after ${fileTimeoutMs} ms")
      // OP-03: zero-byte bodies still produce an (empty) landing file —
      // the FileOutputStream above already created it (for a zip, an
      // empty archive still creates its extraction dir).
      files.increment()
      bytesTotal.add(written)
      val ms = (System.nanoTime() - t0) / 1000000
      val mbps = roundMbps(written, ms)
      log("file_complete", "url" -> url, "bytes" -> written, "ms" -> ms,
        "mbps" -> mbps)
      FileResult(url, outPath, written, ms, mbps, "success", "")
    } catch {
      case e: Throwable =>
        errors.increment()
        // OP-40: abort semantics — remove the partial object (for a
        // zip, the whole partial extraction dir).
        try {
          if (zipped) deleteRecursively(Paths.get(outPath))
          else { Files.deleteIfExists(Paths.get(dest)); () }
        } catch { case _: Throwable => () }
        val ms = (System.nanoTime() - t0) / 1000000
        val msg =
          if (timedOut.get()) s"timeout after ${fileTimeoutMs} ms"
          else String.valueOf(e.getMessage)
        log("file_error", "url" -> url, "error" -> msg, "ms" -> ms)
        FileResult(url, dest, 0L, ms, 0.0, "error", msg)
    }
  }

  /** OP-36: fan out over `urls` with at most `concurrency` in flight.
    * Every request is bounded: `fileTimeoutMs` per file (headers AND
    * body), 10 s connect, and the batch await is derived from the file
    * budget — a hung server can cost one file slot, never the batch.
    * `unzip` turns `.zip` bodies into extracted entry files (see
    * [[streamOne]]); default stays opaque passthrough — byte-faithful
    * landing is the OP-01 contract, extraction is the opt-in for
    * sources (like the NOAA AIS drops) whose payload Spark cannot
    * scan as-is.
    */
  def ingest(
      urls: Seq[String],
      landingDir: String,
      concurrency: Int = 3,
      chunkBytes: Int = 1024 * 1024,
      suffixMap: Map[String, String] = Map(),
      dated: Boolean = true,
      fileTimeoutMs: Long = 15 * 60 * 1000L,
      unzip: Boolean = false): Report = {
    val pool = Executors.newFixedThreadPool(math.max(1, concurrency))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val watchdog = Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "ingest-watchdog"); t.setDaemon(true); t
    })
    val client = HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10))
      .followRedirects(HttpClient.Redirect.NORMAL).build()
    val counters = (new LongAdder, new LongAdder, new LongAdder,
      new LongAdder, new LongAdder)
    try {
      val futures = urls.map { url =>
        val name = suffixFromUrl(url, suffixMap)
        val dest =
          if (dated) datedPath(landingDir, name) else s"$landingDir/$name"
        Future(streamOne(client, url, dest, chunkBytes, fileTimeoutMs,
          watchdog, counters, unzip))
      }
      // worst case: ceil(n/concurrency) sequential waves each taking the
      // full per-file budget, plus slack — bounded, unlike Duration.Inf
      val waves = (urls.size + math.max(1, concurrency) - 1) /
        math.max(1, concurrency)
      val atMost = Duration(fileTimeoutMs * (waves + 1) + 30000, MILLISECONDS)
      val results = Await.result(Future.sequence(futures), atMost)
      val (reqs, chunks, files, errors, bytes) = counters
      Report(results, Counters(reqs.sum, chunks.sum, files.sum, errors.sum, bytes.sum))
    } finally {
      pool.shutdown()
      watchdog.shutdownNow()
    }
  }

  /** Parsed parameters.json — the reference's flagship config shape
    * (`dubai-dataset/config/parameters.json:1-10`) plus its env-var knobs
    * folded into the same document: `file_urls` (required),
    * `s3_path_prefix` (default "raw"), `concurrency` (default 2),
    * `http_chunk_kb` (default 1024), optional `suffix_map` object
    * overriding [[DefaultSuffixMap]].
    */
  final case class IngestConfig(
      fileUrls: Seq[String],
      pathPrefix: String,
      concurrency: Int,
      chunkBytes: Int,
      suffixMap: Map[String, String])

  /** Read an [[IngestConfig]] through the OP-08 JSON source. */
  def readConfig(spark: SparkSession, path: String): IngestConfig = {
    val row = graft.etl.Readers.jsonConfig(spark, path).head()
    val schema = row.schema
    def has(n: String) =
      schema.fieldNames.contains(n) && !row.isNullAt(schema.fieldIndex(n))
    require(has("file_urls"), s"$path: missing required field file_urls")
    val urls = row.getSeq[String](schema.fieldIndex("file_urls"))
    def str(n: String, dflt: String) =
      if (has(n)) row.getString(schema.fieldIndex(n)) else dflt
    def num(n: String, dflt: Long) = // JSON integers arrive as LongType
      if (has(n)) row.getLong(schema.fieldIndex(n)) else dflt
    val suffixMap =
      if (has("suffix_map")) {
        val s = row.getStruct(schema.fieldIndex("suffix_map"))
        s.schema.fieldNames.zipWithIndex.collect {
          case (n, i) if !s.isNullAt(i) => n -> s.getString(i)
        }.toMap
      } else DefaultSuffixMap
    IngestConfig(
      fileUrls = urls,
      pathPrefix = str("s3_path_prefix", "raw"),
      concurrency = num("concurrency", 2L).toInt,
      chunkBytes = num("http_chunk_kb", 1024L).toInt * 1024,
      suffixMap = suffixMap)
  }

  /** The reference's flagship flow end to end: read parameters.json,
    * ingest its URLs under `{landingDir}/{path_prefix}` with the
    * configured suffix map / concurrency / chunk size.
    */
  def ingestFromConfig(spark: SparkSession, configPath: String,
      landingDir: String): Report = {
    val c = readConfig(spark, configPath)
    ingest(c.fileUrls, s"$landingDir/${c.pathPrefix}",
      concurrency = c.concurrency, chunkBytes = c.chunkBytes,
      suffixMap = c.suffixMap)
  }
}
