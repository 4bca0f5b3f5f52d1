package graft.ingest

import java.io.{BufferedOutputStream, FileOutputStream, InputStream}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}
import java.time.format.DateTimeFormatter
import java.time.{ZoneOffset, ZonedDateTime}
import java.util.concurrent.Executors
import java.util.concurrent.atomic.LongAdder

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.util.matching.Regex

import org.apache.spark.sql.{DataFrame, SparkSession}

/** HTTP→landing-dir streaming ingest (SURVEY.md §2A OP-01/02/03/07/09/
  * 36–40), the Spark-side successor of the reference Lambda
  * (`dubai-dataset/lambdas/data-ingestion/lambda_handler.py`).
  *
  * Design mapping:
  *  - chunked streaming (`:194-209`): fixed-size buffer copy from the
  *    HTTP body stream — memory is O(chunk), never O(file);
  *  - bounded concurrency (`:266-291`, Semaphore(CONCURRENCY)): a fixed
  *    thread pool of the same width;
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
      status: String, // "success" | "error"
      error: String)

  final case class Counters(
      requests: Long, chunks: Long, files: Long, errors: Long, bytes: Long)

  final case class Report(results: Seq[FileResult], counters: Counters) {
    def succeeded: Seq[FileResult] = results.filter(_.status == "success")
    def failed: Seq[FileResult] = results.filter(_.status == "error")
    /** Per-file status as a DataFrame (the Lambda's JSON summary). */
    def toDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      results.toDF()
    }
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

  /** Stream one URL to a local file in fixed-size chunks. */
  private def streamOne(
      client: HttpClient,
      url: String,
      dest: String,
      chunkBytes: Int,
      counters: (LongAdder, LongAdder, LongAdder, LongAdder, LongAdder)): FileResult = {
    val (reqs, chunks, files, errors, bytesTotal) = counters
    val t0 = System.nanoTime()
    try {
      val req = HttpRequest.newBuilder(URI.create(url)).GET().build()
      reqs.increment()
      val resp: HttpResponse[InputStream] =
        client.send(req, HttpResponse.BodyHandlers.ofInputStream())
      if (resp.statusCode() / 100 != 2)
        throw new RuntimeException(s"HTTP ${resp.statusCode()}")
      Files.createDirectories(Paths.get(dest).getParent)
      val in = resp.body()
      val out = new BufferedOutputStream(new FileOutputStream(dest), chunkBytes)
      var written = 0L
      try {
        val buf = new Array[Byte](chunkBytes)
        var n = in.read(buf)
        while (n >= 0) {
          if (n > 0) {
            out.write(buf, 0, n)
            written += n
            chunks.increment()
          }
          n = in.read(buf)
        }
      } finally {
        out.close(); in.close()
      }
      // OP-03: zero-byte bodies still produce an (empty) landing file —
      // the FileOutputStream above already created it.
      files.increment()
      bytesTotal.add(written)
      val ms = (System.nanoTime() - t0) / 1000000
      log("file_complete", "url" -> url, "bytes" -> written, "ms" -> ms)
      FileResult(url, dest, written, ms, "success", "")
    } catch {
      case e: Throwable =>
        errors.increment()
        // OP-40: abort semantics — remove the partial object.
        try Files.deleteIfExists(Paths.get(dest)) catch { case _: Throwable => () }
        val ms = (System.nanoTime() - t0) / 1000000
        log("file_error", "url" -> url, "error" -> e.getMessage, "ms" -> ms)
        FileResult(url, dest, 0L, ms, "error", String.valueOf(e.getMessage))
    }
  }

  /** OP-36: fan out over `urls` with at most `concurrency` in flight. */
  def ingest(
      urls: Seq[String],
      landingDir: String,
      concurrency: Int = 3,
      chunkBytes: Int = 1024 * 1024,
      suffixMap: Map[String, String] = Map(),
      dated: Boolean = true): Report = {
    val pool = Executors.newFixedThreadPool(math.max(1, concurrency))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val client = HttpClient.newBuilder()
      .followRedirects(HttpClient.Redirect.NORMAL).build()
    val counters = (new LongAdder, new LongAdder, new LongAdder,
      new LongAdder, new LongAdder)
    try {
      val futures = urls.map { url =>
        val name = suffixFromUrl(url, suffixMap)
        val dest =
          if (dated) datedPath(landingDir, name) else s"$landingDir/$name"
        Future(streamOne(client, url, dest, chunkBytes, counters))
      }
      val results = Await.result(Future.sequence(futures), Duration.Inf)
      val (reqs, chunks, files, errors, bytes) = counters
      Report(results, Counters(reqs.sum, chunks.sum, files.sum, errors.sum, bytes.sum))
    } finally pool.shutdown()
  }
}
