package graft

import java.net.InetSocketAddress
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Ingestor

/** OP-01/02/03/36–40 behavioral tests: N URLs → N landing files,
  * counters match, one failure yields a partial-success report, zero-byte
  * bodies produce empty files.
  */
class IngestorSpec extends AnyFunSuite with TestSpark {

  private def withServer(routes: Map[String, Array[Byte]])(
      body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, bytes) =>
      server.createContext(path, new HttpHandler {
        override def handle(ex: HttpExchange): Unit = {
          ex.sendResponseHeaders(200, if (bytes.isEmpty) -1 else bytes.length.toLong)
          if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
          ex.close()
        }
      })
    }
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("streams N files with bounded concurrency; counters add up") {
    val payloadA = ("a" * 100000).getBytes
    val payloadB = ("b" * 5000).getBytes
    withServer(Map("/a.csv" -> payloadA, "/b.csv" -> payloadB)) { base =>
      val landing = Files.createTempDirectory("graft-land").toString
      val report = Ingestor.ingest(
        Seq(s"$base/a.csv", s"$base/b.csv"), landing,
        concurrency = 2, chunkBytes = 4096, dated = false)
      assert(report.failed.isEmpty)
      assert(report.counters.files == 2)
      assert(report.counters.errors == 0)
      assert(report.counters.bytes == payloadA.length + payloadB.length)
      val a = new java.io.File(s"$landing/a.csv")
      assert(a.length() == payloadA.length)
      // report surfaces as a DataFrame (the Lambda's JSON summary shape)
      assert(report.toDF(spark).count() == 2)
    }
  }

  test("one bad URL -> partial success, good files still land") {
    withServer(Map("/ok.csv" -> "data".getBytes)) { base =>
      val landing = Files.createTempDirectory("graft-land2").toString
      val report = Ingestor.ingest(
        Seq(s"$base/ok.csv", s"$base/missing.csv"), landing,
        concurrency = 3, dated = false)
      assert(report.succeeded.map(_.url) == Seq(s"$base/ok.csv"))
      assert(report.failed.size == 1)
      assert(report.counters.errors == 1)
      assert(new java.io.File(s"$landing/ok.csv").exists())
      assert(!new java.io.File(s"$landing/missing.csv").exists())
    }
  }

  test("zero-byte body still writes an (empty) landing object") {
    withServer(Map("/empty.csv" -> Array.emptyByteArray)) { base =>
      val landing = Files.createTempDirectory("graft-land3").toString
      val report = Ingestor.ingest(Seq(s"$base/empty.csv"), landing,
        dated = false)
      assert(report.failed.isEmpty)
      val f = new java.io.File(s"$landing/empty.csv")
      assert(f.exists() && f.length() == 0)
    }
  }

  test("unzip-on-landing (VERDICT r18 #5): a multi-entry .zip body " +
      "extracts on the chunk stream into {archive}/entry files the " +
      "CSV scan can read directly; counters carry decompressed " +
      "bytes; default stays opaque passthrough") {
    val csvA = "id,name\n1,alpha\n2,beta\n".getBytes("UTF-8")
    val csvB = "id,name\n3,gamma\n".getBytes("UTF-8")
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    Seq("part_a.csv" -> csvA, "sub/part_b.csv" -> csvB).foreach {
      case (n, b) =>
        zos.putNextEntry(new java.util.zip.ZipEntry(n))
        zos.write(b); zos.closeEntry()
    }
    zos.close()
    val zip = bos.toByteArray
    withServer(Map("/AIS_2024_01_01.zip" -> zip)) { base =>
      // opaque default: the archive lands byte-faithful (OP-01)
      val plain = Files.createTempDirectory("graft-zip0").toString
      val r0 = Ingestor.ingest(Seq(s"$base/AIS_2024_01_01.zip"), plain,
        dated = false)
      assert(r0.failed.isEmpty)
      assert(new java.io.File(s"$plain/AIS_2024_01_01.zip").length()
        == zip.length)
      // --unzip: entries land as plain files under the archive name
      val landing = Files.createTempDirectory("graft-zip1").toString
      val report = Ingestor.ingest(Seq(s"$base/AIS_2024_01_01.zip"),
        landing, dated = false, unzip = true)
      assert(report.failed.isEmpty)
      assert(report.counters.files == 1)
      // counted bytes are the DECOMPRESSED landing-side truth
      assert(report.counters.bytes == csvA.length + csvB.length)
      assert(report.results.head.dest == s"$landing/AIS_2024_01_01")
      val a = new java.io.File(s"$landing/AIS_2024_01_01/part_a.csv")
      val b = new java.io.File(s"$landing/AIS_2024_01_01/sub/part_b.csv")
      assert(a.length() == csvA.length && b.length() == csvB.length)
      // Spark reads the extracted entries directly — row counts intact
      val df = spark.read.option("header", "true")
        .csv(s"$landing/AIS_2024_01_01/part_a.csv",
          s"$landing/AIS_2024_01_01/sub/part_b.csv")
      assert(df.count() == 3)
    }
    // zip-slip: an escaping entry fails the FILE (partial dir removed)
    val evil = new java.io.ByteArrayOutputStream()
    val ez = new java.util.zip.ZipOutputStream(evil)
    ez.putNextEntry(new java.util.zip.ZipEntry("../escape.csv"))
    ez.write("x".getBytes); ez.closeEntry(); ez.close()
    withServer(Map("/evil.zip" -> evil.toByteArray)) { base =>
      val landing = Files.createTempDirectory("graft-zip2").toString
      val report = Ingestor.ingest(Seq(s"$base/evil.zip"), landing,
        dated = false, unzip = true)
      assert(report.failed.size == 1)
      assert(!new java.io.File(s"$landing/evil").exists())
      assert(!new java.io.File(landing).getParentFile
        .toPath.resolve("escape.csv").toFile.exists())
    }
  }

  test("stalling server fails the file in bounded time, not forever") {
    // headers + 4 bytes arrive, then the body stalls: HttpRequest.timeout
    // can't catch this (headers already came) — the watchdog must
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.createContext("/stall.csv", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        ex.sendResponseHeaders(200, 100000L)
        ex.getResponseBody.write("abcd".getBytes)
        ex.getResponseBody.flush()
        Thread.sleep(8000) // far past the file timeout below
        ex.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val landing = Files.createTempDirectory("graft-land4").toString
      val t0 = System.nanoTime()
      val report = Ingestor.ingest(Seq(s"$base/stall.csv"), landing,
        dated = false, fileTimeoutMs = 1000)
      val elapsedMs = (System.nanoTime() - t0) / 1000000
      assert(report.failed.size == 1)
      assert(report.failed.head.error.contains("timeout"),
        s"unexpected error: ${report.failed.head.error}")
      assert(elapsedMs < 6000, s"stall not bounded: ${elapsedMs}ms")
      assert(!new java.io.File(s"$landing/stall.csv").exists(),
        "partial object left behind after timeout")
    } finally server.stop(0)
  }

  test("file_progress events carry Content-Length percent; mbps reported") {
    val payload = ("x" * 200000).getBytes
    withServer(Map("/big.csv" -> payload)) { base =>
      val landing = Files.createTempDirectory("graft-land5").toString
      val captured = new java.io.ByteArrayOutputStream()
      val prevErr = System.err
      System.setErr(new java.io.PrintStream(captured, true))
      val report =
        try Ingestor.ingest(Seq(s"$base/big.csv"), landing,
          chunkBytes = 16384, dated = false)
        finally System.setErr(prevErr)
      val events = captured.toString
      assert(events.contains(""""event":"file_progress""""),
        s"no progress events in: $events")
      assert(events.contains(""""total":"${payload.length}"""".replace(
        "${payload.length}", payload.length.toString)),
        s"progress lacks Content-Length total: $events")
      // MB/s + GB-s accounting: per-file and aggregate
      assert(report.succeeded.head.mbps > 0.0)
      assert(report.totalMbps > 0.0)
      assert(report.gbSeconds() > 0.0)
      assert(report.toDF(spark).columns.contains("mbps"))
    }
  }

  test("end-to-end config-driven ingest: parameters.json -> landed files") {
    val payload = ("x" * 2048).getBytes
    withServer(Map(
      "/dl/rent_contracts.csv" -> payload,
      "/dl/other.bin" -> "y".getBytes)) { base =>
      val landing = Files.createTempDirectory("graft-cfg").toString
      val cfgPath = Files.createTempFile("graft-params", ".json")
      Files.writeString(cfgPath,
        s"""{
           |  "file_urls": ["$base/dl/rent_contracts.csv", "$base/dl/other.bin"],
           |  "s3_path_prefix": "raw",
           |  "concurrency": 2,
           |  "http_chunk_kb": 4
           |}""".stripMargin)
      val report = Ingestor.ingestFromConfig(spark, cfgPath.toString, landing)
      assert(report.failed.isEmpty, report.failed.mkString("; "))
      // the default SUFFIX_MAP routes the rent_contracts URL; the
      // unmatched URL falls back to its basename — both under the
      // config's path prefix in the dated layout
      val rc = Ingestor.datedPath(s"$landing/raw", "rent_contracts.csv")
      val ob = Ingestor.datedPath(s"$landing/raw", "other.bin")
      assert(new java.io.File(rc).length() == payload.length)
      assert(new java.io.File(ob).exists())
    }
  }

  test("readConfig defaults mirror the reference knobs; suffix_map overrides") {
    val minimal = Files.createTempFile("graft-params-min", ".json")
    Files.writeString(minimal, """{"file_urls": ["http://x/y.csv"]}""")
    val c = Ingestor.readConfig(spark, minimal.toString)
    assert(c.fileUrls == Seq("http://x/y.csv"))
    assert(c.pathPrefix == "raw")
    assert(c.concurrency == 2)
    assert(c.chunkBytes == 1024 * 1024)
    assert(c.suffixMap == Ingestor.DefaultSuffixMap)

    val overridden = Files.createTempFile("graft-params-ovr", ".json")
    Files.writeString(overridden,
      """{"file_urls": ["http://x/y.csv"],
        |  "suffix_map": {"special": "special.csv"}}""".stripMargin)
    val o = Ingestor.readConfig(spark, overridden.toString)
    assert(o.suffixMap == Map("special" -> "special.csv"))
  }

  test("datedUrls enumerates the template over a day range") {
    val urls = Ingestor.datedUrls(
      "https://example.com/AIS_{date}.zip", "2024-02-27", 3)
    assert(urls == Seq(
      "https://example.com/AIS_2024_02_27.zip",
      "https://example.com/AIS_2024_02_28.zip",
      "https://example.com/AIS_2024_02_29.zip"))
  }

  test("OP-09 url routing: suffix map match, basename fallback") {
    val m = Map("rent_contracts" -> "rent_contracts.csv")
    assert(Ingestor.suffixFromUrl(
      "https://x/api?download=Rent_Contracts.csv", m) == "rent_contracts.csv")
    assert(Ingestor.suffixFromUrl("https://x/path/file.csv") == "file.csv")
    assert(Ingestor.suffixFromUrl("https://x/") == "data.csv")
  }

  test("dated landing layout: {prefix}/{yyyy/MM/dd}/{name}") {
    val p = Ingestor.datedPath("/tmp/landing", "t.csv")
    assert(p.matches("/tmp/landing/\\d{4}/\\d{2}/\\d{2}/t\\.csv"))
  }
}
