package graft

import java.net.InetSocketAddress
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Pipeline
import graft.ingest.Ingestor

/** One-command flagship flow: parameters.json → HTTP ingest → CSV read
  * with null normalization → SchemaOptimizer → dated partitioned parquet
  * + quarantine audit.
  */
class PipelineSpec extends AnyFunSuite with TestSpark {

  test("config to optimized parquet end to end") {
    val csv =
      """id,name,name_ar,qty
        |1,alpha,x,5
        |2,None,y,6
        |3,NULL,z,7
        |""".stripMargin.getBytes
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/dl/rent_contracts.csv", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        ex.sendResponseHeaders(200, csv.length.toLong)
        ex.getResponseBody.write(csv)
        ex.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val landing = Files.createTempDirectory("graft-pipe-land").toString
      val out = Files.createTempDirectory("graft-pipe-out").toString
      val cfg = Files.createTempFile("graft-pipe-params", ".json")
      Files.writeString(cfg,
        s"""{"file_urls": ["$base/dl/rent_contracts.csv"],
           |  "s3_path_prefix": "raw", "concurrency": 1}""".stripMargin)

      val (report, tables) = Pipeline.run(spark, cfg.toString, landing, out)
      assert(report.failed.isEmpty, report.failed.mkString("; "))
      // the CSV landed under the dated raw layout before preprocessing
      assert(new java.io.File(
        Ingestor.datedPath(s"$landing/raw", "rent_contracts.csv")).exists())

      assert(tables.map(_.table) == Seq("rent_contracts"))
      val t = tables.head
      assert(t.rows == 3 && t.quarantined == 0)

      val optimized = spark.read.parquet(s"$out/rent_contracts/optimized")
      // regex column exclusion dropped the _ar duplicate; the dated
      // partition column is present for pruning
      assert(!optimized.columns.contains("name_ar"))
      assert(optimized.columns.contains("ingest_date"))
      // multi-token null markers (None/NULL) were normalized at read time
      assert(optimized.filter(optimized("name").isNull).count() == 2)
      // quarantine audit path exists alongside (empty here — no violators)
      assert(spark.read.parquet(s"$out/rent_contracts/quarantine").count() == 0)
      // kept + quarantined == ingested rows (the audit invariant)
      assert(t.rows + t.quarantined == 3)
    } finally server.stop(0)
  }
}
