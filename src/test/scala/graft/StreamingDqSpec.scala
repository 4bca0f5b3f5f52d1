package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Dq
import graft.streaming.StreamingDq

/** Always-on dq monitor: per-batch profiles compared against a stored
  * baseline with the SAME predicate as the batch `dq diff` report.
  */
class StreamingDqSpec extends AnyFunSuite with TestSpark {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", DoubleType)))

  test("healthy batch quiet, degraded batch alerts on null rate and mean") {
    val landing = Files.createTempDirectory("sdq-land").toString
    val baseline = Files.createTempDirectory("sdq-base").toString
    val out = Files.createTempDirectory("sdq-out").toString

    // baseline: 100 rows, no nulls, v = k * 2
    val base = spark.range(100).select(col("id").as("k"),
      (col("id") * 2).cast("double").as("v"))
    Dq.report(base, "t", baseline)

    def writeBatch(name: String, rows: Seq[String]): Unit =
      Files.write(Paths.get(landing, name), rows.mkString("\n").getBytes)

    // batch 1: the same distribution — nothing drifts
    writeBatch("b1.json",
      (0L until 100L).map(i => s"""{"k":$i,"v":${i * 2}.0}"""))
    StreamingDq.start(spark, landing, schema, baseline, out)
      .awaitTermination()
    val a1 = spark.read.parquet(s"$out/alerts/batch=0")
      .filter(col("drifted")).collect()
    assert(a1.isEmpty, s"healthy batch flagged: ${a1.mkString(", ")}")

    // batch 2: half the values null, survivors shifted 10x
    writeBatch("b2.json",
      (0L until 100L).map(i =>
        if (i % 2 == 0) s"""{"k":$i,"v":null}"""
        else s"""{"k":$i,"v":${i * 20}.0}"""))
    StreamingDq.start(spark, landing, schema, baseline, out)
      .awaitTermination()
    val a2 = spark.read.parquet(s"$out/alerts/batch=1")
      .filter(col("drifted"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(a2.contains(("v", "null_rate")), s"null-rate drift missed: $a2")
    assert(a2.contains(("v", "mean")), s"mean drift missed: $a2")
    // the key column stayed healthy
    assert(!a2.exists(_._1 == "k"), s"k flagged spuriously: $a2")
  }

  test("monitor refuses to start without a baseline") {
    val landing = Files.createTempDirectory("sdq-land2").toString
    val out = Files.createTempDirectory("sdq-out2").toString
    val missing = Files.createTempDirectory("sdq-miss").toString + "/nope"
    val e = intercept[IllegalArgumentException] {
      StreamingDq.start(spark, landing, schema, missing, out)
    }
    assert(e.getMessage.contains("baseline"))
  }
}
