package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Pca, QualityClassifier}
import graft.streaming.StreamingScore

/** Streaming scoring against stored artifacts must equal batch scoring
  * of the same rows (pure function of row + artifact), land one
  * partition per micro-batch, and never retrain on the stream.
  */
class StreamingScoreSpec extends AnyFunSuite with TestSpark {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("text", StringType)))

  private def docRows(ids: Range) = ids.map { i =>
    val good = i % 2 == 0
    (i.toLong, if (good) "en" else "de",
      if (good) (Seq("the", "a") ++ Seq.fill(40)("spark")).mkString(" ")
      else Seq.fill(10)("batch").mkString(" "))
  }

  test("streamed classifier scores == batch scores; one partition per batch") {
    // train on a seed corpus, persist the artifact
    val seed = spark.createDataFrame(
      spark.sparkContext.parallelize(
        docRows(0 until 40).map(Row.fromTuple), 2), docSchema)
    val w = QualityClassifier.train(
      QualityClassifier.features(seed, col("lang") === "en"),
      iters = 100, lr = 4.0)
    val wDir = Files.createTempDirectory("graft-sw").toString
    QualityClassifier.weightsDf(spark, w).coalesce(1)
      .write.mode("overwrite").parquet(wDir)

    // stream two micro-batches of NEW documents through the stored model
    val landing = Files.createTempDirectory("graft-sw-land").toString
    val outDir = Files.createTempDirectory("graft-sw-out").toString
    def writeBatch(name: String, ids: Range): Unit =
      Files.write(Paths.get(landing, name),
        docRows(ids).map { case (i, l, t) =>
          s"""{"doc_id":$i,"lang":"$l","text":"$t"}"""
        }.mkString("\n").getBytes)

    writeBatch("b1.json", 100 until 120)
    StreamingScore.startClassifierScore(spark, landing, docSchema, wDir,
      outDir).awaitTermination()
    writeBatch("b2.json", 120 until 140)
    StreamingScore.startClassifierScore(spark, landing, docSchema, wDir,
      outDir).awaitTermination()

    val parts = new java.io.File(s"$outDir/scores").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted
    assert(parts.length == 2, s"score partitions: ${parts.toSeq}")

    val streamed = StreamingScore.scores(spark, outDir)
      .select("doc_id", "p_score", "pred").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
    val batchDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        docRows(100 until 140).map(Row.fromTuple), 2), docSchema)
    val expected = QualityClassifier.scoreWith(
        QualityClassifier.features(batchDf, col("lang") === "en"),
        spark.read.parquet(wDir))
      .select("doc_id", "p_score", "pred").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
    assert(streamed == expected)
    // and the stored-model scores separate the stream's classes
    assert(streamed.forall { case (id, _, pred) =>
      pred == (if (id % 2 == 0) 1 else 0) })
  }

  test("streamed PCA projections == batch projections from the stored artifact") {
    val dim = 8
    val vecSchema = StructType(Seq(
      StructField("vec_id", LongType), StructField("label", IntegerType),
      StructField("embedding", ArrayType(FloatType))))
    def v(i: Int): Array[Float] =
      Array.tabulate(dim)(j => (math.sin(i * 13 + j * 5) * 3).toFloat)
    val seed = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0 until 64).map(i => Row(i.toLong, i % 3, v(i).toSeq)), 2),
      vecSchema)
    val (mu, w) = Pca.gramComponent(
      seed.select(col("vec_id"), col("label"),
        graft.llm.Similarity.asDouble(col("embedding")).as("a")))
    val cDir = Files.createTempDirectory("graft-spca").toString
    Pca.componentDf(spark, mu, w).coalesce(1)
      .write.mode("overwrite").parquet(cDir)

    val landing = Files.createTempDirectory("graft-spca-land").toString
    val outDir = Files.createTempDirectory("graft-spca-out").toString
    Files.write(Paths.get(landing, "b1.json"),
      (100 until 120).map(i =>
        s"""{"vec_id":$i,"label":${i % 3},"embedding":[${v(i).mkString(",")}]}""")
        .mkString("\n").getBytes)
    StreamingScore.startPcaProject(spark, landing, vecSchema, cDir, outDir)
      .awaitTermination()

    val streamed = StreamingScore.projections(spark, outDir)
      .select("vec_id", "p_pca").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val batchDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (100 until 120).map(i => Row(i.toLong, i % 3, v(i).toSeq)), 2),
      vecSchema)
    val expected = Pca.projectWith(
        batchDf.select(col("vec_id"), col("label"),
          graft.llm.Similarity.asDouble(col("embedding")).as("a")),
        spark.read.parquet(cDir))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(streamed == expected)
  }
}
