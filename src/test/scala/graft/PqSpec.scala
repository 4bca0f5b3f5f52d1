package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Pq

/** Product quantization: code bounds and determinism, clone-ranks-first,
  * and ADC recall against exact L2 on a clustered fixture.
  */
class PqSpec extends AnyFunSuite with TestSpark {

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** 8 well-separated cluster centers in 64-d; 25 noisy members each,
    * plus vec 999 = an exact clone of vec 0.
    */
  private lazy val vectors = {
    val rng = new scala.util.Random(11)
    val centers = Array.fill(8, 64)((rng.nextDouble() - 0.5) * 10)
    val rows = (0L until 200L).map { i =>
      val c = centers((i % 8).toInt)
      Row(i, c.map(x => (x + rng.nextGaussian() * 0.3).toFloat).toSeq)
    }
    val clone = Seq(Row(999L, rows.head.getSeq[Float](1)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows ++ clone, 4), schema)
  }

  private def exactL2Top(qid: Long, k: Int): Seq[Long] = {
    val all = vectors.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val q = all.find(_._1 == qid).get._2
    all.filter(_._1 != qid)
      .map { case (id, v) =>
        id -> v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
      }
      .sortBy { case (id, d) => (d, id) }.take(k).map(_._1).toSeq
  }

  test("codes are in range and independent of input partitioning") {
    val cb = Pq.train(vectors, iters = 2)
    assert(cb.count() == Pq.DefaultM * Pq.DefaultK)
    val codes1 = Pq.encode(vectors, cb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val codes2 = Pq.encode(vectors.repartition(9), cb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes1 == codes2, "codes depend on input layout")
    assert(codes1.values.forall(cs =>
      cs.length == Pq.DefaultM && cs.forall(c => c >= 0 && c < Pq.DefaultK)))
    // the exact clone gets the exact same codes
    assert(codes1(999L) == codes1(0L))
  }

  test("exact clone of the query ranks first by ADC distance") {
    val cb = Pq.train(vectors, iters = 2)
    val codes = Pq.encode(vectors, cb)
    val qv = vectors.filter(col("vec_id") === 0L)
      .select(graft.llm.Similarity.asDouble(col("embedding")))
      .head().getSeq[Double](0).toArray
    val top = Pq.topK(codes, cb, qv, k = 5, excludeId = Some(0L))
      .collect().map(_.getLong(0)).toSeq
    assert(top.head == 999L, s"clone not first: $top")
  }

  test("native PQ assignment and ADC are bit-identical to the HOF reference forms") {
    import graft.functions.Fns
    val cb = Pq.train(vectors, iters = 2)
    val rows = cb.collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2).toArray)).toMap
    val m = rows.keys.map(_._1).max + 1
    val k = rows.keys.map(_._2).max + 1
    val books = (0 until m).map(s => (0 until k).map(c => rows((s, c))))
    val dsub = books.head.head.length
    val vdf = vectors.select(col("vec_id"),
      graft.llm.Similarity.asDouble(col("embedding")).as("v"))
    val nat = vdf.select(col("vec_id"),
        Fns.pqAssign(col("v"), books.map(_.map(_.toSeq).toSeq).toSeq).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val hof = vdf.select(col("vec_id"),
        Pq.codesExprHof(m, dsub, books).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(nat == hof, "native assignment diverged from the HOF reference")

    // ADC: same lookup-table sum through both forms
    val qv = vectors.filter(col("vec_id") === 3L)
      .select(graft.llm.Similarity.asDouble(col("embedding")))
      .head().getSeq[Double](0).toArray
    val table: Seq[Seq[Double]] = books.indices.map { s =>
      books(s).map { cv =>
        cv.indices.map(i => {
          val d = qv(s * dsub + i) - cv(i); d * d
        }).sum
      }.toSeq
    }
    val codes = Pq.encode(vectors, cb)
    val natD = codes.select(col("vec_id"),
        Fns.pqAdcDist(col("codes"), table).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val hofD = codes.select(col("vec_id"),
        aggregate(
          zip_with(col("codes"), typedlit(table),
            (c, row) => element_at(row, c + 1)),
          lit(0.0), (acc, e) => acc + e).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(natD == hofD, "native ADC diverged from the HOF reference")
  }

  test("stored PQ index answers equal fresh encode; append never re-encodes history") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-store").toString
    Pq.buildStore(vectors, dir, iters = 2)
    val cb = spark.read.parquet(s"$dir/codebook")
    val qv = vectors.filter(col("vec_id") === 0L)
      .select(graft.llm.Similarity.asDouble(col("embedding")))
      .head().getSeq[Double](0).toArray
    val fresh = Pq.topK(Pq.encode(vectors, cb), cb, qv, k = 5,
      excludeId = Some(0L)).collect().toSeq
    val stored = Pq.topKStored(spark, dir, qv, k = 5, excludeId = Some(0L))
      .collect().toSeq
    assert(stored == fresh, s"stored != fresh: $stored vs $fresh")
    // append a second clone of vec 0: it must join the top without the
    // existing codes being rewritten
    val filesBefore = new java.io.File(s"$dir/codes").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val extra = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1000L, vectors.filter(col("vec_id") === 0L)
          .head().getSeq[Float](1))), 1), schema)
    Pq.appendStore(extra, dir)
    val filesAfter = new java.io.File(s"$dir/codes").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(filesBefore.subsetOf(filesAfter), "append rewrote existing code files")
    val top = Pq.topKStored(spark, dir, qv, k = 2, excludeId = Some(0L))
      .collect().map(_.getLong(0)).toSet
    assert(top == Set(999L, 1000L), s"clones not on top: $top")
  }

  test("ivf-pq composition runs end to end with ascending distances") {
    val got = graft.queries.Registry.queries("q92_ann_ivfpq")(
      spark, "/root/testdata/sf0.001").collect()
    assert(got.nonEmpty)
    val ids = got.map(_.getLong(0)).toSeq
    assert(ids.distinct == ids && !ids.contains(0L))
    val dists = got.map(_.getDouble(1)).toSeq
    assert(dists == dists.sorted, s"distances not ascending: $dists")
  }

  test("ADC top-10 has useful recall vs exact L2 on clustered data") {
    val cb = Pq.train(vectors, iters = 3)
    val codes = Pq.encode(vectors, cb)
    val qv = vectors.filter(col("vec_id") === 7L)
      .select(graft.llm.Similarity.asDouble(col("embedding")))
      .head().getSeq[Double](0).toArray
    val got = Pq.topK(codes, cb, qv, k = 10, excludeId = Some(7L))
      .collect().map(_.getLong(0)).toSet
    val exact = exactL2Top(7L, 10).toSet
    val recall = got.intersect(exact).size / 10.0
    assert(recall >= 0.5, s"ADC recall $recall vs exact top-10 " +
      s"(got $got, exact $exact)")
  }
}
