package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Multimodal

/** Binary-column plumbing: schema, deterministic metadata, stubbed
  * decode batch shape, frame sampling.
  */
class MultimodalSpec extends AnyFunSuite with TestSpark {

  private lazy val docs = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("source", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "hello world of bytes", "s0"),
        Row(2L, "x" * 100, "s1"),
        Row(3L, "", "s2")), 2),
      schema)
  }

  test("media table carries binary payload + typed metadata") {
    val m = Multimodal.mediaTable(docs)
    assert(m.schema("media").dataType == BinaryType)
    val r = m.filter(col("doc_id") === 1L).head()
    assert(new String(r.getAs[Array[Byte]]("media")) == "hello world of bytes")
    assert(r.getAs[Int]("width") == 20)
    assert(r.getAs[Int]("n_frames") == 20 % 16)
  }

  test("decode stub: deterministic fixed-dim features via mapPartitions") {
    val f = Multimodal.decodeStub(Multimodal.mediaTable(docs), dim = 8)
    val rows = f.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(rows(1L).size == 8)
    assert(rows(3L).forall(_ == 0.0)) // empty payload -> zero features
    // determinism: second run bit-identical
    val again = Multimodal.decodeStub(Multimodal.mediaTable(docs), dim = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(rows == again)
  }

  test("frame sampling is metadata-only (plan before decode)") {
    val s = Multimodal.sampleFrames(Multimodal.mediaTable(docs), stride = 3)
    val r = s.filter(col("doc_id") === 1L).head()
    assert(r.getSeq[Int](r.fieldIndex("sampled_frames")).toList == List(0, 3))
  }

  private lazy val mediaDocs = {
    // 20 payloads >= 64 bytes with distinct byte-value profiles, one
    // short payload (degenerate branch), and one "re-encoded" twin of
    // doc 0: same positions, vowels value-shifted (different md5)
    val rng = new scala.util.Random(11)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet")
    def text(): String = Seq.fill(40)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    val base = (0L until 20L).map(i => (i, text()))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        (base :+ (98L, "tiny")).map(Row.fromTuple), 2),
      schema)
  }

  private def asMedia(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), col("text").cast("binary").as("media"))

  test("perceptual hash: deterministic, short-payload zero, reference bits") {
    // hand-checkable payload: 64 bytes ascending 0..63 -> every bucket
    // holds one byte and every gradient compare is "less" -> all 63
    // bits set
    val asc = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, (0 until 64).map(_.toByte).toArray),
        Row(2L, (0 until 64).reverse.map(_.toByte).toArray), // descending -> 0 bits
        Row(3L, Array.fill[Byte](63)(7)))), // < 64 bytes -> 0
      StructType(Seq(StructField("doc_id", LongType),
        StructField("media", BinaryType))))
    val got = Multimodal.perceptualHash(asc).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == (1L << 63) - 1, s"ascending: ${got(1L)}")
    assert(got(2L) == 0L, s"descending: ${got(2L)}")
    assert(got(3L) == 0L, s"short: ${got(3L)}")
  }

  test("phash pairs recover planted value-perturbed twins, nothing else") {
    val planted = Multimodal.mediaWithPlantedNearDups(
      mediaDocs.withColumn("source", lit("s0")))
    val pairs = Multimodal.phashPairs(planted, maxHamming = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // doc 0 is the only %20==0 doc in the fixture (98 % 20 = 18, and
    // "tiny" is under the 64-byte grid anyway)
    val plantIds = Set(0L)
    plantIds.foreach { id =>
      val hit = pairs.find(p => p._1 == id && p._2 == id + Multimodal.PlantIdOffset)
      assert(hit.isDefined, s"planted twin of $id not recovered: ${pairs.toList}")
      assert(hit.get._3 <= 2, s"plant $id hamming too high: ${hit.get}")
    }
    // no cross pairs between unrelated random docs
    val unexpected = pairs.filterNot(p => plantIds.contains(p._1) &&
      p._2 == p._1 + Multimodal.PlantIdOffset)
    assert(unexpected.isEmpty, s"false-positive media pairs: ${unexpected.toList}")
    // the twins are NOT exact dups: payload md5s differ
    val md5s = planted.filter(col("doc_id").isin(0L, Multimodal.PlantIdOffset))
      .select(md5(col("media"))).collect().map(_.getString(0)).toSet
    assert(md5s.size == 2, "plant must differ byte-wise from its base")
  }

  test("clip similarity: frame-hash overlap pairs re-encoded clips, not strangers") {
    // deterministic 330-byte "clips": n_frames = 330 % 16 = 10, frames
    // of 33 bytes on the 16-bucket grid. Clip 2 is clip 1 re-encoded
    // (every 13th byte value-shifted +1); clip 3 is unrelated (reversed
    // pattern); clip 4 has n_frames = 0 (320 % 16) and must not appear.
    val base = Array.tabulate[Byte](330)(i => ((i * 7) % 251).toByte)
    val twin = base.clone()
    for (i <- twin.indices by 13)
      twin(i) = ((twin(i) + 1) & 0xFF).toByte
    val other = base.reverse
    val noFrames = Array.tabulate[Byte](320)(i => ((i * 11) % 241).toByte)
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, base), Row(2L, twin), Row(3L, other), Row(4L, noFrames)), 2),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("media", BinaryType))))
    val pairs = Multimodal.clipSimilarityPairs(media, minSim = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.contains((1L, 2L)),
      s"re-encoded clip twin not paired: $pairs")
    assert(pairs((1L, 2L)) >= 0.5 && pairs((1L, 2L)) <= 1.0)
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated clip paired: $pairs")
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L),
      "clip with zero frames must be excluded")
    // frame hashes themselves: identical clips -> identical multiset;
    // the twin shares most but not all frames with the base
    val fhBase = Multimodal.frameHashes(
        media.filter(col("doc_id") === 1L)).collect()
      .map(r => r.getLong(2)).sorted.toList
    assert(fhBase.count(_ != 0L) == 10, s"expected 10 live frames: $fhBase")
  }

  test("clip precollapse == direct on a clone-heavy corpus") {
    // exact clones are where the two plans diverge in COST; the answer
    // must be identical: clones of base/twin at ids 5/6, a frameless
    // clip (4) and its clone (7) that must appear in NO pair
    val base = Array.tabulate[Byte](330)(i => ((i * 7) % 251).toByte)
    val twin = base.clone()
    for (i <- twin.indices by 13)
      twin(i) = ((twin(i) + 1) & 0xFF).toByte
    val other = base.reverse
    val noFrames = Array.tabulate[Byte](320)(i => ((i * 11) % 241).toByte)
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, base), Row(2L, twin), Row(3L, other), Row(4L, noFrames),
        Row(5L, base.clone()), Row(6L, twin.clone()),
        Row(7L, noFrames.clone())), 2),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("media", BinaryType))))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = rows(Multimodal.clipSimilarityPairs(media, minSim = 0.5))
    val pre = rows(Multimodal.clipSimilarityPairsPrecollapsed(media, minSim = 0.5))
    assert(pre == direct, s"precollapse drifted:\n  direct=$direct\n  pre=$pre")
    // clone pairs present at exactly 1.0; frameless clones absent
    assert(direct.contains((1L, 5L, 1.0)) && direct.contains((2L, 6L, 1.0)))
    assert(!direct.exists(p => Set(p._1, p._2).intersect(Set(4L, 7L)).nonEmpty))
    // cross pairs expand to every member combination with the rep sim
    val s12 = direct.find(p => p._1 == 1L && p._2 == 2L).get._3
    Seq((1L, 6L), (2L, 5L), (5L, 6L)).foreach { case (a, b) =>
      assert(direct.contains((a, b, s12)), s"missing expanded pair ($a,$b)")
    }
  }

  test("codec seam: a REAL image codec (JDK ImageIO PNG) swaps in without caller changes") {
    // The contract decodeStub stands in for: a genuine codec — the JDK's
    // own PNG reader, no new dependencies — plugs into the decodeWith
    // seam and round-trips pixel data through the same mapPartitions
    // machinery (init once per partition, decode per row).
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO
    def png(pixels: Seq[Int]): Array[Byte] = { // 2x2 RGB image
      val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
      pixels.zipWithIndex.foreach { case (rgb, i) => img.setRGB(i % 2, i / 2, rgb) }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val pxA = Seq(0xFF0000, 0x00FF00, 0x0000FF, 0xFFFFFF)
    val pxB = Seq(0x000000, 0x808080, 0x010203, 0x405060)
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1L, png(pxA)), Row(2L, png(pxB))), 2),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("media", BinaryType))))
    // per-partition init builds the decoder closure; per-row decode
    // parses the PNG and emits the 2x2 raster as 4 packed-RGB doubles
    val feats = Multimodal.decodeWith(media, () => {
      bytes => {
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        (for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
          yield (img.getRGB(x, y) & 0xFFFFFF).toDouble).toArray
      }
    }).collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // PNG is lossless: every pixel of both images round-trips exactly
    assert(feats(1L) == pxA.map(_.toDouble), s"got ${feats(1L)}")
    assert(feats(2L) == pxB.map(_.toDouble), s"got ${feats(2L)}")
    // and the stub rides the SAME seam (schema + shape identical)
    val stub = Multimodal.decodeStub(media, dim = 4)
    assert(stub.schema.fieldNames.toSeq == Seq("doc_id", "features"))
    assert(stub.count() == 2L)
  }

  test("zero-hash payloads pair through the md5 exact route, never the banded join") {
    // phash == 0 covers two real classes: sub-64-byte payloads and
    // constant/blank media (zero gradient). They are kept out of the
    // band index (one degenerate 0-hash bucket = quadratic self-join)
    // but identical payloads must STILL pair — via md5 equality at
    // Hamming 0 inside phashPairs.
    val blankA = Array.fill[Byte](100)(7) // constant >= 64 bytes: phash 0
    val blankB = Array.fill[Byte](100)(7) // identical content
    val blankC = Array.fill[Byte](100)(9) // constant but DIFFERENT content
    val shortA = "tiny payload".getBytes // sub-grid: phash 0
    val shortB = "tiny payload".getBytes // identical short content
    val normal = Array.tabulate[Byte](200)(i => ((i * 7) % 251).toByte)
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(10L, blankA), Row(11L, blankB), Row(12L, blankC),
        Row(20L, shortA), Row(21L, shortB), Row(30L, normal)), 2),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("media", BinaryType))))
    // all four zero-hash rows really do hash to 0
    val ph = Multimodal.perceptualHash(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(10L, 11L, 12L, 20L, 21L).foreach(id =>
      assert(ph(id) == 0L, s"doc $id expected phash 0, got ${ph(id)}"))
    assert(ph(30L) != 0L)
    val pairs = Multimodal.phashPairs(media, maxHamming = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // identical zero-hash payloads pair at Hamming 0; differing-content
    // constants do NOT (phash alone could not tell them apart)
    assert(pairs == Set((10L, 11L, 0), (20L, 21L, 0)), s"got $pairs")
  }
}
