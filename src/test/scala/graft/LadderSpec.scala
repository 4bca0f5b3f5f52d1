package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SchemaOptimizer

/** OP-28 downcast ladder: boundary cases ±1 around every rung edge
  * (SURVEY §5.2) plus round-trip properties.
  */
class LadderSpec extends AnyFunSuite {
  private def t(lo: Long, hi: Long): DataType =
    SchemaOptimizer.minimalIntType(Some(lo), Some(hi))

  test("all-null defaults to Int32 like the reference") {
    assert(SchemaOptimizer.minimalIntType(None, None) == IntegerType)
    assert(SchemaOptimizer.minimalIntType(Some(1L), None) == IntegerType)
  }

  test("boolean rung for {0,1}") {
    assert(t(0, 1) == BooleanType)
    assert(t(0, 0) == BooleanType)
    assert(t(1, 1) == BooleanType)
    assert(t(0, 2) != BooleanType)
    assert(t(-1, 1) != BooleanType)
  }

  test("unsigned ladder boundaries (UInt8/16/32 mapping per SURVEY §1.2)") {
    assert(t(0, 255) == ShortType)
    assert(t(0, 256) == IntegerType)
    assert(t(0, 65535) == IntegerType)
    assert(t(0, 65536) == LongType)
    assert(t(0, 4294967295L) == LongType)
    assert(t(0, 4294967296L) == DecimalType(20, 0))
    assert(t(0, Long.MaxValue) == DecimalType(20, 0))
  }

  test("signed ladder boundaries") {
    assert(t(-1, 127) == ByteType)
    assert(t(-1, 128) == ShortType)
    assert(t(-128, 127) == ByteType)
    assert(t(-129, 0) == ShortType)
    assert(t(-32768, 32767) == ShortType)
    assert(t(-32769, 0) == IntegerType)
    assert(t(-1, 32768) == IntegerType)
    assert(t(Int.MinValue, Int.MaxValue) == IntegerType)
    assert(t(Int.MinValue.toLong - 1, 0) == LongType)
    assert(t(-1, Int.MaxValue.toLong + 1) == LongType)
    assert(t(Long.MinValue, Long.MaxValue) == LongType)
  }

  test("property: chosen type's range always contains [min, max]") {
    // Seeded pseudo-random sweep (deterministic — no flaky CI) plus a
    // dense sweep around every rung boundary.
    val rng = new scala.util.Random(42)
    val boundaryPoints = Seq(0L, 1L, 127L, 128L, 255L, 256L, 32767L, 32768L,
      65535L, 65536L, Int.MaxValue.toLong, Int.MaxValue.toLong + 1,
      4294967295L, 4294967296L).flatMap(v => Seq(v - 1, v, v + 1, -v))
    val randomPairs = Seq.fill(2000) {
      val a = rng.nextLong(); val b = rng.nextLong()
      (math.min(a, b), math.max(a, b))
    }
    val boundaryPairs = for (a <- boundaryPoints; b <- boundaryPoints if a <= b)
      yield (a, b)
    (randomPairs ++ boundaryPairs).foreach { case (lo, hi) =>
      val dt = t(lo, hi)
      if (dt != DecimalType(20, 0)) {
        val (rl, rh) = SchemaOptimizer.typeRange(dt)
        assert(rl <= lo && hi <= rh, s"$dt cannot hold [$lo,$hi]")
      } else assert(lo >= 0)
    }
  }
}
