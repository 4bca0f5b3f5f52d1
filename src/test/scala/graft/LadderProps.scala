package graft

import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}

import graft.etl.SchemaOptimizer

/** ScalaCheck properties for the OP-28 downcast ladder (SURVEY §5.2):
  * runs under sbt's scalacheck framework alongside the ScalaTest suites.
  */
object LadderProps extends Properties("DowncastLadder") {

  private val boundedPair: Gen[(Long, Long)] = for {
    a <- Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)
    b <- Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)
  } yield (math.min(a, b), math.max(a, b))

  property("chosen type always holds the observed range") =
    Prop.forAll(boundedPair) { case (lo, hi) =>
      SchemaOptimizer.minimalIntType(Some(lo), Some(hi)) match {
        case _: DecimalType => lo >= 0 // only the unsigned-64 rung
        case dt =>
          val (rl, rh) = SchemaOptimizer.typeRange(dt)
          rl <= lo && hi <= rh
      }
    }

  property("widening the range never narrows the chosen type") =
    Prop.forAll(boundedPair) { case (lo, hi) =>
      def width(t: DataType): Int = t match {
        case BooleanType => 0
        case ByteType => 1
        case ShortType => 2
        case IntegerType => 3
        case LongType => 4
        case _ => 5
      }
      val base = SchemaOptimizer.minimalIntType(Some(lo), Some(hi))
      val wider = SchemaOptimizer.minimalIntType(
        Some(if (lo > Long.MinValue + 1) lo - 1 else lo),
        Some(if (hi < Long.MaxValue) hi + 1 else hi))
      // the unsigned-64 rung (Decimal) sits beside Long, not above it:
      // widening 0..2^32 to -1..2^32+1 legitimately switches ladders
      base.isInstanceOf[DecimalType] || wider.isInstanceOf[DecimalType] ||
        width(wider) >= width(base)
    }

  property("nonnegative singleton ranges up to 255 fit Boolean or Short") =
    Prop.forAll(Gen.chooseNum(0L, 255L)) { v =>
      val t = SchemaOptimizer.minimalIntType(Some(v), Some(v))
      t == BooleanType || t == ShortType
    }
}
