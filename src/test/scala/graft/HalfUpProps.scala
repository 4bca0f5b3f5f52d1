package graft

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the HALF-UP cross-multiplied integer
  * division rule — the repo's float-free emission discipline (q210/
  * q218/q242/q244/q257/q270/q271): a rational a/b lands on an integer
  * e-grid as `(2·g·a + b) DIV (2·b)` with every operand exact
  * (DECIMAL(38,0) in Spark, HUGEINT in DuckDB). These properties pin
  * the ALGEBRA the engine and oracle both rely on, against BigDecimal
  * HALF_UP as ground truth — if a future refactor bends the identity
  * (dropping the +b, flooring instead of half-up, overflowing), this
  * suite goes red before any oracle does.
  */
object HalfUpProps extends Properties("HalfUpDiv") {

  private def halfUp(g: BigInt, a: BigInt, b: BigInt): BigInt =
    (2 * g * a + b) / (2 * b) // BigInt / is floor for positive operands

  private val pos: Gen[(Long, Long)] = for {
    a <- Gen.chooseNum(0L, 1000000000000L)
    b <- Gen.chooseNum(1L, 1000000000000L)
  } yield (a, b)

  private val grids = Gen.oneOf(1L, 1000000L, 1000000000L)

  property("equals BigDecimal HALF_UP on the same grid") =
    Prop.forAll(pos, grids) { case ((a, b), g) =>
      val want = (BigDecimal(a) * g / BigDecimal(b))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt
      halfUp(g, a, b) == want
    }

  property("exact rationals on the grid pass through unchanged") =
    Prop.forAll(Gen.chooseNum(0L, 1000000L), Gen.chooseNum(1L, 1000L)) {
      (q, b) =>
        // a/b = q/1e6 exactly => the e6 emission is exactly q
        halfUp(1000000L, BigInt(q) * b, BigInt(1000000L) * b) == BigInt(q)
    }

  property("monotone in the numerator") =
    Prop.forAll(pos) { case (a, b) =>
      halfUp(1000000L, a, b) <= halfUp(1000000L, a + 1, b)
    }

  property("error vs the true rational is at most half a grid step") =
    Prop.forAll(pos, grids) { case ((a, b), g) =>
      // |halfUp/g - a/b| <= 1/(2g)  <=>  |2*b*halfUp - 2*g*a| <= b
      val h = halfUp(g, a, b)
      (2 * BigInt(b) * h - 2 * BigInt(g) * a).abs <= BigInt(b)
    }
}
