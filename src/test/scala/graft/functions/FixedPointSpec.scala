package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/** Differential gate for the scaledLongOrNull fast path: the margin-gated
  * integer shortcut must agree with the exact shortest-decimal BigDecimal
  * path on EVERY input — generated cents/quantity-like values, adversarial
  * half-boundary values, huge magnitudes past the fast window, and the
  * non-finite null contract.
  */
object FixedPointSpec extends Properties("fixedpoint") {

  private def same(x: Double, s: Int): Boolean =
    FixedPointOps.scaledLongOrNull(x, s) == FixedPointOps.scaledLongExact(x, s)

  private val scaleGen = Gen.choose(0, 6)

  property("cents-like 2dp money") = Prop.forAll(
    Gen.chooseNum(-100000000L, 100000000L), scaleGen) { (c, s) =>
    same(c / 100.0, s)
  }

  property("4dp rates") = Prop.forAll(
    Gen.chooseNum(-10000000L, 10000000L), scaleGen) { (c, s) =>
    same(c / 10000.0, s)
  }

  property("wide doubles") = Prop.forAll(
    Gen.chooseNum(-1e18, 1e18), scaleGen)((x, s) => same(x, s))

  property("unit interval") = Prop.forAll(
    Gen.chooseNum(-1.0, 1.0), scaleGen)((x, s) => same(x, s))

  property("rev4 shape: products of 2dp price and 2dp discount") =
    Prop.forAll(Gen.chooseNum(1L, 10000000L), Gen.chooseNum(0L, 100L)) {
      (cents, disc) => same((cents / 100.0) * (1.0 - disc / 100.0), 4)
    }

  property("adversarial half-boundary neighborhoods") = Prop.forAll(
    Gen.oneOf(0L, 1L, 7L, 123L, 99999L, 123456789L, 4499999999999999L),
    Gen.choose(0, 4), Gen.oneOf(1, -1)) { (base, s, sign) =>
    val half = sign * (base + 0.5) / math.pow(10.0, s)
    Seq(half,
      Math.nextUp(half), Math.nextDown(half),
      Math.nextUp(Math.nextUp(half)), Math.nextDown(Math.nextDown(half)))
      .forall(same(_, s))
  }

  property("fast-window edges and magnitude cliffs") = Prop.forAll(scaleGen) { s =>
    Seq(4.4e15 / math.pow(10.0, s), 4.6e15, 9.9e17, 9.99999e17, 1.1e18, 1e19)
      .forall(x => same(x, s) && same(-x, s))
  }

  property("null contract") = Prop {
    FixedPointOps.scaledLongOrNull(Double.NaN, 2) == null &&
      FixedPointOps.scaledLongOrNull(Double.PositiveInfinity, 2) == null &&
      FixedPointOps.scaledLongOrNull(Double.NegativeInfinity, 0) == null &&
      FixedPointOps.scaledLongOrNull(1e18, 0) == null &&
      FixedPointOps.scaledLongOrNull(9.99999e17, 0) == 999999000000000000L
  }
}
