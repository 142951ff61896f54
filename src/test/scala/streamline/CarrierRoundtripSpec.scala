package streamline

import java.math.{BigDecimal => JBD, RoundingMode}

import org.scalatest.funsuite.AnyFunSuite

/** Pins the numeric claim the state-rewrite/evolve carriers rest on:
  * a DECIMAL(·,4) partial sum survives the statestore read's
  * double cast and the re-ingestion cast back to DECIMAL(·,4)
  * bit-exactly — PROVIDED the value has at most 15 significant
  * digits (|sum| < 10^11 at scale 4). The mechanism is Java's
  * shortest-repr `BigDecimal.valueOf(double)` (what Spark's
  * double→decimal cast uses): any decimal of ≤15 significant digits
  * round-trips through its nearest double. Beyond ~16 digits the
  * 0.5-ulp error exceeds the scale-4 rounding radius and the
  * roundtrip CAN land on a neighboring 4-decimal — so the witnesses'
  * correctness domain is |partial sum| < 10^11, comfortably above
  * anything the fixtures (or a 10^8-row window of value ≤ 10^4)
  * produce, and the bound is pinned here rather than assumed. */
class CarrierRoundtripSpec extends AnyFunSuite {

  private def roundtrip(p: JBD): JBD =
    JBD.valueOf(p.doubleValue).setScale(4, RoundingMode.HALF_UP)

  test("scale-4 decimals below 1e11 survive the double carrier exactly") {
    val rnd = new scala.util.Random(42)
    (1 to 200000).foreach { _ =>
      // uniform unscaled value in [1, 10^15): up to 15 significant
      // digits at scale 4 (magnitude < 10^11)
      val unscaled = 1L + (rnd.nextDouble() * (1e15 - 2)).toLong
      val p = JBD.valueOf(unscaled, 4)
      assert(roundtrip(p).compareTo(p) == 0, s"roundtrip broke at $p")
    }
  }

  test("the bound is real: some 17-digit scale-4 decimal does not") {
    // exhibit a counterexample past the domain, proving the spec's
    // bound is meaningful rather than vacuously generous
    val broken = Iterator.from(0)
      .map(i => JBD.valueOf(10000000000000000L + i * 7L + 1L, 4))
      .take(100000).find(p => roundtrip(p).compareTo(p) != 0)
    assert(broken.isDefined,
      "expected a roundtrip failure beyond 16 significant digits")
  }
}
