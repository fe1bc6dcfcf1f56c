package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class LshPlannerSpec extends AnyFunSuite with Matchers {

  test("S-curve is the MMDS formula, monotone in s, pinned at a " +
    "hand-computed point") {
    val p = LshPlanner.LshPlan(16, 4, 0.5, 0.0, 0.0)
    // hand value: 1 - (1 - 0.5^4)^16 = 1 - 0.9375^16
    p.sCurve(0.5) shouldBe (1.0 - math.pow(0.9375, 16)) +- 1e-12
    p.sCurve(0.0) shouldBe 0.0 +- 1e-12
    p.sCurve(1.0) shouldBe 1.0 +- 1e-12
    val samples = (0 to 100).map(_ / 100.0).map(p.sCurve)
    samples.sliding(2).foreach { case Seq(a, b) => b should be >= a }
  }

  test("inflection matches (1/b)^(1/r) and sits where the curve " +
    "crosses ~1/2") {
    val p = LshPlanner.LshPlan(32, 4, 0.5, 0.0, 0.0)
    p.inflection shouldBe math.pow(1.0 / 32, 0.25) +- 1e-12
    // at the inflection the curve is 1 - (1 - 1/b)^b -> 1 - 1/e ~ 0.63;
    // it brackets 0.5 within a small neighborhood
    p.sCurve(p.inflection * 0.8) should be < 0.5
    p.sCurve(p.inflection * 1.2) should be > 0.5
  }

  test("planning is threshold-sensitive: high thresholds buy more " +
    "rows per band, low thresholds more bands") {
    val strict = LshPlanner.plan(128, 0.9)
    val loose = LshPlanner.plan(128, 0.3)
    strict.rowsPerBand should be > loose.rowsPerBand
    loose.bands should be > strict.bands
    // each chosen plan's effective threshold lands near its target
    math.abs(strict.inflection - 0.9) should be < 0.25
    math.abs(loose.inflection - 0.3) should be < 0.25
  }

  test("chosen plan minimizes error area over ALL divisor splits of " +
    "the budget") {
    for (t <- Seq(0.3, 0.5, 0.8); n <- Seq(64, 100, 128)) {
      val best = LshPlanner.plan(n, t)
      val all = LshPlanner.candidates(n, t)
      all.foreach(p => best.errorArea should be <= p.errorArea + 1e-12)
      best.bands * best.rowsPerBand should be <= n
    }
  }

  test("fnWeight shifts the choice toward recall: heavier FN penalty " +
    "never increases the false-negative area") {
    for (t <- Seq(0.5, 0.8)) {
      val balanced = LshPlanner.plan(128, t, fnWeight = 1.0)
      val recallish = LshPlanner.plan(128, t, fnWeight = 8.0)
      recallish.falseNegativeArea should be <= balanced.falseNegativeArea + 1e-12
    }
  }

  test("the engine's historical (16 bands x 4 rows) default is the " +
    "planner's own choice for n=64 near t=0.5") {
    val p = LshPlanner.plan(64, 0.5)
    p.bands * p.rowsPerBand should be <= 64
    // the planner should land within one step of the classic split —
    // pin the exact choice so regressions are loud
    p.rowsPerBand should (be >= 3 and be <= 5)
  }

  test("non-maximal band counts are in the search space and win when " +
    "the budget-exhausting split overshoots the threshold") {
    // at n=32, t=0.1 every maximal split (b = n/r) has its inflection
    // well above or below t; the optimum uses FEWER bands than the
    // budget allows (verified against a brute-force sweep of all
    // b*r <= n)
    val best = LshPlanner.plan(32, 0.1)
    val maximalOnly = (1 to 32).map { r =>
      val b = 32 / r
      val all = LshPlanner.candidates(32, 0.1)
      all.find(p => p.bands == b && p.rowsPerBand == r).get
    }.minBy(_.errorArea)
    best.errorArea should be <= maximalOnly.errorArea
    best.bands * best.rowsPerBand should be <= 32
    // and the winner here really is non-maximal
    best.bands should be < (32 / best.rowsPerBand)
  }

  test("degenerate budgets and bad inputs fail loudly or stay sane") {
    val one = LshPlanner.plan(1, 0.5)
    one.bands shouldBe 1
    one.rowsPerBand shouldBe 1
    an[IllegalArgumentException] should be thrownBy
      LshPlanner.plan(0, 0.5)
    an[IllegalArgumentException] should be thrownBy
      LshPlanner.plan(64, 0.0)
    an[IllegalArgumentException] should be thrownBy
      LshPlanner.plan(64, 1.0)
    an[IllegalArgumentException] should be thrownBy
      LshPlanner.plan(64, 0.5, fnWeight = 0.0)
  }

  test("FP and FN areas are true integrals: a plan with everything " +
    "below threshold candidate-free has zero FP area") {
    // b=1, r=64: the curve is ~0 everywhere except s~1
    val p = LshPlanner.candidates(64, 0.5).find(_.rowsPerBand == 64).get
    p.falsePositiveArea shouldBe 0.0 +- 1e-9
    p.falseNegativeArea should be > 0.3 // misses most true dups
  }
}
