package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class BenchGateSpec extends AnyFunSuite with Matchers {

  test("priorMedians parses the queries object out of a bench_last line") {
    val line = """{"metric":"total","unit":"sec","runs":3,""" +
      """"min_med_max":{"q1":[0.1,0.2,0.3]},"standalone":{},""" +
      """"standalone_failed":[],"queries":{"q1_agg":0.2134,""" +
      """"q30_jaccard":3.4600,"q70_vocab":1.35e0},"failed":[],""" +
      """"value":5.0,"sf":"/root/testdata/sf0.1"}"""
    val got = BenchGate.priorMedians(line)
    got("q1_agg") shouldBe 0.2134 +- 1e-12
    got("q30_jaccard") shouldBe 3.46 +- 1e-12
    got("q70_vocab") shouldBe 1.35 +- 1e-12
    // garbled / missing input disables the drift trigger, never throws
    BenchGate.priorMedians("not json") shouldBe Map.empty
    BenchGate.priorMedians("") shouldBe Map.empty
  }

  test("a noise-corrected standalone median overrides a poisoned baseline") {
    // Round N recorded q70 in-suite at 3.94 (contended window) with
    // the standalone correction 1.35 on the same line; the NEXT
    // round's drift baseline must be 1.35, or a real regression to
    // ~3.9 would hide behind the poisoned number forever.
    val line = """{"metric":"total","standalone":{"q70":1.35},""" +
      """"queries":{"q70":3.94,"q1":0.2},"value":4.1,""" +
      """"sf":"/root/testdata/sf0.1"}"""
    val got = BenchGate.priorMedians(line)
    got("q70") shouldBe 1.35 +- 1e-12 // corrected wins
    got("q1") shouldBe 0.2 +- 1e-12 // untouched without a correction
    // And the regression now fires where the old baseline was silent:
    BenchGate.needsStandalone(Seq(3.85, 3.9, 3.95), Some(got("q70"))) shouldBe true
  }

  test("priors apply only when the recorded sf matches") {
    val line = """{"metric":"total","queries":{"q1":0.2},""" +
      """"value":0.2,"sf":"/root/testdata/sf0.001"}"""
    BenchGate.priorMedians(line, "/root/testdata/sf0.001") shouldBe
      Map("q1" -> 0.2)
    // A smoke run at another scale is not a drift baseline.
    BenchGate.priorMedians(line, "/root/testdata/sf0.1") shouldBe Map.empty
    BenchGate.sfSlug("/root/testdata/sf0.1") shouldBe "_root_testdata_sf0_1"
  }

  test("quietTotal substitutes standalone medians for contended rows only") {
    val med = Seq("q1" -> 0.5, "q113" -> 6.35, "q164" -> 4.56, "q2" -> 1.0)
    val standalone = Map("q113" -> 1.79, "q164" -> 0.64, "q1" -> 0.48)
    // Contended rows read their clean standalone; quiet rows (q1, even
    // though a standalone exists for it) keep the in-suite median.
    BenchGate.quietTotal(med, standalone, Set("q113", "q164")) shouldBe
      (0.5 + 1.79 + 0.64 + 1.0) +- 1e-12
    // Quiet window: empty contended set ⇒ the plain sum (value_quiet == value).
    BenchGate.quietTotal(med, standalone, Set.empty) shouldBe
      (0.5 + 6.35 + 4.56 + 1.0) +- 1e-12
    // A contended row whose rerun ALSO failed keeps its in-suite
    // median — never invent a number.
    BenchGate.quietTotal(med, Map.empty, Set("q113")) shouldBe
      (0.5 + 6.35 + 4.56 + 1.0) +- 1e-12
  }

  test("spread trigger: one stall in the window still fires") {
    BenchGate.needsStandalone(Seq(0.4, 0.5, 1.2), None) shouldBe true
    BenchGate.needsStandalone(Seq(0.4, 0.5, 0.6), None) shouldBe false
  }

  test("drift trigger: uniformly-inflated run fires against recorded history") {
    // The round-8 artifact shape: 3.91/3.94/4.85 spreads < 2x (silent
    // under the old gate) but the prior median was 1.35 — must fire.
    BenchGate.needsStandalone(Seq(3.91, 3.94, 4.85), Some(1.35)) shouldBe true
    // Same samples with matching history: quiet host, no re-measure.
    BenchGate.needsStandalone(Seq(3.91, 3.94, 4.85), Some(3.90)) shouldBe false
    // Just under the 1.5x drift bar: no trigger.
    BenchGate.needsStandalone(Seq(1.9, 2.0, 2.1), Some(1.4)) shouldBe false
    // New query (no history): drift undetectable, spread rule only.
    BenchGate.needsStandalone(Seq(1.9, 2.0, 2.1), None) shouldBe false
  }

  test("degenerate inputs never fire") {
    BenchGate.needsStandalone(Nil, Some(1.0)) shouldBe false
    BenchGate.needsStandalone(Seq(0.0, 0.0), Some(1.0)) shouldBe false
    BenchGate.needsStandalone(Seq(1.0), Some(0.0)) shouldBe false
  }

  test("window certification: vacuous records are marked uncertified") {
    // The median-of-N protocol with standalone re-measures on: the
    // empty-contended-set certificate is meaningful.
    BenchGate.windowCertified(standaloneOn = true, runs = 3) shouldBe true
    // Single-pass evidence runs (BENCH_RUNS=1) or standalone off:
    // window_contended is empty BY CONSTRUCTION — not a certificate
    // (VERDICT r14 item 3: the 332.9 s sf1x record read as quiet
    // while its replicate measured 268.1 s).
    BenchGate.windowCertified(standaloneOn = true, runs = 1) shouldBe false
    BenchGate.windowCertified(standaloneOn = false, runs = 3) shouldBe false
    BenchGate.windowCertified(standaloneOn = false, runs = 1) shouldBe false
  }
}
