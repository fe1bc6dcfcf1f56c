package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[RobustStats.medianByKey]] — the histogram-refinement exact median
  * — against the naive sort-based definition on crafted and fuzzed
  * inputs (the q113 oracle gates it cross-engine; this pins operator
  * semantics standalone, including the degenerate shapes the synthetic
  * table never produces). */
class RobustStatsOpSpec extends SparkSpec {
  import spark.implicits._

  private def naive(rows: Seq[(String, Double)]): Map[String, Double] =
    rows.groupBy(_._1).map { case (k, vs) =>
      val s = vs.map(_._2).sorted
      val n = s.length
      val lo = s((n - 1) / 2)
      val hi = s(n / 2)
      k -> (lo + (hi - lo) * 0.5)
    }

  /** byte-threshold 0 forces the histogram path; MaxValue the sort path. */
  private def got(rows: Seq[(String, Double)], buckets: Int = 4096,
      threshold: Long = 0L): Map[String, Double] =
    RobustStats.medianByKey(rows.toDF("k", "v"), "k", "v",
        buckets = buckets, sortPathMaxBytes = threshold)
      .as[(String, Double)].collect().toMap

  test("odd and even group sizes, hand-checked, BOTH paths") {
    val rows = Seq("a" -> 1.0, "a" -> 9.0, "a" -> 5.0, // odd: 5
      "b" -> 1.0, "b" -> 2.0, "b" -> 3.0, "b" -> 10.0) // even: 2.5
    got(rows) shouldBe Map("a" -> 5.0, "b" -> 2.5)
    got(rows, threshold = Long.MaxValue) shouldBe
      Map("a" -> 5.0, "b" -> 2.5)
  }

  test("single-row, constant, and duplicate-heavy groups (histogram path)") {
    val rows = Seq("one" -> 7.0) ++
      (1 to 100).map(_ => "const" -> 3.3) ++
      (Seq.fill(50)(1.0) ++ Seq.fill(50)(2.0)).map("dup" -> _)
    val g = got(rows)
    g("one") shouldBe 7.0
    g("const") shouldBe 3.3
    g("dup") shouldBe 1.5 // ranks 50/51 straddle the two plateaus
  }

  test("fuzz parity: sort path, histogram path, and the naive definition agree") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 3000).map { _ =>
      (s"k${rnd.nextInt(7)}",
        // mix of spread, clustered, and repeated values
        rnd.nextInt(4) match {
          case 0 => rnd.nextDouble() * 1e6 - 5e5
          case 1 => rnd.nextInt(10).toDouble
          case _ => 42.0 + rnd.nextDouble() * 1e-6
        })
    }
    val expect = naive(rows)
    // buckets=4 forces multi-row target buckets and boundary targets.
    val hist = got(rows, buckets = 4)
    val sorted = got(rows, threshold = Long.MaxValue)
    hist.keySet shouldBe expect.keySet
    hist.foreach { case (k, v) => v shouldBe expect(k) +- 1e-12 }
    sorted shouldBe hist
  }

  test("quantilesByKey: multi-probe one-pass selection matches quantile_cont, BOTH paths") {
    def naiveQ(s: Seq[Double], p: Double): Double = {
      val v = s.sorted
      val pos = p * (v.length - 1)
      val lo = v(math.floor(pos).toInt)
      val hi = v(math.ceil(pos).toInt)
      lo + (hi - lo) * (pos - math.floor(pos))
    }
    val rnd = new scala.util.Random(13)
    val rows = (1 to 2000).map(_ =>
      (s"k${rnd.nextInt(5)}", rnd.nextDouble() * 1000 - 500))
    val probes = Seq(0.0 -> "p00", 0.25 -> "p25", 0.5 -> "p50",
      0.75 -> "p75", 1.0 -> "p100")
    val expect = rows.groupBy(_._1).map { case (k, vs) =>
      k -> probes.map { case (p, _) => naiveQ(vs.map(_._2), p) } }
    for (threshold <- Seq(0L, Long.MaxValue)) {
      val g = RobustStats.quantilesByKey(rows.toDF("k", "v"), "k", "v",
          probes, buckets = 8, sortPathMaxBytes = threshold)
        .as[(String, Double, Double, Double, Double, Double)]
        .collect().map(r => r._1 -> Seq(r._2, r._3, r._4, r._5, r._6))
        .toMap
      g.keySet shouldBe expect.keySet
      g.foreach { case (k, qs) =>
        qs.zip(expect(k)).foreach { case (a, b) => a shouldBe b +- 1e-9 } }
    }
  }

  test("nulls are ignored; all-null keys are absent") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("gone", None)).toDF("k", "v")
    val g = RobustStats.medianByKey(df, "k", "v")
      .as[(String, Double)].collect().toMap
    g shouldBe Map("a" -> 2.0)
  }

  // --- poissonBootstrap ---

  private lazy val bootRows = (0 until 400).map { i =>
    (i.toLong, if (i % 2 == 0) "a" else "b",
      100L + (i * 7919 % 97)) // deterministic spread, integral values
  }.toDF("id", "k", "x")

  test("poissonBootstrap: point estimate is the exact mean; CI brackets it; se plausible") {
    val got = RobustStats.poissonBootstrap(bootRows, "k", "x", "id")
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    got.keySet shouldBe Set("a", "b")
    val exact = bootRows.groupBy("k")
      .agg((sum("x").cast("double") / count(lit(1))).as("m"))
      .as[(String, Double)].collect().toMap
    got.foreach { case (k, (_, n, point, se, lo, hi)) =>
      n shouldBe 200L
      point shouldBe (math.rint(exact(k) * 1e6) / 1e6)
      se should be > 0.0
      // se of a mean over 200 draws from a ~uniform[100, 197] spread:
      // sd ≈ 28 ⇒ se ≈ 2; bootstrap estimate must land in the right
      // order of magnitude, not exactly.
      se should be < 10.0
      lo should be < point
      hi should be > point
      (hi - lo) shouldBe (2 * 1.96 * se) +- 1e-5
    }
  }

  test("poissonBootstrap is bit-identical across partitionings and reruns") {
    val a = RobustStats.poissonBootstrap(bootRows.repartition(13), "k", "x", "id")
      .orderBy("k").collect()
    val b = RobustStats.poissonBootstrap(bootRows.coalesce(1), "k", "x", "id")
      .orderBy("k").collect()
    a shouldBe b // exact Row equality — fixed-point + pinned fold order
  }

  test("poissonBootstrap rejects non-integral value columns loudly") {
    val doubles = Seq((1L, "a", 1.5)).toDF("id", "k", "x")
    val e = intercept[IllegalArgumentException] {
      RobustStats.poissonBootstrap(doubles, "k", "x", "id")
    }
    e.getMessage should include("integral")
  }

  test("Poisson thresholds: mean weight over hash space ≈ 1 (the bootstrap contract)") {
    // The CDF thresholds partition [0, 2^20); expected weight
    // Σ k · P(k) must be ~1 for Poisson(1) (truncation at 8 loses
    // ~1e-6; 20-bit quantization ~1e-5). Computed exactly from the
    // integer thresholds.
    val t = RobustStats.PoissonCdfThresholds.map(BigDecimal(_))
    val full = BigDecimal(1L << 20)
    val probs = (t :+ full).zip(BigDecimal(0) +: t)
      .map { case (hi, lo) => (hi - lo) / full }
    val mean = probs.zipWithIndex.map { case (p, k) => p * k }.sum
    mean.toDouble shouldBe 1.0 +- 1e-4
  }
}
