package graft.queries

import graft.{SparkEntry, SparkSpec}

/** q63's exact percentile profile vs its approx_percentile twin: the
  * sketch path must land within a small relative error of the exact
  * path on real data (sf0.01, the driver's correctness scale), or it
  * is not a usable stand-in for unbounded-value metrics. */
class LengthProfileSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("approx_percentile profile tracks the exact q63 profile within 5% per quantile") {
    val exactDef = SparkEntry.allDefs.find(_.name == "q63_length_profile")
      .getOrElse(fail("q63 missing"))
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3),
          r.getLong(4))
      }.toMap
    val exact = toMap(exactDef.build(spark, dir))
    val approx = toMap(TextQueries.lengthProfileApprox(spark, dir))
    approx.keySet shouldBe exact.keySet
    exact.foreach { case (lang, (p50, p90, p99, n)) =>
      val (a50, a90, a99, an) = approx(lang)
      an shouldBe n // counts are exact in both
      withClue(s"$lang p50: ") { math.abs(a50 - p50) / p50 should be <= 0.05 }
      withClue(s"$lang p90: ") { math.abs(a90 - p90) / p90 should be <= 0.05 }
      withClue(s"$lang p99: ") { math.abs(a99 - p99) / p99 should be <= 0.05 }
    }
  }

  test("a low-accuracy sketch still brackets the exact median (bounded state, bounded error)") {
    // accuracy=100 → sketch state is ~fixed and tiny; rank error grows
    // but the estimate must stay inside the observed value range and
    // within 15% of exact — the knob trades memory for error, it does
    // not break.
    val exactDef = SparkEntry.allDefs.find(_.name == "q63_length_profile").get
    val exact = exactDef.build(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    TextQueries.lengthProfileApprox(spark, dir, accuracy = 100).collect()
      .foreach { r =>
        val lang = r.getString(0)
        withClue(s"$lang coarse p50: ") {
          math.abs(r.getDouble(1) - exact(lang)) / exact(lang) should be <= 0.15
        }
      }
  }
}
