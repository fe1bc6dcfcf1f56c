package graft

import org.apache.spark.sql.functions._

/** Sketch extensions (SURVEY §2.6 note: not required for parity, added
  * as engine extensions). Approximate results can't hash-match a
  * DuckDB oracle, so they are spec-verified with error bounds instead
  * of registered as oracle queries. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val values =
    (1 to 100000).map(i => (i.toLong % 30000, i.toDouble)).toDF("k", "v")

  test("approx_count_distinct lands within 5% of the exact count") {
    val (approx, exact) = values
      .agg(approx_count_distinct("k").as("a"), countDistinct("k").as("e"))
      .as[(Long, Long)].collect().head
    exact shouldBe 30000L
    math.abs(approx - exact).toDouble / exact should be < 0.05
  }

  test("approx percentile brackets the exact median") {
    val p = values.agg(percentile_approx($"v", lit(0.5), lit(10000)))
      .as[Double].collect().head
    p should be (50000.0 +- 1000.0)
  }

  test("HLL sketches merge across groups (sketch-aggregate pattern)") {
    // Per-group sketches unioned == sketch of the union: the pattern
    // that lets a 100 TB distinct-count run as partial aggregates.
    val perGroup = values.withColumn("g", $"k" % 7)
      .groupBy("g").agg(hll_sketch_agg("k").as("sk"))
    val merged = perGroup.agg(
      hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
      .as[Long].collect().head
    math.abs(merged - 30000L).toDouble / 30000 should be < 0.05
  }
}
