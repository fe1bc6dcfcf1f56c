package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.RobustStats

/** KLL quantile sketch: exactness below compaction, empirical rank
  * error under heavy compaction, partition-layout mergeability, and
  * parity of the grouped operator against the exact
  * `RobustStats.quantilesByKey` within the sketch's error budget. */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val probes =
    Seq(0.1 -> "p10", 0.5 -> "p50", 0.9 -> "p90")

  test("exact while the group fits level 0 (no compaction)") {
    // k=200 => level-0 capacity 200; 100 values stay uncompacted and
    // the sketch IS the sorted data: ceil-rank quantiles are exact.
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("k", "v")
    val got = RobustStats.approxQuantilesByKey(df, "k", "v", probes)
      .collect()(0)
    got.getDouble(1) shouldBe 10.0 // ceil(0.1*100) = rank 10
    got.getDouble(2) shouldBe 50.0
    got.getDouble(3) shouldBe 90.0
  }

  test("rank error stays within ~1.5% at 100k values, k=200, any layout") {
    val n = 100000
    // Adversarial-ish order: interleaved ramps, not sorted, not uniform
    // random (no Math.random in specs for reproducibility).
    val values = (0 until n).map(i => ((i * 7919) % n).toDouble)
    for (parts <- Seq(1, 7)) {
      val df = values.map(("g", _)).toDF("k", "v").repartition(parts)
      val got = RobustStats.approxQuantilesByKey(df, "k", "v", probes)
        .collect()(0)
      for ((p, idx) <- Seq(0.1 -> 1, 0.5 -> 2, 0.9 -> 3)) {
        val est = got.getDouble(idx)
        // values are the permutation of 0..n-1, so the TRUE rank of
        // the estimate is est+1; target rank is ceil(p*n).
        val rankErr = math.abs((est + 1) - math.ceil(p * n))
        withClue(s"p=$p parts=$parts est=$est: ") {
          rankErr should be <= (0.015 * n)
        }
      }
    }
  }

  test("grouped operator tracks the exact quantilesByKey within the error budget") {
    // 5 keys x 20k values each, distinct shifted ranges so cross-key
    // leakage would show up immediately.
    val rows = for {
      g <- 0 until 5
      i <- 0 until 20000
    } yield (s"g$g", (g * 100000 + (i * 7919) % 20000).toDouble)
    val df = rows.toDF("k", "v").repartition(8)
    val approx = RobustStats.approxQuantilesByKey(df, "k", "v", probes)
      .collect().map(r => r.getString(0) -> (r.getDouble(2))).toMap
    val exact = RobustStats.quantilesByKey(df, "k", "v", probes)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    exact.keySet shouldBe approx.keySet
    exact.foreach { case (g, ex) =>
      // medians live on a 20k-value range: 1.5% rank error = 300
      withClue(s"$g: ") {
        math.abs(approx(g) - ex) should be <= 300.0
      }
    }
  }

  test("null and empty groups: nulls skipped, empty group yields no row") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)))
      .toDF("k", "v")
    val got = RobustStats.approxQuantilesByKey(df, "k", "v", Seq(0.5 -> "p50"))
      .collect()
    got.length shouldBe 1
    got(0).getDouble(1) shouldBe 1.0 // ceil(0.5*2) = rank 1 of {1,3}
  }

  test("buffer: weight conservation through compaction and merge") {
    val a = new QuantileSketch.Buffer(32)
    (1 to 5000).foreach(i => a.add(i.toDouble))
    val b = new QuantileSketch.Buffer(32)
    (5001 to 9000).foreach(i => b.add(i.toDouble))
    a.mergeIn(b)
    // total sketched weight == total observations (KLL invariant: a
    // compaction promotes m/2 items at doubled weight)
    val total = a.levels.zipWithIndex
      .map { case (lvl, h) => lvl.length.toLong << h }.sum
    total shouldBe 9000L
    a.n shouldBe 9000L
    // state is logarithmic, nowhere near n
    a.levels.map(_.length).sum should be < 500
  }
}
