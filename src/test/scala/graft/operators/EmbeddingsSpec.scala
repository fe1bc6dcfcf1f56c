package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** VecOuterSum covariance + power-iteration PCA: parity with the
  * textbook two-pass covariance, layout independence within the
  * documented raw-moment error bound, analytic principal-component
  * recovery, and input-edge handling. */
class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  // Deterministic pseudo-random-ish doubles in [-1, 1] (no RNG in specs).
  private def noise(i: Int, j: Int): Double =
    (((i * 7919 + j * 104729) % 2000) - 1000) / 1000.0

  test("cov matches the exact two-pass covariance") {
    val d = 5
    val rows = (0 until 200).map(i => Array.tabulate(d)(j => noise(i, j)))
    val stats = Embeddings.covStats(
      rows.map(r => Tuple1(r.map(_.toFloat))).toDF("embedding"), "embedding")
    stats.n shouldBe 200L
    stats.dim shouldBe d
    // Exact reference (two-pass, on the same float-rounded values).
    val asD = rows.map(_.map(x => x.toFloat.toDouble))
    val mean = Array.tabulate(d)(j => asD.map(_(j)).sum / 200)
    for (i <- 0 until d; j <- 0 until d) {
      val ref = asD.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / 199
      stats.cov(i * d + j) shouldBe ref +- 1e-12
      stats.cov(j * d + i) shouldBe stats.cov(i * d + j) // symmetry
    }
  }

  test("covariance is layout-independent within the raw-moment bound") {
    val rows = (0 until 500).map(i => Array.tabulate(8)(j => noise(i, j).toFloat))
    val df = rows.map(Tuple1(_)).toDF("embedding")
    val a = Embeddings.covStats(df.coalesce(1), "embedding")
    val b = Embeddings.covStats(df.repartition(11), "embedding")
    a.n shouldBe b.n
    a.cov.zip(b.cov).foreach { case (x, y) => x shouldBe y +- 1e-12 }
  }

  test("topComponent recovers an analytic principal direction") {
    // Rank-1 signal along u = (3,4)/5 plus small orthogonal jitter.
    val u = Array(0.6, 0.8)
    val rows = (0 until 300).map { i =>
      val t = (i % 21) - 10.0          // spread along u: variance >> noise
      val eps = noise(i, 1) * 0.01     // orthogonal (-0.8, 0.6) jitter
      Array((t * u(0) - eps * 0.8).toFloat, (t * u(1) + eps * 0.6).toFloat)
    }
    val stats = Embeddings.covStats(rows.map(Tuple1(_)).toDF("embedding"),
      "embedding")
    val pc = Embeddings.topComponent(stats)
    math.abs(pc.component(0) * u(0) + pc.component(1) * u(1)) shouldBe
      1.0 +- 1e-4
    pc.explainedVariance shouldBe 1.0 +- 1e-3
    // Sign convention: largest-|coordinate| entry positive → along +u.
    pc.component(1) should be > 0.0
  }

  test("whiten: output covariance is the identity, mean is zero") {
    // Correlated 3-dim data: x2 = x0 + x1 + jitter, distinct scales.
    val rows = (0 until 400).map { i =>
      val a = noise(i, 0) * 3.0
      val b = noise(i, 1)
      Array(a.toFloat, b.toFloat, (a + b + noise(i, 2) * 0.1).toFloat)
    }
    val df = rows.map(Tuple1(_)).toDF("embedding")
    val stats = Embeddings.covStats(df, "embedding")
    val white = Embeddings.whiten(df, "embedding", stats)
    val ws = Embeddings.covStats(white, "white")
    for (i <- 0 until 3; j <- 0 until 3) {
      // 1e-4: the x2 ≈ x0 + x1 construction is deliberately
      // ill-conditioned (κ ~ 10³), which amplifies the float32
      // input rounding through the factorization.
      ws.cov(i * 3 + j) shouldBe (if (i == j) 1.0 else 0.0) +- 1e-4
      ws.mean(i) shouldBe 0.0 +- 1e-9
    }
  }

  test("whiten survives a dead (zero-variance) dimension via the ridge") {
    val rows = (0 until 100).map(i =>
      Array(noise(i, 0).toFloat, 0.0f)) // dim 1 is constant
    val df = rows.map(Tuple1(_)).toDF("embedding")
    val stats = Embeddings.covStats(df, "embedding")
    val out = Embeddings.whiten(df, "embedding", stats)
      .select("white").as[Seq[Double]].collect()
    out.foreach(v => v.foreach(x => assert(!x.isNaN && !x.isInfinite)))
    // live dim still whitens to unit variance
    Embeddings.covStats(
      Embeddings.whiten(df, "embedding", stats), "white")
      .cov(0) shouldBe 1.0 +- 1e-6
  }

  test("null vectors are skipped, and an all-null input evaluates to null") {
    val df = Seq(Some(Array(1.0f, 2.0f)), None, Some(Array(3.0f, 4.0f)))
      .toDF("embedding")
    Embeddings.covStats(df, "embedding").n shouldBe 2L
    val allNull = Seq(Option.empty[Array[Float]]).toDF("embedding")
    allNull.agg(Embeddings.covStatsCol(col("embedding")).as("s"))
      .select(col("s")).collect()(0).isNullAt(0) shouldBe true
  }

  test("inconsistent vector dims fail loudly") {
    val df = Seq(Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)).toDF("embedding")
    val e = intercept[Exception] {
      Embeddings.covStats(df, "embedding")
    }
    e.getMessage should include("dim")
  }
}
