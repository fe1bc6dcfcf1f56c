package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.{functions => gf, CacheRegistry}
import graft.plans.{LogitScore, StableHash60}

/** Hashed-feature logistic-regression quality classifier — the
  * fastText/CCNet-style model-based document filter (Joulin et al.
  * 2017; Wenzek et al. 2020): train a linear model on hashed
  * bag-of-words features against a cheap label (a known-clean corpus,
  * a language tag, a heuristic gate), then score every document with
  * one codegen'd pass ([[graft.plans.LogitScore]]).
  *
  * Design for 100 TB, and for the determinism bar the rest of this
  * engine holds:
  *
  *   - '''Featurize once, iterate on the skinny frame.''' Tokens hash
  *     to `dim` buckets via [[StableHash60]] (md5-derived — identical
  *     on any engine, any JVM, any layout; never `hashCode`). The
  *     (label, sorted bucket idx, ℓ¹-normalized tf) rows are
  *     data-sized, smaller than the text they summarize, and cached
  *     through [[CacheRegistry]] for the training loop — the corpus is
  *     tokenized exactly once, not once per iteration.
  *   - '''Exact layout-independent gradients.''' Full-batch gradient
  *     descent accumulates per-row gradient contributions in FIXED
  *     POINT (`rint(g · 2^24)` longs) via `treeAggregate` — long
  *     addition is associative and commutative, so any partitioning,
  *     any combine order, any executor count produces BIT-IDENTICAL
  *     gradients, and therefore bit-identical weights, to the
  *     sequential reference loop ([[trainLocalReference]], the spec
  *     oracle). A float accumulator would make the trained model
  *     depend on partition boundaries. Quantization error is bounded:
  *     ≤ 2⁻²⁵ per row per coordinate, ~10⁻⁸ of a unit gradient —
  *     far below the learning-rate scale; headroom: |contribution| ≤ 1
  *     so long overflow needs > 2³⁹ rows.
  *   - '''Bounded driver state.''' The driver holds (dim + 2) longs
  *     per aggregate and the dim-sized weight vector — independent of
  *     corpus size. Weights ship per iteration as a broadcast, and to
  *     scoring as a codegen reference. Nothing output-sized, nothing
  *     all-pairs, no per-row driver work.
  *   - '''Train-time σ == apply-time σ.''' Both use
  *     [[LogitScore.sigmoid]]'s overflow-free symmetric form, so the
  *     probabilities the loss trace reports are exactly the
  *     probabilities scoring emits.
  */
object TextClassifier {

  /** One featurized document: label ∈ {0,1}, strictly ascending bucket
    * indices, ℓ¹-normalized term frequencies (Σv = 1). The ascending
    * index order is CONTRACTUAL — the margin Σ v·w accumulates in that
    * order, pinning per-row float summation across implementations. */
  final case class FeatRow(y: Double, idx: Array[Int], v: Array[Double])

  /** Trained model + the per-iteration mean log-loss trace (driver
    * diagnostics; `lossTrace(0)` is the loss BEFORE the first step). */
  final case class LogitModel(weights: Array[Double], bias: Double,
      dim: Int, lossTrace: Array[Double])

  /** Fixed-point scale for gradient/loss accumulation: 2^24 ≈ 1.7e7 —
    * quantization ≤ 3e-8 per row, overflow headroom > 5e11 rows. */
  val Scale: Double = (1L << 24).toDouble

  val DefaultDim: Int = 1 << 14

  /** Bucket of one token — THE hash contract shared by featurize and
    * [[graft.plans.LogitScore]]. */
  def bucket(tok: String, dim: Int): Int =
    (StableHash60.hash(UTF8String.fromString(tok)) % dim).toInt

  /** Hash-featurize `docs`: whitespace tokens ([[gf.tokens]] — the
    * suite-wide tokenization contract) → per-row bucket tf, ℓ¹
    * normalized. Zero-token rows drop (no features to learn from).
    * One narrow pass: tokenize + per-row local counting in
    * `mapPartitions`, NO shuffle and no explode — the per-row bucket
    * map lives only for that row. */
  def featurize(docs: DataFrame, labelExpr: Column, textCol: String = "text",
      dim: Int = DefaultDim): Dataset[FeatRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(dim > 0, s"dim must be positive, got $dim")
    docs
      .select(labelExpr.cast("double").as("y"),
        gf.tokens(col(textCol)).as("t"))
      .filter(size(col("t")) > 0)
      .as[(Double, Seq[String])]
      .mapPartitions(_.map { case (y, toks) =>
        val counts = new java.util.TreeMap[Int, Int]()
        toks.foreach { tok =>
          counts.merge(bucket(tok, dim), 1, (a, b) => a + b)
        }
        val nnz = counts.size()
        val idx = new Array[Int](nnz)
        val v = new Array[Double](nnz)
        val n = toks.size.toDouble
        val it = counts.entrySet().iterator()
        var k = 0
        while (it.hasNext) {
          val e = it.next()
          idx(k) = e.getKey
          v(k) = e.getValue / n
          k += 1
        }
        FeatRow(y, idx, v)
      })
  }

  /** Per-row fixed-point gradient/loss contribution, shared verbatim by
    * the distributed `seqOp` and the sequential reference — the parity
    * proof is that both run THIS function and sum longs. `acc` layout:
    * [0, dim) weight gradient, [dim] bias gradient, [dim+1] log-loss. */
  private def accumulate(acc: Array[Long], r: FeatRow, w: Array[Double],
      b: Double, dim: Int): Unit = {
    var margin = b
    var k = 0
    while (k < r.idx.length) { margin += r.v(k) * w(r.idx(k)); k += 1 }
    val p = LogitScore.sigmoid(margin)
    val diff = p - r.y
    k = 0
    while (k < r.idx.length) {
      acc(r.idx(k)) += math.rint(diff * r.v(k) * Scale).toLong
      k += 1
    }
    acc(dim) += math.rint(diff * Scale).toLong
    val pc = math.min(math.max(p, 1e-12), 1.0 - 1e-12)
    val loss = -(r.y * math.log(pc) + (1.0 - r.y) * math.log1p(-pc))
    acc(dim + 1) += math.rint(loss * Scale).toLong
  }

  /** Driver-side step, shared by both trainers: returns the mean loss
    * at the PRE-step weights and updates (w, b) in place. */
  private def applyStep(acc: Array[Long], w: Array[Double], bias: Double,
      n: Long, lr: Double, l2: Double, dim: Int): (Double, Double) = {
    var j = 0
    while (j < dim) {
      w(j) -= lr * (acc(j) / Scale / n + l2 * w(j))
      j += 1
    }
    val newBias = bias - lr * (acc(dim) / Scale / n)
    (acc(dim + 1) / Scale / n, newBias)
  }

  /** Full-batch GD on a featurized (usually cached) frame. Weights
    * start at zero (deterministic — no RNG anywhere in the trainer). */
  def train(feats: Dataset[FeatRow], dim: Int = DefaultDim,
      iters: Int = 30, lr: Double = 0.5, l2: Double = 0.0): LogitModel = {
    val spark = feats.sparkSession
    val n = feats.count()
    val w = new Array[Double](dim)
    var b = 0.0
    val trace = new Array[Double](iters)
    if (n == 0) return LogitModel(w, b, dim, trace)
    val rdd = feats.rdd
    var t = 0
    while (t < iters) {
      val bw = spark.sparkContext.broadcast(w.clone())
      val bb = b
      val acc =
        try rdd.treeAggregate(new Array[Long](dim + 2))(
          (a, r) => { accumulate(a, r, bw.value, bb, dim); a },
          (a1, a2) => {
            var i = 0
            while (i < a1.length) { a1(i) += a2(i); i += 1 }
            a1
          }, depth = 2)
        finally bw.unpersist(blocking = false)
      val (loss, nb) = applyStep(acc, w, b, n, lr, l2, dim)
      trace(t) = loss
      b = nb
      t += 1
    }
    LogitModel(w, b, dim, trace)
  }

  /** Featurize → cache → train → release: the end-to-end entry point.
    * The featurized frame persists (DataSized) only for the duration of
    * the training loop. */
  def trainOnDocs(docs: DataFrame, labelExpr: Column,
      textCol: String = "text", dim: Int = DefaultDim, iters: Int = 30,
      lr: Double = 0.5, l2: Double = 0.0): LogitModel = {
    val feats = CacheRegistry.persistTracked(
      featurize(docs, labelExpr, textCol, dim), CacheRegistry.DataSized)
    try train(feats, dim, iters, lr, l2)
    finally feats.unpersist(blocking = false)
  }

  /** Sequential reference trainer — the spec oracle. Runs the SAME
    * [[accumulate]]/[[applyStep]] math row by row; because gradients
    * accumulate in longs, [[train]] must equal this BIT FOR BIT on any
    * partitioning. */
  def trainLocalReference(rows: Seq[FeatRow], dim: Int = DefaultDim,
      iters: Int = 30, lr: Double = 0.5, l2: Double = 0.0): LogitModel = {
    val w = new Array[Double](dim)
    var b = 0.0
    val trace = new Array[Double](iters)
    if (rows.isEmpty) return LogitModel(w, b, dim, trace)
    var t = 0
    while (t < iters) {
      val acc = new Array[Long](dim + 2)
      rows.foreach(r => accumulate(acc, r, w, b, dim))
      val (loss, nb) = applyStep(acc, w, b, rows.size.toLong, lr, l2, dim)
      trace(t) = loss
      b = nb
      t += 1
    }
    LogitModel(w, b, dim, trace)
  }

  /** Scoring column: σ(b + w·x) over the token array of `textCol`,
    * one codegen'd pass, weights as a codegen reference. */
  def scoreColumn(model: LogitModel, textCol: Column): Column =
    org.apache.spark.sql.graft.CatalystBridge.column(
      LogitScore(org.apache.spark.sql.graft.CatalystBridge.expr(
        gf.tokens(textCol)), model.weights, model.bias, model.dim))

  /** `docs` + a `score` column from the trained model. */
  def score(docs: DataFrame, model: LogitModel,
      textCol: String = "text"): DataFrame =
    docs.withColumn("score", scoreColumn(model, col(textCol)))
}
