package graft.operators

/** MinHash-LSH parameter planner: given a signature budget and a target
  * Jaccard threshold, choose the (bands b, rows-per-band r) split that
  * minimizes expected candidate error mass around the threshold.
  *
  * The engine's near-dup pipeline (q28 and everything riding it —
  * incremental dedup, dup matrix, cluster reps, fuzzy census) bands a
  * length-n MinHash signature into b bands of r rows, b·r ≤ n; a pair
  * becomes a CANDIDATE iff some band matches. For true Jaccard s the
  * candidate probability is the classic S-curve
  *
  *   P(candidate | s) = 1 − (1 − s^r)^b        (MMDS, Leskovec–
  *                                              Rajaraman–Ullman ch. 3)
  *
  * whose inflection sits near (1/b)^(1/r). Banding choice is the ONE
  * free knob that trades shuffle volume (false positives → verify-join
  * work) against recall (false negatives → missed dups), so at 100 TB
  * it deserves a sizing function, not a hard-coded (16, 4).
  *
  * Everything here is exact driver-side arithmetic on the O(n log n)
  * (b, r) pairs with b·r ≤ n — no data, no sampling; the chosen plan
  * plugs straight into the existing banding queries.
  */
object LshPlanner {

  /** One candidate plan: `bands` × `rowsPerBand` ≤ signature length. */
  final case class LshPlan(
      bands: Int,
      rowsPerBand: Int,
      threshold: Double,
      falsePositiveArea: Double,
      falseNegativeArea: Double) {

    /** P(pair becomes a candidate | true Jaccard = s). */
    def sCurve(s: Double): Double =
      1.0 - math.pow(1.0 - math.pow(s, rowsPerBand.toDouble), bands.toDouble)

    /** The similarity where the S-curve crosses ~0.5 — the plan's
      * effective threshold, (1/b)^(1/r). */
    def inflection: Double =
      math.pow(1.0 / bands, 1.0 / rowsPerBand)

    /** Total error mass: FP area below the threshold plus FN area
      * above it (the objective `plan` minimizes). */
    def errorArea: Double = falsePositiveArea + falseNegativeArea
  }

  /** Riemann error areas for a (b, r) split at threshold `t`:
    * FP = ∫₀ᵗ P(cand|s) ds (work wasted verifying sub-threshold
    * pairs), FN = ∫ₜ¹ (1 − P(cand|s)) ds (true dups never surfaced).
    * 1024 midpoint cells — the integrand is smooth and bounded, so the
    * midpoint rule's error is far below any decision margin between
    * distinct divisor pairs. */
  private def areas(b: Int, r: Int, t: Double): (Double, Double) = {
    val cells = 1024
    var fp = 0.0
    var fn = 0.0
    var i = 0
    while (i < cells) {
      val s = (i + 0.5) / cells
      val p = 1.0 - math.pow(1.0 - math.pow(s, r.toDouble), b.toDouble)
      if (s < t) fp += p else fn += 1.0 - p
      i += 1
    }
    (fp / cells, fn / cells)
  }

  /** ALL (b, r) splits that fit the signature budget: every r in 1..n
    * and every b in 1..⌊n/r⌋ — not just the maximal b per r. Using
    * fewer bands than the budget allows is sometimes strictly better:
    * b shifts the curve's inflection (1/b)^(1/r), and when the maximal
    * b overshoots the target threshold a smaller b can sit its
    * inflection closer to t and cut the total error mass (e.g. at
    * n=32, t=0.1 the optimum is (15, 1), not the budget-exhausting
    * (32, 1)). O(n log n) pairs of exact driver arithmetic — free. */
  def candidates(nSignature: Int, threshold: Double): Seq[LshPlan] = {
    require(nSignature >= 1, s"signature budget must be >= 1: $nSignature")
    require(threshold > 0.0 && threshold < 1.0,
      s"threshold must be in (0, 1): $threshold")
    for {
      r <- 1 to nSignature
      b <- 1 to nSignature / r
    } yield {
      val (fp, fn) = areas(b, r, threshold)
      LshPlan(b, r, threshold, fp, fn)
    }
  }

  /** The minimum-error plan for a signature budget at a threshold.
    * `fnWeight` > 1 penalizes missed duplicates more than wasted
    * verification (the usual production stance: a verify join retests
    * candidates anyway, so FPs cost only work while FNs cost recall).
    * Deterministic: ties break toward fewer bands (less shuffle
    * fan-out), then smaller r. */
  def plan(nSignature: Int, threshold: Double,
      fnWeight: Double = 1.0): LshPlan = {
    require(fnWeight > 0.0, s"fnWeight must be positive: $fnWeight")
    candidates(nSignature, threshold).minBy(p =>
      (p.falsePositiveArea + fnWeight * p.falseNegativeArea,
        p.bands, p.rowsPerBand))
  }
}
