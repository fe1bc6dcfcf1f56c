package graft

/** The Bench noise gate — pure logic, spec-testable without Spark.
  *
  * Two host-noise signatures poison a recorded median:
  *  - ONE stall inside the 3-run window: spread is wide
  *    (max > spreadFactor × min) and the median may be the stalled
  *    sample.
  *  - UNIFORM contention across the whole window: all three samples
  *    inflate together, the spread looks clean, and only comparison
  *    against the PREVIOUS round's recorded median reveals the drift
  *    (round-8 driver artifact: q70 recorded 3.94 s vs 1.35 s real,
  *    spread gate silent because 3.91/3.94/4.85 spreads < 2×).
  *
  * Both trigger the post-suite standalone re-measure; the in-suite
  * median stays the headline (round-comparable), the standalone column
  * is the noise-corrected reading.
  */
object BenchGate {

  private def objMedians(json: String, key: String): Map[String, Double] = {
    val qobj = ("\"" + key + """":\{([^}]*)\}""").r
    qobj.findFirstMatchIn(json).map(_.group(1)).map { body =>
      val kv = """"([^"]+)":(-?[0-9.]+(?:[eE][+-]?[0-9]+)?)""".r
      kv.findAllMatchIn(body)
        .flatMap(m => scala.util.Try(m.group(1) -> m.group(2).toDouble)
          .toOption)
        .toMap
    }.getOrElse(Map.empty)
  }

  /** Per-query baseline medians recorded in a prior `bench_last`
    * line: the in-suite `"queries"` medians, OVERRIDDEN by the
    * noise-corrected `"standalone"` re-measurements where present —
    * a baseline poisoned by the very contention this gate detects
    * (q70 recorded in-suite at 3.94 s, standalone 1.35 s) must not
    * mask a later REAL regression to ~3.9 s. Tolerant of
    * missing/garbled input — an empty map just disables the drift
    * trigger. */
  def priorMedians(json: String): Map[String, Double] = {
    val suite = objMedians(json, "queries")
    val corrected = objMedians(json, "standalone")
    suite.map { case (k, v) =>
      k -> corrected.get(k).map(math.min(_, v)).getOrElse(v)
    }
  }

  /** [[priorMedians]], but ONLY when the recorded run used the same
    * sf directory — medians from a different scale factor are not a
    * drift baseline (a dev smoke run at sf0.001 must not make every
    * sf0.1 query look 10× drifted, or vice versa). */
  def priorMedians(json: String, sfDir: String): Map[String, Double] =
    if (json.contains("\"sf\":\"" + sfDir + "\"")) priorMedians(json)
    else Map.empty

  /** Filesystem slug for a per-sf history file. */
  def sfSlug(sfDir: String): String =
    sfDir.replaceAll("[^a-zA-Z0-9]+", "_")

  /** Should this query get a standalone re-measure? `times` are the
    * in-suite samples (any order), `prior` the previous round's
    * recorded median for the same query (None on first run or new
    * queries — drift undetectable then). */
  def needsStandalone(times: Seq[Double], prior: Option[Double],
      spreadFactor: Double = 2.0, driftFactor: Double = 1.5): Boolean = {
    val ts = times.sorted
    if (ts.isEmpty || ts.head <= 0) return false
    val med = ts(ts.length / 2)
    ts.last > spreadFactor * ts.head ||
      prior.exists(p => p > 0 && med > driftFactor * p)
  }

  /** Is this record's quiet-window self-certification MEANINGFUL
    * (VERDICT r14 item 3)? With standalone re-measures off or a
    * single-pass run (BENCH_RUNS=1), `window_contended` is empty BY
    * CONSTRUCTION and `value_quiet == value` vacuously — the r14
    * sf1x evidence run (332.9 s) read as quiet-certified while its
    * replicate measured 268.1 s. `window_certified:false` marks such
    * records so no round mistakes an uncertified single-pass total
    * for a certified one; it says nothing about whether the window
    * WAS quiet — only that the record cannot testify either way. */
  def windowCertified(standaloneOn: Boolean, runs: Int): Boolean =
    standaloneOn && runs > 1

  /** Quiet-adjusted suite total (VERDICT r13 item 2): the sum of
    * in-suite medians with each `contended` row's clean STANDALONE
    * median substituted — so a host-contended record carries its own
    * corrected headline. A contended row with no clean standalone
    * re-measure (its rerun also failed) keeps its in-suite median:
    * never invent a number. Empty contended set ⇒ identical to the
    * plain sum, so `value_quiet == value` certifies a quiet window. */
  def quietTotal(medians: Seq[(String, Double)],
      standalone: Map[String, Double], contended: Set[String]): Double =
    medians.map { case (k, v) =>
      if (contended(k)) standalone.getOrElse(k, v) else v
    }.sum
}
