package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-key order statistics WITHOUT a per-key sort — the scale
  * path for grouped medians when the key cardinality is far below the
  * row count (q113's five event types over a 100 TB event log).
  *
  * The naive exact shape — `row_number() OVER (PARTITION BY key ORDER
  * BY value)` — sorts every group in ONE task: parallelism equals the
  * key cardinality, so five keys means five threads no matter how many
  * executors exist. `percentile()` holds O(distinct values) per group
  * in the aggregation buffer (the q63 caveat). Above the size
  * threshold this operator selects by histogram refinement instead:
  *
  *   1. one scan: per-key count / min / max (key-cardinality rows,
  *      broadcast back — this operator's contract is BOUNDED key
  *      cardinality, the regime where the per-key sort chokes);
  *   2. one scan: per-(key, bucket) histogram over `buckets`
  *      equal-width cells — the shuffle key space is keys × buckets,
  *      data-volume-independent;
  *   3. per-key cumulative counts over the HISTOGRAM (tiny window)
  *      locate the bucket holding each target rank and the rank's
  *      offset within it;
  *   4. one scan: keep only rows landing in a target bucket
  *      (expected group_n / buckets rows per key), rank those few
  *      within (key, bucket), pick the target rows.
  *
  * Every corpus-sized pass is a parallel scan; the only sorts touch
  * the target buckets. Exactness does not depend on float bucket
  * arithmetic: bucket ids only PARTITION the data — ranks come from
  * counting the same partition function, so boundary fuzz moves a
  * row's bucket and its histogram cell together. Worst case (every
  * value in one bucket — near-constant groups) the target-bucket sort
  * degrades to the naive per-key sort, no worse than the baseline.
  *
  * BELOW the threshold the windowed-sort path runs instead: at toy
  * group sizes the histogram's extra stages cost more than the
  * single-task sorts they parallelize (measured: q113 at the sf1x
  * probe is 2.9 s sorted vs 5.2 s histogrammed, while sf10x is 16.1 s
  * sorted vs 9.1 s histogrammed). The decision reads Catalyst's
  * `optimizedPlan.stats.sizeInBytes` — free at plan time, no job (the
  * TopKRewriteRule child-stats precedent) — so BOTH paths stay fully
  * lazy. Both compute the identical interpolated p50; the spec pins
  * their parity.
  */
object RobustStats {

  /** Plan-stats bytes above which [[medianByKey]] abandons the
    * windowed per-key sort. 16 MB of (key, value) input per the
    * measured crossover (sf1x's 5.5 MB scan: sort 2.9 s vs histogram
    * 5.2 s; sf10x's 55 MB scan: sort 16.1 s vs histogram 9.1 s). */
  val SortPathMaxBytes: Long = 16L << 20

  /** Exact interpolated p50 (SQL `median` / `quantile_cont(0.5)`) of
    * `valCol` per `keyCol`: lo + (hi − lo) · 0.5 over the two middle
    * ranks. Returns (`keyCol`, `out`). Null values are ignored (SQL
    * aggregate semantics); keys whose values are all null are absent.
    *
    * `histogram = None` decides the path from this frame's OWN
    * `optimizedPlan.stats.sizeInBytes` (free at plan time, no job —
    * the TopKRewriteRule precedent). Callers whose input is a join
    * should pass the decision explicitly (`Some(…)` from the
    * UNDERLYING scan's stats): Catalyst's join size estimates inflate
    * multiplicatively, which would misroute the choice — q113's MAD
    * pass (a broadcast-join of the median onto the same scan) shows
    * a 45× inflation. */
  def medianByKey(df: DataFrame, keyCol: String, valCol: String,
      out: String = "median", buckets: Int = 4096,
      sortPathMaxBytes: Long = SortPathMaxBytes,
      histogram: Option[Boolean] = None): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    val rows = df.select(col(keyCol).as("_k"), col(valCol).as("_v"))
      .filter(col("_v").isNotNull)
    val stats = broadcast(rows.groupBy("_k").agg(count(lit(1)).as("_n"),
      min("_v").as("_lo"), max("_v").as("_hi")))
    val useHistogram = histogram.getOrElse(
      rows.queryExecution.optimizedPlan.stats.sizeInBytes > sortPathMaxBytes)

    if (!useHistogram) {
      // Windowed-sort path: one task per key — fine while the input
      // (an upper bound on the largest group) fits a task's sort
      // budget.
      val w = Window.partitionBy("_k").orderBy("_v")
      rows.withColumn("_rn", row_number().over(w))
        .join(stats, "_k")
        .filter(col("_rn") === floor((col("_n") + 1) / lit(2.0)) ||
          col("_rn") === floor((col("_n") + 2) / lit(2.0)))
        .groupBy("_k")
        .agg((min(col("_v")) + (max(col("_v")) - min(col("_v"))) * 0.5)
          .as(out))
        .withColumnRenamed("_k", keyCol)
    } else {
      // Equal-width bucket id in [0, buckets). Width 0 (constant
      // group) pins everything to bucket 0.
      def bucketOf(v: org.apache.spark.sql.Column) = {
        val w = (col("_hi") - col("_lo")) / lit(buckets.toDouble)
        when(col("_hi") === col("_lo"), lit(0L)).otherwise(
          least(floor((v - col("_lo")) / w), lit(buckets - 1L)).cast("long"))
      }
      val bucketed = rows.join(stats, "_k")
        .withColumn("_b", bucketOf(col("_v")))
      val hist = bucketed.groupBy("_k", "_b").agg(count(lit(1)).as("_c"))

      // The two middle 1-based ranks of each key (equal when n odd).
      val ks = stats.select(col("_k"), col("_n"),
          floor((col("_n") + 1) / lit(2.0)).cast("long").as("_k1"),
          floor((col("_n") + 2) / lit(2.0)).cast("long").as("_k2"))
        .select(col("_k"), explode(array(
          struct(col("_k1").as("_rank"), lit(1).as("_which")),
          struct(col("_k2").as("_rank"), lit(2).as("_which")))).as("_t"))
        .select(col("_k"), col("_t._rank").as("_rank"),
          col("_t._which").as("_which"))

      // Locate each target rank's bucket + in-bucket offset on the
      // HISTOGRAM (keys × buckets rows — the window is over tiny
      // data).
      val wcum = Window.partitionBy("_k").orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.withColumn("_cum", sum("_c").over(wcum))
      val targets = cum.join(ks, "_k")
        .filter(col("_rank") > col("_cum") - col("_c") &&
          col("_rank") <= col("_cum"))
        .select(col("_k"), col("_b"),
          (col("_rank") - (col("_cum") - col("_c"))).as("_local"),
          col("_which"))

      // Keep only target-bucket rows, rank them within (key, bucket) —
      // expected n/buckets rows per key — and pick the targets. Tie
      // order inside equal values is irrelevant: any permutation of
      // equal values yields the same kth VALUE.
      val tb = targets.select("_k", "_b").distinct()
      val wr = Window.partitionBy("_k", "_b").orderBy("_v")
      val picked = bucketed.join(broadcast(tb), Seq("_k", "_b"), "left_semi")
        .withColumn("_local", row_number().over(wr))
        .join(broadcast(targets), Seq("_k", "_b", "_local"))

      picked.groupBy("_k")
        .agg((min(when(col("_which") === 1, col("_v"))) +
          (min(when(col("_which") === 2, col("_v"))) -
            min(when(col("_which") === 1, col("_v")))) * 0.5).as(out))
        .withColumnRenamed("_k", keyCol)
    }
  }
}
