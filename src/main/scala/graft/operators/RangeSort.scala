package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Total-order ORDER BY without RangePartitioner's sample pass.
  *
  * `df.orderBy(...)` range-partitions its input, and RangePartitioner
  * SAMPLES the child to pick partition bounds — which EXECUTES the
  * child plan once before the sort pass executes it again. For a cheap
  * child that is noise; for q30's blocked verify join the child is the
  * whole candidate-verification pipeline and its output is
  * OUTPUT-sized (2.48 B pairs at the sf10x probe). Round 7 worked
  * around the double execution by caching the pair frame DISK_ONLY —
  * correct, but it writes the ~60 GB output twice (cache + sort
  * shuffle) and exhausted single-box scratch at sf10x (PERF #23 /
  * round-7 verdict #1).
  *
  * This operator removes both the second execution AND the cache:
  * the caller supplies explicit split bounds for the leading sort
  * column (computed from a cheap, already-materialized side frame
  * whose key distribution is known — for q30, the persisted `groups`
  * frame), and the sort becomes
  *
  *   bucket-by-binary-rank → hash-shuffle steered so partition i
  *   receives exactly bucket i → sortWithinPartitions.
  *
  * The steering trick: `repartition(n, col)` hash-partitions by
  * `pmod(murmur3(col, seed=42), n)`. We precompute n probe ints such
  * that probe(i) lands in partition i (a few hundred hash evaluations
  * on the driver), map each row's bucket rank to its probe, and
  * shuffle on the probe column. Rank is monotone in the leading sort
  * column, so partition order == bucket order == global order, and
  * `sortWithinPartitions` finishes the contract. One execution, one
  * shuffle, zero caches, zero sampling.
  *
  * Scale: the per-row cost is a ≤`cells`-element fold (bucket rank)
  * plus the shuffle Spark would have done anyway; the in-partition
  * sort is Spark's spill-capable external sort. Bound quality only
  * affects balance, never correctness — a skewed bound means a fatter
  * partition, exactly the failure mode RangePartitioner's sample has
  * on skewed data too.
  */
object RangeSort {

  /** Probe values steering hash-partitioning to the identity mapping:
    * `pmod(murmur3int(probes(i), 42), n) == i`. Murmur3 seed 42 and
    * the pmod shape match Spark's `HashPartitioning.partitionIdExpression`
    * for an IntegerType column (verified against `hash()` itself in
    * RangeSortSpec). Expected probes scanned ≈ n·H(n) (coupon
    * collector) — microseconds for any realistic partition count. */
  def hashProbes(n: Int): Array[Int] = {
    require(n > 0, s"partition count must be positive, got $n")
    val out = new Array[Int](n)
    val found = new Array[Boolean](n)
    var x = 0
    var remaining = n
    while (remaining > 0) {
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(x, 42)
      val p = ((h % n) + n) % n
      if (!found(p)) { found(p) = true; out(p) = x; remaining -= 1 }
      x += 1
    }
    out
  }

  /** Sort `df` globally by (`leading`, tieBreaks...) using explicit
    * `bounds` for `leading` (ascending, bucket i = rows with
    * bounds(i-1) < leading <= bounds(i)). Output partition i holds
    * bucket i, sorted — so partition-ordered readers (parquet part
    * files, toLocalIterator, the driver's hash compare) see the exact
    * ORDER BY contract. `bounds` may be empty (single partition —
    * only sensible for tiny frames). */
  def sortedByBounds(
      df: DataFrame,
      leading: Column,
      bounds: Array[Long],
      tieBreaks: Seq[Column]): DataFrame = {
    val bs = bounds.distinct.sorted
    val n = bs.length + 1
    val sortCols = leading +: tieBreaks
    if (n == 1) {
      // No bounds: single output partition. Correct for any size, but
      // callers should pass real bounds for anything non-trivial.
      return df.repartition(1).sortWithinPartitions(sortCols: _*)
    }
    val probes = hashProbes(n)
    // Bucket rank via codegen'd binary search over the bound array —
    // O(log n) compares per row, so the bucketing stays cheap even
    // when weightedBounds sizes n by output volume (thousands of
    // buckets at the 100 TB end, where an O(n) fold per row would
    // make the rank itself the bottleneck).
    val rank = org.apache.spark.sql.graft.CatalystBridge.column(
      graft.plans.SortedBucket(
        org.apache.spark.sql.graft.CatalystBridge.expr(leading.cast("long")),
        bs))
    df.withColumn("__rs_probe", element_at(typedlit(probes.toSeq), rank + 1))
      .repartition(n, col("__rs_probe"))
      .sortWithinPartitions(sortCols: _*)
      .drop("__rs_probe")
  }

  /** Split bounds for [[sortedByBounds]] from a (key, weight) frame:
    * approximates the weighted key distribution on a fixed grid of
    * `cells` contiguous key ranges, then cuts the cumulative weight
    * into even slices. Two driver-side actions, both BOUNDED: a
    * 2-value min/max aggregate and a ≤`cells`-row collect — this
    * REPLACES RangePartitioner's sample collect, which executed the
    * full (output-sized) child to draw its sample. Resolution is one
    * cell: a single key heavier than total/parts simply yields a fat
    * partition (external sort spills), never wrong order.
    *
    * The slice count is NOT `minParts` alone: the frame being sorted
    * is output-sized, and the weight total IS the output-volume
    * prediction, so the partition count scales with it —
    * `max(minParts, total / rowsPerPart)`. The sf10x lesson
    * (2.48 B pairs): pinning the sort to the session's 32 shuffle
    * partitions put ~77 M rows in every in-partition sort and 32
    * concurrent external sorts thrashed an 8 g heap to OOM; at
    * `rowsPerPart` = 8 M each sort buffers ~200 MB raw and spills
    * shallowly. On a real cluster this is exactly how you'd size
    * reducer count for a sort whose output dwarfs its input. */
  def weightedBounds(
      weights: DataFrame,
      minParts: Int,
      cells: Int = 4096,
      rowsPerPart: Long = 8_000_000L): Array[Long] = {
    require(minParts > 0 && cells > 0 && rowsPerPart > 0)
    val mm = weights.agg(
      min(col("key")).as("lo"), max(col("key")).as("hi")).collect()(0)
    if (mm.isNullAt(0)) return Array.empty // empty input
    val lo = mm.getLong(0)
    val hi = mm.getLong(1)
    // (cell width, per-cell weight sums) at a given grid resolution.
    def cellHistogram(nCells: Int): (Long, Array[(Long, Long)]) = {
      val width = math.max(1L, (hi - lo) / nCells + 1)
      val rows = weights
        .groupBy(((col("key") - lit(lo)) / lit(width)).cast("long").as("cell"))
        .agg(sum(col("weight")).as("w"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1)
      (width, rows)
    }
    val (coarseWidth, coarseRows) = cellHistogram(cells)
    val total = coarseRows.iterator.map(_._2).sum
    if (total <= 0L) return Array.empty
    val parts = math.max(minParts.toLong,
      math.min((total + rowsPerPart - 1) / rowsPerPart, 65536L)).toInt
    if (parts == 1) return Array.empty
    // Keep ≥4 cells per cut so bound resolution tracks the scaled
    // partition count (the collect stays bounded: ≤ parts*8 rows).
    val (width, cellRows) =
      if (parts.toLong * 4 > cells) cellHistogram(parts * 8)
      else (coarseWidth, coarseRows)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var acc = 0L
    var nextCut = 1
    cellRows.foreach { case (cell, w) =>
      acc += w
      // Emit a bound at each crossed total*(i/parts) cut point; the
      // bucket edge is the cell's upper key (inclusive, matching
      // sortedByBounds' `leading > bound` rank test).
      while (nextCut < parts && acc * parts >= total * nextCut) {
        out += lo + (cell + 1) * width - 1
        nextCut += 1
      }
    }
    out.distinct.toArray
  }
}
