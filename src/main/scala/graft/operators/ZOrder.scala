package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CatalystBridge

import graft.plans.{InterleaveBits, SortedBucket}

/** Z-order (Morton-curve) data clustering — the multi-dimensional
  * layout technique behind min/max file pruning in modern lakehouse
  * table formats (public knowledge: Morton 1966; z-ordering as a
  * table-layout optimization is documented across Delta/Iceberg/Hudi
  * literature). Sorting a table by ONE column gives parquet files
  * tight min/max ranges on that column and useless full-range stats
  * on every other; interleaving the bucket ranks of N columns into a
  * single curve key and range-writing on it gives every file a tight
  * range on ALL N columns at once, so a scan filtered on ANY of them
  * (or any conjunction) skips most files at the footer.
  *
  * At 100 TB this is a layout-time investment: one clustering write,
  * then every downstream range/equality scan on the clustered
  * dimensions prunes. The implementation composes the engine's
  * existing scale machinery end to end —
  *
  *  1. per-dimension EQUI-DEPTH bucket bounds from one multi-column
  *     `approxQuantile` pass (Greenwald–Khanna sketch: one scan,
  *     driver state bounded by 1/err, never a sort) — equi-depth, so
  *     skew in a dimension costs curve resolution nowhere;
  *  2. per-row bucket ranks via [[SortedBucket]] (codegen'd binary
  *     search, O(log buckets)/row) and the curve key via
  *     [[InterleaveBits]] (codegen'd Morton interleave);
  *  3. partition bounds from a BOUNDED coarse z-histogram (≤ 4096
  *     groups — map-side-combined aggregate, tiny collect) through
  *     [[RangeSort.weightedBounds]], then [[RangeSort.sortedByBounds]]
  *     for the steered single-shuffle placement — the q30 machinery:
  *     no RangePartitioner sample pass, so the input plan executes
  *     once for the histogram and once for the write, same as
  *     `repartitionByRange` but with exact weights and no unbounded
  *     driver sample collect.
  */
object ZOrder {

  /** Coarse-histogram resolution for partition-bound estimation. */
  private val HistogramBits = 12

  /** Per-dimension equi-depth bounds: one pass for ALL dimensions.
    * Returns ≤ 2^bitsPerDim − 1 sorted distinct bounds per column
    * (fewer when the column has few distinct values — the curve just
    * uses fewer bits of that dimension). */
  def dimBounds(df: DataFrame, cols: Seq[String], bitsPerDim: Int,
      relativeError: Double = 0.001): Seq[Array[Long]] = {
    require(bitsPerDim > 0 && bitsPerDim <= 20,
      s"bitsPerDim must be in [1, 20], got $bitsPerDim")
    val nb = (1 << bitsPerDim) - 1
    val probs = Array.tabulate(nb)(i => (i + 1).toDouble / (nb + 1))
    val casted = cols.foldLeft(df)((d, c) =>
      d.withColumn(c, col(c).cast("double")))
    casted.stat.approxQuantile(cols.toArray, probs, relativeError)
      .map(_.map(_.toLong).distinct.sorted.toArray).toSeq
  }

  /** The Morton curve key for one row: bucket each dimension by its
    * bounds ([[SortedBucket]]), interleave the ranks
    * ([[InterleaveBits]]). Total key width is
    * `ndims × bitsPerDim` bits — callers get it from [[cluster]] or
    * build bounds via [[dimBounds]]. */
  def zvalue(cols: Seq[Column], bounds: Seq[Array[Long]], bitsPerDim: Int)
      : Column = {
    require(cols.nonEmpty && cols.size == bounds.size,
      s"need one bound array per column: ${cols.size} vs ${bounds.size}")
    val ranks = cols.zip(bounds).map { case (c, bs) =>
      // NULL dimension values rank as bucket 0 (Long.MinValue is below
      // every bound): null rows cluster together at the curve's origin
      // instead of getting a null curve key and arbitrary placement —
      // the global-order contract of the clustering write then covers
      // every row.
      CatalystBridge.expr(
        CatalystBridge.column(
          SortedBucket(CatalystBridge.expr(
            coalesce(c.cast("long"), lit(Long.MinValue))), bs))
          .cast("long"))
    }
    CatalystBridge.column(InterleaveBits(ranks, bitsPerDim))
  }

  /** Cluster `df` on the Z-order curve of `cols`: globally sorted by
    * the curve key, `minParts`-or-more output partitions balanced by
    * the measured key distribution. Write the result with an ordinary
    * parquet writer — one output file per partition, each with tight
    * min/max footer ranges on every clustered column.
    *
    * Passes over the input: one bounded quantile sketch (all columns
    * together), one map-side-combined coarse histogram, one shuffle.
    * Nothing driver-side scales with the data: the quantile sketch is
    * O(1/err) state, the histogram collect is ≤ 2^12 rows, and the
    * shuffle is the one any range-layout write performs. */
  def cluster(df: DataFrame, cols: Seq[String], bitsPerDim: Int = 12,
      minParts: Int = 0, rowsPerPart: Long = 8_000_000L,
      relativeError: Double = 0.001): DataFrame = {
    require(cols.size >= 2 && cols.size <= 4,
      s"z-order needs 2-4 columns, got ${cols.size}")
    require(bitsPerDim * cols.size <= 63,
      s"bitsPerDim × ndims must fit a long: $bitsPerDim × ${cols.size}")
    val bounds = dimBounds(df, cols, bitsPerDim, relativeError)
    val z = zvalue(cols.map(col), bounds, bitsPerDim)
    val zdf = df.withColumn("__zorder", z)
    // Partition bounds from a COARSE histogram of the curve key: at
    // most 2^HistogramBits groups regardless of data volume, then
    // scaled back to full-key space (cell upper edge, inclusive —
    // matching SortedBucket's `leading > bound` rank contract).
    val totalBits = bitsPerDim * cols.size
    val shift = math.max(0, totalBits - HistogramBits)
    val weights = zdf
      .groupBy(shiftright(col("__zorder"), shift).as("key"))
      .agg(count(lit(1)).as("weight"))
    val parts = math.max(minParts,
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
    val coarse = RangeSort.weightedBounds(weights, parts,
      rowsPerPart = rowsPerPart)
    val full = coarse.map(b => (b << shift) | ((1L << shift) - 1))
    RangeSort.sortedByBounds(zdf, col("__zorder"), full, Seq.empty)
      .drop("__zorder")
  }
}
