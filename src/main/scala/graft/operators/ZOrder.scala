package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CatalystBridge

import org.apache.spark.sql.types.{DataType, DecimalType, DoubleType, FloatType}

import graft.plans.{InterleaveBits, SortedBucket, SortedBucketDouble}

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

  /** Per-integral-dimension histogram resolution for [[dimBounds]]:
    * 2^16 cells keeps the driver collect tiny while giving ≥ 16 cells
    * per bound at the 12-bit default curve resolution. */
  private val DimHistCells = 1 << 16

  /** Typed per-dimension bucket bounds — integral dimensions carry
    * EXACT long bounds, fractional ones full-resolution doubles, so
    * neither a 60-bit hash key (> 2^53: a Double round-trip sheds low
    * bits) nor a score in [0, 1) (a long truncation collapses every
    * bucket to 0) loses curve resolution. */
  sealed trait DimBounds
  final case class LongBounds(bounds: Array[Long]) extends DimBounds
  final case class DoubleBounds(bounds: Array[Double]) extends DimBounds

  private def isFractional(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType | _: DecimalType => true
    case _ => false
  }

  /** Per-dimension equi-depth bucket bounds. Returns ≤ 2^bitsPerDim − 1
    * sorted distinct bounds per column (fewer when the column has few
    * distinct values — the curve just uses fewer bits of that
    * dimension).
    *
    * Fractional columns: one multi-column `approxQuantile` pass
    * (Greenwald–Khanna sketch, driver state O(1/err)), bounds kept at
    * full double resolution. Integral columns: one bounded min/max
    * aggregate plus ONE shared shifted-key histogram pass for ALL
    * integral dimensions (explode to (dim, cell) → map-side-combined
    * count, collect ≤ ndims × 2^16 rows), then equi-depth cuts in pure
    * Long arithmetic — no Double round-trip, so 60-bit hash dimensions
    * keep exact bound values (resolution = span / 2^16 per cell). */
  def dimBounds(df: DataFrame, cols: Seq[String], bitsPerDim: Int,
      relativeError: Double = 0.001): Seq[DimBounds] = {
    require(bitsPerDim > 0 && bitsPerDim <= 20,
      s"bitsPerDim must be in [1, 20], got $bitsPerDim")
    val nb = (1 << bitsPerDim) - 1
    val types = cols.map(c => df.schema(c).dataType)
    val fracCols = cols.zip(types).filter(ct => isFractional(ct._2)).map(_._1)
    val intCols = cols.zip(types).filterNot(ct => isFractional(ct._2)).map(_._1)

    val fracBounds: Map[String, DoubleBounds] =
      if (fracCols.isEmpty) Map.empty
      else {
        val probs = Array.tabulate(nb)(i => (i + 1).toDouble / (nb + 1))
        val casted = fracCols.foldLeft(df)((d, c) =>
          d.withColumn(c, col(c).cast("double")))
        fracCols.zip(
          casted.stat.approxQuantile(fracCols.toArray, probs, relativeError)
            .map(bs => DoubleBounds(bs.distinct.sorted))).toMap
      }

    val intBounds: Map[String, LongBounds] =
      if (intCols.isEmpty) Map.empty
      else {
        val longed = df.select(intCols.map(c => col(c).cast("long").as(c)): _*)
        val mmAggs = intCols.flatMap(c => Seq(min(col(c)), max(col(c))))
        val mmRow = longed.agg(mmAggs.head, mmAggs.tail: _*).collect()(0)
        val ranges: Seq[(Long, Long, Long)] = intCols.indices.map { i =>
          if (mmRow.isNullAt(2 * i)) (0L, 0L, 1L)
          else {
            val lo = mmRow.getLong(2 * i)
            val hi = mmRow.getLong(2 * i + 1)
            // Width via double only to SIZE the cells (harmless); cell
            // edges below are exact arithmetic.
            val width = math.max(1L,
              ((hi.toDouble - lo.toDouble) / DimHistCells).toLong + 1)
            (lo, hi, width)
          }
        }
        // One histogram pass for every integral dimension: explode to
        // (dim index, cell) and count — the shuffle key space is
        // bounded by ndims × DimHistCells regardless of data volume.
        // `div`, not `/`: Spark's `/` is DOUBLE division, which would
        // reintroduce the 53-bit round-trip this path exists to avoid.
        // When the dimension's SPAN itself exceeds Long capacity (a
        // raw signed 64-bit hash: lo ≈ Long.Min, hi ≈ Long.Max), the
        // exact `c - lo` subtraction overflows — an ANSI-mode crash,
        // silent wraparound otherwise — so that regime computes the
        // CELL INDEX through doubles instead: cells are ≤ 2^16, width
        // ≥ span/2^16 ≈ 2^48, and double's worst absolute error at
        // 2^63 magnitude (~2^11) misplaces a value by ≪ one cell;
        // bound EDGES stay exact (BigInt-clamped below) either way.
        val cellCols = intCols.zip(ranges).map { case (c, (lo, hi, width)) =>
          val spanOverflows = BigInt(hi) - BigInt(lo) > Long.MaxValue
          if (spanOverflows)
            // GREATEST-clamped: double rounding at ±2^63 magnitude can
            // nudge (c − lo) a hair negative for values at the bottom
            // edge; floor would emit cell −1.
            expr(s"GREATEST(CAST(0 AS BIGINT), " +
              s"CAST(floor((CAST(`$c` AS DOUBLE) - CAST(${lo}L AS DOUBLE))" +
              s" / CAST(${width}L AS DOUBLE)) AS BIGINT))")
          else expr(s"(`$c` - (${lo}L)) div (${width}L)")
        }
        val hist = longed
          .select(posexplode(array(cellCols: _*)).as(Seq("dim", "cell")))
          .filter(col("cell").isNotNull)
          .groupBy("dim", "cell").agg(count(lit(1)).as("w"))
          .collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        intCols.indices.map { i =>
          val (lo, _, width) = ranges(i)
          val cells = hist.filter(_._1 == i).map(t => (t._2, t._3)).sortBy(_._1)
          val total = cells.iterator.map(_._2).sum
          val out = scala.collection.mutable.ArrayBuffer.empty[Long]
          var acc = 0L
          var nextCut = 1
          cells.foreach { case (cell, w) =>
            acc += w
            while (nextCut <= nb && acc * (nb + 1).toLong >= total * nextCut) {
              // Upper-inclusive edge, BigInt-clamped: width rounds up,
              // so the top cell's edge can exceed hi — and for wide
              // dimensions even Long.MaxValue, where plain Long math
              // would wrap NEGATIVE and (after distinct.sorted) shift
              // every bucket rank by one.
              out += (BigInt(lo) + (BigInt(cell) + 1) * width - 1)
                .min(Long.MaxValue).toLong
              nextCut += 1
            }
          }
          intCols(i) -> LongBounds(out.distinct.sorted.toArray)
        }.toMap
      }
    cols.map(c => fracBounds.getOrElse(c, intBounds(c)))
  }

  /** The Morton curve key for one row: bucket each dimension by its
    * typed bounds ([[SortedBucket]] for integral dims,
    * [[SortedBucketDouble]] for fractional — codegen'd binary search
    * either way), interleave the ranks ([[InterleaveBits]]). Total key
    * width is `ndims × bitsPerDim` bits — callers get bounds from
    * [[dimBounds]] (or [[cluster]] end to end). */
  def zvalue(cols: Seq[Column], bounds: Seq[DimBounds], bitsPerDim: Int)
      : Column = {
    require(cols.nonEmpty && cols.size == bounds.size,
      s"need one bound array per column: ${cols.size} vs ${bounds.size}")
    // NULL dimension values rank as bucket 0 (the sentinel is below
    // every bound): null rows cluster together at the curve's origin
    // instead of getting a null curve key and arbitrary placement —
    // the global-order contract of the clustering write then covers
    // every row.
    val ranks = cols.zip(bounds).map {
      case (c, LongBounds(bs)) =>
        CatalystBridge.expr(
          CatalystBridge.column(
            SortedBucket(CatalystBridge.expr(
              coalesce(c.cast("long"), lit(Long.MinValue))), bs))
            .cast("long"))
      case (c, DoubleBounds(bs)) =>
        CatalystBridge.expr(
          CatalystBridge.column(
            SortedBucketDouble(CatalystBridge.expr(
              coalesce(c.cast("double"), lit(Double.NegativeInfinity))), bs))
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
