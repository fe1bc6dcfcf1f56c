package graft.star

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental append-only dimension maintenance (SCD type 0).
  *
  * Semantics from the reference's legacy star populator (reference
  * `scripts/__pycache__/populate_star_schema.cpython-310.pyc`, recovered
  * source lines 6-36): incoming natural keys are anti-joined against the
  * existing dimension and ONLY new keys are appended, with surrogate keys
  * continuing from the existing maximum. Existing attributes are never
  * updated — that is the reference's contract, documented not "fixed"
  * (SURVEY §7.4-6). Non-key attribute columns present in BOTH frames are
  * carried through: existing rows keep theirs, new rows take a
  * deterministic (min-by-attribute-tuple) pick from the incoming batch.
  *
  * Idempotent: upsert(upsert(D, x), x) == upsert(D, x).
  *
  * Scale notes: the anti-join broadcasts whichever side is small (dims
  * almost always are); the max-SK lookup is a single-row aggregate; new
  * rows get row_number over an orderBy of the natural key — fine for the
  * per-batch delta (small), not the full dimension. SKs are LongType.
  *
  * Caching contract: the SK assignment persists the delta internally
  * (SkStrategy.Auto). Long-lived sessions issuing repeated upserts
  * should reclaim those frames with [[graft.CacheRegistry.drain]]
  * after materializing each result (the Verify/Bench harness uses
  * `clearCache()` instead).
  */
object DimensionUpsert {

  def upsert(
      existing: DataFrame,
      incoming: DataFrame,
      naturalKeys: Seq[String],
      skCol: String): DataFrame = {
    // Attribute columns = existing's non-key, non-SK columns that the
    // incoming batch also carries (anything else can't be populated).
    val attrCols = existing.columns.toSeq
      .filterNot(c => c == skCol || naturalKeys.contains(c))
      .filter(incoming.columns.contains)

    // One row per new natural key, attributes picked deterministically
    // (min over the attribute tuple) so re-runs are stable.
    val incomingRows = incoming
      .select((naturalKeys ++ attrCols).map(col): _*)
      .na.drop(naturalKeys)
    val incomingKeyed =
      if (attrCols.isEmpty) incomingRows.distinct()
      else incomingRows.groupBy(naturalKeys.map(col): _*)
        .agg(min(struct(attrCols.map(col): _*)).as("_attrs"))
        .select(naturalKeys.map(col) ++ attrCols.map(a => col(s"_attrs.$a").as(a)): _*)

    val newKeys = incomingKeyed.join(existing, naturalKeys, "left_anti")
    // Dense keys continuing after the current max. coalesce handles the
    // bootstrap case (empty existing dim).
    val base = coalesce(max(col(skCol)).cast("long"), lit(0L))
    val maxSk = existing.agg(base.as("_m"))
    val outCols = col(skCol) +: (naturalKeys ++ attrCols).map(col)
    // Dense numbering of the delta via the shared SK machinery: Auto
    // takes the single-task window only below its threshold and the
    // parallel PartitionedOffset path above it — a dim delta is
    // usually small, but nothing guarantees it (a backfill replays
    // history), and a hand-rolled global Window.orderBy here was the
    // one SK assignment outside that guard.
    val newRows = StarSchemaBuilder
      .withSurrogateKey(newKeys, naturalKeys, "_rn", SkStrategy.Auto)
      .crossJoin(broadcast(maxSk))
      .withColumn(skCol, (col("_rn") + col("_m")).cast("long"))
      .select(outCols: _*)
    existing.select(outCols: _*).withColumn(skCol, col(skCol).cast("long"))
      .unionByName(newRows)
  }
}
