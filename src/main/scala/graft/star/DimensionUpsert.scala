package graft.star

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental append-only dimension maintenance (SCD type 0).
  *
  * Semantics from the reference's legacy star populator (reference
  * `scripts/__pycache__/populate_star_schema.cpython-310.pyc`, recovered
  * source lines 6-36): incoming natural keys are anti-joined against the
  * existing dimension and ONLY new keys are appended, with surrogate keys
  * continuing from the existing maximum. Existing attributes are never
  * updated — that is the reference's contract, documented not "fixed"
  * (SURVEY §7.4-6).
  *
  * Idempotent: upsert(upsert(D, x), x) == upsert(D, x).
  *
  * Scale notes: the anti-join broadcasts whichever side is small (dims
  * almost always are); the max-SK lookup is a single-row aggregate; new
  * rows get row_number over an orderBy of the natural key — fine for the
  * per-batch delta (small), not the full dimension.
  */
object DimensionUpsert {

  def upsert(
      existing: DataFrame,
      incoming: DataFrame,
      naturalKeys: Seq[String],
      skCol: String): DataFrame = {
    val incomingKeys = incoming.select(naturalKeys.map(col): _*)
      .na.drop(naturalKeys).distinct()
    val newKeys = incomingKeys.join(existing, naturalKeys, "left_anti")
    // Dense keys continuing after the current max. coalesce handles the
    // bootstrap case (empty existing dim).
    val base = coalesce(max(col(skCol)), lit(0))
    val maxSk = existing.agg(base.as("m"))
    val newRows = newKeys
      .withColumn("_rn", row_number().over(Window.orderBy(naturalKeys.map(col): _*)))
      .crossJoin(broadcast(maxSk))
      .select((col("_rn") + col("m")).cast("int").as(skCol) +: naturalKeys.map(col): _*)
    existing.select(col(skCol) +: naturalKeys.map(col): _*).unionByName(newRows)
  }
}
