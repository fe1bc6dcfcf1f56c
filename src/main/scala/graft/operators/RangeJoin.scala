package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join: points to enclosing intervals (`lo <= v < hi`), made
  * shuffle-friendly by bucketization.
  *
  * A naive `p.v >= r.lo AND p.v < r.hi` theta join has no equi-key —
  * Spark plans it as a broadcast-nested-loop (or cartesian), O(|P|·|R|)
  * comparisons. The standard fix: quantize the value domain into
  * fixed-width buckets, explode each interval onto every bucket it
  * overlaps, equi-join points to intervals ON THE BUCKET, then apply
  * the exact containment predicate to the (tiny) per-bucket candidate
  * set. Cost: one equi-shuffle + candidates bounded by bucket
  * occupancy, instead of all pairs. `bucketWidth` trades replication
  * (wide intervals explode onto more buckets) against candidate count.
  */
object RangeJoin {

  /** @param points      frame with a numeric `valueCol`
    * @param ranges      frame with numeric `loCol` (inclusive) and
    *                    `hiCol` (exclusive)
    * @param bucketWidth bucket size in value units — pick ≳ median
    *                    interval width so most intervals hit ≤2 buckets
    */
  def join(
      points: DataFrame,
      ranges: DataFrame,
      valueCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Double): DataFrame = {
    val p = points.withColumn("_bucket",
      floor(col(valueCol) / bucketWidth).cast("long"))
    val r = ranges.withColumn("_bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        // hi is exclusive: a range ending exactly on a bucket boundary
        // does not overlap the next bucket
        floor((col(hiCol) - lit(1e-9)) / bucketWidth).cast("long"))))
    p.join(r, Seq("_bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("_bucket")
  }
}
