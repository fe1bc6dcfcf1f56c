package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single most recent right row at
  * or before the left's timestamp, per key.
  *
  * NOT implemented as a range join: a `l.ts >= r.ts` theta-join
  * explodes to O(|L|·|R|) candidates per key before picking the max.
  * The scalable technique is union + ordered window:
  *
  *   1. tag both sides and union them (schema-aligned);
  *   2. one shuffle on the key, sort within (key, ts, side-priority);
  *   3. ONE `last(struct(right-values), ignoreNulls)` over the running
  *      window carries the latest right row forward onto every left
  *      row, then the struct is unpacked. A single struct (not one
  *      window per carried column) guarantees all carried columns come
  *      from the SAME right row even when some of its value columns are
  *      legitimately NULL — per-column `last(ignoreNulls)` would skip
  *      past a null value to an older row for that column only.
  *
  * O(n log n) per key partition, ONE shuffle total, no pair blow-up —
  * the classic time-series alignment (ticks→quotes) shape at any
  * scale. Ties (equal timestamps) resolve right-before-left, i.e. a
  * right row AT the left timestamp matches.
  */
object AsOfJoin {

  /** @param left       probe side (e.g. clicks)
    * @param right      reference side (e.g. views / quotes)
    * @param keyCols    equi-key columns present on both sides
    * @param leftTs     left timestamp column name
    * @param rightTs    right timestamp column name
    * @param rightVals  right columns to carry (prefixed in the output
    *                   as-is; must not collide with left columns)
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // All carried columns ride in ONE struct per right row; a right row
    // is never null as a whole (even if its value columns are), so
    // last(ignoreNulls) lands on the most recent right ROW atomically.
    val rvalType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c)))
    // side = 0 sorts right rows before left rows at equal timestamps.
    val taggedRight = right.select(
      (keyCols.map(col) :+ col(rightTs).as("_ts") :+ lit(0).as("_side") :+
        struct(rightVals.map(col): _*).as("_rvals")) ++
        leftCols.filterNot(keyCols.contains).map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      (keyCols.map(col) :+ col(leftTs).as("_ts") :+ lit(1).as("_side") :+
        lit(null).cast(rvalType).as("_rvals")) ++
        leftCols.filterNot(keyCols.contains).map(col): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn("_rlast", last(col("_rvals"), ignoreNulls = true).over(w))
    carried.filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        rightVals.map(c => col("_rlast").getField(c).as(c)): _*)
  }
}
