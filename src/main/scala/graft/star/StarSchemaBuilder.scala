package graft.star

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Star-schema construction — the engine's core ETL operator set.
  *
  * Mirrors the reference's dimensional build (reference
  * `dags/spark_etl_script.py:90-189`: distinct + normalize + surrogate
  * key per dimension, date dimension derivation, fact assembly via left
  * joins back to the dims, bridge via explode) re-expressed Spark-first.
  *
  * Surrogate-key strategy is pluggable (SURVEY §7.4-5):
  *   - [[SkStrategy.GlobalRowNumber]] — bit-compatible with the
  *     reference (`row_number over Window.orderBy`), but the global
  *     unpartitioned window is a single-task sort: correct at any scale,
  *     bottlenecked on one core beyond ~10^8 dim rows.
  *   - [[SkStrategy.ZipWithIndex]] — scalable: sortWithinPartitions +
  *     per-partition offsets (two jobs, no single-task sort). Same dense
  *     1..N contiguous keys, safe for 100 TB dims.
  */
object SkStrategy extends Enumeration { val GlobalRowNumber, ZipWithIndex = Value }

object StarSchemaBuilder {

  /** Distinct + normalize + dense surrogate key. Dimension rows are tiny
    * relative to the fact, so the distinct's shuffle is the real cost;
    * the SK assignment is chosen by `strategy`. */
  def buildDim(
      src: DataFrame,
      naturalKey: Column,
      skName: String,
      keyName: String,
      strategy: SkStrategy.Value = SkStrategy.GlobalRowNumber): DataFrame = {
    val distinctKeys = src
      .select(naturalKey.as(keyName))
      .filter(col(keyName).isNotNull)
      .distinct()
    withSurrogateKey(distinctKeys, Seq(keyName), skName, strategy)
      .select(col(skName), col(keyName))
  }

  /** Assign a dense 1..N surrogate key ordered by `orderCols`. */
  def withSurrogateKey(
      df: DataFrame,
      orderCols: Seq[String],
      skName: String,
      strategy: SkStrategy.Value): DataFrame = strategy match {
    case SkStrategy.GlobalRowNumber =>
      // Reference-compatible: one global sort, single-task window.
      // SKs stay LongType — an int cast would silently wrap past 2^31
      // rows; the reference only needs int at the write boundary.
      df.withColumn(skName,
        row_number().over(Window.orderBy(orderCols.map(col): _*)).cast("long"))
    case SkStrategy.ZipWithIndex =>
      // Scalable: range-partition by the order columns (so partition i
      // holds keys strictly before partition i+1), then zipWithIndex —
      // a two-pass, all-parallel dense numbering with no global window.
      val sorted = df.repartitionByRange(orderCols.map(col): _*)
        .sortWithinPartitions(orderCols.map(col): _*)
      val schema = sorted.schema
      val indexed = sorted.rdd.zipWithIndex.map { case (row, idx) =>
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (idx + 1L))
      }
      sorted.sparkSession.createDataFrame(indexed,
        schema.add(skName, org.apache.spark.sql.types.LongType))
  }

  /** Date dimension from a timestamp/date column (reference
    * `dags/spark_etl_script.py:112-120`): one row per distinct date with
    * yyyyMMdd integer SK and calendar attributes. */
  def buildDateDim(src: DataFrame, dateCol: Column): DataFrame =
    src.select(to_date(dateCol).as("full_date"))
      .filter(col("full_date").isNotNull)
      .distinct()
      .select(
        date_format(col("full_date"), "yyyyMMdd").cast("int").as("date_sk"),
        col("full_date"),
        date_format(col("full_date"), "EEEE").as("day_of_week"),
        date_format(col("full_date"), "MMMM").as("month_name"),
        month(col("full_date")).as("month_number"),
        quarter(col("full_date")).as("quarter_number"),
        year(col("full_date")).as("year_number"))
}
