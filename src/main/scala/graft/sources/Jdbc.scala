package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** JDBC source/sink surface (SURVEY §2.1 S5/S6/S11).
  *
  * The incremental scan pushes the watermark predicate INTO the database
  * as a subquery-as-dbtable (reference
  * `scripts/pyspark/extract_postgres_table.py:46-56`) so the DB ships
  * only new rows — at 100 TB of history with a daily delta, this is the
  * difference between scanning everything and scanning the delta.
  * `partitionColumn/numPartitions` options make the read itself
  * parallel across executors.
  */
object Jdbc {

  /** Full-table scan (reference `dags/spark_etl_script.py:65-72`). */
  def scan(spark: SparkSession, url: String, table: String,
      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Pushdown subquery for the incremental read. Exposed for testing —
    * the quoting contract matters. */
  def incrementalSubquery(table: String, tsCol: String, watermark: String): String =
    s"(SELECT * FROM $table WHERE $tsCol > '$watermark') filtered_data"

  /** Incremental scan: watermark from `store`, predicate pushed into
    * the DB. `epochWatermark` is the bootstrap lower bound. */
  def incrementalScan(
      spark: SparkSession,
      url: String,
      table: String,
      tsCol: String,
      store: WatermarkStore,
      storeKey: String,
      epochWatermark: String = "1970-01-01 00:00:00",
      props: Properties = new Properties()): DataFrame = {
    val wm = store.getOrElse(storeKey, epochWatermark)
    spark.read.jdbc(url, incrementalSubquery(table, tsCol, wm), props)
  }

  /** Record max(tsCol) of an extracted batch back into the store
    * (reference `extract_postgres_table.py:72-76`). No-op on an empty
    * batch — the watermark must never regress. */
  def recordWatermark(df: DataFrame, tsCol: String,
      store: WatermarkStore, storeKey: String): Unit = {
    val row = df.agg(max(col(tsCol)).cast("string")).collect()(0)
    if (!row.isNullAt(0)) store.set(storeKey, row.getString(0))
  }

  /** Append sink (reference `extraction.py:178,220-232`). */
  def append(df: DataFrame, url: String, table: String,
      props: Properties = new Properties()): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, props)
}
