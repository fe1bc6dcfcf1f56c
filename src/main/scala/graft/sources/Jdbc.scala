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
  *
  * Reads accept an optional [[Jdbc.PartitionSpec]]: with it, Spark
  * opens `numPartitions` connections, each scanning one stride of
  * `[lowerBound, upperBound)` on `column` — without it every JDBC
  * extract is a single-connection, single-task read, which is the
  * bottleneck at any real landing-table size.
  */
object Jdbc {

  /** Parallel-read partitioning: `numPartitions` concurrent
    * connections, each reading one stride of `column` in
    * `[lowerBound, upperBound]`. Rows outside the bounds are still
    * read (by the first/last stride) — bounds shape parallelism, not
    * the result. */
  final case class PartitionSpec(
      column: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int)

  /** Single-quoted SQL string literal with embedded quotes doubled —
    * the portable escape. The watermark comes from the engine's own
    * store, but a timestamp-ish value containing `'` must not break
    * (or rewrite) the pushed-down subquery.
    *
    * Backslashes are REJECTED rather than escaped: standard-SQL
    * engines treat `\` as a literal character while MySQL (default
    * sql_mode) treats it as an escape — no single rendering is safe on
    * both, and no real timestamp watermark contains one. Failing loud
    * beats a predicate that silently means something else. */
  def sqlLiteral(value: String): String = {
    require(!value.contains("\\"),
      s"refusing to embed a backslash-containing SQL literal " +
        s"(engine-dependent escaping): $value")
    "'" + value.replace("'", "''") + "'"
  }

  /** Full-table scan (reference `dags/spark_etl_script.py:65-72`);
    * pass `partitioning` to fan the read out over N connections. */
  def scan(spark: SparkSession, url: String, table: String,
      props: Properties = new Properties(),
      partitioning: Option[PartitionSpec] = None): DataFrame =
    partitioning match {
      case Some(p) =>
        spark.read.jdbc(url, table, p.column, p.lowerBound, p.upperBound,
          p.numPartitions, props)
      case None => spark.read.jdbc(url, table, props)
    }

  /** Pushdown subquery for the incremental read. Exposed for testing —
    * the quoting contract matters: the watermark is embedded as an
    * escaped literal (see [[sqlLiteral]]). */
  def incrementalSubquery(table: String, tsCol: String, watermark: String): String =
    s"(SELECT * FROM $table WHERE $tsCol > ${sqlLiteral(watermark)}) filtered_data"

  /** Incremental scan: watermark from `store`, predicate pushed into
    * the DB. `epochWatermark` is the bootstrap lower bound; pass
    * `partitioning` to parallelize the delta read itself. */
  def incrementalScan(
      spark: SparkSession,
      url: String,
      table: String,
      tsCol: String,
      store: WatermarkStore,
      storeKey: String,
      epochWatermark: String = "1970-01-01 00:00:00",
      props: Properties = new Properties(),
      partitioning: Option[PartitionSpec] = None): DataFrame = {
    val wm = store.getOrElse(storeKey, epochWatermark)
    scan(spark, url, incrementalSubquery(table, tsCol, wm), props, partitioning)
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
