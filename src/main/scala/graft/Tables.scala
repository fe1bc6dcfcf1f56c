package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All engine queries take a scale-factor directory and read the table
  * they need; filters and column pruning are left to Catalyst so that
  * `PushedFilters`/`ReadSchema` reach the parquet scan. At cluster scale
  * these paths become warehouse locations — nothing else changes.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = table(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "lineitem")
  /** `events.ts` has shipped as two physical encodings across
    * testdata generations: INT64 TIMESTAMP(NANOS) (which Spark's
    * reader rejects outright — read nanos as long, truncate to µs,
    * exactly what DuckDB's µs-native reader does) and plain
    * TIMESTAMP(MICROS) (read as-is, like orders/lineitem dates).
    * Dispatch on the schema actually read so either generation works;
    * both yield the same instants, so the oracle agrees either way. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        // isAdjustedToUTC=false parquet reads as TIMESTAMP_NTZ; every
        // event query (windows, watermarks, unix_timestamp math) was
        // written against the LTZ TimestampType the nanos path
        // produced. Sessions run UTC, so the cast is value-identical.
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
