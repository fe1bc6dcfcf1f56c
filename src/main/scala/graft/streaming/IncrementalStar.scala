package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row
import graft.star.DimensionUpsert

/** Incremental star maintenance under Structured Streaming — the
  * engine's generalization of the reference's legacy incremental path
  * (watermark-pushdown JDBC extract + pandas append-only dim populator,
  * `scripts/pyspark/extract_postgres_table.py` +
  * `populate_star_schema`): each micro-batch of landing rows upserts
  * the dimensions (append-only, SKs continue from the stored max —
  * SCD-0 exactly like [[graft.star.DimensionUpsert]]) and appends
  * SK-resolved fact rows.
  *
  * `foreachBatch` is the idiomatic Spark shape for this: the batch
  * body reuses the BATCH operators unchanged, and dimension state
  * lives in the warehouse tables themselves (re-read per batch — C3's
  * re-read-after-write, now load-bearing: the sink IS the dim store).
  * Dims are warehouse-table-sized reads per batch; the fact only ever
  * appends.
  *
  * End-to-end idempotence under foreachBatch's AT-LEAST-ONCE replay:
  *   - dim upsert is naturally idempotent (left-anti on the natural
  *     key: a replayed batch finds its keys present and adds nothing);
  *   - the fact append is made idempotent by landing each micro-batch
  *     in its own `batch_id` partition and writing it with DYNAMIC
  *     partition overwrite — a batch replayed after a crash (between
  *     fact write and checkpoint commit) overwrites its own partition
  *     instead of appending duplicate rows. A plain append would
  *     silently double those rows.
  */
object IncrementalStar {

  final case class DimSpec(table: String, skCol: String, naturalKeys: Seq[String],
      attrs: Seq[String] = Nil)

  /** Upsert one micro-batch into the dims + fact tables under `db`.
    * Exposed for direct (batch) use and testing; `stream` wires it
    * into foreachBatch, threading the engine's batchId through so
    * replays land on the same fact partition.
    *
    * `batchId` is REQUIRED (no default on purpose): re-running with
    * the same id REPLACES that id's fact partition — that is the
    * replay-idempotence contract. A direct batch caller must supply a
    * fresh id per logical load (e.g. a yyyyMMdd run date); a silent
    * default would turn successive loads into overwrites of one
    * partition. */
  def processBatch(
      spark: SparkSession,
      batch: DataFrame,
      db: String,
      dims: Seq[DimSpec],
      factTable: String,
      factCols: Seq[String],
      batchId: Long): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val resolvedDims = dims.map { d =>
      val fq = s"$db.${d.table}"
      val existing =
        if (spark.catalog.tableExists(fq)) spark.table(fq)
        else {
          val cols = (Seq(d.skCol) ++ d.naturalKeys ++ d.attrs)
          val schema = org.apache.spark.sql.types.StructType(
            org.apache.spark.sql.types.StructField(d.skCol,
              org.apache.spark.sql.types.LongType) +:
            (d.naturalKeys ++ d.attrs).map(c =>
              org.apache.spark.sql.types.StructField(c, batch.schema(c).dataType)))
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[Row], schema)
        }
      val updated = DimensionUpsert.upsert(
        existing, batch.select((d.naturalKeys ++ d.attrs).map(col): _*),
        d.naturalKeys, d.skCol)
      // Overwrite via checkpointed temp: the upsert READS the table it
      // replaces, so write through a staging frame.
      val staged = updated.localCheckpoint(true)
      staged.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(fq)
      // The session caches the table's file listing; after the
      // overwrite it points at deleted part files.
      spark.catalog.refreshTable(fq)
      d -> spark.table(fq)
    }
    // Fact: resolve each dim's SK by its natural keys (broadcast — dims
    // are small relative to the batch), then land the batch in its own
    // batch_id partition, dynamically overwritten so replays are
    // idempotent.
    val fact = resolvedDims.foldLeft(batch) { case (acc, (d, dimDf)) =>
      acc.join(
        broadcast(dimDf.select((d.skCol +: d.naturalKeys).map(col): _*)),
        d.naturalKeys, "left")
    }
    val factOut = fact.select(factCols.map(col): _*)
      .withColumn("batch_id", lit(batchId))
    val factFq = s"$db.$factTable"
    if (!spark.catalog.tableExists(factFq)) {
      factOut.write.partitionBy("batch_id").format("parquet")
        .saveAsTable(factFq)
    } else {
      // insertInto is position-based; batch_id (the partition column)
      // is last in both the frame and the table schema. DYNAMIC
      // overwrite mode limits the overwrite to the partitions present
      // in this frame — exactly {batchId}. Session conf, not a writer
      // option: insertInto does not honor the per-writer option.
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prev = spark.conf.get(key)
      spark.conf.set(key, "dynamic")
      try factOut.write.mode(SaveMode.Overwrite).insertInto(factFq)
      finally spark.conf.set(key, prev)
    }
    spark.catalog.refreshTable(factFq)
  }

  /** Wire a landing stream into the incremental star. Caller starts the
    * returned writer (choosing trigger/checkpoint). */
  def stream(
      landing: DataFrame,
      db: String,
      dims: Seq[DimSpec],
      factTable: String,
      factCols: Seq[String]): DataStreamWriter[Row] =
    landing.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, db, dims, factTable, factCols,
          batchId)
      }
      .trigger(Trigger.AvailableNow())
}
