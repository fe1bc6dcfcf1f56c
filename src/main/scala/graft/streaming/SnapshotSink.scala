package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.sources.SnapshotStore

/** Streaming → [[SnapshotStore]] bridge: each micro-batch commits as
  * one tagged snapshot version, so the at-least-once `foreachBatch`
  * contract becomes exactly-once at the TABLE level — a batch replayed
  * after a crash (between data write and checkpoint commit) finds its
  * `batch-N` tag already published and no-ops instead of duplicating
  * rows. The same idempotence idea as
  * [[IncrementalStar]]'s dynamic-partition-overwrite fact landing, but
  * carried by the snapshot manifest instead of a partition column —
  * downstream readers additionally get snapshot isolation and time
  * travel across micro-batches for free.
  *
  * Retention contract: [[SnapshotStore.vacuum]]'s `keepLast` must
  * cover the stream's replay horizon (in practice: one batch), or a
  * replay after an aggressive vacuum re-appends.
  */
object SnapshotSink {

  /** Commit one micro-batch (idempotent on `batchId`). Empty batches
    * publish no version — foreachBatch fires them on some triggers and
    * an empty commit per tick would grow the manifest list for
    * nothing. */
  def processBatch(batch: DataFrame, root: String,
      batchId: Long): Option[SnapshotStore.Version] =
    if (batch.isEmpty) None
    else Some(SnapshotStore.appendOnce(batch, root, s"batch-$batchId"))

  /** writeStream writer wired to [[processBatch]]; caller sets
    * checkpointLocation/trigger and starts it. */
  def writer(stream: DataFrame, root: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        processBatch(b, root, id); ()
      }
}
