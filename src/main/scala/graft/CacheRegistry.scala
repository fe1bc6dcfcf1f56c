package graft

import scala.collection.mutable

import org.apache.spark.sql.Dataset

/** Session-lifetime registry of the helper frames graft persists
  * internally (SK assignment inputs, q30/q28-style pair frames, q88's
  * counted-bigram frame).
  *
  * Why it exists: several operators persist an intermediate because
  * two passes consume it inside ONE logical query (RangePartitioner's
  * sample pass + the sort pass; the SK count + numbering passes; the
  * LM build + scoring join). The DataFrame API gives the operator no
  * "result fully materialized" hook to unpersist at, so the frames
  * outlive the query. The Verify/Bench harness clears them with
  * `spark.catalog.clearCache()` between queries; EMBEDDED callers
  * instead drain this registry once they have materialized (written,
  * collected) the results of a graft query:
  *
  * {{{
  *   val out = SparkEntry.queries("q30_jaccard_pairs")(spark, dir)
  *   out.write.parquet(...)
  *   CacheRegistry.drain()       // unpersists graft-internal caches
  * }}}
  *
  * `drain()` only touches frames graft itself persisted — never
  * user caches — so it is always safe to call. Registration keeps a
  * strong reference until drained; the set is bounded by the number
  * of persisting operators invoked since the last drain (a handful
  * per query), not by data volume.
  */
object CacheRegistry {

  private val frames = mutable.ArrayBuffer.empty[Dataset[_]]

  /** Persist `ds` and track it for [[drain]]. Returns `ds` for
    * chaining. Default level MEMORY_AND_DISK fits frames that are
    * re-READ by compute (SK inputs, q30's groups, q88's counted
    * bigrams); pass DISK_ONLY for OUTPUT-SIZED frames read once under
    * a contract sort (q30/q87 pair frames) — disk writes stream with
    * zero unroll memory, where a memory-first level must unroll each
    * partition on-heap first and an output-sized frame (pairs can be
    * 100× the corpus on dup-heavy data) OOMs executors at scale for
    * cache residency nothing will ever re-read. */
  def persistTracked[T](
      ds: Dataset[T],
      level: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    ds.persist(level)
    synchronized { frames += ds }
    ds
  }

  /** Unpersist every tracked frame and forget it. Non-blocking by
    * default (storage is freed asynchronously, like
    * `Dataset.unpersist()`). */
  def drain(blocking: Boolean = false): Unit = {
    val toDrop = synchronized {
      val copy = frames.toList
      frames.clear()
      copy
    }
    toDrop.foreach(_.unpersist(blocking))
  }

  /** Number of currently tracked frames (test/diagnostic hook). */
  def trackedCount: Int = synchronized(frames.length)

  /** Storage levels of the tracked frames (test/diagnostic hook). */
  def trackedLevels: List[org.apache.spark.storage.StorageLevel] =
    synchronized(frames.toList).map(_.storageLevel)
}
