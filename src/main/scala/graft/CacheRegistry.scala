package graft

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.storage.StorageLevel

/** Session-lifetime registry of the helper frames graft persists
  * internally (SK assignment inputs, q87-style pair frames, q88's
  * counted-bigram frame).
  *
  * Why it exists: several operators persist an intermediate because
  * two passes consume it inside ONE logical query (the SK count +
  * numbering passes; the LM build + scoring join; a contract sort
  * above an expensive verify join). The DataFrame API gives the
  * operator no "result fully materialized" hook to unpersist at, so
  * the frames outlive the query. Three reclamation paths:
  *
  *  1. The Verify/Bench harness clears everything with
  *     `spark.catalog.clearCache()` + [[drain]] between queries.
  *  2. Embedded callers who go through [[SparkEntry.queries]] get
  *     AUTO-drain: a [[QueryExecutionListener]] watches for the first
  *     materialization of each built query and unpersists exactly the
  *     internal frames that query's plan references (other queries'
  *     frames are untouched — the scoping round 7's advice asked for).
  *  3. Manual [[drain]] unpersists every tracked frame — correct only
  *     between logical queries: calling it while another in-flight
  *     graft query still needs its internal frames does not corrupt
  *     results (Spark recomputes) but silently re-executes the
  *     heaviest intermediates. One logical query at a time, or use
  *     the auto path.
  *
  * Registration keeps a strong reference until drained; the set is
  * bounded by the number of persisting operators invoked since the
  * last drain (a handful per query), not by data volume.
  */
object CacheRegistry {

  /** How a persisted frame's row count scales — declared at every
    * [[persistTracked]] call site so the memory-safety rule below is
    * structural, not reviewer discipline (the sf10x OOM class:
    * memory-first unroll of a frame that is output-bounded rather
    * than input-bounded). */
  sealed trait SizeClass
  /** ≤ a fixed row count regardless of input (dims, 1-row totals). */
  case object Bounded extends SizeClass
  /** O(input rows): per-document/per-fact intermediates. A
    * memory-first level is safe — partitions are sized by the scan. */
  case object DataSized extends SizeClass
  /** O(output rows), potentially orders of magnitude above the input
    * (pair frames: 2.48 B pairs from 500 k docs at the sf10x probe).
    * MUST be DISK_ONLY — disk writes stream with zero unroll memory,
    * while a memory-first level unrolls each partition on-heap for
    * residency nothing will ever re-read. Enforced by require(). */
  case object OutputSized extends SizeClass

  private final case class Tracked(
      ds: Dataset[_],
      sizeClass: SizeClass,
      var armed: Boolean = false)

  private val frames = mutable.ArrayBuffer.empty[Tracked]
  private val sessionsWithListener =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Persist `ds` and track it for reclamation. Returns `ds` for
    * chaining. `sizeClass` is the call site's declaration of how the
    * frame scales (see [[SizeClass]]); an [[OutputSized]] frame with
    * any level but DISK_ONLY is rejected outright. */
  def persistTracked[T](
      ds: Dataset[T],
      sizeClass: SizeClass,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    require(sizeClass != OutputSized || level == StorageLevel.DISK_ONLY,
      s"output-sized frames must be DISK_ONLY, got $level — a memory-first " +
        "unroll of an output-bounded frame OOMs executors at scale (PERF #23)")
    ds.persist(level)
    synchronized { frames += Tracked(ds, sizeClass) }
    ds
  }

  /** Unpersist every tracked frame and forget it. Non-blocking by
    * default (storage is freed asynchronously, like
    * `Dataset.unpersist()`). Only touches frames graft itself
    * persisted — never user caches. */
  def drain(blocking: Boolean = false): Unit = {
    val toDrop = synchronized {
      val copy = frames.toList
      frames.clear()
      copy
    }
    toDrop.foreach(_.ds.unpersist(blocking))
  }

  /** Arm every currently tracked frame for auto-drain. Called by
    * [[SparkEntry.queries]] once a query's builder RETURNS: frames
    * persisted during construction (whose bound/SK actions fire the
    * listener before the caller ever sees the DataFrame) stay immune
    * until the query is fully built. */
  private[graft] def armAll(): Unit =
    synchronized { frames.foreach(_.armed = true) }

  /** Auto-drain hook: after any query execution on `spark`, unpersist
    * exactly the ARMED tracked frames that execution's plan consumed.
    * Idempotent per session; the listener fires asynchronously (like
    * all QueryExecutionListeners), so reclamation lags the action by
    * at most a listener-bus hop. */
  def installAutoDrain(spark: SparkSession): Unit = synchronized {
    if (sessionsWithListener.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(
            funcName: String, qe: QueryExecution, durationNs: Long): Unit =
          drainReferenced(qe)
        override def onFailure(
            funcName: String, qe: QueryExecution, exception: Exception): Unit =
          drainReferenced(qe)
      })
    }
  }

  /** Unpersist the armed tracked frames whose plan occurs in `qe`'s
    * analyzed plan (pre-cache-substitution, so the persisted subtree
    * is present verbatim; matching is canonicalized `sameResult`).
    * Frames belonging to OTHER queries — different subtrees — are
    * left alone. */
  private def drainReferenced(qe: QueryExecution): Unit = {
    val hit = synchronized {
      if (frames.isEmpty || !frames.exists(_.armed)) Nil
      else {
        val (drop, keep) = frames.partition { t =>
          t.armed && {
            val target = t.ds.queryExecution.analyzed
            qe.analyzed.find(_.sameResult(target)).isDefined
          }
        }
        frames.clear()
        frames ++= keep
        drop.toList
      }
    }
    hit.foreach(_.ds.unpersist(false))
  }

  /** Number of currently tracked frames (test/diagnostic hook). */
  def trackedCount: Int = synchronized(frames.length)

  /** Storage levels of the tracked frames (test/diagnostic hook). */
  def trackedLevels: List[StorageLevel] =
    synchronized(frames.toList).map(_.ds.storageLevel)

  /** Size classes of the tracked frames (test/diagnostic hook). */
  def trackedSizeClasses: List[SizeClass] =
    synchronized(frames.toList).map(_.sizeClass)
}
