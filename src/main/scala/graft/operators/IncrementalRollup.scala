package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.SnapshotStore

/** Incremental aggregate maintenance over [[SnapshotStore]] lineage —
  * the materialized-view refresh a 100 TB corpus store needs: a
  * keys-bounded COUNT/SUM rollup stays current by aggregating ONLY the
  * data directories appended since the last refresh and merging with
  * the stored rollup, instead of re-scanning the whole table per
  * refresh.
  *
  * Mechanics: the rollup is itself a snapshot table whose latest
  * manifest carries a `srcv-N` tag — the source version it covers.
  * `refresh` diffs the source lineage from N to latest:
  *   - all intermediate commits are appends ⇒ the delta is exactly the
  *     data dirs added after version N (manifests list dirs, so the
  *     diff is set arithmetic, no file listing) — aggregate the delta,
  *     merge with the stored rollup (both keys-bounded), publish;
  *   - any overwrite in between ⇒ the delta is not expressible as an
  *     append — fall back to a full recompute (correct by
  *     construction, and the rollup manifest records it);
  *   - already current ⇒ None, nothing read, nothing written.
  *
  * COUNT and SUM are the algebraic aggregates whose merge is itself a
  * sum — which is what makes merge(old, Δ) ≡ recompute provable
  * (`IncrementalRollupSpec` pins equality after every refresh, and
  * proves the delta property behaviorally: a refresh still succeeds
  * after already-covered data dirs are made unreadable).
  */
object IncrementalRollup {

  private val TagPrefix = "srcv-"

  /** Source version the current rollup covers, if any. */
  def coveredVersion(rollupRoot: String): Option[Long] =
    SnapshotStore.latestVersion(rollupRoot)
      .flatMap(_.tag)
      .filter(_.startsWith(TagPrefix))
      .map(_.drop(TagPrefix.length).toLong)

  /** Bring the rollup up to the source's latest version. Returns the
    * published rollup version, or None when already current. */
  def refresh(srcRoot: String, rollupRoot: String, keys: Seq[String],
      sumCols: Seq[String])(
      implicit spark: SparkSession): Option[SnapshotStore.Version] = {
    require(keys.nonEmpty, "rollup needs at least one key column")
    val srcLatest = SnapshotStore.latestVersion(srcRoot)
      .getOrElse(return None) // empty source: nothing to cover
    val covered = coveredVersion(rollupRoot)
    if (covered.contains(srcLatest.version)) return None

    val history = SnapshotStore.history(srcRoot)
    val incremental = covered.flatMap { cv =>
      val since = history.filter(_.version > cv)
      val base = history.find(_.version == cv)
      // appends only, and the covered manifest must still exist (else
      // we cannot compute the dir diff)
      if (base.isDefined && since.nonEmpty && since.forall(_.op == "append"))
        Some(srcLatest.dataDirs.diff(base.get.dataDirs))
      else None
    }

    val rollup = incremental match {
      case Some(deltaDirs) if deltaDirs.isEmpty =>
        // lineage advanced but added no dirs (defensive) — re-tag only
        SnapshotStore.read(rollupRoot)
      case Some(deltaDirs) =>
        val delta = aggregate(
          SnapshotStore.readDirs(srcRoot, deltaDirs), keys, sumCols)
        merge(SnapshotStore.read(rollupRoot), delta, keys, sumCols)
      case None =>
        aggregate(SnapshotStore.read(srcRoot), keys, sumCols)
    }
    // checkpoint: the overwrite below replaces the table the merge read
    val staged = rollup.localCheckpoint(true)
    Some(SnapshotStore.overwriteOnce(staged, rollupRoot,
      s"$TagPrefix${srcLatest.version}"))
  }

  /** groupBy(keys) → n_rows + sum_<c> for each requested column. */
  def aggregate(df: DataFrame, keys: Seq[String],
      sumCols: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sumCols.map(c => sum(col(c)).as(s"sum_$c")): _*)

  /** Merge two rollups: algebraic — sums of sums. */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    val measures = "n_rows" +: sumCols.map(c => s"sum_$c")
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(measures.head)).as(measures.head),
        measures.tail.map(m => sum(col(m)).as(m)): _*)
  }
}
