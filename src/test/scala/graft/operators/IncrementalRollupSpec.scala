package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.SnapshotStore

class IncrementalRollupSpec extends SparkSpec {

  import spark.implicits._
  implicit private lazy val s: org.apache.spark.sql.SparkSession = spark

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def batch(rows: (String, Long)*): DataFrame =
    rows.toSeq.toDF("k", "v")

  private def fullRecompute(srcRoot: String): Map[String, (Long, Long)] =
    SnapshotStore.read(srcRoot).groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  private def rollupState(rollupRoot: String): Map[String, (Long, Long)] =
    SnapshotStore.read(rollupRoot)
      .collect().map(r => r.getAs[String]("k") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("sum_v"))).toMap

  test("refresh == full recompute after every append; no-op when current") {
    val src = tmp("roll-src"); val agg = tmp("roll-agg")
    SnapshotStore.append(batch("a" -> 1L, "a" -> 2L, "b" -> 5L), src)
    IncrementalRollup.refresh(src, agg, Seq("k"), Seq("v")).isDefined shouldBe true
    rollupState(agg) shouldBe fullRecompute(src)
    // current → None, no new rollup version
    val nVersions = SnapshotStore.history(agg).size
    IncrementalRollup.refresh(src, agg, Seq("k"), Seq("v")) shouldBe None
    SnapshotStore.history(agg).size shouldBe nVersions
    // two more appends, one refresh
    SnapshotStore.append(batch("a" -> 10L, "c" -> 7L), src)
    SnapshotStore.append(batch("b" -> 1L), src)
    IncrementalRollup.refresh(src, agg, Seq("k"), Seq("v")).isDefined shouldBe true
    rollupState(agg) shouldBe fullRecompute(src)
    IncrementalRollup.coveredVersion(agg) shouldBe Some(3L)
  }

  test("incremental refresh never re-reads covered data (behavioral proof)") {
    val src = tmp("roll-src2"); val agg = tmp("roll-agg2")
    SnapshotStore.append(batch("a" -> 1L, "b" -> 2L), src)
    IncrementalRollup.refresh(src, agg, Seq("k"), Seq("v"))
    val expectedAfter = Map("a" -> (2L, 4L), "b" -> (1L, 2L))
    // make v1's data unreadable: a full recompute would now fail
    val v1dir = SnapshotStore.history(src).head.dataDirs.head
    val from = Paths.get(src, v1dir)
    val away = Paths.get(src, "data", "hidden-away")
    Files.move(from, away)
    SnapshotStore.append(batch("a" -> 3L), src)
    // the refresh must succeed: it only reads v2's delta dir
    IncrementalRollup.refresh(src, agg, Seq("k"), Seq("v")).isDefined shouldBe true
    rollupState(agg) shouldBe expectedAfter
    Files.move(away, from) // restore for hygiene
  }

  test("an overwrite in the lineage forces a full recompute") {
    val src = tmp("roll-src3"); val agg = tmp("roll-agg3")
    SnapshotStore.append(batch("a" -> 1L, "b" -> 2L), src)
    IncrementalRollup.refresh(src, agg, Seq("k"), Seq("v"))
    SnapshotStore.overwrite(batch("z" -> 100L), src)
    SnapshotStore.append(batch("z" -> 1L), src)
    IncrementalRollup.refresh(src, agg, Seq("k"), Seq("v")).isDefined shouldBe true
    rollupState(agg) shouldBe Map("z" -> (2L, 101L))
    rollupState(agg) shouldBe fullRecompute(src)
  }

  test("refresh is idempotent on the source version (replayed publish no-ops)") {
    val src = tmp("roll-src4"); val agg = tmp("roll-agg4")
    SnapshotStore.append(batch("a" -> 1L), src)
    val v = IncrementalRollup.refresh(src, agg, Seq("k"), Seq("v")).get
    // simulate a crashed caller re-running after the publish landed:
    // the tag exists, so a second publish for the same source version
    // returns the existing rollup version
    SnapshotStore.overwriteOnce(
      IncrementalRollup.aggregate(SnapshotStore.read(src), Seq("k"), Seq("v")),
      agg, "srcv-1").version shouldBe v.version
  }

  test("multiple sum columns and multi-column keys") {
    val src = tmp("roll-src5"); val agg = tmp("roll-agg5")
    val df = Seq(("a", "x", 1L, 10.0), ("a", "x", 2L, 0.5), ("b", "y", 3L, 1.0))
      .toDF("k1", "k2", "v1", "v2")
    SnapshotStore.append(df, src)
    IncrementalRollup.refresh(src, agg, Seq("k1", "k2"), Seq("v1", "v2"))
    SnapshotStore.append(Seq(("a", "x", 5L, 1.0)).toDF("k1", "k2", "v1", "v2"), src)
    IncrementalRollup.refresh(src, agg, Seq("k1", "k2"), Seq("v1", "v2"))
    val out = SnapshotStore.read(agg).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("sum_v1"),
          r.getAs[Double]("sum_v2"))).toMap
    out(("a", "x")) shouldBe ((3L, 8L, 11.5))
    out(("b", "y")) shouldBe ((1L, 3L, 1.0))
  }
}
