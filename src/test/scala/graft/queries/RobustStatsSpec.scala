package graft.queries

import java.nio.file.Files
import java.sql.Timestamp

import graft.{SparkEntry, SparkSpec}

/** Round-10 analytics additions on crafted inputs where the answer is
  * computable by hand (the DuckDB oracle gates them on the synthetic
  * tables; these pin the SEMANTICS — interpolated order statistics,
  * RANGE-frame tie handling, NTILE bucket sizing). */
class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) =
    SparkEntry.allDefs.find(_.name == name).getOrElse(fail(s"missing $name"))

  /** Stage an events.parquet with the testdata schema (µs timestamps). */
  private def stageEvents(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val dir = Files.createTempDirectory("robuststats").toString
    rows.map { case (id, tsMicros, user, typ, value) =>
      (id, new Timestamp(tsMicros / 1000), user, typ, value, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q113: hand-computed median/MAD/outliers, odd and even counts") {
    val h = 3600000000L
    val dir = stageEvents(
      // type "ev" (even n=4): values 1,2,3,4 → med 2.5, |dev| sorted
      // [0.5,0.5,1.5,1.5] → mad 1.0, threshold 4.4478 → 0 outliers.
      Seq((1L, 0L, 1L, "ev", 1.0), (2L, h, 1L, "ev", 2.0),
        (3L, 2 * h, 1L, "ev", 3.0), (4L, 3 * h, 1L, "ev", 4.0),
        // type "od" (odd n=5, one wild value): 1,2,3,4,100 → med 3,
        // |dev| [2,1,0,1,97] → mad 1, threshold 4.4478 → 1 outlier.
        (5L, 0L, 2L, "od", 1.0), (6L, h, 2L, "od", 2.0),
        (7L, 2 * h, 2L, "od", 3.0), (8L, 3 * h, 2L, "od", 4.0),
        (9L, 4 * h, 2L, "od", 100.0)))
    val got = q("q113_mad_outliers").build(spark, dir)
      .select("event_type", "n", "med", "mad", "outlier_cnt")
      .as[(String, Long, Double, Double, Long)].collect().toSeq
    got should contain theSameElementsAs Seq(
      ("ev", 4L, 2.5, 1.0, 0L), ("od", 5L, 3.0, 1.0, 1L))
  }

  test("q113: sort-based interpolated median matches Spark's exact percentile on fuzz") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 257L).map { i =>
      (i, i * 1000000L, i % 3, s"t${i % 3}", rnd.nextDouble() * 100 - 50)
    }.map { case (id, ts, u, t, v) => (id, ts, u, t, v) }
    val dir = stageEvents(rows)
    val got = q("q113_mad_outliers").build(spark, dir)
      .select("event_type", "med").as[(String, Double)].collect().toMap
    val want = graft.Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.expr("percentile(value, 0.5D)"), 6)
        .as("med"))
      .as[(String, Double)].collect().toMap
    got.keySet shouldBe want.keySet
    got.foreach { case (k, v) => v shouldBe want(k) +- 1e-6 }
  }

  test("q110: trailing-hour RANGE frame — inclusive bound and equal-ts peers") {
    val m = 60000000L // one minute in µs
    val dir = stageEvents(Seq(
      (1L, 0L, 1L, "view", 1.0),
      (2L, 30 * m, 1L, "view", 2.0),   // frame [−30m, 30m] → {1,2}
      (3L, 60 * m, 1L, "view", 4.0),   // exactly 1h later: event 1 still in-frame (inclusive)
      (4L, 61 * m, 1L, "view", 8.0),   // event 1 now out of frame → {2,3,4}
      // equal-ts peers: RANGE includes both regardless of tie order
      (5L, 200 * m, 1L, "view", 16.0),
      (6L, 200 * m, 1L, "view", 32.0),
      // other user: frames don't cross the partition
      (7L, 0L, 2L, "view", 64.0)))
    val got = q("q110_rolling_window").build(spark, dir)
      .select("event_id", "cnt_1h", "sum_1h")
      .as[(Long, Long, Double)].collect()
      .map { case (id, c, s) => id -> ((c, s)) }.toMap
    got(1L) shouldBe ((1L, 1.0))
    got(2L) shouldBe ((2L, 3.0))
    got(3L) shouldBe ((3L, 7.0))
    got(4L) shouldBe ((3L, 14.0))
    got(5L) shouldBe ((2L, 48.0))
    got(6L) shouldBe ((2L, 48.0))
    got(7L) shouldBe ((1L, 64.0))
  }

  test("q115: LOCF carries the last observation, leading gaps stay null") {
    val m = 60000000L
    val dir = stageEvents(Seq(
      (1L, 0L, 1L, "error", 99.0),      // leading gap: nothing to carry → null
      (2L, 1 * m, 1L, "view", 10.0),
      (3L, 2 * m, 1L, "error", 99.0),   // filled with 10.0
      (4L, 3 * m, 1L, "error", 99.0),   // still 10.0 (carries across gaps)
      (5L, 4 * m, 1L, "click", 20.0),
      (6L, 5 * m, 1L, "error", 99.0),   // filled with 20.0
      (7L, 0L, 2L, "error", 99.0)))     // other user: no cross-partition carry
    val got = q("q115_locf_fill").build(spark, dir)
      .select("event_id", "filled", "was_gap")
      .as[(Long, Option[Double], Long)].collect()
      .map { case (id, f, g) => id -> ((f, g)) }.toMap
    got(1L) shouldBe ((None, 1L))
    got(2L) shouldBe ((Some(10.0), 0L))
    got(3L) shouldBe ((Some(10.0), 1L))
    got(4L) shouldBe ((Some(10.0), 1L))
    got(5L) shouldBe ((Some(20.0), 0L))
    got(6L) shouldBe ((Some(20.0), 1L))
    got(7L) shouldBe ((None, 1L))
  }

  test("q116: cumulative users counts each user once, at first-seen day") {
    val d = 86400000000L
    val dir = stageEvents(Seq(
      (1L, 0L, 1L, "view", 1.0),          // user 1 first seen day 0
      (2L, 1 * d, 1L, "view", 1.0),       // user 1 again day 1: NOT recounted
      (3L, 1 * d, 2L, "view", 1.0),       // user 2 first seen day 1
      (4L, 2 * d, 3L, "view", 1.0),       // user 3 first seen day 2
      (5L, 2 * d + 1L, 2L, "view", 1.0))) // user 2 again day 2: NOT recounted
    val got = q("q116_cumulative_users").build(spark, dir)
      .select("new_users", "cum_users").as[(Long, Long)].collect().toSeq
    got shouldBe Seq((1L, 1L), (1L, 2L), (1L, 3L))
  }

  test("q117: cohort retention — offsets from first-seen day, one cell per active day") {
    val d = 86400000000L
    val dir = stageEvents(Seq(
      (1L, 0L, 1L, "view", 1.0),          // u1 cohort day0
      (2L, 0L + 1L, 2L, "view", 1.0),     // u2 cohort day0
      (3L, 1 * d, 1L, "view", 1.0),       // u1 active day1 (offset 1)
      (4L, 1 * d + 1L, 1L, "view", 1.0),  // u1 again day1: ONE cell, not two
      (5L, 2 * d, 2L, "view", 1.0),       // u2 active day2 (offset 2)
      (6L, 2 * d, 3L, "view", 1.0)))      // u3 cohort day2
    val got = q("q117_cohort_retention").build(spark, dir)
      .select("offset_days", "active_users", "cohort_users", "retention")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // day0 cohort (2 users): offset0 both active, offset1 u1, offset2 u2.
    // day2 cohort (1 user): offset0.
    got shouldBe Seq(
      (0L, 2L, 2L, 1.0), (1L, 1L, 2L, 0.5), (2L, 1L, 2L, 0.5),
      (0L, 1L, 1L, 1.0))
  }

  test("q118: EWMA renormalizes over available history; span truncates at 8") {
    val m = 60000000L
    val dir = stageEvents(
      (1L to 10L).map(i => (i, i * m, 1L, "view", if (i == 1) 100.0 else 0.0)))
    val got = q("q118_ewma_smooth").build(spark, dir)
      .select("event_id", "ewma").as[(Long, Double)].collect().toMap
    got(1L) shouldBe 100.0 // single obs: exact mean of what exists
    // row 2: (0*1 + 100*0.5) / (1 + 0.5) = 33.333333
    got(2L) shouldBe 33.333333 +- 1e-9
    // row 8 still sees the spike at lag 7; rows 9,10 have it out of span.
    got(8L) should be > 0.0
    got(9L) shouldBe 0.0
    got(10L) shouldBe 0.0
  }

  test("q119: SCD2 versions collapse equal runs, close on change, flag current") {
    val m = 60000000L
    val dir = stageEvents(Seq(
      (1L, 0L, 1L, "view", 1.0),
      (2L, 1 * m, 1L, "view", 1.0),   // same state: merged into version 1
      (3L, 2 * m, 1L, "click", 1.0),  // change: closes v1 at 2m
      (4L, 3 * m, 1L, "view", 1.0),   // change back: A-B-A gives THREE versions
      (5L, 0L, 2L, "error", 1.0)))    // other user isolated
    val got = q("q119_scd2_dim").build(spark, dir)
      .select("user_id", "state", "eff_from", "eff_to", "is_current")
      .as[(Long, String, Timestamp, Option[Timestamp], Long)].collect().toSeq
    def ts(micros: Long) = new Timestamp(micros / 1000)
    got shouldBe Seq(
      (1L, "view", ts(0L), Some(ts(2 * m)), 0L),
      (1L, "click", ts(2 * m), Some(ts(3 * m)), 0L),
      (1L, "view", ts(3 * m), None, 1L),
      (2L, "error", ts(0L), None, 1L))
  }

  test("q124: hand-computed quartiles and Tukey fences, one wild value") {
    val m = 60000000L
    // 1..10 plus 100: q1 = 3.5 (pos 2.5), q3 = 8.5 (pos 7.5), IQR 5,
    // fences [-4, 16] — only the 100 is outside.
    val dir = stageEvents(
      ((1 to 10).map(i => (i.toLong, i * m, 1L, "t", i.toDouble)) :+
        ((11L, 11 * m, 1L, "t", 100.0))))
    val got = q("q124_iqr_fences").build(spark, dir)
      .select("event_type", "n", "q1", "q3", "fence_outliers")
      .as[(String, Long, Double, Double, Long)].collect().toSeq
    got shouldBe Seq(("t", 11L, 3.5, 8.5, 1L))
  }

  test("q122: ordered funnel requires each step strictly AFTER the prior step") {
    val m = 60000000L
    val dir = stageEvents(Seq(
      // user 1: full ordered path.
      (1L, 0L, 1L, "view", 0.0), (2L, 1 * m, 1L, "click", 0.0),
      (3L, 2 * m, 1L, "signup", 0.0), (4L, 3 * m, 1L, "purchase", 0.0),
      // user 2: click BEFORE view — the later signup must NOT count
      // (no click-after-view exists; the chain is broken at step 2).
      (5L, 0L, 2L, "click", 0.0), (6L, 1 * m, 2L, "view", 0.0),
      (7L, 2 * m, 2L, "signup", 0.0),
      // user 3: skips signup — purchase must NOT count.
      (8L, 0L, 3L, "view", 0.0), (9L, 1 * m, 3L, "click", 0.0),
      (10L, 2 * m, 3L, "purchase", 0.0)))
    val got = q("q122_ordered_funnel").build(spark, dir)
      .select("step", "users", "frac_of_entry", "step_conversion")
      .as[(String, Long, Double, Double)].collect().toSeq
    got shouldBe Seq(
      ("view", 3L, 1.0, 1.0),
      ("click", 2L, 0.666667, 0.666667),
      ("signup", 1L, 0.333333, 0.5),
      ("purchase", 1L, 0.333333, 1.0))
  }

  test("q123: transition matrix row-normalizes over each source state") {
    val m = 60000000L
    val dir = stageEvents(Seq(
      (1L, 0L, 1L, "view", 0.0), (2L, 1 * m, 1L, "click", 0.0),
      (3L, 2 * m, 1L, "signup", 0.0),
      (4L, 0L, 2L, "view", 0.0), (5L, 1 * m, 2L, "click", 0.0),
      (6L, 0L, 3L, "view", 0.0), (7L, 1 * m, 3L, "signup", 0.0)))
    val got = q("q123_transition_matrix").build(spark, dir)
      .select("src", "dst", "cnt", "prob")
      .as[(String, String, Long, Double)].collect().toSeq
    got shouldBe Seq(
      ("click", "signup", 1L, 1.0), // click is src of exactly one pair
      ("view", "click", 2L, 0.666667),
      ("view", "signup", 1L, 0.333333))
  }

  test("q112: NTILE equal-height buckets — first buckets take the remainder") {
    val dir = Files.createTempDirectory("robuststats").toString
    (1L to 25L).map(i => (i, "x" * i.toInt, "en", "s0", i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = q("q112_ntile_deciles").build(spark, dir)
      .select("decile", "cnt", "min_chars", "max_chars")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // 25 rows into 10 buckets: first 5 buckets get 3, the rest 2.
    got.map(_._2) shouldBe Seq(3L, 3L, 3L, 3L, 3L, 2L, 2L, 2L, 2L, 2L)
    // Bands tile the sorted domain contiguously.
    got.sliding(2).foreach { case Seq(a, b) =>
      b._3 shouldBe (a._4 + 1)
    }
    got.head._3 shouldBe 1L
    got.last._4 shouldBe 25L
  }
}
