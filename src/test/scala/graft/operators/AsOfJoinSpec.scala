package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("joinAsOf picks the latest right row at-or-before each left row per key") {
    val quotes = Seq(
      (1L, ts("2026-01-01 00:00:00"), 10.0),
      (1L, ts("2026-01-01 00:10:00"), 11.0),
      (2L, ts("2026-01-01 00:05:00"), 20.0))
      .toDF("key", "qts", "price")
    val ticks = Seq(
      (1L, 100L, ts("2026-01-01 00:05:00")), // after quote 10.0
      (1L, 101L, ts("2026-01-01 00:10:00")), // exactly at 11.0 → matches it
      (1L, 102L, ts("2026-01-01 00:20:00")), // after 11.0
      (2L, 200L, ts("2026-01-01 00:01:00")), // before any quote → null
      (3L, 300L, ts("2026-01-01 00:30:00"))) // key with no quotes → null
      .toDF("key", "tick_id", "tts")
    val got = AsOfJoin.joinAsOf(ticks, quotes, Seq("key"), "tts", "qts", Seq("price"))
      .orderBy("tick_id")
      .collect().map(r => (r.getLong(1), Option(r.get(3)).map(_.asInstanceOf[Double])))
    got shouldBe Array(
      (100L, Some(10.0)),
      (101L, Some(11.0)),
      (102L, Some(11.0)),
      (200L, None),
      (300L, None))
  }

  test("all carried columns come from the SAME right row, even when some are NULL") {
    // The most recent quote has price=NULL, size=5. Per-column
    // last(ignoreNulls) would desynchronize: price from the older row,
    // size from the newer one. The struct carry must return the newest
    // ROW atomically: (null, 5).
    val quotes = Seq(
      (1L, ts("2026-01-01 00:00:00"), Option(10.0), Option(1L)),
      (1L, ts("2026-01-01 00:10:00"), None: Option[Double], Option(5L)))
      .toDF("key", "qts", "price", "size")
    val ticks = Seq((1L, 100L, ts("2026-01-01 00:20:00")))
      .toDF("key", "tick_id", "tts")
    val got = AsOfJoin.joinAsOf(ticks, quotes, Seq("key"), "tts", "qts",
        Seq("price", "size"))
      .select("tick_id", "price", "size")
      .as[(Long, Option[Double], Option[Long])].collect()
    got shouldBe Array((100L, None, Some(5L)))
  }

  test("joinAsOf plans a single shuffle, no theta join") {
    val quotes = (1 to 100).map(i => (i.toLong % 5, ts(f"2026-01-01 00:${i % 60}%02d:00"), i.toDouble))
      .toDF("key", "qts", "price")
    val ticks = (1 to 100).map(i => (i.toLong % 5, i.toLong, ts(f"2026-01-01 00:${i % 60}%02d:30")))
      .toDF("key", "tick_id", "tts")
    val plan = AsOfJoin.joinAsOf(ticks, quotes, Seq("key"), "tts", "qts", Seq("price"))
      .queryExecution.executedPlan.toString
    plan should not include "Join" // union + window, not a join at all
  }
}
