package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val rows = Seq(
    (1L, 101L, ts("2026-01-01 00:05:00"), 1.0),
    (1L, 102L, ts("2026-01-01 00:20:00"), 2.0),
    (1L, 103L, ts("2026-01-01 01:10:00"), 3.0), // >30min gap → new session
    (2L, 201L, ts("2026-01-01 00:45:00"), 4.0),
    (2L, 202L, ts("2026-01-01 02:30:00"), 5.0)) // watermark pusher

  private def runToCompletion(name: String)(
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      mode: OutputMode): org.apache.spark.sql.DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp, Double)]
    val events = build(mem.toDF()
      .toDF("user_id", "event_id", "ts", "value"))
    val q = events.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    mem.addData(rows)
    q.processAllAvailable()
    // A far-future batch advances the watermark so windowed state closes.
    mem.addData(Seq((9L, 999L, ts("2026-01-02 00:00:00"), 0.0)))
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("streaming tumbling window matches the batch twin (q37 semantics)") {
    val got = runToCompletion("tumbling")(
      EventStreams.tumblingCounts(_), OutputMode.Append())
      .filter($"window_start" < ts("2026-01-02 00:00:00"))
      .orderBy("window_start")
      .as[(Timestamp, Long, Double)].collect()
    got shouldBe Array(
      (ts("2026-01-01 00:00:00"), 3L, 7.0),
      (ts("2026-01-01 01:00:00"), 1L, 3.0),
      (ts("2026-01-01 02:00:00"), 1L, 5.0))
  }

  test("streaming sliding window emits two windows per event") {
    val got = runToCompletion("sliding")(
      EventStreams.slidingCounts(_), OutputMode.Append())
      .filter($"window_start" < ts("2026-01-02 00:00:00"))
      .orderBy("window_start").as[(Timestamp, Long, Double)].collect()
    got.map(_._2).sum shouldBe 10L // 5 events × 2 windows each
    // [23:30, 00:30) holds the 00:05 and 00:20 events
    got.head shouldBe ((ts("2025-12-31 23:30:00"), 2L, 3.0))
  }

  test("built-in session windows split on the gap") {
    val got = runToCompletion("sessions")(
      EventStreams.sessionCounts(_), OutputMode.Append())
      .filter($"user_id" < 9L)
      .orderBy("user_id", "session_start")
      .as[(Long, Timestamp, Long)].collect()
    got shouldBe Array(
      (1L, ts("2026-01-01 00:05:00"), 2L),
      (1L, ts("2026-01-01 01:10:00"), 1L),
      (2L, ts("2026-01-01 00:45:00"), 1L),
      (2L, ts("2026-01-01 02:30:00"), 1L))
  }

  test("flatMapGroupsWithState sessionization emits closed sessions with counts") {
    implicit val sqlCtx = spark.sqlContext
    implicit val ss = spark
    val mem = MemoryStream[(Long, Long, Timestamp)]
    val sessions = EventStreams.sessionize(
      mem.toDF().toDF("user_id", "event_id", "ts")
        .as[EventStreams.Event])
    val q = sessions.writeStream.format("memory").queryName("fmgws")
      .outputMode(OutputMode.Append()).start()
    mem.addData(rows.map(r => (r._1, r._2, r._3)))
    q.processAllAvailable()
    mem.addData(Seq((9L, 999L, ts("2026-01-02 00:00:00"))))
    q.processAllAvailable()
    // one more batch so timed-out state from the previous watermark flushes
    mem.addData(Seq((9L, 998L, ts("2026-01-02 00:00:01"))))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("fmgws").filter($"user_id" < 9L)
      .orderBy("user_id", "session_start")
      .as[(Long, Timestamp, Long)].collect()
    got shouldBe Array(
      (1L, ts("2026-01-01 00:05:00"), 2L),
      (1L, ts("2026-01-01 01:10:00"), 1L),
      (2L, ts("2026-01-01 00:45:00"), 1L),
      (2L, ts("2026-01-01 02:30:00"), 1L))
  }
}
