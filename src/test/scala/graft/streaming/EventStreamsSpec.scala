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

  test("file-source stream over events.parquet matches the batch tumbling result") {
    // Stage the real testdata table into a stream-source dir.
    val dir = java.nio.file.Files.createTempDirectory("evstream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val stream = EventStreams.tumblingCounts(
      EventStreams.readEventStream(spark, dir), watermark = "0 seconds")
    val q = stream.writeStream.format("memory").queryName("filestream")
      .outputMode(OutputMode.Complete()) // finite source; complete mode
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("filestream")
      .orderBy("window_start").as[(Timestamp, Long, Double)].collect()
    val batch = graft.SparkEntry.allDefs.find(_.name == "q37_tumbling_window").get
      .build(spark, "/root/testdata/sf0.001")
      .as[(Timestamp, Long, Double)].collect()
    streamed shouldBe batch
  }

  test("late data beyond the watermark is dropped, not re-aggregated") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp, Double)]
    val q = EventStreams.tumblingCounts(
        mem.toDF().toDF("user_id", "event_id", "ts", "value"),
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("latedrop")
      .outputMode(OutputMode.Append()).start()
    mem.addData(Seq((1L, 1L, ts("2026-01-01 00:10:00"), 1.0)))
    q.processAllAvailable()
    // Advance event time far past the first window + watermark so the
    // [00:00, 01:00) window finalizes and emits.
    mem.addData(Seq((1L, 2L, ts("2026-01-01 05:00:00"), 2.0)))
    q.processAllAvailable()
    // This event is hours behind the watermark — state for its window
    // is gone; it must NOT emit a second [00:00, 01:00) row.
    mem.addData(Seq((1L, 3L, ts("2026-01-01 00:20:00"), 99.0)))
    mem.addData(Seq((1L, 4L, ts("2026-01-01 06:00:00"), 3.0)))
    q.processAllAvailable()
    q.stop()
    val firstWindow = spark.table("latedrop")
      .filter($"window_start" === ts("2026-01-01 00:00:00"))
      .as[(Timestamp, Long, Double)].collect()
    firstWindow shouldBe Array((ts("2026-01-01 00:00:00"), 1L, 1.0))
  }

  test("streaming dedup drops in-watermark duplicate event_ids") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp, Double)]
    val q = EventStreams.dedupEvents(
        mem.toDF().toDF("user_id", "event_id", "ts", "value"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    mem.addData(Seq(
      (1L, 101L, ts("2026-01-01 00:05:00"), 1.0),
      (1L, 101L, ts("2026-01-01 00:05:00"), 1.0), // same-batch dup
      (2L, 102L, ts("2026-01-01 00:06:00"), 2.0)))
    q.processAllAvailable()
    mem.addData(Seq((9L, 101L, ts("2026-01-01 00:07:00"), 9.0))) // cross-batch dup
    q.processAllAvailable()
    q.stop()
    spark.table("dedup").select($"event_id").as[Long].collect().sorted shouldBe
      Array(101L, 102L)
  }

  test("stream-static enrichment broadcast-joins a dimension per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("view", "browse"), ("click", "engage")).toDF("event_type", "category")
    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.enriched(
        mem.toDF().toDF("event_id", "event_type"), dim)
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    mem.addData(Seq((1L, "view"), (2L, "click"), (3L, "signup")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("enriched")
      .select("event_id", "category").as[(Long, Option[String])]
      .collect().sortBy(_._1)
    got shouldBe Array((1L, Some("browse")), (2L, Some("engage")), (3L, None))
  }

  test("stream-stream interval join pairs clicks with in-window views only") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Long, Timestamp)]
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val joined = EventStreams.viewToClick(
      views.toDF().toDF("user_id", "event_id", "ts"),
      clicks.toDF().toDF("user_id", "event_id", "ts"))
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode(OutputMode.Append()).start()
    views.addData(Seq(
      (1L, 10L, ts("2026-01-01 00:00:00")),
      (1L, 11L, ts("2026-01-01 01:00:00")),
      (2L, 20L, ts("2026-01-01 00:00:00"))))
    clicks.addData(Seq(
      (1L, 100L, ts("2026-01-01 00:10:00")), // within 30min of view 10
      (1L, 101L, ts("2026-01-01 01:05:00")), // within 30min of view 11 only
      (2L, 200L, ts("2026-01-01 02:00:00")))) // no view within window
    q.processAllAvailable()
    views.addData(Seq((9L, 90L, ts("2026-01-02 00:00:00"))))
    clicks.addData(Seq((9L, 900L, ts("2026-01-02 00:00:00"))))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssjoin").filter($"user_id" < 9)
      .select("click_id", "view_id").as[(Long, Long)].collect().sorted
    got shouldBe Array((100L, 10L), (101L, 11L))
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

  test("streaming SCD2 emits exactly the batch twin's CLOSED versions across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    implicit val ss = spark
    val mem = MemoryStream[(Long, Long, Timestamp, String)]
    val versions = EventStreams.scd2Versions(
      mem.toDF().toDF("user_id", "event_id", "ts", "event_type")
        .as[EventStreams.TypedEvent])
    val q = versions.writeStream.format("memory").queryName("scd2s")
      .outputMode(OutputMode.Append()).start()
    // Micro-batch 1: user 1 view→view (extends)→click; user 2 error.
    // Batch 2 (out of order WITHIN the batch, repaired by the group
    // sort): user 1 back to view — the A-B-A third version opens;
    // user 2's state persists ACROSS batches (no close emitted).
    mem.addData(Seq(
      (1L, 1L, ts("2026-01-01 00:00:00"), "view"),
      (1L, 2L, ts("2026-01-01 00:01:00"), "view"),
      (1L, 3L, ts("2026-01-01 00:02:00"), "click"),
      (2L, 4L, ts("2026-01-01 00:00:00"), "error")))
    q.processAllAvailable()
    mem.addData(Seq(
      (1L, 6L, ts("2026-01-01 00:04:00"), "view"),
      (1L, 5L, ts("2026-01-01 00:03:00"), "click"),
      (2L, 7L, ts("2026-01-01 00:05:00"), "error")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("scd2s")
      .orderBy("user_id", "eff_from")
      .as[(Long, String, Timestamp, Timestamp)].collect()
    // Only CLOSED versions appear: user 1's view [00:00,00:02) and
    // click [00:02,00:04); the reopened view and user 2's error are
    // still current (in state, not output).
    got shouldBe Array(
      (1L, "view", ts("2026-01-01 00:00:00"), ts("2026-01-01 00:02:00")),
      (1L, "click", ts("2026-01-01 00:02:00"), ts("2026-01-01 00:04:00")))
  }

  test("streaming SCD2 orders by MICROSECONDS and emits full-precision eff_from") {
    // The testdata events carry sub-millisecond micros; getTime()
    // truncates to millis, which would mis-order same-millisecond
    // events (falling back to event_id) and zero eff_from's micros.
    implicit val sqlCtx = spark.sqlContext
    implicit val ss = spark
    def tsMicros(base: String, micros: Int): Timestamp = {
      val t = Timestamp.valueOf(base)
      t.setNanos(micros * 1000)
      t
    }
    // Same millisecond, micros order OPPOSITE to event_id order.
    val early = tsMicros("2026-01-01 00:00:00", 100) // id 9, 'view'
    val late = tsMicros("2026-01-01 00:00:00", 900)  // id 2, 'click'
    val close = tsMicros("2026-01-01 00:00:01", 500) // id 3, 'view'
    val mem = MemoryStream[(Long, Long, Timestamp, String)]
    val versions = EventStreams.scd2Versions(
      mem.toDF().toDF("user_id", "event_id", "ts", "event_type")
        .as[EventStreams.TypedEvent])
    val q = versions.writeStream.format("memory").queryName("scd2us")
      .outputMode(OutputMode.Append()).start()
    mem.addData(Seq((1L, 9L, early, "view"), (1L, 2L, late, "click"),
      (1L, 3L, close, "view")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("scd2us")
      .orderBy("eff_from")
      .as[(Long, String, Timestamp, Timestamp)].collect()
    // Micros-ordered: view@.000100 → click@.000900 → view@1.000500;
    // eff_from/eff_to keep the exact microsecond values.
    got shouldBe Array(
      (1L, "view", early, late),
      (1L, "click", late, close))
  }
}
