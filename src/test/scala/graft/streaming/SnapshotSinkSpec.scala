package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.sources.SnapshotStore

class SnapshotSinkSpec extends SparkSpec {

  import spark.implicits._
  implicit private lazy val s: org.apache.spark.sql.SparkSession = spark
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("each micro-batch lands as one tagged version; replay is a no-op") {
    val root = tmp("snapsink")
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val b1 = Seq((3L, "c")).toDF("id", "v")
    SnapshotSink.processBatch(b0, root, batchId = 0).get.version shouldBe 1L
    SnapshotSink.processBatch(b1, root, batchId = 1).get.version shouldBe 2L
    SnapshotStore.read(root).count() shouldBe 3L
    // crash-replay of batch 1: same id, same (or partial) data — no-op
    val replayed = SnapshotSink.processBatch(b1, root, batchId = 1)
    replayed.get.version shouldBe 2L
    SnapshotStore.read(root).count() shouldBe 3L
    SnapshotStore.history(root).map(_.tag.get) shouldBe
      Seq("batch-0", "batch-1")
    // replayed commit abandoned its data dir, vacuum reaps it
    SnapshotStore.vacuum(root)
    SnapshotStore.read(root).count() shouldBe 3L
  }

  test("empty batches publish no version") {
    val root = tmp("snapsink-empty")
    SnapshotSink.processBatch(Seq.empty[(Long, String)].toDF("id", "v"),
      root, 0) shouldBe None
    SnapshotStore.history(root) shouldBe empty
  }

  test("end-to-end: MemoryStream micro-batches stream into the snapshot table") {
    val root = tmp("snapsink-e2e")
    val mem = MemoryStream[(Long, String)]
    val q = SnapshotSink.writer(mem.toDF().toDF("id", "v"), root)
      .option("checkpointLocation", tmp("snapsink-ckpt"))
      .start()
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    val out = SnapshotStore.read(root)
      .select("id").as[Long].collect().sorted
    out shouldBe Array(1L, 2L, 3L)
    val hist = SnapshotStore.history(root)
    hist.size shouldBe 2
    hist.flatMap(_.tag) shouldBe Seq("batch-0", "batch-1")
    // time travel to the first micro-batch
    SnapshotStore.readVersion(root, 1).count() shouldBe 2L
  }
}
