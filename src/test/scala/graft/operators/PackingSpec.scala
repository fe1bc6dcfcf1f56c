package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def pack(rows: Seq[(Long, String, Long)], maxTokens: Long,
      shardSize: Long = 1000) = {
    implicit val s = spark
    Packing.packSequences(
        rows.toDF("doc_id", "source", "n_tokens"), maxTokens, shardSize)
      .as[Packing.PackedDoc].collect().sortBy(_.doc_id)
  }

  test("greedy fold: packs fill up to the budget, then roll over, in id order") {
    val got = pack(Seq(
      (1L, "a", 100L), (2L, "a", 200L), (3L, "a", 250L), // 100+200 fit, 250 rolls
      (4L, "a", 400L), (5L, "a", 90L)), maxTokens = 500)
    got.map(d => (d.doc_id, d.pack_id, d.pack_pos)) shouldBe Seq(
      (1L, 0L, 1L), (2L, 0L, 2L), (3L, 1L, 1L), (4L, 2L, 1L), (5L, 2L, 2L))
  }

  test("no pack exceeds the budget unless it is a single oversized doc") {
    val rows = (1L to 200L).map(i => (i, s"s${i % 3}", (i * 37) % 300 + 1))
    val got = pack(rows, maxTokens = 400)
    val packs = got.groupBy(d => (d.source, d.shard, d.pack_id))
    packs.foreach { case (_, ds) =>
      if (ds.length > 1) ds.map(_.n_tokens).sum should be <= 400L
    }
    // every doc lands in exactly one pack
    got.map(_.doc_id).toSeq shouldBe (1L to 200L)
  }

  test("an oversized doc gets its own pack and does not poison the accumulator") {
    val got = pack(Seq(
      (1L, "a", 100L), (2L, "a", 9000L), (3L, "a", 100L), (4L, "a", 100L)),
      maxTokens = 500)
    got.map(d => (d.doc_id, d.pack_id)) shouldBe Seq(
      (1L, 0L), (2L, 1L), (3L, 2L), (4L, 2L))
  }

  test("packs never span shards, and the result is partitioning-invariant") {
    val rows = (1L to 100L).map(i => (i, "a", 50L))
    val a = pack(rows, maxTokens = 1000, shardSize = 25)
    a.map(_.shard).distinct.sorted shouldBe Seq(0L, 1L, 2L, 3L, 4L)
    // doc 25 is in shard 1 even though shard 0's last pack had room
    a.find(_.doc_id == 24L).get.shard shouldBe 0L
    a.find(_.doc_id == 25L).get.shard shouldBe 1L
    a.find(_.doc_id == 25L).get.pack_pos shouldBe 1L
    implicit val s = spark
    val b = Packing.packSequences(
        rows.toDF("doc_id", "source", "n_tokens").repartition(13),
        maxTokens = 1000, shardSize = 25)
      .as[Packing.PackedDoc].collect().sortBy(_.doc_id)
    a.toSeq shouldBe b.toSeq
  }
}
