package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TrainingShardsSpec extends SparkSpec {

  import spark.implicits._
  implicit private lazy val s: org.apache.spark.sql.SparkSession = spark

  private def docs(n: Int) =
    (0 until n).map { i =>
      (i.toLong, s"src${i % 3}", (i % 7 + 1).toLong,
        s"doc $i body ${"tok " * (i % 7)}".trim)
    }.toDF("doc_id", "source", "n_tokens", "text")

  test("same seed => identical assignment and manifest; different seed permutes") {
    val d = docs(200)
    val a = TrainingShards.pack(d, "epoch-1", maxTokens = 16, nShards = 8)
      .select("doc_id", "shard", "pack_id", "pack_pos")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3))).toMap
    val b = TrainingShards.pack(d, "epoch-1", maxTokens = 16, nShards = 8)
      .select("doc_id", "shard", "pack_id", "pack_pos")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3))).toMap
    b shouldBe a
    val c = TrainingShards.pack(d, "epoch-2", maxTokens = 16, nShards = 8)
      .select("doc_id", "shard", "pack_id", "pack_pos")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3))).toMap
    c should not be a // a different epoch reshuffles
  }

  test("assignment is layout-independent") {
    val d = docs(150)
    def assign(parts: Int) =
      TrainingShards.pack(d.repartition(parts), "s", 16, 8)
        .select("doc_id", "shard", "pack_id", "pack_pos")
        .collect().map(r => r.getLong(0) ->
          (r.getInt(1), r.getLong(2), r.getLong(3))).toMap
    assign(1) shouldBe assign(7)
  }

  test("packs respect the token budget; oversized docs get their own pack") {
    val d = docs(100).withColumn("n_tokens",
      when(col("doc_id") === 42L, 99L).otherwise(col("n_tokens")))
    val packed = TrainingShards.pack(d, "s", maxTokens = 16, nShards = 4)
    val perPack = packed.groupBy("shard", "pack_id")
      .agg(sum("n_tokens").as("tot"), count(lit(1)).as("n"),
        max(col("doc_id") === 42L).as("hasBig"))
      .collect()
    perPack.foreach { r =>
      val tot = r.getLong(2)
      if (r.getBoolean(4)) { tot shouldBe 99L; r.getLong(3) shouldBe 1L }
      else tot should be <= 16L
    }
  }

  test("pack order within a shard follows the seeded hash order") {
    val d = docs(120)
    val rows = TrainingShards.pack(d, "s", 16, 4)
      .withColumn("h", graft.functions.stableHashSeeded(
        lit("s"), col("doc_id").cast("string")))
      .orderBy("shard", "pack_id", "pack_pos")
      .select("shard", "h").collect()
    rows.groupBy(_.getInt(0)).foreach { case (_, rs) =>
      val hs = rs.map(_.getLong(1)).toSeq
      hs shouldBe hs.sorted // pack traversal == permutation order
    }
    // and the shard itself is the arithmetic slice of the hash
    rows.foreach { r =>
      TrainingShards.shardOf(r.getLong(1), 4) shouldBe r.getInt(0)
    }
  }

  test("write -> read round trip preserves the doc multiset; manifest agrees") {
    val dir = Files.createTempDirectory("shards").toString
    val d = docs(200)
    val manifest = TrainingShards.writeShards(d, dir, "epoch-1",
      maxTokens = 16, nShards = 8)
    manifest.totalDocs shouldBe 200L
    manifest.nShards shouldBe 8
    manifest.shards.map(_.shard).toSet.size shouldBe manifest.shards.size
    val back = TrainingShards.readShards(dir)
    back.count() shouldBe 200L
    back.select("doc_id").as[Long].collect().sorted shouldBe
      (0L until 200L).toArray
    // manifest token totals match the data
    val tokTotal = back.agg(sum("n_tokens")).head().getLong(0)
    manifest.totalTokens shouldBe tokTotal
    // manifest file round-trips
    val parsed = TrainingShards.readManifest(dir)
    parsed shouldBe manifest
    // re-write with the same seed is byte-identical manifest
    val dir2 = Files.createTempDirectory("shards2").toString
    val manifest2 = TrainingShards.writeShards(d, dir2, "epoch-1",
      maxTokens = 16, nShards = 8)
    manifest2 shouldBe manifest
  }

  test("readShard prunes to one shard partition") {
    val dir = Files.createTempDirectory("shards3").toString
    TrainingShards.writeShards(docs(100), dir, "s", 16, 4)
    val one = TrainingShards.readShard(dir, 2)
    one.select("shard").distinct().as[Int].collect() shouldBe Array(2)
    // partition pruning: the scan's partition filters mention `shard`
    val scans = one.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.FileSourceScanExec => b
    }
    scans should not be empty
    scans.head.partitionFilters.mkString should include ("shard")
  }

  test("degenerate inputs fail loudly") {
    an[IllegalArgumentException] should be thrownBy
      TrainingShards.pack(docs(5), "s", maxTokens = 0, nShards = 4)
    an[IllegalArgumentException] should be thrownBy
      TrainingShards.pack(docs(5), "s", maxTokens = 16, nShards = 0)
  }
}
