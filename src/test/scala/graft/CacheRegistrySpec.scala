package graft

import org.apache.spark.sql.functions._

class CacheRegistrySpec extends SparkSpec {
  import spark.implicits._

  test("persistTracked caches the frame; drain unpersists every tracked frame") {
    CacheRegistry.drain() // start clean regardless of spec order
    spark.catalog.clearCache()
    val before = CacheRegistry.trackedCount
    before shouldBe 0

    val a = CacheRegistry.persistTracked(
      (1 to 100).toDF("x").groupBy(($"x" % 7).as("k")).count())
    val b = CacheRegistry.persistTracked(
      (1 to 50).toDF("y").select(($"y" * 2).as("z")))
    CacheRegistry.trackedCount shouldBe 2

    a.count(); b.count() // materialize both caches
    a.storageLevel.useMemory shouldBe true
    spark.sharedState.cacheManager.isEmpty shouldBe false

    CacheRegistry.drain(blocking = true)
    CacheRegistry.trackedCount shouldBe 0
    spark.sharedState.cacheManager.isEmpty shouldBe true
  }

  test("a graft query's internal persists are reclaimable by an embedded caller") {
    CacheRegistry.drain()
    spark.catalog.clearCache()
    // q88 persists its counted-bigram frame internally (the documented
    // embedded-caller contract: materialize, then drain).
    val out = SparkEntry.queries("q88_bigram_perplexity")(
      spark, "/root/testdata/sf0.001")
    out.write.format("noop").mode("overwrite").save()
    CacheRegistry.trackedCount should be >= 1
    CacheRegistry.drain(blocking = true)
    CacheRegistry.trackedCount shouldBe 0
    spark.sharedState.cacheManager.isEmpty shouldBe true
  }

  test("persistTracked honors an explicit DISK_ONLY level (output-sized frames)") {
    CacheRegistry.drain()
    spark.catalog.clearCache()
    val p = CacheRegistry.persistTracked(
      (1 to 100).toDF("x"),
      org.apache.spark.storage.StorageLevel.DISK_ONLY)
    p.count()
    p.storageLevel.useDisk shouldBe true
    p.storageLevel.useMemory shouldBe false
    CacheRegistry.drain(blocking = true)
    CacheRegistry.trackedCount shouldBe 0
  }

  test("q30/q87 cache their output-sized pair frames DISK_ONLY, hot frames in memory") {
    for (q <- Seq("q30_jaccard_pairs", "q87_incremental_dedup")) {
      CacheRegistry.drain(blocking = true)
      spark.catalog.clearCache()
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      val levels = CacheRegistry.trackedLevels
      // Exactly one disk-only frame (the pair frame under the contract
      // sort — the sf10x OOM lesson, PERF log #23); any other internal
      // persist is a re-read compute frame and stays memory-first.
      withClue(s"$q tracked levels $levels: ") {
        levels.count(l => l.useDisk && !l.useMemory) shouldBe 1
        levels.filter(_.useMemory).foreach(_.useDisk shouldBe true)
      }
    }
    CacheRegistry.drain(blocking = true)
  }

  test("drain is safe to call twice and with nothing tracked") {
    CacheRegistry.drain()
    noException should be thrownBy CacheRegistry.drain()
  }
}
