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
      (1 to 100).toDF("x").groupBy(($"x" % 7).as("k")).count(),
      CacheRegistry.DataSized)
    val b = CacheRegistry.persistTracked(
      (1 to 50).toDF("y").select(($"y" * 2).as("z")),
      CacheRegistry.DataSized)
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
    // q142 persists its train-bigram frame internally (q88's persist
    // moved into the shared disk-backed bigram table); manual drain
    // remains available for multi-query composition.
    val out = SparkEntry.allDefs.find(_.name == "q142_kneser_ney").get
      .build(spark, "/root/testdata/sf0.001")
    out.write.format("noop").mode("overwrite").save()
    CacheRegistry.trackedCount should be >= 1
    CacheRegistry.drain(blocking = true)
    CacheRegistry.trackedCount shouldBe 0
    spark.sharedState.cacheManager.isEmpty shouldBe true
  }

  test("auto-drain: an embedded caller using SparkEntry.queries needs NO manual drain") {
    // Round-7 verdict #2: materialize a query through the public map
    // and the internal frames must reclaim themselves — no drain()
    // call anywhere. The listener is async, so poll briefly.
    for (q <- Seq("q30_jaccard_pairs", "q142_kneser_ney")) {
      CacheRegistry.drain(blocking = true)
      spark.catalog.clearCache()
      val out = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      CacheRegistry.trackedCount should be >= 1 // built, armed, not yet run
      out.write.format("noop").mode("overwrite").save()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (CacheRegistry.trackedCount > 0 && System.nanoTime() < deadline)
        Thread.sleep(50)
      withClue(s"$q residual tracked frames: ") {
        CacheRegistry.trackedCount shouldBe 0
      }
    }
  }

  test("auto-drain is scoped: materializing query A leaves query B's frames cached") {
    // The round-7 advice scenario: two graft queries interleaved on
    // one session. Draining must touch only the frames the completed
    // query's plan references.
    CacheRegistry.drain(blocking = true)
    spark.catalog.clearCache()
    // q142 persists its train-bigram frame (q88 stopped persisting
    // when the bigram counts moved to the shared disk-backed table).
    val qa = SparkEntry.queries("q142_kneser_ney")(
      spark, "/root/testdata/sf0.001")
    val framesA = CacheRegistry.trackedCount
    framesA should be >= 1
    val qb = SparkEntry.queries("q25_skill_bridge")(
      spark, "/root/testdata/sf0.001")
    val framesAB = CacheRegistry.trackedCount
    framesAB should be > framesA
    qa.write.format("noop").mode("overwrite").save()
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (CacheRegistry.trackedCount > framesAB - framesA &&
      System.nanoTime() < deadline) Thread.sleep(50)
    // A's frames gone, B's intact and still cached.
    CacheRegistry.trackedCount shouldBe (framesAB - framesA)
    qb.write.format("noop").mode("overwrite").save()
    while (CacheRegistry.trackedCount > 0 && System.nanoTime() < deadline)
      Thread.sleep(50)
    CacheRegistry.trackedCount shouldBe 0
    CacheRegistry.drain(blocking = true)
    spark.catalog.clearCache()
  }

  test("persistTracked honors an explicit DISK_ONLY level (output-sized frames)") {
    CacheRegistry.drain()
    spark.catalog.clearCache()
    val p = CacheRegistry.persistTracked(
      (1 to 100).toDF("x"),
      CacheRegistry.OutputSized,
      org.apache.spark.storage.StorageLevel.DISK_ONLY)
    p.count()
    p.storageLevel.useDisk shouldBe true
    p.storageLevel.useMemory shouldBe false
    CacheRegistry.drain(blocking = true)
    CacheRegistry.trackedCount shouldBe 0
  }

  test("lint: an output-sized frame with a memory-first level is rejected outright") {
    // Round-7 verdict #6 — the sf10x OOM class (memory-first unroll of
    // an output-bounded frame) is a structural error, not a review
    // finding: the wrong level fails at the call site.
    val df = (1 to 10).toDF("x")
    an[IllegalArgumentException] should be thrownBy {
      CacheRegistry.persistTracked(df, CacheRegistry.OutputSized)
    }
    an[IllegalArgumentException] should be thrownBy {
      CacheRegistry.persistTracked(df, CacheRegistry.OutputSized,
        org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    }
    CacheRegistry.trackedCount shouldBe 0 // nothing registered on failure
  }

  test("suite-wide: every output-sized tracked frame is DISK_ONLY; q30 caches no expanded pair frame") {
    // q87 persists its output-sized pair frame (DISK_ONLY, enforced).
    // q30 persists the groups frame (data-sized) plus the COLLAPSED
    // group-grain qualifying-pair frame (DISK_ONLY — k_a·k_b doc pairs
    // ride in k_a+k_b array slots, ~k̄× smaller than the expanded
    // output; it feeds the sort-bound weights AND the expansion, so
    // the verify join runs once). The EXPANDED doc-pair output is
    // never cached — it goes straight into the steered contract sort;
    // that's what the sf10x disk-exhaustion fix pinned down.
    for ((q, wantDiskOnly) <- Seq(
        ("q30_jaccard_pairs", 1), ("q87_incremental_dedup", 1))) {
      CacheRegistry.drain(blocking = true)
      spark.catalog.clearCache()
      SparkEntry.allDefs.find(_.name == q).get
        .build(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      val levels = CacheRegistry.trackedLevels
      val classes = CacheRegistry.trackedSizeClasses
      withClue(s"$q tracked levels $levels classes $classes: ") {
        levels.count(l => l.useDisk && !l.useMemory) shouldBe wantDiskOnly
        classes.zip(levels).foreach { case (c, l) =>
          if (c == CacheRegistry.OutputSized) {
            l.useDisk shouldBe true; l.useMemory shouldBe false
          }
        }
        classes.count(_ == CacheRegistry.OutputSized) shouldBe wantDiskOnly
      }
    }
    CacheRegistry.drain(blocking = true)
  }

  test("drain is safe to call twice and with nothing tracked") {
    CacheRegistry.drain()
    noException should be thrownBy CacheRegistry.drain()
  }

  test("suite-end guard: the Verify loop shape ends with zero tracked frames") {
    // Mimic Verify's per-query protocol over cache-using queries, then
    // assert the invariant Verify now enforces at suite end: after the
    // last drain + listener-bus quiesce, the registry is empty. A
    // future query whose persist path escapes both the auto-drain
    // listener and the per-query drain fails here (and in Verify).
    val sf = "/root/testdata/sf0.001"
    Seq("q24_fact_build", "q87_incremental_dedup", "q88_bigram_perplexity")
      .foreach { name =>
        val d = graft.SparkEntry.allDefs.find(_.name == name).get
        d.build(spark, sf).write.format("noop").mode("overwrite").save()
        CacheRegistry.drain()
        spark.catalog.clearCache()
      }
    org.apache.spark.sql.graft.CatalystBridge.waitListenerBusEmpty(spark)
    CacheRegistry.trackedCount shouldBe 0
  }
}
