package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Streaming corpus gates vs their batch twins: the same docs through
  * `cleanDocStream` as a MemoryStream (two micro-batches) and as a
  * batch frame must agree on which CONTENT survives. */
class DocumentStreamsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // Eval set: two "benchmark" docs; their 5-gram shingles feed the filter.
  private val evalDocs = Seq(
    "alpha beta gamma delta epsilon zeta eta",
    "one two three four five six seven eight")

  private lazy val bloomBytes: Array[Byte] = {
    val sh = evalDocs.toDF("text")
      .select(explode(org.apache.spark.sql.graft.CatalystBridge.column(
        graft.plans.ShingleTokens(
          org.apache.spark.sql.graft.CatalystBridge.expr(trim(col("text"))),
          5))).as("tok"))
      .distinct()
    graft.plans.BloomProbe.serialize(sh.stat.bloomFilter("tok", 1000, 0.01))
  }

  // (doc_id, text, ingest_ts): one clean doc, one contaminated (carries
  // an eval 5-gram verbatim), one too short, one exact dup of the clean
  // doc (cross-batch), one distinct clean doc in batch 2.
  private val batch1 = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today", ts("2026-01-01 00:01:00")),
    (2L, "prefix alpha beta gamma delta epsilon suffix words here", ts("2026-01-01 00:02:00")),
    (3L, "too short", ts("2026-01-01 00:03:00")))
  private val batch2 = Seq(
    (4L, "the quick brown fox jumps over the lazy dog today", ts("2026-01-01 00:04:00")),
    (5L, "an entirely different clean document with plenty of tokens", ts("2026-01-01 00:05:00")))

  test("streaming gates match the batch twin on surviving content") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = DocumentStreams.cleanDocStream(
        mem.toDF().toDF("doc_id", "text", "ingest_ts"), bloomBytes)
      .writeStream.format("memory").queryName("cleandocs")
      .outputMode(OutputMode.Append()).start()
    mem.addData(batch1)
    q.processAllAvailable()
    mem.addData(batch2)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("cleandocs")
      .select($"content_hash").as[String].collect().sorted

    val batch = DocumentStreams.cleanDocStream(
        (batch1 ++ batch2).toDF("doc_id", "text", "ingest_ts"), bloomBytes)
      .select($"content_hash").as[String].collect().sorted

    streamed shouldBe batch
    // Exactly the two distinct clean texts survive.
    streamed.length shouldBe 2
  }

  test("contamination probe has no false negatives at the doc level") {
    // Every eval doc itself must probe contaminated.
    val hits = evalDocs.toDF("text")
      .filter(DocumentStreams.contaminated(col("text"), bloomBytes))
      .count()
    hits shouldBe evalDocs.size
  }

  test("the dup that arrives inside the watermark is dropped, the first kept") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = DocumentStreams.cleanDocStream(
        mem.toDF().toDF("doc_id", "text", "ingest_ts"), bloomBytes)
      .writeStream.format("memory").queryName("dedupdocs")
      .outputMode(OutputMode.Append()).start()
    mem.addData(batch1)
    q.processAllAvailable()
    mem.addData(batch2)
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedupdocs").select($"doc_id").as[Long].collect().sorted
    ids shouldBe Array(1L, 5L) // doc 4 deduped against doc 1; 2 and 3 gated
  }

  test("manufactured Bloom FALSE POSITIVE: conservative gate drops the clean doc, exact side channel passes it") {
    implicit val sqlCtx = spark.sqlContext
    // Eval shingle set (exact) and a bloom that ALSO contains one
    // shingle of clean doc 1 — a manufactured false positive: the
    // probe says contaminated, the exact join says clean.
    val benchShingles = evalDocs.toDF("text")
      .select(explode(org.apache.spark.sql.graft.CatalystBridge.column(
        graft.plans.ShingleTokens(
          org.apache.spark.sql.graft.CatalystBridge.expr(trim(col("text"))),
          5))).as("tok"))
      .distinct()
    val fpBloomBytes = {
      val f = benchShingles.stat.bloomFilter("tok", 1000, 0.01)
      f.putBinary("the quick brown fox jumps".getBytes("UTF-8"))
      graft.plans.BloomProbe.serialize(f)
    }
    // Sanity: doc 1 now probes positive under the conservative gate...
    batch1.take(1).toDF("doc_id", "text", "ingest_ts")
      .filter(DocumentStreams.contaminated(col("text"), fpBloomBytes))
      .count() shouldBe 1L
    // ...and the conservative stream-shape gate drops it.
    DocumentStreams.cleanDocStream(
        (batch1 ++ batch2).toDF("doc_id", "text", "ingest_ts"), fpBloomBytes)
      .filter($"doc_id" === 1L).count() shouldBe 0L

    // Exact side channel: stream the same two micro-batches through
    // foreachBatch.
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = DocumentStreams.cleanDocStreamExact(
        mem.toDF().toDF("doc_id", "text", "ingest_ts"),
        fpBloomBytes, benchShingles,
        (batch, _) => batch.select($"doc_id", $"content_hash")
          .as[(Long, String)].collect().foreach(got.add))
      .outputMode(OutputMode.Append()).start()
    mem.addData(batch1)
    q.processAllAvailable()
    mem.addData(batch2)
    q.processAllAvailable()
    q.stop()

    import scala.jdk.CollectionConverters._
    val streamed = got.asScala.toSeq.sortBy(_._1)
    // Doc 1 (the false positive) SURVIVES; doc 2 (truly contaminated:
    // carries the eval shingle "alpha beta gamma delta epsilon"
    // verbatim) still drops; doc 3 quality-gated; doc 4 deduped
    // against doc 1; doc 5 clean.
    streamed.map(_._1) shouldBe Seq(1L, 5L)

    // And the stream's output equals the exact BATCH pipeline on the
    // same corpus (q74 semantics: probe prefilter + exact verify).
    val batchExact = DocumentStreams.decontaminateExact(
        (batch1 ++ batch2).toDF("doc_id", "text", "ingest_ts")
          .filter(DocumentStreams.qualityGate(col("text"), 5, 1 << 20))
          .withColumn("content_hash", md5(trim(col("text"))))
          .dropDuplicates("content_hash"),
        fpBloomBytes, benchShingles)
      .select($"doc_id", $"content_hash").as[(Long, String)]
      .collect().toSeq.sortBy(_._1)
    streamed shouldBe batchExact
  }

  test("file-source document stream applies the same gates") {
    val outDocs = DocumentStreams.cleanDocStream(
      DocumentStreams.readDocumentStream(spark, "/root/testdata/sf0.001")
        .drop("ingest_ts").withColumn("ingest_ts", current_timestamp()),
      bloomBytes)
    val q = outDocs.writeStream.format("memory").queryName("filedocs")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val n = spark.table("filedocs").count()
    // The synthetic corpus shares no 5-grams with the eval docs and has
    // no sub-5-token docs, so only exact dups drop relative to 500.
    val batchN = DocumentStreams.cleanDocStream(
      graft.Tables.documents(spark, "/root/testdata/sf0.001")
        .withColumn("ingest_ts", current_timestamp()),
      bloomBytes).count()
    n shouldBe batchN
    n should be > 400L
  }

  test("tokenBudgetGate: per-source budget enforced across micro-batches, one-Long state") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s2 = spark
    // Docs arrive one per micro-batch so arrival order is pinned:
    // source a: 4, 3, 5, 2 tokens against budget 8 -> admit 4 (4),
    // admit 3 (7), DROP 5 (12 > 8), DROP 2? 7+2=9 > 8 -> drop too.
    // source b: 6, 2 -> admit 6, admit 2 (8 == budget, inclusive).
    val arrivals = Seq(
      (1L, "w w w w", "a"), (10L, "w w w w w w", "b"),
      (2L, "w w w", "a"), (3L, "w w w w w", "a"),
      (11L, "w w", "b"), (4L, "w w", "a"))
    val mem = MemoryStream[(Long, String, String)]
    val q = DocumentStreams.tokenBudgetGate(
        mem.toDF().toDF("doc_id", "text", "source"), budget = 8L)
      .writeStream.format("memory").queryName("budgeted")
      .outputMode(OutputMode.Append()).start()
    arrivals.foreach { a => mem.addData(a); q.processAllAvailable() }
    q.stop()
    val got = spark.table("budgeted")
      .select($"doc_id").as[Long].collect().sorted
    got shouldBe Array(1L, 2L, 10L, 11L)
    // Batch twin: the same fold over the same order admits the same set.
    var takenA = 0L; var takenB = 0L
    val ref = arrivals.flatMap { case (id, text, src) =>
      val n = text.split(" ").length.toLong
      val taken = if (src == "a") takenA else takenB
      if (taken + n <= 8L) {
        if (src == "a") takenA += n else takenB += n
        Some(id)
      } else None
    }
    got shouldBe ref.sorted.toArray
  }

  test("heavyHitterStream: MG guarantees hold across micro-batches, state stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s2 = spark
    // Skewed composition: "hot" dominates, "warm" is frequent, the
    // noise terms n0..n9 each appear a handful of times. capacity=3
    // per bucket guarantees any term with bucket share > 1/4 survives.
    val batch1 = (1 to 30).map(i => (i.toLong, "hot warm n" + (i % 10)))
    val batch2 = (31 to 60).map(i => (i.toLong, "hot hot n" + (i % 10)))
    val batch3 = (61 to 80).map(i => (i.toLong, "hot warm warm"))
    val mem = MemoryStream[(Long, String)]
    val q = DocumentStreams.heavyHitterStream(
        mem.toDF().toDF("doc_id", "text"), capacity = 3, buckets = 2)
      .writeStream.format("memory").queryName("hh")
      .outputMode(OutputMode.Update()).start()
    Seq(batch1, batch2, batch3).foreach { b =>
      mem.addData(b: _*); q.processAllAvailable()
    }
    q.stop()
    val all = spark.table("hh")
      .as[DocumentStreams.HhRow].collect()
    // live candidate set = latest emission per bucket
    val latestSeen = all.groupBy(_.bucket).view.mapValues(_.map(_.n_seen).max)
    val live = all.filter(r => r.n_seen == latestSeen(r.bucket))
    // state bound: <= capacity counters per bucket at every emission
    all.groupBy(r => (r.bucket, r.n_seen)).values
      .foreach(_.length should be <= 3)
    // true counts + bucket totals from the same token stream
    val toks = (batch1 ++ batch2 ++ batch3)
      .flatMap(_._2.split(" ")).groupBy(identity).view.mapValues(_.size.toLong)
    // bucket assignment for EVERY term, via the same Spark hash the
    // operator partitions with
    val bucketOf = toks.keys.toSeq.toDF("term")
      .select($"term", pmod(hash($"term"), lit(2)).as("b"))
      .as[(String, Int)].collect().toMap
    // hot appears 110 times of 180 tokens: guaranteed in its bucket
    val liveTerms = live.map(_.term).toSet
    liveTerms should contain("hot")
    // every live lower bound undercounts, by at most seen/(capacity+1)
    live.foreach { r =>
      val truth = toks(r.term)
      r.lower_count should be <= truth
      (truth - r.lower_count) should be <= r.n_seen / 4
    }
    // guarantee sweep: any term with bucket share > 1/(capacity+1)
    // must be live (needs per-bucket totals: seen per bucket)
    val seenPerBucket = latestSeen.toMap
    toks.foreach { case (t, c) =>
      bucketOf.get(t).foreach { b =>
        if (c > seenPerBucket(b) / 4) liveTerms should contain(t)
      }
    }
  }

  test("tokenFrequencyStream: CM estimates never undercount arrivals, per source, across batches") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s2 = spark
    val probes = Seq("hot", "warm", "absent")
    val batch1 = (1 to 20).map(i => (i.toLong, "hot warm cold n" + (i % 5), "a")) ++
      (1 to 10).map(i => (100L + i, "hot hot", "b"))
    val batch2 = (21 to 40).map(i => (i.toLong, "hot n" + (i % 7), "a"))
    val mem = MemoryStream[(Long, String, String)]
    val q = DocumentStreams.tokenFrequencyStream(
        mem.toDF().toDF("doc_id", "text", "source"), probes,
        width = 256, depth = 4)
      .writeStream.format("memory").queryName("freqs")
      .outputMode(OutputMode.Update()).start()
    mem.addData(batch1: _*); q.processAllAvailable()
    mem.addData(batch2: _*); q.processAllAvailable()
    q.stop()
    val all = spark.table("freqs").as[DocumentStreams.FreqRow].collect()
    // final emission per source = max total
    val finalTotal = all.groupBy(_.source).view.mapValues(_.map(_.total).max)
    val fin = all.filter(r => r.total == finalTotal(r.source))
      .map(r => (r.source, r.term) -> r.estimate).toMap
    // exact arrival counts per (source, term)
    val truth = (batch1 ++ batch2)
      .flatMap { case (_, text, src) => text.split(" ").map(src -> _) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (src <- Seq("a", "b"); p <- probes) {
      val t = truth.getOrElse(src -> p, 0L)
      val est = fin((src, p))
      withClue(s"$src/$p true=$t est=$est: ") {
        est should be >= t // Count-Min never undercounts
        // 256-wide grid, tiny vocab: overcount ≤ 3·⌈e/256⌉·N is generous
        est - t should be <= 3 * (math.ceil(math.E / 256 *
          finalTotal(src)).toLong + 1)
      }
    }
    // totals are per-source arrival counts
    finalTotal("a") shouldBe truth.collect { case ((s, _), c) if s == "a" => c }.sum
    finalTotal("b") shouldBe 20L
    // emissions are probe-bounded: exactly |probes| rows per (source, batch)
    all.groupBy(r => (r.source, r.total)).values
      .foreach(_.length shouldBe probes.length)
  }

  // Shared corpus for the passage-dedup gate: k=4 blocks, duplicates
  // only ACROSS docs (cross-batch, so arrival order is pinned by the
  // one-doc-per-batch feed).
  private val dedupDocs = Seq(
    (1L, "a b c d e f g h"),   // blocks [a b c d], [e f g h]
    (2L, "a b c d x y z w"),   // first block dups doc 1
    (3L, "e f g h"),           // whole doc dups doc 1
    (4L, "p q r s t"))         // novel, ragged tail block [t]

  private def runDedupStream(
      gate: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.Dataset[DocumentStreams.KeptBlock],
      name: String): Seq[DocumentStreams.KeptBlock] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = gate(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    dedupDocs.foreach { d => mem.addData(d); q.processAllAvailable() }
    q.stop()
    spark.table(name).as[DocumentStreams.KeptBlock].collect().toSeq
  }

  test("passageDedupStream: arrival-order first occurrence reproduces " +
    "the q134 winner fold; later duplicates drop") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s2 = spark
    val got = runDedupStream(
      df => DocumentStreams.passageDedupStream(df, k = 4, buckets = 3),
      "pdedup_exact")
    // reference: q134's fold in arrival (= doc_id) order — every
    // distinct block text kept at its first doc
    val ref = scala.collection.mutable.LinkedHashMap[String, (Long, Long)]()
    dedupDocs.foreach { case (id, text) =>
      text.split(" ").grouped(4).zipWithIndex.foreach { case (blk, i) =>
        val key = blk.mkString(" ")
        if (!ref.contains(key)) ref(key) = (id, i.toLong)
      }
    }
    got.map(b => (b.doc_id, b.blk)).toSet shouldBe ref.values.toSet
    // doc 3 contributed nothing; doc 4's ragged tail block counted at
    // its true token length
    got.map(_.doc_id).toSet shouldBe Set(1L, 2L, 4L)
    got.filter(_.doc_id == 4L).map(_.n_toks).sorted shouldBe Seq(1L, 4L)
    // no hash emitted twice
    got.map(_.block_hash).distinct.length shouldBe got.length
  }

  test("passageDedupStreamBloom: never admits a duplicate, and with " +
    "generous sizing equals the exact gate") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s2 = spark
    val exact = runDedupStream(
      df => DocumentStreams.passageDedupStream(df, k = 4, buckets = 3),
      "pdedup_exact2")
    val bloom = runDedupStream(
      df => DocumentStreams.passageDedupStreamBloom(
        df, bloomBytes = 1024, k = 4, buckets = 3),
      "pdedup_bloom")
    // conservative: emitted set is a subset of the exact gate's…
    bloom.map(_.block_hash).toSet.subsetOf(
      exact.map(_.block_hash).toSet) shouldBe true
    // …dup-free by construction…
    bloom.map(_.block_hash).distinct.length shouldBe bloom.length
    // …and at ~10 bits/block sizing it IS the exact set
    bloom.map(b => (b.doc_id, b.blk)).toSet shouldBe
      exact.map(b => (b.doc_id, b.blk)).toSet
  }

  test("bootstrapMeanStream: after each micro-batch prefix, estimates are " +
      "bit-identical to the batch bootstrap over arrivals so far") {
    implicit val sqlCtx = spark.sqlContext
    val rows1 = (0 until 40).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", 100L + i * 3))
    val rows2 = (40 until 90).map(i =>
      (i.toLong, if (i % 3 == 0) "a" else "b", 200L + i))
    val mem = MemoryStream[(Long, String, Long)]
    val q = DocumentStreams.bootstrapMeanStream(
        mem.toDF().toDF("doc_id", "source", "n_chars"))
      .writeStream.format("memory").queryName("bootci")
      .outputMode(OutputMode.Complete()).start()

    def batchOver(rows: Seq[(Long, String, Long)]) =
      graft.operators.RobustStats.poissonBootstrap(
        rows.toDF("doc_id", "source", "n_chars"),
        "source", "n_chars", "doc_id")
        .orderBy("source").collect()

    mem.addData(rows1)
    q.processAllAvailable()
    spark.table("bootci").orderBy("source").collect() shouldBe
      batchOver(rows1)
    mem.addData(rows2)
    q.processAllAvailable()
    spark.table("bootci").orderBy("source").collect() shouldBe
      batchOver(rows1 ++ rows2)
    q.stop()
  }

  test("spanDedupStream: micro-batch sequence ≡ sequential batch increments, " +
    "vocabulary append is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s2 = spark
    import graft.operators.Dedup
    val vocabTable = "span_vocab_stream_spec"
    // The warehouse persists across JVMs: clear any prior generation.
    spark.sql(s"DROP TABLE IF EXISTS `$vocabTable`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), vocabTable)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)

    val run = "c1 c2 c3 c4 c5 c6 c7"
    val b1 = Seq(
      (1L, s"$run first tail"),
      (2L, "completely novel opening text with many tokens"))
    val b2 = Seq(
      (10L, s"fresh stuff here $run"), // echo of PUBLISHED batch-1 text
      (11L, "b1 b2 b3 b4 b5 b6 extra"), // intra-batch pair with 12
      (12L, "b1 b2 b3 b4 b5 b6 other"))
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val mem = MemoryStream[(Long, String)]
    val q = DocumentStreams.spanDedupStream(
        mem.toDF().toDF("doc_id", "text"), vocabTable) { cleaned =>
      got ++= cleaned.orderBy("doc_id")
        .as[(Long, String)](implicitly).collect()
    }
    mem.addData(b1)
    q.processAllAvailable()
    mem.addData(b2)
    q.processAllAvailable()
    q.stop()

    // Sequential batch reference: increment 1 against the empty
    // vocabulary, publish its cleaned windows, increment 2 against them.
    val empty = Seq.empty[Long].toDF("wh")
    val ref1 = Dedup.removeDuplicatedSpansIncrementalWith(
      empty, b1.toDF("doc_id", "text"))
    val vocab1 = Dedup.windowVocabulary(ref1)
    val ref2 = Dedup.removeDuplicatedSpansIncrementalWith(
      vocab1, b2.toDF("doc_id", "text"))
    val want = (ref1.orderBy("doc_id").as[(Long, String)].collect() ++
      ref2.orderBy("doc_id").as[(Long, String)].collect()).toSeq
    got.toSeq shouldBe want
    // The batch-2 echo of batch-1's published run was stripped.
    got.find(_._1 == 10L).get._2 shouldBe "fresh stuff here"

    // Idempotent publish: the table holds the DISTINCT union of the
    // published batches' vocabularies — re-appending batch 2's
    // vocabulary adds nothing (the left-anti guard).
    val before = spark.table(vocabTable).count()
    val cleaned2 = b2.toDF("doc_id", "text") // replay shape: same rows
    val fresh = Dedup.windowVocabulary(
      Dedup.removeDuplicatedSpansIncrementalWith(
        spark.table(vocabTable), cleaned2))
    fresh.join(spark.table(vocabTable), Seq("wh"), "left_anti")
      .count() shouldBe 0L
    spark.table(vocabTable).select("wh").distinct().count() shouldBe before

    // Width is table identity: the created table carries the width in
    // its properties, and a restart with a DIFFERENT width must fail
    // loudly at start (mixed-width hashes would silently corrupt every
    // later dedup decision), while the matching width restarts fine.
    spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(vocabTable))
      .properties.get("graft.spanWidth") shouldBe Some("6")
    val err = intercept[IllegalArgumentException] {
      DocumentStreams.spanDedupStream(
        mem.toDF().toDF("doc_id", "text"), vocabTable, width = 5)(_ => ())
    }
    err.getMessage should include("width")
    val q2 = DocumentStreams.spanDedupStream(
      mem.toDF().toDF("doc_id", "text"), vocabTable, width = 6)(_ => ())
    q2.stop()
  }

  test("passageDedupStreamBloom: a saturated filter drops novel blocks " +
    "but still never admits dups (the documented FP direction)") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s2 = spark
    // 1 byte = 8 bits per bucket: saturates after a couple of blocks
    val tiny = runDedupStream(
      df => DocumentStreams.passageDedupStreamBloom(
        df, bloomBytes = 1, k = 4, buckets = 1),
      "pdedup_tiny")
    tiny.map(_.block_hash).distinct.length shouldBe tiny.length
    tiny.length should be < 6 // 6 distinct blocks exist; some FP-drop
  }
}
