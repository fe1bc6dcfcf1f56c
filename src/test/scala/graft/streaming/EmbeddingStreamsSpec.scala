package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Streaming SRP candidate generator vs the batch pigeonhole
  * reference: the same vectors through `srpCandidateStream` as a
  * MemoryStream must emit exactly the pairs `batchCandidates` finds,
  * each at the LATER vector's arrival. */
class EmbeddingStreamsSpec extends SparkSpec {

  import spark.implicits._

  // Deterministic synthetic vectors: family f's members are small
  // perturbations of a shared base (near-dups within a family, far
  // across families). Values are exact binary fractions (k/64) so
  // quantization is exact and the test is platform-stable.
  private def vec(family: Int, member: Int): Seq[Float] =
    Seq.tabulate(graft.operators.Srp.Dims) { i =>
      val base = if ((i * 7 + family * 13) % 5 == 0) 1f else -1f
      val tweak = if ((i + member * 11) % 17 == 0) 0.25f else 0f
      (base / 4 + tweak * (if (family % 2 == 0) 1 else -1))
    }

  // 3 families × 3 members, interleaved arrival across two batches.
  private val batch1 = Seq(
    (10L, vec(0, 0)), (20L, vec(1, 0)), (11L, vec(0, 1)), (30L, vec(2, 0)))
  private val batch2 = Seq(
    (21L, vec(1, 1)), (12L, vec(0, 2)), (31L, vec(2, 1)), (22L, vec(1, 2)))

  private val MaxHamming = 3

  test("stream emits exactly the batch pigeonhole pairs, in arrival order") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = EmbeddingStreams.srpCandidateStream(
        mem.toDF().toDF("vec_id", "embedding"), maxHamming = MaxHamming)
      .writeStream.format("memory").queryName("srpcands")
      .outputMode(OutputMode.Append()).start()
    mem.addData(batch1)
    q.processAllAvailable()
    mem.addData(batch2)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("srpcands")
      .select($"vec_a", $"vec_b", $"hamming")
      .distinct() // a pair may surface via several agreeing bands
      .as[(Long, Long, Int)].collect()
      .map { case (a, b, h) => ((math.min(a, b), math.max(a, b)), h) }
      .toMap

    val arrivalPos = (batch1 ++ batch2).map(_._1).zipWithIndex.toMap
    val ref = EmbeddingStreams.batchCandidates(
        (batch1 ++ batch2).toDF("vec_id", "embedding"), MaxHamming)
      .as[(Long, Long, Int)].collect()
      .map { case (a, b, h) => ((math.min(a, b), math.max(a, b)), h) }
      .toMap

    assert(ref.nonEmpty, "degenerate test: no qualifying pairs")
    assert(streamed === ref)

    // Each emitted pair respects arrival order: vec_a arrived first.
    val ordered = spark.table("srpcands")
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect()
    ordered.foreach { case (a, b) =>
      assert(arrivalPos(a) < arrivalPos(b),
        s"pair ($a, $b) violates arrival order")
    }
  }

  test("annIngestStream: stream-grown index ≡ batch appendToIndex sequence at covering probes; replay no-ops") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Similarity
    import graft.sources.SnapshotStore
    // Deterministic 3-cluster corpus (the SimilaritySpec shape): base
    // index on ids < 60, stream in the rest as two micro-batches.
    val all = (0 until 90).map { i =>
      val base = Array.fill(8)(0.05f)
      base((i % 3) * 2) = 1.0f + (i / 3) * 0.01f
      base((i % 3) * 2 + 1) = 0.5f
      (i.toLong, base.toSeq)
    }
    def df(rows: Seq[(Long, Seq[Float])]) = rows.toDF("vec_id", "embedding")
    val baseRows = all.filter(_._1 < 60)
    val b1 = all.filter(r => r._1 >= 60 && r._1 < 75)
    val b2 = all.filter(_._1 >= 75)
    val deltaRoot = java.nio.file.Files
      .createTempDirectory("ann_delta").toString
    val idx = Similarity.buildIndex(df(baseRows), "ann_stream_base",
      nCentroids = 9)

    val mem = MemoryStream[(Long, Seq[Float])]
    val q = EmbeddingStreams.annIngestStream(
      mem.toDF().toDF("vec_id", "embedding"), idx, deltaRoot)
    mem.addData(b1)
    q.processAllAvailable()
    mem.addData(b2)
    q.processAllAvailable()
    q.stop()

    // Stream-grown serving (base ∪ delta) ≡ the batch appendToIndex
    // twin ≡ brute force, row-identical at covering probes.
    val queries = df(all.filter(r => Seq(0L, 62L, 89L).contains(r._1)))
    val got = Similarity.ivfTopKWithDelta(idx,
        SnapshotStore.read(deltaRoot), queries, k = 4, nprobe = 9)
      .select("qid", "vec_id", "cos", "rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    val twin = Similarity.buildIndex(df(baseRows), "ann_stream_twin",
      nCentroids = 9)
    Similarity.appendToIndex(twin, df(b1))
    Similarity.appendToIndex(twin, df(b2))
    val want = Similarity.ivfTopK(twin, queries, k = 4, nprobe = 9,
        idCol = "vec_id", embCol = "embedding")
      .select("qid", "vec_id", "cos", "rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    got shouldBe want
    got shouldBe Similarity.bruteForceTopK(df(all), queries, k = 4)
      .select("qid", "vec_id", "cos", "rank")
      .as[(Long, Long, Double, Long)].collect().toSet

    // T168 composition: the append-health census over the stream-grown
    // serving set (base ∪ delta) equals the appendToIndex twin's
    // census — the rebuild trigger watches exactly what
    // ivfTopKWithDelta serves. Base counts come from idx's assigned
    // table, which streaming never mutates (appends live in the
    // delta); the twin's build is deterministic on the same base so
    // the counts transfer. 30/90 appended = 33% ≥ 30% trips rebuild.
    val bcH = spark.table(idx.assignedTable)
      .groupBy("bucket").agg(count(lit(1)).as("n_base"))
    val hStream = Similarity.appendHealthWithDelta(idx, bcH,
      SnapshotStore.read(deltaRoot))
    val hTwin = Similarity.appendHealth(twin, bcH)
    hStream.collect() shouldBe hTwin.collect()
    hStream.select(min("rebuild")).as[Long].collect().head shouldBe 1L

    // Replay no-op: re-driving an already-committed micro-batch finds
    // its batch-N tag and publishes nothing — version lineage and
    // delta rows are byte-stable (the SnapshotSink exactly-once
    // contract carried to the index).
    val versionsBefore = SnapshotStore.history(deltaRoot).map(_.version)
    val rowsBefore = SnapshotStore.read(deltaRoot).count()
    val replayed = EmbeddingStreams.annIngestBatch(idx, df(b1), deltaRoot,
      batchId = 0L)
    replayed.map(_.tag) shouldBe Some(Some("batch-0"))
    SnapshotStore.history(deltaRoot).map(_.version) shouldBe versionsBefore
    SnapshotStore.read(deltaRoot).count() shouldBe rowsBefore
    // Empty batches publish no version (foreachBatch fires them on
    // some triggers; an empty commit per tick would grow the manifest).
    EmbeddingStreams.annIngestBatch(idx, df(Seq.empty), deltaRoot,
      batchId = 99L) shouldBe None
    SnapshotStore.history(deltaRoot).map(_.version) shouldBe versionsBefore
  }

  test("arrival order is the ingest id, not physical row order: reversed multi-partition input keeps orientation deterministic") {
    // After the groupByKey shuffle Spark guarantees nothing about row
    // order inside a bucket group — the state function's orderCol sort
    // must pin the (vec_a, vec_b) orientation to the ingest id even
    // when the physical input arrives reversed across 7 partitions
    // (the round-10 advice scenario: two same-bucket vectors in one
    // micro-batch).
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val src = mem.toDF().toDF("vec_id", "embedding").repartition(7)
    val q = EmbeddingStreams.srpCandidateStream(src, maxHamming = MaxHamming)
      .writeStream.format("memory").queryName("srporder")
      .outputMode(OutputMode.Append()).start()
    mem.addData((batch1 ++ batch2).reverse) // ONE batch, reversed
    q.processAllAvailable()
    q.stop()
    val got = spark.table("srporder")
      .select($"vec_a", $"vec_b").distinct().as[(Long, Long)].collect()
    assert(got.nonEmpty, "degenerate test: no qualifying pairs")
    got.foreach { case (a, b) =>
      assert(a < b, s"orientation ($a, $b) not in ingest-id order")
    }
    val ref = EmbeddingStreams.batchCandidates(
        (batch1 ++ batch2).toDF("vec_id", "embedding"), MaxHamming)
      .as[(Long, Long, Int)].collect()
      .map { case (a, b, _) => (math.min(a, b), math.max(a, b)) }.toSet
    assert(got.toSet === ref)
  }

  test("cross-family pairs stay out; within-family pairs are found") {
    implicit val s = spark
    val all = (batch1 ++ batch2).toDF("vec_id", "embedding")
    val pairs = EmbeddingStreams.batchCandidates(all, MaxHamming)
      .as[(Long, Long, Int)].collect()
    // Families are ids/10: candidates must be dominated by
    // within-family pairs (the sketch separates the construction).
    val (within, cross) = pairs.partition { case (a, b, _) => a / 10 == b / 10 }
    assert(within.nonEmpty, "sketch failed to find any within-family pair")
    assert(cross.length <= within.length,
      s"sketch admits more cross-family than within-family pairs: " +
        s"${cross.length} vs ${within.length}")
  }

  test("windowed variant: generous window == unbounded; window 1 only links adjacent arrivals in-bucket, never fabricates") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    def run(name: String, window: Int): Map[(Long, Long), Int] = {
      val mem = MemoryStream[(Long, Seq[Float])]
      val q = EmbeddingStreams.srpCandidateStreamWindowed(
          mem.toDF().toDF("vec_id", "embedding"), windowSize = window,
          maxHamming = MaxHamming)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      mem.addData(batch1)
      q.processAllAvailable()
      mem.addData(batch2)
      q.processAllAvailable()
      q.stop()
      spark.table(name).select($"vec_a", $"vec_b", $"hamming")
        .distinct().as[(Long, Long, Int)].collect()
        .map { case (a, b, h) => ((math.min(a, b), math.max(a, b)), h) }
        .toMap
    }
    val unbounded = run("srpwin_big", window = 1000)
    val ref = EmbeddingStreams.batchCandidates(
        (batch1 ++ batch2).toDF("vec_id", "embedding"), MaxHamming)
      .as[(Long, Long, Int)].collect()
      .map { case (a, b, h) => ((math.min(a, b), math.max(a, b)), h) }
      .toMap
    assert(unbounded === ref,
      "a window larger than the stream must equal the unbounded gate")

    // A tight window may only MISS pairs (evicted earlier member),
    // never invent one or change a hamming distance.
    val tight = run("srpwin_1", window = 1)
    tight.foreach { case (k, h) =>
      assert(ref.contains(k) && ref(k) === h,
        s"windowed gate fabricated or altered pair $k")
    }
    assert(tight.size <= ref.size)
  }

  test("guards: bands must divide bits, pigeonhole bound enforced") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val df = mem.toDF().toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      EmbeddingStreams.srpCandidateStream(df, maxHamming = 4, bands = 4)
    }
    intercept[IllegalArgumentException] {
      EmbeddingStreams.srpCandidateStream(df, maxHamming = 1, bands = 5)
    }
  }
}
