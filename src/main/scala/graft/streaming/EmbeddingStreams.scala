package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Srp

/** Streaming operators over an embedding stream — the arrival-order
  * companions to the batch ANN family (q41/q42/q161). */
object EmbeddingStreams {

  /** One emitted near-dup candidate: `vec_a` was admitted BEFORE
    * `vec_b` (arrival order), their sketches agree on band `band`,
    * and the full-sketch Hamming distance is `hamming`. */
  final case class SrpCand(vec_a: Long, vec_b: Long, hamming: Int,
      band: Int)

  /** Per-(band, key) admitted index: the (vec_id, sketch) pairs this
    * bucket has seen — Seq because Spark's state encoder codegen
    * constructs it (the SeenBlocks precedent). */
  final case class BandState(ids: Seq[Long], sketches: Seq[Long])

  /** Streaming SRP near-dup CANDIDATE generator — the arrival-order
    * twin of the batch LSH banding (T2 for text, q161's sketch for
    * embeddings): every arriving vector is checked against all
    * previously-arrived vectors that share any of `bands` disjoint
    * sketch bands, and each (earlier, later) pair within `maxHamming`
    * full-sketch bits is emitted AT THE LATER VECTOR'S ARRIVAL — the
    * ingest-time dedup/linkage signal, with the exact-cosine verify
    * join left downstream exactly as in the batch pipeline.
    *
    * Completeness is the q59 pigeonhole: with `bands` disjoint bands
    * of `Srp.Bits / bands` bits, any pair within Hamming < `bands`
    * agrees exactly on at least one band — so for maxHamming <= bands
    * - 1 the candidate stream contains EVERY qualifying pair (possibly
    * via several bands; dedup on (vec_a, vec_b) downstream).
    *
    * State: each (band, bandKey) bucket stores the (vec_id, sketch)
    * pairs seen — 12 bytes per vector per band, O(corpus) in total
    * like every exact first-occurrence index (at 100 TB it lives in
    * the RocksDB state store; a TTL/watermark variant bounds it to
    * the linkage window a pipeline actually needs).
    *
    * The sketch is computed with [[Srp.sketch]] on the same
    * floor(x·2^15) quantization as q161 — bit-identical to the batch
    * sketch at any partitioning, so stream and batch candidates can
    * be diffed exactly (spec-pinned).
    *
    * Arrival order WITHIN a micro-batch: after the groupByKey shuffle
    * Spark only guarantees rows are grouped by key, not that the
    * group's iterator reflects source order — so "admitted before" is
    * defined by `orderCol`, a monotonic ingest sequence (default
    * `vec_id`, the id the ingest assigns in arrival order). Rows of
    * one bucket-group are sorted by it before admission, making the
    * (vec_a, vec_b) orientation deterministic at any source
    * partitioning. */
  def srpCandidateStream(vecs: DataFrame, maxHamming: Int = 3,
      bands: Int = 4, orderCol: String = "vec_id")(
      implicit spark: SparkSession): Dataset[SrpCand] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(bands > 0 && Srp.Bits % bands == 0,
      s"bands must divide ${Srp.Bits}: $bands")
    require(maxHamming >= 0 && maxHamming < bands,
      s"pigeonhole completeness needs maxHamming < bands: " +
        s"$maxHamming vs $bands")
    val bandBits = Srp.Bits / bands
    val mask = (1L << bandBits) - 1
    vecs
      .select(col("vec_id").cast("long").as("vec_id"),
        col(orderCol).cast("long").as("seq"),
        Srp.sketch(
          transform(col("embedding"), x => x.cast("double"))).as("sk"))
      .select(col("vec_id"), col("seq"), col("sk"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .select(col("band"), col("vec_id"), col("sk"),
        expr(s"shiftrightunsigned(sk, band * $bandBits)")
          .bitwiseAND(mask).as("bkey"), col("seq"))
      .as[(Int, Long, Long, Long, Long)]
      .groupByKey { case (band, _, _, bkey, _) => (band, bkey) }
      .flatMapGroupsWithState[BandState, SrpCand](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key, rows, state) =>
          val st = state.getOption.getOrElse(BandState(Nil, Nil))
          val ids = scala.collection.mutable.ArrayBuffer[Long](st.ids: _*)
          val sks = scala.collection.mutable.ArrayBuffer[Long](
            st.sketches: _*)
          val before = ids.size
          val out = Seq.newBuilder[SrpCand]
          // A bucket-group is band-bounded; buffer + sort by the
          // ingest sequence so admission order is deterministic.
          rows.toSeq.sortBy(_._5).foreach { case (band, vecId, sk, _, _) =>
            var i = 0
            while (i < ids.size) {
              val h = java.lang.Long.bitCount(sk ^ sks(i))
              if (h <= maxHamming) out += SrpCand(ids(i), vecId, h, band)
              i += 1
            }
            ids += vecId
            sks += sk
          }
          if (ids.size != before)
            state.update(BandState(ids.toSeq, sks.toSeq))
          out.result().iterator
      }
  }

  /** Bounded-state variant of [[srpCandidateStream]]: each
    * (band, key) bucket keeps only the `windowSize` MOST RECENT
    * arrivals (FIFO eviction) — the linkage-WINDOW semantics a 100 TB
    * ingest actually wants (link against the recent past, not the
    * whole corpus history), with state pinned at
    * buckets × windowSize × 12 bytes FOREVER. CONSERVATIVE in the
    * candidate direction: every emitted pair is a true
    * within-`maxHamming` pair (no false candidates); pairs whose
    * earlier member was evicted before the later member arrived are
    * not emitted — the documented trade, mirrored on
    * `passageDedupStreamBloom`'s saturation direction. With
    * windowSize ≥ arrivals it emits EXACTLY [[srpCandidateStream]]'s
    * pairs (spec-pinned). Arrival order within a micro-batch — and
    * therefore which element a full window evicts — is defined by
    * `orderCol` exactly as in [[srpCandidateStream]]. */
  def srpCandidateStreamWindowed(vecs: DataFrame, windowSize: Int,
      maxHamming: Int = 3, bands: Int = 4, orderCol: String = "vec_id")(
      implicit spark: SparkSession): Dataset[SrpCand] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(windowSize > 0, s"windowSize must be positive: $windowSize")
    require(bands > 0 && Srp.Bits % bands == 0,
      s"bands must divide ${Srp.Bits}: $bands")
    require(maxHamming >= 0 && maxHamming < bands,
      s"pigeonhole completeness needs maxHamming < bands: " +
        s"$maxHamming vs $bands")
    val bandBits = Srp.Bits / bands
    val mask = (1L << bandBits) - 1
    vecs
      .select(col("vec_id").cast("long").as("vec_id"),
        col(orderCol).cast("long").as("seq"),
        Srp.sketch(
          transform(col("embedding"), x => x.cast("double"))).as("sk"))
      .select(col("vec_id"), col("seq"), col("sk"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .select(col("band"), col("vec_id"), col("sk"),
        expr(s"shiftrightunsigned(sk, band * $bandBits)")
          .bitwiseAND(mask).as("bkey"), col("seq"))
      .as[(Int, Long, Long, Long, Long)]
      .groupByKey { case (band, _, _, bkey, _) => (band, bkey) }
      .flatMapGroupsWithState[BandState, SrpCand](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_, rows, state) =>
          val st = state.getOption.getOrElse(BandState(Nil, Nil))
          var ids = scala.collection.immutable.Queue[Long](st.ids: _*)
          var sks = scala.collection.immutable.Queue[Long](
            st.sketches: _*)
          var changed = false
          val out = Seq.newBuilder[SrpCand]
          rows.toSeq.sortBy(_._5).foreach { case (band, vecId, sk, _, _) =>
            val it1 = ids.iterator
            val it2 = sks.iterator
            while (it1.hasNext) {
              val pid = it1.next(); val psk = it2.next()
              val h = java.lang.Long.bitCount(sk ^ psk)
              if (h <= maxHamming) out += SrpCand(pid, vecId, h, band)
            }
            ids = ids.enqueue(vecId)
            sks = sks.enqueue(sk)
            while (ids.size > windowSize) {
              ids = ids.dequeue._2
              sks = sks.dequeue._2
            }
            changed = true
          }
          if (changed) state.update(BandState(ids.toSeq, sks.toSeq))
          out.result().iterator
      }
  }

  /** STREAMING ANN ingest — the T161 streaming twin (VERDICT r13 item
    * 3): each micro-batch of new vectors is assigned under the index's
    * FROZEN coarse quantizer ([[graft.operators.Similarity
    * .assignUnderIndex]], the `IndexIVF.add` contract) and committed
    * as ONE tagged [[graft.sources.SnapshotStore]] version at
    * `deltaRoot` — the [[SnapshotSink]] pattern, so at-least-once
    * foreachBatch replay is exactly-once at the index level: a
    * replayed micro-batch finds its `batch-N` tag already published
    * and no-ops.
    *
    * Why the delta rides the snapshot store instead of
    * `appendToIndex`-ing the bucketed table per batch: the store's
    * manifest commit makes the batch's DATA and its idempotence TAG
    * one atomic rename — a "check tag, append bucket files, publish
    * tag" wrapper would leave a crash window between the table append
    * and the tag publish in which a replay double-appends (and a
    * saveAsTable append offers no way to detect or undo the partial
    * fold). Serving reads base ∪ delta
    * ([[graft.operators.Similarity.ivfTopKWithDelta]]); the delta
    * folds into the bucketed base at the periodic REBUILD that is
    * T161's documented counter-measure for quantizer drift anyway (a
    * single maintenance writer may instead `appendToIndex` the delta's
    * rows and reset `deltaRoot` — that fold is its transaction to
    * sequence against readers, the Compaction/T60 stance).
    *
    * Retention: [[graft.sources.SnapshotStore.vacuum]]'s `keepLast`
    * must cover the replay horizon (one batch in practice) — the
    * SnapshotSink contract. Centroids are never retrained here; id
    * uniqueness across base + appends is the caller's contract, as
    * for `appendToIndex`. */
  def annIngestStream(vectors: DataFrame,
      index: graft.operators.Similarity.IvfIndex, deltaRoot: String,
      idCol: String = "vec_id", embCol: String = "embedding")(
      implicit spark: SparkSession)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        annIngestBatch(index, batch, deltaRoot, id, idCol, embCol)
        ()
      }
      .start()

  /** One micro-batch of [[annIngestStream]] (factored out so replay
    * idempotence is spec-drivable): assign under the frozen quantizer,
    * commit as the `batch-<id>`-tagged version — a no-op returning the
    * already-published version if the tag exists. Empty batches
    * publish nothing (the SnapshotSink contract). */
  def annIngestBatch(index: graft.operators.Similarity.IvfIndex,
      batch: DataFrame, deltaRoot: String, batchId: Long,
      idCol: String = "vec_id", embCol: String = "embedding")
      : Option[graft.sources.SnapshotStore.Version] =
    SnapshotSink.processBatch(
      graft.operators.Similarity.assignUnderIndex(index, batch, idCol, embCol),
      deltaRoot, batchId)

  /** Batch reference for the spec: ALL ordered pairs (a before b in
    * `order`) within `maxHamming` sketch bits — what the pigeonhole
    * guarantees the stream emits (after (vec_a, vec_b) dedup). */
  def batchCandidates(vecs: DataFrame, maxHamming: Int)(
      implicit spark: SparkSession): DataFrame = {
    val sk = vecs.select(col("vec_id").cast("long").as("vec_id"),
      Srp.sketch(
        transform(col("embedding"), x => x.cast("double"))).as("sk"))
    val a = sk.select(col("vec_id").as("vec_a"), col("sk").as("ska"))
    val b = sk.select(col("vec_id").as("vec_b"), col("sk").as("skb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        bit_count(col("ska").bitwiseXOR(col("skb"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
