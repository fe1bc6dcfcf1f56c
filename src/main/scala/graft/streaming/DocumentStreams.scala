package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._

/** Streaming corpus ingest: the training-data gates (quality floor,
  * benchmark decontamination, exact dedup) as a Structured Streaming
  * pipeline, so a 100 TB corpus can be cleaned ON ARRIVAL instead of
  * re-scanned per snapshot. Every stage is a stateless per-row map
  * except the dedup, whose state is watermark-bounded.
  *
  * Decontamination is the conservative streaming shape: a doc is
  * dropped if ANY of its 5-token shingles probes positive against the
  * plan-embedded Bloom filter of eval-set shingles
  * ([[graft.plans.BloomProbe]]). No contaminated doc ever passes
  * (Bloom filters have no false negatives); a clean doc is dropped at
  * ~the filter's fpp — the documented price of keeping the stream
  * join-free. Pipelines that cannot pay it use
  * [[cleanDocStreamExact]]: the probe-positive sliver routes through
  * q74's exact verify join per micro-batch ([[decontaminateExact]])
  * and Bloom false positives pass.
  *
  * Dedup keys on the md5 content hash inside
  * `dropDuplicatesWithinWatermark`, so state holds only the watermark
  * window, not the corpus — the q27 exact-dedup semantics made
  * incremental. Batch twins: q32 (quality), q62/q74 (decontamination),
  * q27 (dedup); `DocumentStreamsSpec` holds stream-vs-batch parity.
  */
object DocumentStreams {

  /** documents.parquet schema plus the ingest timestamp a streaming
    * source stamps on arrival (used only to bound dedup state). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readDocumentStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(dir)
      .withColumn("ingest_ts", current_timestamp())

  /** True iff any w-token shingle of `text` probes positive against
    * the serialized Bloom filter — the per-row contamination test. */
  def contaminated(text: Column, bloomBytes: Array[Byte], w: Int = 5): Column = {
    val sh = CatalystBridge.column(
      graft.plans.ShingleTokens(CatalystBridge.expr(trim(text)), w))
    exists(sh, t => CatalystBridge.column(
      graft.plans.BloomProbe(Literal(bloomBytes), CatalystBridge.expr(t))))
  }

  /** Quality floor: token count within bounds (the q32 length gate —
    * the other q32 ratios are pure per-row Columns and compose the
    * same way). */
  def qualityGate(text: Column, minTokens: Int, maxTokens: Int): Column = {
    val n = size(graft.functions.tokens(text))
    n.between(minTokens, maxTokens)
  }

  /** The full gate chain over a document stream (or a batch frame —
    * the plan is identical, which is what the spec asserts):
    * quality floor → decontamination probe → watermarked exact dedup
    * on content hash. `ingest_ts` must exist on streaming input for
    * the dedup state bound; batch input dedups globally. */
  def cleanDocStream(
      docs: DataFrame,
      bloomBytes: Array[Byte],
      minTokens: Int = 5,
      maxTokens: Int = 1 << 20,
      watermark: String = "10 minutes"): DataFrame = {
    val gated = docs
      .filter(qualityGate(col("text"), minTokens, maxTokens))
      .filter(!contaminated(col("text"), bloomBytes))
      .withColumn("content_hash", md5(trim(col("text"))))
    if (docs.isStreaming)
      gated
        .withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark("content_hash")
    else
      gated.dropDuplicates("content_hash")
  }

  /** EXACT decontamination of a (micro-)batch — the side channel the
    * conservative probe gate documents: probe-NEGATIVE docs pass with
    * no join at all (Bloom filters have no false negatives), only the
    * probe-positive sliver pays q74's exact shingle equi-join against
    * the eval set, and a doc drops only when it truly shares
    * `minShared`+ shingles (default 1 — the exact twin of the
    * conservative gate's ANY-shingle drop; q74's >= 2 decision table
    * is one parameter away). A Bloom false positive is verified clean
    * and passes — zero fpp-rate corpus loss, at the cost of a
    * sliver-sized join per batch. */
  def decontaminateExact(
      docs: DataFrame, bloomBytes: Array[Byte], benchShingles: DataFrame,
      w: Int = 5, minShared: Int = 1): DataFrame = {
    val probed = docs.withColumn("_suspect",
      contaminated(col("text"), bloomBytes, w))
    val suspects = probed.filter(col("_suspect")).drop("_suspect")
    val sh = CatalystBridge.column(
      graft.plans.ShingleTokens(CatalystBridge.expr(trim(col("text"))), w))
    val confirmed = suspects
      .select(col("doc_id"), explode(sh).as("tok"))
      .join(broadcast(benchShingles.select(col("tok")).distinct()), "tok")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select("doc_id")
    probed.filter(!col("_suspect")).drop("_suspect")
      .unionByName(suspects.join(confirmed, Seq("doc_id"), "left_anti"))
  }

  /** The gate chain with the EXACT decontamination side channel wired
    * in: the stateless quality gate and the watermark-bounded dedup
    * run in the stream; each micro-batch then routes its
    * probe-positive sliver through [[decontaminateExact]] inside
    * `foreachBatch`, so the stream passes exactly what the batch
    * pipeline passes — a manufactured Bloom false positive survives
    * instead of being dropped at ~fpp. `onBatch` receives each
    * verified-clean micro-batch (sink it however the pipeline needs);
    * caller configures trigger/checkpoint and starts the returned
    * writer. */
  def cleanDocStreamExact(
      docs: DataFrame, bloomBytes: Array[Byte], benchShingles: DataFrame,
      onBatch: (DataFrame, Long) => Unit,
      minTokens: Int = 5, maxTokens: Int = 1 << 20,
      watermark: String = "10 minutes", w: Int = 5, minShared: Int = 1)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val gated = docs
      .filter(qualityGate(col("text"), minTokens, maxTokens))
      .withColumn("content_hash", md5(trim(col("text"))))
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")
    gated.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      onBatch(decontaminateExact(batch, bloomBytes, benchShingles, w, minShared), id)
    }
  }

  /** One admitted (doc_id, source, n_toks) row of [[tokenBudgetGate]]. */
  final case class DocTokens(doc_id: Long, source: String, n_toks: Long)

  /** Per-source running-total state — public only because Spark's
    * encoder codegen must construct it from generated bytecode (the
    * BpeTrainer.WordSyms precedent). */
  final case class BudgetState(taken: Long)

  /** Streaming per-source token-BUDGET gate — the arrival-order twin
    * of `Sampling.tokenBudget` (q108): a doc is admitted iff its
    * source's running token total stays ≤ `budget` AFTER adding it
    * (the same inclusive prefix-sum rule), and once a source's budget
    * is spent every later arrival from it drops. State is ONE Long
    * per source (`flatMapGroupsWithState`, no timeout needed — it
    * never grows with docs), so a 100 TB ingest carries
    * #sources × 8 bytes of state, not a corpus. Arrival order is the
    * stream's order (micro-batch sequence; within a micro-batch, the
    * engine's group iteration order — pin one doc per batch where
    * the exact cut matters); the batch path applies the same fold in
    * frame order. */
  final case class HhRow(bucket: Int, term: String, lower_count: Long,
      n_seen: Long)

  /** Misra–Gries summary for one hash bucket — public for Spark's
    * encoder codegen (the BudgetState precedent). */
  final case class MgState(terms: Seq[String], counts: Seq[Long],
      seen: Long)

  /** Streaming heavy-hitter candidates over the token stream — the
    * arrival-order twin of the batch [[graft.plans.FreqSketch]]
    * (Misra–Gries) aggregate behind q79. Terms are hash-partitioned
    * into `buckets` groups; each group's state is ONE Misra–Gries
    * summary of `capacity` counters maintained across micro-batches
    * by `flatMapGroupsWithState` — so total state is
    * buckets × capacity counters regardless of stream length, and
    * because a term lives in exactly one bucket the per-bucket MG
    * guarantee is undiluted: after any prefix, every term with
    * bucket-count > seen/(capacity+1) is IN the summary, and each
    * reported lower bound undercounts by at most seen/(capacity+1).
    * Each trigger re-emits the bucket's current summary (Update
    * mode) stamped with the running `n_seen`, so the latest rows per
    * bucket (max n_seen) are the live candidate set — the exact
    * rescore then runs as a bounded batch join, the q79 pattern. */
  def heavyHitterStream(docs: DataFrame, capacity: Int, buckets: Int = 16)(
      implicit spark: SparkSession)
      : org.apache.spark.sql.Dataset[HhRow] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(capacity > 0, s"capacity must be positive: $capacity")
    require(buckets > 0, s"buckets must be positive: $buckets")
    val terms = docs
      .select(explode(graft.functions.tokens(col("text"))).as("term"))
      .select(pmod(hash(col("term")), lit(buckets)).as("bucket"), col("term"))
      .as[(Int, String)]
    terms.groupByKey(_._1)
      .flatMapGroupsWithState[MgState, HhRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (bucket, rows, state) =>
          val prev = state.getOption.getOrElse(MgState(Nil, Nil, 0L))
          val counters = scala.collection.mutable.LinkedHashMap[String, Long](
            prev.terms.zip(prev.counts): _*)
          var seen = prev.seen
          rows.foreach { case (_, term) =>
            seen += 1
            counters.get(term) match {
              case Some(c) => counters(term) = c + 1
              case None if counters.size < capacity => counters(term) = 1L
              case None =>
                // decrement-all; evict zeros (the MG step)
                val dead = Seq.newBuilder[String]
                counters.foreach { case (t, c) =>
                  if (c == 1L) dead += t else counters(t) = c - 1
                }
                dead.result().foreach(counters.remove)
            }
          }
          state.update(
            MgState(counters.keys.toSeq, counters.values.toSeq, seen))
          // materialized: the emission must not alias the mutable map
          // after this function returns (Spark drains it lazily)
          counters.toList.map { case (t, c) =>
            HhRow(bucket, t, c, seen)
          }.iterator
      }
  }

  final case class FreqRow(source: String, term: String,
      estimate: Long, total: Long)
  /** Count-Min grid as streaming state: fixed width×depth cells plus
    * the observation total — NEVER grows with the stream. */
  final case class CmStreamState(cells: Seq[Long], total: Long)

  /** Streaming per-source token-frequency estimates on Count-Min
    * state ([[graft.plans.CmSketch]]'s grid, T94, as
    * `flatMapGroupsWithState` state) — the "how often has THIS term
    * arrived so far" twin of [[heavyHitterStream]] (which answers
    * "WHICH terms are frequent"): after every micro-batch each source
    * emits updated estimates for the fixed `probes` list. State is
    * width×depth longs per source at ANY stream length, and because
    * the grid is the T94 cell-wise-add merge, the running estimate
    * carries Count-Min's guarantee across batches: never an
    * undercount of the true arrivals so far, overcount ≤ ~(e/width)·N
    * w.h.p. Batch twin: exact `groupBy(term).count` filtered to the
    * probes (`DocumentStreamsSpec` pins the bracket). */
  def tokenFrequencyStream(docs: DataFrame, probes: Seq[String],
      width: Int = 1024, depth: Int = 4)(
      implicit spark: SparkSession)
      : org.apache.spark.sql.Dataset[FreqRow] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(probes.nonEmpty, "at least one probe term is required")
    require(width >= 8 && depth >= 1, s"bad grid: ${width}x$depth")
    val terms = docs
      .select(col("source"),
        explode(graft.functions.tokens(col("text"))).as("term"))
      .as[(String, String)]
    terms.groupByKey(_._1)
      .flatMapGroupsWithState[CmStreamState, FreqRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (source, rows, state) =>
          val cells = state.getOption.map(_.cells.toArray)
            .getOrElse(new Array[Long](width * depth))
          var total = state.getOption.map(_.total).getOrElse(0L)
          rows.foreach { case (_, term) =>
            val h = graft.plans.CmSketch.fnv64(
              term.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            var r = 0
            while (r < depth) {
              cells(r * width + graft.plans.CmSketch.bucket(h, r, width)) += 1L
              r += 1
            }
            total += 1L
          }
          state.update(CmStreamState(cells.toSeq, total))
          probes.map { p =>
            val h = graft.plans.CmSketch.fnv64(
              p.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            var mn = Long.MaxValue
            var r = 0
            while (r < depth) {
              val c = cells(r * width + graft.plans.CmSketch.bucket(h, r, width))
              if (c < mn) mn = c
              r += 1
            }
            FreqRow(source, p, mn, total)
          }.iterator
      }
  }

  /** One admitted block of [[passageDedupStream]]: the block survives
    * (first corpus occurrence at arrival time) with its home doc,
    * in-doc position, content hash, and token count. */
  final case class KeptBlock(doc_id: Long, blk: Long, block_hash: String,
      n_toks: Long)

  /** Seen-block index for one hash bucket — Seq because Spark's state
    * encoder codegen constructs it (the BudgetState precedent). */
  final case class SeenBlocks(hashes: Seq[String])

  /** Bloom bits for one hash bucket of [[passageDedupStreamBloom]]. */
  final case class BloomState(bits: Array[Byte])

  /** Blockify a document frame exactly as q134 does: non-overlapping
    * `k`-token blocks, md5-keyed. */
  private def blockified(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id").cast("long").as("doc_id"),
        graft.functions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn("nb", ceil(size(col("toks")) / lit(k.toDouble)).cast("long"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0L), col("nb") - 1),
          i => slice(col("toks"), (i * k + 1).cast("int"), lit(k)))))
      .select(col("doc_id"), col("pos").cast("long").as("blk"),
        md5(array_join(col("col"), " ")).as("block_hash"),
        size(col("col")).cast("long").as("n_toks"))

  /** Streaming passage-level exact dedup gate — the arrival-order twin
    * of q134 (T101): every distinct `k`-token block is admitted at its
    * FIRST arrival and dropped on every later one, so the emitted
    * stream is the ingest-time deduplicated corpus (C4/RefinedWeb
    * line-dedup applied at the door instead of in a batch rewrite).
    * Blocks hash-partition into `buckets` groups; each group's state
    * is the set of block md5s it has admitted. That state IS the dedup
    * index — it grows with DISTINCT corpus blocks (inherent to exact
    * first-occurrence semantics; at 100 TB it lives in the RocksDB
    * state store, sized by distinct — not total — blocks, and dup-heavy
    * streams grow it sublinearly in arrivals). For fixed-size state
    * accept the bounded-FP variant [[passageDedupStreamBloom]].
    * Arrival order is the stream's order (micro-batch sequence; pin
    * one doc per batch where the exact cut matters); when arrivals
    * come in (doc_id, blk) order the admitted set is EXACTLY q134's
    * winner set (spec-pinned). */
  def passageDedupStream(docs: DataFrame, k: Int = 16, buckets: Int = 16)(
      implicit spark: SparkSession)
      : org.apache.spark.sql.Dataset[KeptBlock] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(k > 0, s"block size must be positive: $k")
    require(buckets > 0, s"buckets must be positive: $buckets")
    blockified(docs, k)
      .select(pmod(hash(col("block_hash")), lit(buckets)).as("bucket"),
        col("doc_id"), col("blk"), col("block_hash"), col("n_toks"))
      .as[(Int, Long, Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SeenBlocks, KeptBlock](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_, rows, state) =>
          val seen = scala.collection.mutable.LinkedHashSet[String](
            state.getOption.map(_.hashes).getOrElse(Nil): _*)
          val before = seen.size
          val out = Seq.newBuilder[KeptBlock]
          rows.foreach { case (_, docId, blk, h, n) =>
            if (seen.add(h)) out += KeptBlock(docId, blk, h, n)
          }
          // all-duplicate batches (the steady state of a dup-heavy
          // stream) must not re-serialize the whole index
          if (seen.size != before) state.update(SeenBlocks(seen.toSeq))
          out.result().iterator
      }
  }

  /** Bounded-state variant of [[passageDedupStream]]: each bucket's
    * seen-index is a fixed `bloomBytes`-byte Bloom filter (two
    * double-hashed probes per block). CONSERVATIVE in the gate's
    * direction: a duplicate block is NEVER admitted twice (Bloom
    * filters have no false negatives), but a novel block can be
    * false-positive-dropped once the filter saturates — the standard
    * at-scale trade (state is buckets × bloomBytes FOREVER, and the
    * emitted stream is dup-free by construction). Size bloomBytes for
    * the expected distinct-block count (~10 bits/block for ~1% FP). */
  def passageDedupStreamBloom(docs: DataFrame, bloomBytes: Int,
      k: Int = 16, buckets: Int = 16)(implicit spark: SparkSession)
      : org.apache.spark.sql.Dataset[KeptBlock] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(k > 0, s"block size must be positive: $k")
    require(buckets > 0, s"buckets must be positive: $buckets")
    // bit positions are Int array offsets: past 2^32 bits (512 MiB per
    // bucket) extra bytes would silently alias instead of lowering the
    // FP rate — size MORE BUCKETS, not a bigger filter
    require(bloomBytes > 0 && bloomBytes <= (1 << 29),
      s"bloomBytes must be in [1, ${1 << 29}] (512 MiB/bucket; " +
        s"shard across more buckets beyond that): $bloomBytes")
    val nBits = bloomBytes.toLong * 8
    blockified(docs, k)
      .select(pmod(hash(col("block_hash")), lit(buckets)).as("bucket"),
        col("doc_id"), col("blk"), col("block_hash"), col("n_toks"))
      .as[(Int, Long, Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[BloomState, KeptBlock](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_, rows, state) =>
          val stored = state.getOption.map(_.bits)
          // clone lazily: an all-duplicate batch (the dup-heavy steady
          // state) must neither copy nor re-serialize the filter
          var bits = stored.getOrElse(new Array[Byte](bloomBytes))
          var dirty = stored.isEmpty
          def probe(h1: Long, h2: Long): Boolean = {
            var all = true
            var i = 0
            while (i < 2) {
              val bit = java.lang.Long.remainderUnsigned(
                h1 + i * h2, nBits).toInt
              val mask = (1 << (bit & 7)).toByte
              val idx = bit >>> 3
              if ((bits(idx) & mask) == 0) {
                all = false
                if (!dirty && stored.isDefined) { bits = bits.clone(); dirty = true }
                bits(idx) = (bits(idx) | mask).toByte
              }
              i += 1
            }
            all
          }
          val out = Seq.newBuilder[KeptBlock]
          rows.foreach { case (_, docId, blk, h, n) =>
            val h1 = java.lang.Long.parseUnsignedLong(h.substring(0, 15), 16)
            val h2 = java.lang.Long.parseUnsignedLong(h.substring(15, 30), 16) | 1L
            if (!probe(h1, h2))
              out += KeptBlock(docId, blk, h, n)
          }
          if (dirty) state.update(BloomState(bits))
          out.result().iterator
      }
  }

  def tokenBudgetGate(docs: DataFrame, budget: Long)(
      implicit spark: SparkSession)
      : org.apache.spark.sql.Dataset[DocTokens] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(budget > 0, s"budget must be positive: $budget")
    val typed = docs.select(col("doc_id").cast("long").as("doc_id"),
        col("source"),
        size(graft.functions.tokens(col("text"))).cast("long").as("n_toks"))
      .as[DocTokens]
    typed.groupByKey(_.source)
      .flatMapGroupsWithState[BudgetState, DocTokens](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_, rows, state) =>
          var taken = state.getOption.map(_.taken).getOrElse(0L)
          val out = Seq.newBuilder[DocTokens]
          rows.foreach { d =>
            if (taken + d.n_toks <= budget) {
              taken += d.n_toks
              out += d
            }
          }
          state.update(BudgetState(taken))
          out.result().iterator
      }
  }

  /** Streaming twin of
    * [[graft.operators.RobustStats.poissonBootstrap]]: per-key mean
    * WITH a bootstrap confidence interval, maintained live at the
    * ingest door — the corpus-metric error bar that says whether
    * today's arrivals actually moved a quality metric or just wiggled
    * within sampling noise.
    *
    * Why it streams for free: replicate weights are STATELESS per row
    * (a pure function of (idCol, replicate) — the batch operator's
    * md5-vs-integer-threshold draw), and the per-key bootstrap sums
    * are ALGEBRAIC (longs that merge by addition). So the whole
    * operator is ONE streaming aggregation whose state per key is the
    * same 2R+2 longs the batch pass computes — no custom state store,
    * no watermark needed (the estimate is over EVERYTHING seen, the
    * cumulative-census semantics of q116) — plus a row-local CI
    * projection on the aggregation output. Emit under
    * `OutputMode.Update`/`Complete`; after any prefix of micro-batches
    * the emitted rows are BIT-IDENTICAL to the batch operator run over
    * the union of arrivals so far (`DocumentStreamsSpec` pins it). */
  def bootstrapMeanStream(rows: DataFrame, keyCol: String = "source",
      valCol: String = "n_chars", idCol: String = "doc_id",
      replicates: Int = 32): DataFrame =
    graft.operators.RobustStats.bootstrapFinish(
      graft.operators.RobustStats.bootstrapCells(
        rows, keyCol, valCol, idCol, replicates),
      keyCol, replicates)

  /** Streaming SPAN dedup — `removeDuplicatedSpans` at the door (the
    * T153 emitter in arrival order, micro-batch = T157 increment):
    * each micro-batch is cleaned against the PUBLISHED window
    * vocabulary ([[graft.operators.Dedup
    * .removeDuplicatedSpansIncrementalWith]] — the corpus enters only
    * through the materialized `vocabTable`, never as text), the
    * cleaned batch goes to `onBatch` (the caller's sink), and then the
    * CLEANED batch's own window vocabulary is appended — the
    * append-on-publish contract, wired as a foreachBatch pipeline.
    *
    * Semantics: a batch token is dropped when a covering
    * `width`-window occurs in anything PUBLISHED so far or in ≥ 2
    * distinct docs of the same batch; what the vocabulary accumulates
    * is the PUBLISHED (cleaned) text's windows, so downstream
    * re-ingest of published text strips as an echo — exactly the
    * sequential-batch semantics of the batch operator, which
    * `DocumentStreamsSpec` pins micro-batch-for-batch.
    *
    * State & restart story: state IS the vocabulary table (distinct
    * window hashes — bucketed on wh so the increment's probe join is
    * bucket-local), not stream state. The append is IDEMPOTENT under
    * micro-batch replay: only hashes not already in the table are
    * appended (left-anti), so an at-least-once foreachBatch retry
    * cannot double-publish vocabulary — and re-cleaning a replayed
    * batch against the already-published vocabulary only strips text
    * the failed attempt had already published, the conservative
    * direction for a dedup gate.
    *
    * Width is part of the table's identity (ADVICE r13): a window
    * hash is meaningless at any other width, so the table records
    * `graft.spanWidth` in its properties at creation and a restart
    * against an existing table validates it LOUDLY at start — mixing
    * widths would silently corrupt every later dedup decision. The
    * bucket count is likewise read back from catalog metadata on
    * append (the appendToIndex stance) rather than re-assumed. */
  def spanDedupStream(docs: DataFrame, vocabTable: String, width: Int = 6)(
      onBatch: DataFrame => Unit)(implicit spark: SparkSession)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Dedup
    require(width > 0, s"width must be positive: $width")
    val WidthProp = "graft.spanWidth"
    if (spark.catalog.tableExists(vocabTable)) {
      val props = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(vocabTable)).properties
      val stored = props.get(WidthProp)
      require(stored.contains(width.toString),
        s"vocabulary table $vocabTable was built with width=" +
          s"${stored.getOrElse("<unrecorded — not a span-dedup vocabulary " +
            "table, or predates width metadata; rebuild it>")} " +
          s"but this stream was started with width=$width — window hashes " +
          "of different widths must never mix in one vocabulary")
    }
    docs.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val haveVocab = spark.catalog.tableExists(vocabTable)
        val vocab =
          if (haveVocab) spark.table(vocabTable)
          else spark.emptyDataFrame
            .select(lit(0L).as("wh")).filter(lit(false))
        // Pin the cleaned batch BEFORE the vocabulary append below —
        // its plan reads the vocabulary table, and a lazy re-execution
        // after the append would see the batch's own windows.
        val cleaned = Dedup
          .removeDuplicatedSpansIncrementalWith(vocab, batch, width)
          .localCheckpoint(true)
        onBatch(cleaned)
        val fresh = Dedup.windowVocabulary(cleaned, width)
        val delta = if (haveVocab)
          fresh.join(spark.table(vocabTable), Seq("wh"), "left_anti")
        else fresh
        val numBuckets = if (haveVocab)
          spark.sessionState.catalog.getTableMetadata(
              org.apache.spark.sql.catalyst.TableIdentifier(vocabTable))
            .bucketSpec.map(_.numBuckets).getOrElse(throw
              new IllegalStateException(
                s"$vocabTable is not bucketed — not a span-dedup " +
                  "vocabulary table"))
        else 16
        if (!haveVocab) {
          // Stamp the width IN the creating DDL (ADVICE r14): the old
          // write-then-ALTER left a crash window in which the table
          // existed without its width property, bricking every
          // restart behind the start-time require. CREATE TABLE with
          // TBLPROPERTIES is one catalog operation, and the data
          // append below is crash-safe in both orders (an empty
          // stamped table restarts cleanly).
          spark.sql(
            s"""CREATE TABLE `$vocabTable` (wh BIGINT) USING parquet
               |CLUSTERED BY (wh) SORTED BY (wh) INTO $numBuckets BUCKETS
               |TBLPROPERTIES ('$WidthProp' = '$width')""".stripMargin)
          ()
        }
        graft.sources.FileIO.writeBucketedTable(delta, vocabTable,
          "wh", numBuckets, org.apache.spark.sql.SaveMode.Append)
      }
      .start()
  }
}
