package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Greedy sequence packing: group documents into training sequences of
  * at most `maxTokens` tokens, preserving id order — the step between
  * a clean corpus and a token-budgeted training shard (every LLM data
  * pipeline ships one; the reference's ETL stops at the warehouse, so
  * this is an engine-original operator like the dedup family).
  *
  * Packing is an inherently sequential fold (each doc's pack depends
  * on the running token budget), so it cannot be a window cumsum —
  * the accumulator resets at every pack boundary. The parallel unit is
  * the (group, shard) cell: docs are hash-shuffled once on that key,
  * sorted within the group by id, and folded in one pass via
  * `flatMapSortedGroups` (the typed-API home for per-group sequential
  * state). `shardSize` bounds the sequential run: packs never span a
  * shard, so a 100 TB corpus packs as millions of independent cells
  * instead of one giant scan per source. A document longer than
  * `maxTokens` gets a pack of its own (standard oversize handling).
  */
object Packing {

  final case class PackedDoc(
      doc_id: Long,
      source: String,
      shard: Long,
      pack_id: Long,   // 0-based, local to (source, shard)
      pack_pos: Long,  // 1-based position within the pack
      n_tokens: Long)

  /** Pack `docs(idCol, groupCol, tokensCol)` greedily per
    * (group, shard = id / shardSize) in id order. */
  def packSequences(
      docs: DataFrame, maxTokens: Long, shardSize: Long,
      idCol: String = "doc_id", groupCol: String = "source",
      tokensCol: String = "n_tokens")(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val prepped = docs.select(
        col(idCol).cast("long").as("doc_id"),
        col(groupCol).cast("string").as("source"),
        (col(idCol).cast("long") / lit(shardSize)).cast("long").as("shard"),
        col(tokensCol).cast("long").as("n_tokens"))
      .as[(Long, String, Long, Long)]
    prepped
      .groupByKey { case (_, source, shard, _) => (source, shard) }
      .flatMapSortedGroups($"doc_id") { case ((source, shard), rows) =>
        var packId = -1L
        var acc = 0L
        var pos = 0L
        rows.map { case (docId, _, _, n) =>
          // first doc always opens pack 0 (packId < 0), even at n = 0
          if (packId < 0 || acc + n > maxTokens) { packId += 1; acc = n; pos = 1L }
          else { acc += n; pos += 1L }
          PackedDoc(docId, source, shard, packId, pos, n)
        }
      }
      .toDF()
  }
}
