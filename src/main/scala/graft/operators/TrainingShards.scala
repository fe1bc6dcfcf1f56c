package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{functions => gf, CacheRegistry}

/** The training-shard writer — the step that turns a clean corpus into
  * what a trainer actually mmaps: a deterministic epoch permutation,
  * greedily packed into ≤ `maxTokens` sequences, laid out as
  * `shard=K/` parquet partitions with a driver-side JSON manifest.
  * Composes the shipped primitives: the seeded 60-bit hash order of
  * [[Sampling.epochShuffle]] (same floor-division slice contract) and
  * the per-cell sequential pack fold of [[Packing]].
  *
  * Scale shape (100 TB):
  *   - ONE shuffle: rows hash to their shard by the seeded permutation
  *     key (arithmetic slice of the 2^60 space — no sample pass, no
  *     side frame), `flatMapSortedGroups` sorts within shard and folds
  *     the pack budget in a single pass. With thousands of shards the
  *     sequential unit is corpus/nShards — the same independence
  *     argument as [[Packing]]'s (group, shard) cells.
  *   - The manifest aggregate is shard-bounded (nShards rows collect to
  *     the driver; at any corpus size that is the operator's only
  *     driver-side state). Per-shard `member_sum` is the order-free
  *     residue witness (q138/q139 stance) so two writes can be
  *     compared without reading data files.
  *   - Readers prune: `readShard` filters on the `shard` partition
  *     column, so loading one shard scans one directory
  *     (spec-asserted PartitionFilters).
  *
  * Determinism: same (input content, seed, maxTokens, nShards) ⇒
  * byte-identical manifest and identical (shard, pack_id, pack_pos)
  * assignment for every doc, regardless of input partitioning — the
  * permutation key is md5-derived from doc_id, never a JVM hash or
  * RNG state.
  */
object TrainingShards {

  final case class PackedRow(
      shard: Int,
      pack_id: Long,  // 0-based within shard
      pack_pos: Long, // 1-based within pack
      doc_id: Long,
      source: String,
      n_tokens: Long,
      text: String)

  final case class ShardStat(
      shard: Int,
      n_docs: Long,
      n_packs: Long,
      n_tokens: Long,
      member_sum: Long)

  final case class Manifest(
      seed: String,
      maxTokens: Long,
      nShards: Int,
      shards: Seq[ShardStat]) {
    def totalDocs: Long = shards.map(_.n_docs).sum
    def totalTokens: Long = shards.map(_.n_tokens).sum
  }

  private val Space = 1L << 60

  /** Shard of one seeded hash — the [[Sampling.epochShuffle]] slice
    * contract: floor(h / (2^60 / n)), capped (the truncated divisor
    * makes the top slice absorb the remainder, exactly like the
    * upper-inclusive bound array the shuffle uses). */
  def shardOf(h: Long, nShards: Int): Int =
    math.min(h / (Space / nShards), (nShards - 1).toLong).toInt

  /** Shuffle + pack, no write: the deterministic
    * (shard, pack_id, pack_pos) assignment for every doc. */
  def pack(docs: DataFrame, seed: String, maxTokens: Long, nShards: Int,
      idCol: String = "doc_id", groupCol: String = "source",
      tokensCol: String = "n_tokens", textCol: String = "text")(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(nShards > 0, s"nShards must be positive: $nShards")
    require(maxTokens > 0, s"maxTokens must be positive: $maxTokens")
    val h = gf.stableHashSeeded(lit(seed), col(idCol).cast("string"))
    docs.select(
        h.as("h"),
        col(idCol).cast("long").as("doc_id"),
        col(groupCol).cast("string").as("source"),
        col(tokensCol).cast("long").as("n_tokens"),
        col(textCol).cast("string").as("text"))
      .as[(Long, Long, String, Long, String)]
      .groupByKey { case (hh, _, _, _, _) => shardOf(hh, nShards) }
      .flatMapSortedGroups($"h", $"doc_id") { case (shard, rows) =>
        var packId = -1L
        var acc = 0L
        var pos = 0L
        rows.map { case (_, docId, source, n, text) =>
          if (packId < 0 || acc + n > maxTokens) { packId += 1; acc = n; pos = 1L }
          else { acc += n; pos += 1L }
          PackedRow(shard, packId, pos, docId, source, n, text)
        }
      }
      .toDF()
  }

  /** Pack and write `outDir/shard=K/...` + `outDir/_MANIFEST.json`.
    * Returns the manifest (shard-bounded driver state). */
  def writeShards(docs: DataFrame, outDir: String, seed: String,
      maxTokens: Long, nShards: Int, idCol: String = "doc_id",
      groupCol: String = "source", tokensCol: String = "n_tokens",
      textCol: String = "text")(implicit spark: SparkSession): Manifest = {
    import spark.implicits._
    val packed = CacheRegistry.persistTracked(
      pack(docs, seed, maxTokens, nShards, idCol, groupCol, tokensCol,
        textCol),
      CacheRegistry.DataSized)
    try {
      packed.write.mode("overwrite").partitionBy("shard").parquet(outDir)
      val stats = packed
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          (max("pack_id") + 1).as("n_packs"),
          sum("n_tokens").as("n_tokens"),
          sum(gf.stableHash(col("doc_id").cast("string")) % 1000003)
            .as("member_sum"))
        .orderBy("shard")
        .as[(Int, Long, Long, Long, Long)]
        .collect() // nShards rows — bounded
        .map { case (s, d, p, t, m) => ShardStat(s, d, p, t, m) }
      val manifest = Manifest(seed, maxTokens, nShards, stats.toSeq)
      Files.write(Paths.get(outDir, "_MANIFEST.json"),
        manifestJson(manifest).getBytes(StandardCharsets.UTF_8))
      manifest
    } finally packed.unpersist(blocking = false)
  }

  /** All shards (the manifest travels separately). */
  def readShards(outDir: String)(implicit spark: SparkSession): DataFrame =
    spark.read.parquet(outDir)

  /** One shard — filter on the partition column so the scan prunes to
    * the `shard=K` directory. */
  def readShard(outDir: String, shard: Int)(
      implicit spark: SparkSession): DataFrame =
    readShards(outDir).filter(col("shard") === shard)

  def readManifest(outDir: String): Manifest = {
    val txt = new String(
      Files.readAllBytes(Paths.get(outDir, "_MANIFEST.json")),
      StandardCharsets.UTF_8)
    parseManifest(txt)
  }

  // -- manifest (de)serialization: flat, dependency-free ---------------

  private def manifestJson(m: Manifest): String = {
    val shards = m.shards.map(s =>
      s"""{"shard":${s.shard},"n_docs":${s.n_docs},"n_packs":${s.n_packs},""" +
        s""""n_tokens":${s.n_tokens},"member_sum":${s.member_sum}}""")
      .mkString("[", ",", "]")
    val seedEsc = m.seed.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    s"""{"seed":"$seedEsc","max_tokens":${m.maxTokens},""" +
      s""""n_shards":${m.nShards},"shards":$shards}"""
  }

  private def parseManifest(s: String): Manifest = {
    def longField(src: String, name: String): Long = {
      val m = s"""\"$name\":(-?\\d+)""".r.findFirstMatchIn(src)
      m.getOrElse(sys.error(s"manifest missing $name")).group(1).toLong
    }
    val seed = """"seed":"((?:[^"\\]|\\.)*)"""".r
      .findFirstMatchIn(s).map(_.group(1))
      .getOrElse(sys.error("manifest missing seed"))
      .replace("\\\"", "\"").replace("\\\\", "\\")
    val shardObjs = """\{"shard":[^}]*\}""".r.findAllIn(s).toSeq
    Manifest(
      seed,
      longField(s, "max_tokens"),
      longField(s, "n_shards").toInt,
      shardObjs.map(o => ShardStat(
        longField(o, "shard").toInt, longField(o, "n_docs"),
        longField(o, "n_packs"), longField(o, "n_tokens"),
        longField(o, "member_sum"))))
  }
}
