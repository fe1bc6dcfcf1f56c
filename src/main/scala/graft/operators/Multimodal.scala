package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` payloads with
  * typed metadata, processed per-partition in batches.
  *
  * The Spark-side plumbing is real — schema, partition-preserving
  * batch iteration, deterministic outputs. The codec itself is a
  * STUB: this container has no image/audio libraries, so
  * [[StubCodec.decode]] derives features from the raw bytes (byte
  * histogram standing in for a pixel histogram). Swapping in a real
  * codec (JavaCV, TwelveMonkeys, ffmpeg-over-pipe) changes ONLY that
  * function — batch shape, schema, and distribution are unchanged.
  *
  * Scale notes: decode runs via `mapPartitions` — per-partition
  * imperative logic over opaque bytes is the one documented case where
  * dropping below the Column API is warranted (builder prompt (d);
  * a JVM codec call can't be a Catalyst expression). No shuffle is
  * introduced: features are computed where the bytes already live —
  * at 100 TB of media that data-locality is the whole game.
  */
object Multimodal {

  final case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      format: String,
      declared_width: Int,
      declared_height: Int)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      histogram: Array[Long]) // 16 coarse byte-value bins

  /** STUB codec — deterministic fake of the decode step. A real
    * implementation would parse `format` and emit pixel/sample
    * statistics; the container ships no media libs, so features come
    * from the payload bytes themselves. */
  object StubCodec {
    val HistogramBins = 16
    def decode(r: MediaRecord): MediaFeatures = {
      val hist = new Array[Long](HistogramBins)
      var checksum = 0L
      var i = 0
      while (i < r.payload.length) {
        val b = r.payload(i) & 0xff
        hist(b * HistogramBins / 256) += 1
        checksum = (checksum * 31 + b) & 0xfffffffffffffL
        i += 1
      }
      MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, checksum, hist)
    }
  }

  /** Decode a media dataset to features, batch-wise per partition. */
  def decodeFeatures(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map(StubCodec.decode))
  }

  /** Deterministic frame/chunk sampling: `n` evenly spaced slices of
    * `chunk` bytes — the video-frame-sample analog, pure Column ops. */
  def sampleChunks(payload: org.apache.spark.sql.Column, n: Int, chunk: Int)
      : org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(n - 1)), i => {
      val len = length(payload)
      val pos = lit(1) + (i * greatest((len - chunk) / math.max(n - 1, 1), lit(0)))
      payload.substr(pos, lit(chunk))
    })

  /** STUB resize: deterministic stride downsample of the payload to
    * ~`targetBytes` (a real codec would decode, bilinear-resample, and
    * re-encode; the byte-level stride keeps the plumbing — schema,
    * size contract, distribution — identical). Runs inside the same
    * mapPartitions pass as decode when chained. */
  def resizeStub(media: Dataset[MediaRecord], targetBytes: Int)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      if (r.payload.length <= targetBytes) r
      else {
        val stride = r.payload.length.toDouble / targetBytes
        val out = Array.tabulate(targetBytes)(i => r.payload((i * stride).toInt))
        r.copy(payload = out, format = r.format + ";resized")
      }
    })
  }

  /** Wrap documents as fake media records (payload = utf-8 bytes) —
    * exercises the full plumbing without real media files. */
  def mediaFromDocuments(documents: DataFrame)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    documents.select(
        col("doc_id").as("media_id"),
        lit("image").as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("raw/utf8").as("format"),
        lit(0).as("declared_width"),
        lit(0).as("declared_height"))
      .as[MediaRecord]
  }
}
