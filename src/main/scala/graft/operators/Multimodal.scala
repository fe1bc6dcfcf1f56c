package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` payloads with
  * typed metadata, processed per-partition in batches.
  *
  * The Spark-side plumbing is real — schema, partition-preserving
  * batch iteration, deterministic outputs. Image METADATA decode is
  * real too: [[ImageIoCodec]] header-parses PNG/JPEG/GIF/BMP via
  * `javax.imageio` (ships in the JDK — no external libraries). The
  * pixel/audio/video feature path remains a STUB: this container has
  * no media libraries beyond the JDK, so [[StubCodec.decode]] derives
  * features from the raw bytes (byte histogram standing in for a pixel
  * histogram). Swapping in a full codec (JavaCV, TwelveMonkeys,
  * ffmpeg-over-pipe) changes ONLY that function — batch shape, schema,
  * and distribution are unchanged.
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

  /** Image metadata decoded for real: id, whether a registered JDK
    * codec recognized the payload, and the decoded (or declared, on
    * fallback) dimensions/channels. */
  final case class MediaMeta(
      media_id: Long,
      kind: String,
      decoded: Boolean,
      width: Int,
      height: Int,
      channels: Int,
      n_bytes: Long)

  /** REAL codec for the formats the JDK ships readers for (PNG, JPEG,
    * GIF, BMP, WBMP) — no external libraries. Reads the image HEADER
    * only: `ImageReader.getWidth/getHeight/getImageTypes` parse IHDR /
    * SOF markers without decoding pixel data, so metadata extraction
    * over 100 TB of media costs header bytes, not decode CPU. Payloads
    * no reader claims (or that fail to parse) return None and the
    * caller falls back to [[StubCodec]] semantics. */
  object ImageIoCodec {
    import javax.imageio.ImageIO

    /** (width, height, channels) from the image header, or None. */
    def imageMeta(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
      if (bytes == null || bytes.length == 0) return None
      try {
        val iis = ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis, true, true)
              val w = reader.getWidth(0)
              val h = reader.getHeight(0)
              val types = reader.getImageTypes(0)
              val channels =
                if (types.hasNext) types.next().getNumBands else -1
              Some((w, h, channels))
            } finally reader.dispose()
          }
        } finally iis.close()
      } catch { case _: Exception => None }
    }

    def decode(r: MediaRecord): MediaMeta = imageMeta(r.payload) match {
      case Some((w, h, c)) =>
        MediaMeta(r.media_id, r.kind, decoded = true, w, h, c,
          r.payload.length.toLong)
      case None =>
        MediaMeta(r.media_id, r.kind, decoded = false,
          r.declared_width, r.declared_height, 0, r.payload.length.toLong)
    }
  }

  /** Decode real image metadata per partition — same no-shuffle
    * plumbing as [[decodeFeatures]], real header parse via
    * [[ImageIoCodec]], declared-metadata fallback for payloads the JDK
    * has no reader for. */
  def decodeMeta(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    media.mapPartitions(_.map(ImageIoCodec.decode))
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
