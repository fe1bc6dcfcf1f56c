package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` payloads with
  * typed metadata, processed per-partition in batches.
  *
  * The Spark-side plumbing is real — schema, partition-preserving
  * batch iteration, deterministic outputs. Image METADATA decode is
  * real ([[ImageIoCodec.imageMeta]] header-parses PNG/JPEG/GIF/BMP via
  * `javax.imageio` — ships in the JDK, no external libraries), and so
  * are PIXEL features for images of ANY size: [[decodePixels]] rasters
  * the payload in full within the memory cap and through uniform
  * source subsampling above it (bounded raster, estimated means —
  * `exact_pixels` says which), reporting mean-R/G/B and Rec.601 luma.
  * What remains a STUB is audio/video SAMPLE-level feature extraction:
  * this container has no media libraries beyond the JDK, so
  * [[StubCodec.decode]] derives features from the raw bytes (byte
  * histogram standing in for a sample histogram). Swapping in a full
  * codec (JavaCV, TwelveMonkeys, ffmpeg-over-pipe) changes ONLY that
  * function — batch shape, schema, and distribution are unchanged.
  *
  * Audio METADATA is real too ([[AudioIoCodec.audioMeta]]): the JDK
  * ships WAV/AIFF/AU parsers in `javax.sound.sampled`, so container
  * type, encoding, sample rate, channels, bit depth, and frame count
  * come from `AudioSystem.getAudioFileFormat` — a header parse, no
  * sample decode. Video CONTAINER metadata is real as well
  * ([[IsoBmffCodec.videoMeta]]): MP4/MOV duration, dimensions, codec
  * fourcc, and track count via a pure-JDK ISO-BMFF box parse. The
  * remaining stub surface is codec-level feature extraction (video
  * frame raster, audio sample decode) only.
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
              // 0 = "unknown", documented: a reader that can size the
              // image but advertises no image type gives no band count;
              // -1 would read as a valid-looking sentinel downstream.
              val channels =
                if (types.hasNext) types.next().getNumBands else 0
              Some((w, h, channels))
            } finally reader.dispose()
          }
        } finally iis.close()
      } catch { case _: Exception => None }
    }

    /** Raster memory cap: a decoded ARGB raster costs 4 bytes/pixel of
      * executor heap, so an unbounded `ImageIO.read` on adversarial
      * dimensions (a 1 GB decompression-bomb PNG header claiming
      * 50k×50k) would OOM the task. 1 MPix ≈ 4 MB raster — safe at
      * full mapPartitions parallelism. Images ABOVE the cap are not
      * skipped: they decode through `ImageReadParam.setSourceSubsampling`
      * with the smallest step whose subsampled raster fits the cap, so
      * the RASTER memory stays bounded while the means become a
      * uniform-grid estimate (`PixelStats.exact = false`). */
    val DefaultMaxDecodePixels: Long = 1L << 20

    /** Header claims beyond this (16 Gpix) are refused outright: even a
      * subsampled read must inflate every source row CPU-wise, and a
      * fabricated petapixel header would pin a task on pure decode. */
    val HardMaxSourcePixels: Long = 1L << 34

    /** Pixel statistics for one image. `width`/`height` are the FULL
      * source dimensions (from the header) even when the raster was
      * subsampled; `exact` says whether the means cover every pixel
      * (step 1) or a uniform step×step grid sample. */
    final case class PixelStats(
        width: Int,
        height: Int,
        meanR: Double,
        meanG: Double,
        meanB: Double,
        meanLuma: Double,
        exact: Boolean)

    /** REAL pixel statistics — mean R/G/B and Rec.601 luma — for ANY
      * JDK-decodable image. Within `maxPixels` the raster is read in
      * full (exact means); above it the reader decodes a uniformly
      * subsampled grid sized to the cap (estimated means, bounded
      * memory) — the standard estimator for channel statistics over
      * images too large to raster whole. None for non-images, refused
      * oversize headers, or payloads the reader sizes but cannot
      * raster. */
    def pixelStats(bytes: Array[Byte], maxPixels: Long = DefaultMaxDecodePixels)
        : Option[PixelStats] = {
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
              val pixels = w.toLong * h
              if (pixels <= 0 || pixels > HardMaxSourcePixels) None
              else {
                val step = math.max(1,
                  math.ceil(math.sqrt(pixels.toDouble / maxPixels)).toInt)
                val param = reader.getDefaultReadParam
                if (step > 1) param.setSourceSubsampling(step, step, 0, 0)
                val img = reader.read(0, param)
                if (img == null) None
                else {
                  val sw = img.getWidth
                  val sh = img.getHeight
                  var sr = 0.0; var sg = 0.0; var sb = 0.0
                  val row = new Array[Int](sw)
                  var y = 0
                  while (y < sh) {
                    img.getRGB(0, y, sw, 1, row, 0, sw)
                    var x = 0
                    while (x < sw) {
                      val p = row(x)
                      sr += (p >> 16) & 0xff
                      sg += (p >> 8) & 0xff
                      sb += p & 0xff
                      x += 1
                    }
                    y += 1
                  }
                  val n = sw.toDouble * sh
                  if (n <= 0) None
                  else {
                    val (mr, mg, mb) = (sr / n, sg / n, sb / n)
                    Some(PixelStats(w, h, mr, mg, mb,
                      0.299 * mr + 0.587 * mg + 0.114 * mb,
                      exact = step == 1))
                  }
                }
              }
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

  /** Real pixel features when the payload is a JDK-decodable image:
    * exact channel means within the raster cap, uniform-grid estimates
    * above it (`exact_pixels = false` — bounded memory via source
    * subsampling). Header/declared fallback for non-images
    * (`decoded_pixels = false`, means 0.0 — read the flag, not the
    * zeros). */
  final case class PixelFeatures(
      media_id: Long,
      kind: String,
      decoded_pixels: Boolean,
      exact_pixels: Boolean,
      width: Int,
      height: Int,
      mean_r: Double,
      mean_g: Double,
      mean_b: Double,
      mean_luma: Double,
      n_bytes: Long)

  /** Mean-RGB / luma per image ([[ImageIoCodec.pixelStats]]): full
    * decode within `maxPixels`, subsampled decode above it — same
    * no-shuffle mapPartitions plumbing as [[decodeMeta]]; the raster
    * cap means one poison row can't OOM a task at any claimed size. */
  def decodePixels(media: Dataset[MediaRecord],
      maxPixels: Long = ImageIoCodec.DefaultMaxDecodePixels)(
      implicit spark: SparkSession): Dataset[PixelFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      ImageIoCodec.pixelStats(r.payload, maxPixels) match {
        case Some(ps) =>
          PixelFeatures(r.media_id, r.kind, decoded_pixels = true,
            exact_pixels = ps.exact, ps.width, ps.height,
            ps.meanR, ps.meanG, ps.meanB, ps.meanLuma,
            r.payload.length.toLong)
        case None =>
          val (w, h) = ImageIoCodec.imageMeta(r.payload)
            .map { case (w0, h0, _) => (w0, h0) }
            .getOrElse((r.declared_width, r.declared_height))
          PixelFeatures(r.media_id, r.kind, decoded_pixels = false,
            exact_pixels = false, w, h, 0.0, 0.0, 0.0, 0.0,
            r.payload.length.toLong)
      }
    })
  }

  /** Audio metadata decoded for real from the container header — the
    * audio twin of [[MediaMeta]]. `frame_count` is -1 when the header
    * does not declare it (streamed/truncated containers);
    * `duration_sec` is derived (frames / frame rate) and -1.0 when
    * either side is unknown. */
  final case class AudioMeta(
      media_id: Long,
      kind: String,
      decoded: Boolean,
      container: String, // WAVE | AIFF | AU
      encoding: String, // PCM_SIGNED | ULAW | ...
      sample_rate: Double,
      channels: Int,
      bit_depth: Int,
      frame_count: Long,
      duration_sec: Double,
      n_bytes: Long)

  /** REAL codec for the audio containers the JDK ships parsers for
    * (WAV, AIFF, AU — `javax.sound.sampled`, no external libraries).
    * `AudioSystem.getAudioFileFormat` reads the CONTAINER HEADER only
    * (RIFF/FORM/.snd chunks): sample rate, channels, bit depth, and
    * frame count cost header bytes, not sample-decode CPU — the same
    * 100 TB story as [[ImageIoCodec.imageMeta]]. Payloads no provider
    * claims return None and the caller keeps declared metadata. */
  object AudioIoCodec {

    /** (container, encoding, sampleRate, channels, bitDepth, frames)
      * from the audio header, or None. ByteArrayInputStream supports
      * mark/reset, which `getAudioFileFormat(InputStream)` requires. */
    def audioMeta(bytes: Array[Byte])
        : Option[(String, String, Double, Int, Int, Long)] = {
      if (bytes == null || bytes.length == 0) return None
      try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(bytes))
        val f = aff.getFormat
        Some((aff.getType.toString, f.getEncoding.toString,
          f.getSampleRate.toDouble, f.getChannels, f.getSampleSizeInBits,
          aff.getFrameLength.toLong))
      } catch {
        // UnsupportedAudioFileException for non-audio payloads; any
        // IO/parse failure means "not decodable", same as ImageIoCodec.
        case _: Exception => None
      }
    }

    def decode(r: MediaRecord): AudioMeta = audioMeta(r.payload) match {
      case Some((container, enc, rate, ch, bits, frames)) =>
        val dur =
          if (frames >= 0 && rate > 0) frames / rate else -1.0
        AudioMeta(r.media_id, r.kind, decoded = true, container, enc,
          rate, ch, bits, frames, dur, r.payload.length.toLong)
      case None =>
        AudioMeta(r.media_id, r.kind, decoded = false, "", "",
          -1.0, 0, 0, -1L, -1.0, r.payload.length.toLong)
    }
  }

  /** Decode real audio metadata per partition — same no-shuffle
    * plumbing as [[decodeMeta]], real header parse via
    * [[AudioIoCodec]]. */
  def decodeAudioMeta(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[AudioMeta] = {
    import spark.implicits._
    media.mapPartitions(_.map(AudioIoCodec.decode))
  }

  /** Video container metadata decoded for real from the ISO-BMFF
    * (MP4/MOV) header — the video twin of [[MediaMeta]]/[[AudioMeta]].
    * `duration_sec`/`width`/`height` are -1/-1/-1 when the container
    * does not declare them. */
  final case class VideoMeta(
      media_id: Long,
      kind: String,
      decoded: Boolean,
      brand: String, // ftyp major brand ("isom", "mp42", "qt  ", ...)
      duration_sec: Double,
      width: Int,
      height: Int,
      codec: String, // sample-entry fourcc: avc1, hvc1, vp09, ...
      n_tracks: Int,
      n_bytes: Long)

  /** REAL codec for MP4/MOV container METADATA — a pure-JDK byte parse
    * of the ISO-BMFF box structure (ISO/IEC 14496-12, a published
    * public format; the audio precedent from round 7). The file is a
    * sequence of `[u32 size][4cc type]` boxes; `moov/mvhd` carries
    * duration+timescale, `moov/trak/tkhd` carries 16.16-fixed
    * width/height, `trak/mdia/hdlr` distinguishes the video track,
    * and `stbl/stsd`'s first sample entry names the codec fourcc.
    * Header-only — ~1 KB of byte arithmetic per file, no sample
    * decode, no media libraries: the same 100 TB cost story as
    * [[ImageIoCodec.imageMeta]]. Payloads that are not ISO-BMFF (no
    * parseable `moov`) return None and the caller keeps declared
    * metadata. Codec FEATURE extraction (frame raster) remains out of
    * scope for this container — see the class scaladoc. */
  object IsoBmffCodec {

    private def u32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

    private def u64(b: Array[Byte], o: Int): Long =
      (u32(b, o) << 32) | u32(b, o + 4)

    private def fourcc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

    /** A box's payload span (after the 8- or 16-byte header). */
    private final case class Box(typ: String, start: Int, end: Int)

    /** Parse the box sequence in [from, to). Malformed sizes terminate
      * the walk rather than throw — truncated files yield whatever
      * prefix parsed. */
    private def boxes(b: Array[Byte], from: Int, to: Int): List[Box] = {
      val out = List.newBuilder[Box]
      var o = from
      var ok = true
      while (ok && o + 8 <= to) {
        var size = u32(b, o)
        var hdr = 8
        val typ = fourcc(b, o + 4)
        if (size == 1 && o + 16 <= to) { size = u64(b, o + 8); hdr = 16 }
        else if (size == 0) size = (to - o).toLong // "to end of file"
        if (size < hdr || o + size > to) ok = false
        else {
          out += Box(typ, o + hdr, o + size.toInt)
          o += size.toInt
        }
      }
      out.result()
    }

    private def child(b: Array[Byte], parent: Box, typ: String): Option[Box] =
      boxes(b, parent.start, parent.end).find(_.typ == typ)

    /** (brand, durationSec, width, height, codecFourcc, nTracks) from
      * the container header, or None when no parseable `moov` exists. */
    def videoMeta(bytes: Array[Byte])
        : Option[(String, Double, Int, Int, String, Int)] = {
      if (bytes == null || bytes.length < 16) return None
      try {
        val top = boxes(bytes, 0, bytes.length)
        val moov = top.find(_.typ == "moov").getOrElse(return None)
        val brand = top.find(_.typ == "ftyp")
          .filter(f => f.end - f.start >= 4)
          .map(f => fourcc(bytes, f.start))
          .getOrElse("") // bare QuickTime files may lack ftyp
        // mvhd: v0 = ts@12 dur@16 (u32); v1 = ts@20 dur@24 (u64);
        // offsets relative to the payload, after version(1)+flags(3).
        val duration = child(bytes, moov, "mvhd").flatMap { m =>
          val v = bytes(m.start) & 0xff
          val (tsOff, durOff) = if (v == 1) (20, 24) else (12, 16)
          if (m.end - m.start < durOff + (if (v == 1) 8 else 4)) None
          else {
            val ts = u32(bytes, m.start + tsOff)
            val dur =
              if (v == 1) u64(bytes, m.start + durOff)
              else u32(bytes, m.start + durOff)
            if (ts > 0) Some(dur.toDouble / ts) else None
          }
        }
        val traks = boxes(bytes, moov.start, moov.end).filter(_.typ == "trak")
        // Per track: handler type (vide/soun), tkhd dimensions, stsd fourcc.
        val parsed = traks.map { trak =>
          val mdia = child(bytes, trak, "mdia")
          val handler = mdia.flatMap(child(bytes, _, "hdlr"))
            .filter(h => h.end - h.start >= 12)
            .map(h => fourcc(bytes, h.start + 8))
          val dims = child(bytes, trak, "tkhd").flatMap { t =>
            val v = bytes(t.start) & 0xff
            // width/height are 16.16 fixed at payload offset 76 (v0)
            // / 88 (v1): version+flags(4) + times+ids(20 or 32) +
            // reserved(8)+layer(2)+alt(2)+volume(2)+reserved(2)+matrix(36).
            val wOff = if (v == 1) 88 else 76
            if (t.end - t.start < wOff + 8) None
            else Some(((u32(bytes, t.start + wOff) >> 16).toInt,
              (u32(bytes, t.start + wOff + 4) >> 16).toInt))
          }
          val codec = mdia.flatMap(child(bytes, _, "minf"))
            .flatMap(child(bytes, _, "stbl"))
            .flatMap(child(bytes, _, "stsd"))
            // stsd payload: version+flags(4) entry_count(4), then the
            // first sample entry's [u32 size][4cc format].
            .filter(s => s.end - s.start >= 16)
            .map(s => fourcc(bytes, s.start + 12))
          (handler, dims, codec)
        }
        val video = parsed.find(_._1.contains("vide"))
          .orElse(parsed.find(_._2.exists(d => d._1 > 0 && d._2 > 0)))
        val (w, h) = video.flatMap(_._2).getOrElse((-1, -1))
        val codec = video.flatMap(_._3).getOrElse("")
        Some((brand, duration.getOrElse(-1.0), w, h, codec, traks.length))
      } catch { case _: Exception => None }
    }

    def decode(r: MediaRecord): VideoMeta = videoMeta(r.payload) match {
      case Some((brand, dur, w, h, codec, n)) =>
        VideoMeta(r.media_id, r.kind, decoded = true, brand, dur, w, h,
          codec, n, r.payload.length.toLong)
      case None =>
        VideoMeta(r.media_id, r.kind, decoded = false, "", -1.0,
          r.declared_width, r.declared_height, "", 0,
          r.payload.length.toLong)
    }
  }

  /** Decode real video container metadata per partition — same
    * no-shuffle plumbing as [[decodeMeta]]/[[decodeAudioMeta]], real
    * ISO-BMFF header parse via [[IsoBmffCodec]]. */
  def decodeVideoMeta(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[VideoMeta] = {
    import spark.implicits._
    media.mapPartitions(_.map(IsoBmffCodec.decode))
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
