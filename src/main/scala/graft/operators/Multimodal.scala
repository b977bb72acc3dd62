package graft.operators

import java.nio.ByteBuffer

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus decode / frame-sample / resize operators.
  *
  * IMAGE decode is REAL: the JDK ships PNG/JPEG codecs (`javax.imageio`),
  * so [[imageMedia]] synthesizes genuine PNG AND JPEG payloads (format
  * cycles by id; the driver ships no binary table) and [[decodeImages]]
  * parses the actual bytes — width and height come from the container
  * header (PNG IHDR / JPEG SOF), channels from the decoded raster.
  * The planted-dimension scheme makes this oracle-checkable in an engine
  * with no codec: dimensions are a deterministic function of document
  * metadata, the PNG is encoded AT those dimensions, and DuckDB replays
  * the formula — a hash match proves the decoder recovered the planted
  * values from real bytes (the same certification pattern as the q12
  * approximate-stats booleans).
  *
  * AUDIO decode is REAL too: [[wavMedia]] hand-assembles genuine
  * RIFF/WAVE containers with planted PCM and [[decodeAudio]] parses
  * them through the JDK's independent `javax.sound` codec. VIDEO is
  * real at the CONTAINER level: [[Mp4]] builds genuine ISO-BMFF files
  * and [[demuxFrames]] resolves every frame's byte range from the
  * sample tables; only codec-level pixel decode of the extracted frames
  * remains out of scope (no JVM video codec — the one honest stub,
  * [[sampleFrames]], covers opaque non-container payloads). The
  * surrounding design — opaque binary end-to-end (no driver
  * materialization), `mapPartitions` micro-batches so a real codec
  * amortizes per-batch setup (model load, GPU transfer) the way
  * `mapInPandas`/`mapInArrow` batch Python UDFs, explode-per-frame
  * layout keeping downstream ops row-parallel — is what a pixel-codec
  * drop-in inherits unchanged.
  */
object Multimodal {

  final case class MediaMeta(n_bytes: Long, source: String)
  final case class MediaRecord(media_id: Long, kind: String,
                               payload: Array[Byte], meta: MediaMeta)
  final case class DecodedImage(media_id: Long, width: Long, height: Long,
                                channels: Long, content_hash: String)

  /** Synthesize a mixed-kind media table from `documents` (payload =
    * UTF-8 bytes of the text, kind cycles by id) — the audio/video
    * surface, where payloads stay opaque. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
                 (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      struct(length(col("text").cast("binary")).cast("long").as("n_bytes"),
             col("source").as("source")).as("meta"))

  /** Planted PNG dimensions: a pure function of (doc_id, n_chars) both
    * engines compute exactly — the ASCII corpus makes byte length = char
    * length, so DuckDB's `length(text)` matches. Range 8..55 keeps the
    * rasters tiny (≤ 55×55). */
  private[operators] def plantedWidth(nChars: Long): Int = (nChars % 48 + 8).toInt
  private[operators] def plantedHeight(id: Long): Int = (id % 48 + 8).toInt

  /** Real image media from `documents`: each payload is a genuine PNG or
    * JPEG container (encoded with the JDK codec, executor-side,
    * micro-batched — format cycles by id, so every corpus exercises BOTH
    * decode paths) whose dimensions are planted from document metadata.
    * Constant fill color derived from the id — content is irrelevant to
    * the decode contract, only the planted dimensions are, which is also
    * why JPEG's lossy pixel round-trip doesn't matter here: the container
    * header and raster geometry are lossless in both formats. */
  def imageMedia(docs: DataFrame, batchSize: Int = 64): Dataset[MediaRecord] =
    encodeImages(docs, batchSize, id => if (id % 2 == 0) "png" else "jpg")

  /** PNG-only variant of [[imageMedia]] (single-format corpora exist too;
    * the decode path is identical). */
  def pngMedia(docs: DataFrame, batchSize: Int = 64): Dataset[MediaRecord] =
    encodeImages(docs, batchSize, _ => "png")

  private def encodeImages(docs: DataFrame, batchSize: Int,
                           formatOf: Long => String): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // codec work must scale with CORES, not input splits (measured 2
    // scan partitions at sf1 — 30 of 32 cores idle through the encode,
    // 9.5s → 2.1s after spreading). The exchange moves three scalar
    // columns — negligible against the per-row codec cost.
    Parallelism.spreadToCores(
      docs.select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
                  col("source")))
      .as[(Long, Long, String)]
      .mapPartitions { it =>
        // no temp-file round-trip per encoded image (see decodeImages)
        javax.imageio.ImageIO.setUseCache(false)
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, nChars, source) =>
            val w = plantedWidth(nChars)
            val h = plantedHeight(id)
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
            // constant fill straight into the raster's backing byte array —
            // per-pixel setRGB was the measured encode bottleneck (150M
            // interpreted calls across a 50k-image corpus)
            val buf = img.getRaster.getDataBuffer
              .asInstanceOf[java.awt.image.DataBufferByte].getData
            val (rB, gB, bB) = (((id >> 16) & 0xff).toByte,
                                ((id >> 8) & 0xff).toByte, (id & 0xff).toByte)
            var i = 0
            while (i < buf.length) {
              buf(i) = bB; buf(i + 1) = gB; buf(i + 2) = rB; i += 3
            }
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, formatOf(id), baos)
            val bytes = baos.toByteArray
            MediaRecord(id, "image", bytes, MediaMeta(bytes.length.toLong, source))
          }
        }
      }
  }

  /** REAL image decode over the payload bytes: `javax.imageio` parses the
    * PNG/JPEG container — dimensions from the header, channel count from
    * the decoded raster, md5 of the payload as the content identity.
    * Micro-batched `mapPartitions` (the shape a native/GPU codec would
    * decode per batch). Fails loudly on an undecodable payload rather
    * than inventing metadata.
    *
    * Codec discipline (the part that matters at 10⁹ images): the
    * ImageIO DISK cache is off (its default wraps every input stream in
    * a temp FILE — one filesystem round-trip per image), and the
    * PNG/JPEG readers are instantiated once per task and re-used,
    * dispatched on the container magic bytes — `ImageIO.read` re-scans
    * the reader registry per call. Unknown containers fall back to the
    * registry path, so the accepted format set is unchanged. */
  def decodeImages(media: Dataset[MediaRecord],
                   batchSize: Int = 64): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      def readerFor(fmt: String) = {
        val rs = javax.imageio.ImageIO.getImageReadersByFormatName(fmt)
        if (rs.hasNext) Some(rs.next()) else None
      }
      val pngReader = readerFor("png")
      val jpgReader = readerFor("jpeg")
      def decode(payload: Array[Byte]): java.awt.image.BufferedImage = {
        val reader =
          if (payload.length >= 8 && (payload(0) & 0xff) == 0x89 &&
              payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G')
            pngReader
          else if (payload.length >= 2 && (payload(0) & 0xff) == 0xff &&
                   (payload(1) & 0xff) == 0xd8)
            jpgReader
          else None
        reader match {
          case Some(rd) =>
            val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(payload))
            try {
              rd.setInput(iis, true, true)
              rd.read(0)
            } finally iis.close()
          case None =>
            javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        }
      }
      it.grouped(batchSize).flatMap { batch =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        batch.map { r =>
          val img = decode(r.payload)
          if (img == null)
            throw new IllegalArgumentException(
              s"media ${r.media_id}: payload is not a decodable image " +
              "(javax.imageio found no reader)")
          digest.reset()
          val hash = digest.digest(r.payload).map("%02x".format(_)).mkString
          DecodedImage(r.media_id, img.getWidth.toLong, img.getHeight.toLong,
                       img.getRaster.getNumBands.toLong, hash)
        }
      }
    }
  }

  /** Oracle-facing projection of the real decode: the payload-dependent
    * content hash is dropped (no codec-free engine can recompute it);
    * what remains is exactly what the planted-dimension oracle certifies. */
  def decodeImageMeta(media: Dataset[MediaRecord]): DataFrame =
    decodeImages(media).toDF()
      .select(col("media_id"), col("width"), col("height"), col("channels"))

  // ------------------------------------------------------------- video

  /** Planted video geometry, pure functions of document metadata both
    * engines compute exactly (the image planted-dimension pattern):
    * frame count 1..7, per-frame sizes 16..128 bytes. */
  private[operators] def plantedFrameCount(id: Long): Int = (id % 7 + 1).toInt
  private[operators] def plantedFrameSize(id: Long, k: Int): Int =
    ((id * 31 + k * 17) % 113 + 16).toInt

  /** Real video media from `documents`: each payload is a genuine
    * single-track ISO-BMFF (MP4) container ([[Mp4.build]], executor-side,
    * micro-batched) whose sample tables index frames of planted count and
    * sizes. Multi-chunk files appear naturally (frame count > 4 splits
    * into two chunks), so the stsc/stco resolution path is exercised by
    * the corpus itself. */
  def mp4Media(docs: DataFrame, batchSize: Int = 64): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    Parallelism.spreadToCores(docs.select(col("doc_id"), col("source")))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, source) =>
            val frames = (0 until plantedFrameCount(id)).map { k =>
              val sz = plantedFrameSize(id, k)
              Array.tabulate[Byte](sz)(j => ((id * 131 + k * 29 + j) % 251).toByte)
            }
            val bytes = Mp4.build(frames)
            MediaRecord(id, "video", bytes, MediaMeta(bytes.length.toLong, source))
          }
        }
      }
  }

  final case class DemuxedFrame(media_id: Long, frame_idx: Long,
                                n_bytes: Long, pts_ms: Long,
                                keyframe: Boolean, frame_hash: String)

  /** REAL container demux over the payload bytes: [[Mp4.demux]] parses
    * the box tree and sample tables (stts/stsc/stsz/stco/stss) and
    * resolves every frame's exact byte range, pts, and sync flag; the
    * frame hash is md5 of the bytes actually sliced at that range, so a
    * wrong offset/size cannot hash-match. Cost is O(container metadata)
    * per file — frame payloads are never copied, only the matched
    * ranges are hashed. Codec-level pixel decode of the extracted
    * frames remains out of scope (no JVM video codec); a real codec
    * consumes exactly these (offset, size) slices. */
  def demuxFrames(media: Dataset[MediaRecord],
                  batchSize: Int = 64): Dataset[DemuxedFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { r =>
          Mp4.demux(r.payload).map { f =>
            digest.reset()
            digest.update(r.payload, f.offset.toInt, f.size.toInt)
            val hash = digest.digest().map("%02x".format(_)).mkString
            DemuxedFrame(r.media_id, f.idx.toLong, f.size, f.ptsMs,
                         f.keyframe, hash)
          }
        }
      }
    }
  }

  /** Oracle-facing projection of the real demux (the payload-dependent
    * frame hash is dropped; what remains is what the planted-geometry
    * oracle certifies). */
  def demuxFrameMeta(media: Dataset[MediaRecord]): DataFrame =
    demuxFrames(media).toDF()
      .select(col("media_id"), col("frame_idx"), col("n_bytes"),
              col("pts_ms"), col("keyframe"))

  // ---------------------------------------------------- video pixel path

  /** Planted per-frame pixel corpus: geometry and constant fill color of
    * frame `k` of video `id`, every value an exact integer formula both
    * engines replay. Rasters stay tiny (2..15 px per side). */
  private[operators] def plantedPxWidth(id: Long, k: Int): Int =
    ((id + 11 * k) % 14 + 2).toInt
  private[operators] def plantedPxHeight(id: Long, k: Int): Int =
    ((id * 3 + 7 * k) % 14 + 2).toInt
  private[operators] def plantedPxColor(id: Long, k: Int): (Int, Int, Int) =
    (((id * 13 + k * 7) % 256).toInt,
     ((id * 5 + k * 3) % 256).toInt,
     ((id + k) % 256).toInt)

  /** MP4 corpus whose frame payloads are REAL PNGs: same genuine
    * ISO-BMFF container as [[mp4Media]], but each sample is a JDK-encoded
    * PNG of planted geometry and planted constant fill — the fixture
    * that lets [[decodeFrames]] exercise codec-level pixel decode of
    * DEMUXED ranges end to end (PNG is lossless, so the planted color
    * survives the round trip bit-exactly). */
  def mp4PngMedia(docs: DataFrame, batchSize: Int = 64): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    Parallelism.spreadToCores(docs.select(col("doc_id"), col("source")))
      .as[(Long, String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, source) =>
            val frames = (0 until plantedFrameCount(id)).map { k =>
              val (w, h) = (plantedPxWidth(id, k), plantedPxHeight(id, k))
              val (r, g, b) = plantedPxColor(id, k)
              val img = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
              val buf = img.getRaster.getDataBuffer
                .asInstanceOf[java.awt.image.DataBufferByte].getData
              var i = 0
              while (i < buf.length) {
                buf(i) = b.toByte; buf(i + 1) = g.toByte; buf(i + 2) = r.toByte
                i += 3
              }
              val baos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", baos)
              baos.toByteArray
            }
            val bytes = Mp4.build(frames)
            MediaRecord(id, "video", bytes, MediaMeta(bytes.length.toLong, source))
          }
        }
      }
  }

  final case class DecodedFrame(media_id: Long, frame_idx: Long,
                                width: Long, height: Long, channels: Long,
                                px_r: Long, px_g: Long, px_b: Long)

  /** PIXEL DECODE of demuxed video frames — the former honest stub,
    * closed: [[Mp4.demux]] resolves each sample's exact `(offset, size)`
    * from the container's sample tables, the byte slice at that range
    * feeds the SAME JDK ImageIO path still images use, and the decoded
    * raster's geometry plus constant fill color are emitted per frame.
    * The result BINDS pixels to the demuxed ranges: a wrong offset or
    * size is not a valid PNG (the codec fails loudly, never invents
    * pixels), and a right range with wrong decoded content misses the
    * planted-color oracle hash. The constant-fill invariant of the
    * corpus is VERIFIED over every pixel, not sampled — a torn slice
    * that still parses cannot sneak through as "close enough".
    *
    * Same scale shape as the other codec kernels: micro-batched
    * `mapPartitions`, payloads never leave the executor, cost ∝ decoded
    * pixels. A production H.264/AV1 codec consumes exactly these
    * slices; the container walk, range math, and batch plumbing are
    * codec-independent. */
  def decodeFrames(media: Dataset[MediaRecord],
                   batchSize: Int = 64): Dataset[DecodedFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { r =>
          Mp4.demux(r.payload).map { f =>
            val slice = java.util.Arrays.copyOfRange(
              r.payload, f.offset.toInt, (f.offset + f.size).toInt)
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(slice))
            if (img == null) throw new IllegalArgumentException(
              s"media ${r.media_id} frame ${f.idx}: demuxed range " +
                s"[${f.offset}, ${f.offset + f.size}) is not a decodable image")
            val (w, h) = (img.getWidth, img.getHeight)
            val rgb0 = img.getRGB(0, 0)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                if (img.getRGB(x, y) != rgb0) throw new IllegalStateException(
                  s"media ${r.media_id} frame ${f.idx}: non-constant fill at " +
                    s"($x,$y) — decoded pixels disagree with the planted corpus")
                x += 1
              }
              y += 1
            }
            DecodedFrame(r.media_id, f.idx.toLong, w.toLong, h.toLong,
              img.getRaster.getNumBands.toLong,
              (rgb0 >> 16) & 0xff, (rgb0 >> 8) & 0xff, rgb0 & 0xff)
          }
        }
      }
    }
  }

  /** Oracle-facing projection of the pixel decode (all columns are
    * planted-formula replayable; nothing to drop — kept for symmetry
    * with the other meta projections). */
  def decodeFrameMeta(media: Dataset[MediaRecord]): DataFrame =
    decodeFrames(media).toDF()

  // ------------------------------------------------------------- audio

  /** Planted audio geometry: sample count 160..479 at a fixed 8 kHz
    * mono 16-bit format; sample k's amplitude is an exact integer
    * formula in (doc_id, k), so peak/sum-of-abs statistics replay in
    * SQL with no floating point anywhere. */
  private[operators] val AudioSampleRate = 8000
  private[operators] def plantedSampleCount(id: Long): Int = (id % 320 + 160).toInt
  private[operators] def plantedSample(id: Long, k: Int): Int =
    ((id * 37 + k * 11) % 2048 - 1024).toInt

  /** Hand-assembled RIFF/WAVE container (PCM 16-bit LE): the writer
    * emits raw bytes with no library involved, so the decode side's
    * `javax.sound` parse is a genuine cross-implementation check. */
  private def buildWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1)                            // PCM
    buf.putShort(1)                            // mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2)                 // byte rate
    buf.putShort(2)                            // block align
    buf.putShort(16)                           // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Real audio media from `documents`: each payload is a genuine WAV
    * container with planted PCM content (executor-side, micro-batched —
    * the image/video synthesis pattern, third modality). */
  def wavMedia(docs: DataFrame, batchSize: Int = 64): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    Parallelism.spreadToCores(docs.select(col("doc_id"), col("source")))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, source) =>
            val samples = Array.tabulate[Short](plantedSampleCount(id))(
              k => plantedSample(id, k).toShort)
            val bytes = buildWav(samples, AudioSampleRate)
            MediaRecord(id, "audio", bytes, MediaMeta(bytes.length.toLong, source))
          }
        }
      }
  }

  final case class DecodedAudio(media_id: Long, sample_rate: Long,
                                channels: Long, n_samples: Long,
                                duration_ms: Long, peak_amp: Long,
                                sum_abs: Long, content_hash: String)

  /** Parsed WAV facts: format fields from the `fmt ` chunk, amplitude
    * statistics over the `data` chunk's 16-bit LE PCM in exact integer
    * arithmetic. */
  private[operators] final case class WavFacts(
      sampleRate: Long, channels: Long, frames: Long,
      peakAmp: Long, sumAbs: Long)

  /** RIFF/WAVE chunk-walk parser, 16-bit signed PCM only (anything else
    * fails loudly rather than inventing amplitudes). Hot-path choice:
    * `AudioSystem.getAudioInputStream` consults the provider REGISTRY
    * per call — every non-WAV reader (AIFF, AU) rejects by throwing,
    * so decoding a 640-byte payload cost two constructed exceptions and
    * a registry walk (~160 µs/file measured at sf1 — 8 s of a 50 k-file
    * corpus, vs ~0.5 s for the direct parse). The JDK codec remains the
    * independent cross-check: WavSpec decodes the same corpus through
    * `javax.sound` and asserts identical facts. */
  private[operators] def parseWav(payload: Array[Byte], ctx: => String): WavFacts = {
    def fail(msg: String) = sys.error(s"$ctx: $msg")
    def u16(o: Int): Int = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = (payload(o) & 0xffL) | ((payload(o + 1) & 0xffL) << 8) |
      ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
    def tag(o: Int): String = new String(payload, o, 4, "US-ASCII")
    if (payload.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE")
      fail("not a RIFF/WAVE container")
    var fmtSeen = false
    var sampleRate = 0L; var channels = 0
    var dataOff = -1; var dataLen = 0
    var p = 12
    while (p + 8 <= payload.length) {
      // chunk size stays a Long END TO END: a hostile size >= 2^31 cast
      // to Int goes negative, slips past this bounds check, and then
      // either never advances p (infinite loop pinning the executor) or
      // yields a negative dataLen (silent 0-sample "success") — both
      // violations of this parser's fail-loudly contract
      val id = tag(p); val size = u32(p + 4)
      if (p.toLong + 8L + size > payload.length) fail(
        s"chunk '$id' claims $size bytes past end of payload")
      id match {
        case "fmt " =>
          if (size < 16L) fail("fmt chunk too short")
          val audioFormat = u16(p + 8)
          channels = u16(p + 10)
          sampleRate = u32(p + 12)
          val bits = u16(p + 22)
          if (audioFormat != 1 || bits != 16) fail(
            s"unsupported audio format (format=$audioFormat bits=$bits; " +
              "16-bit signed PCM only)")
          fmtSeen = true
        case "data" =>
          dataOff = p + 8; dataLen = size.toInt // bounds-checked above: fits Int
        case _ => () // LIST/INFO etc: skipped, as any RIFF reader must
      }
      p += (8L + size + (size & 1L)).toInt // chunks are word-aligned; fits: checked
    }
    if (!fmtSeen) fail("no fmt chunk")
    if (dataOff < 0) fail("no data chunk")
    if (channels <= 0) fail("fmt chunk declares zero channels")
    if (sampleRate <= 0) fail("fmt chunk declares zero sample rate")
    val n = dataLen / 2
    var peak = 0L; var sumAbs = 0L
    var i = 0
    while (i < n) {
      val v = ((payload(dataOff + 2 * i + 1) << 8) |
               (payload(dataOff + 2 * i) & 0xff)).toShort.toInt
      val a = math.abs(v.toLong)
      if (a > peak) peak = a
      sumAbs += a
      i += 1
    }
    WavFacts(sampleRate, channels.toLong, n.toLong / channels, peak, sumAbs)
  }

  /** REAL audio decode over the payload bytes: the RIFF header yields
    * the format facts, the PCM data the amplitude statistics —
    * [[parseWav]] does the container walk (see there for why not
    * `AudioSystem` on the hot path; the JDK codec cross-validates the
    * same corpus in WavSpec). */
  def decodeAudio(media: Dataset[MediaRecord],
                  batchSize: Int = 64): Dataset[DecodedAudio] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val w = parseWav(r.payload, s"media ${r.media_id}")
          digest.reset()
          val hash = digest.digest(r.payload).map("%02x".format(_)).mkString
          DecodedAudio(r.media_id, w.sampleRate, w.channels, w.frames,
            w.frames * 1000L / w.sampleRate, w.peakAmp, w.sumAbs, hash)
        }
      }
    }
  }

  /** Oracle-facing projection (payload hash dropped, as with images). */
  def decodeAudioMeta(media: Dataset[MediaRecord]): DataFrame =
    decodeAudio(media).toDF()
      .select(col("media_id"), col("sample_rate"), col("channels"),
              col("n_samples"), col("duration_ms"), col("peak_amp"),
              col("sum_abs"))

  // ---------------------------------------------------------------- STUB
  /** Frame sampling for OPAQUE video payloads: one output row per sampled
    * frame, n_frames = n_bytes % 7 + 1 (STUB for container-derived frame
    * count — kept for payloads that are not containerized; for real
    * ISO-BMFF payloads use [[demuxFrames]], which parses the actual
    * sample tables), frame hash binds payload identity to the frame
    * index. */
  def sampleFrames(media: DataFrame): DataFrame = {
    val nFrames = (col("meta.n_bytes") % 7 + 1).cast("int")
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("payload"),
              explode(sequence(lit(0), nFrames - 1)).as("frame_idx"))
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
              md5(concat(col("payload").cast("string"), lit("#"),
                         col("frame_idx").cast("string"))).as("frame_hash"))
  }
  // --------------------------------------------------------------- /STUB

  /** Metadata-level resize: recompute target dimensions preserving aspect
    * ratio against a bounding box (pure arithmetic — runs at scan speed).
    * Composes with the real decode: width/height are the actual decoded
    * dimensions. */
  def resizeMeta(decoded: DataFrame, maxDim: Long): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim.toDouble) / greatest(col("width"), col("height")))
    decoded.select(
      col("media_id"), col("width"), col("height"),
      floor(col("width") * scale).cast("long").as("out_width"),
      floor(col("height") * scale).cast("long").as("out_height"),
      round(scale, 6).as("scale"))
  }

  /** Typed view of the synthesized mixed-kind media table. */
  def mediaDataset(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    fromDocuments(docs).as[MediaRecord]
  }
}
