package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Multimodal
import graft.sources.Sources.table

/** Multimodal queries.
  *
  * x17/x19 run the REAL `javax.imageio` path over a MIXED-FORMAT corpus:
  * payloads are genuine PNG and JPEG containers ([[Multimodal.imageMedia]]
  * — format cycles by id) whose dimensions are planted from document
  * metadata, and the decode parses the actual bytes. DuckDB has no codec,
  * so the oracle replays the planted-dimension formula — the hash match
  * proves the decoder recovered the planted values from the real
  * container headers (PNG IHDR / JPEG SOF), i.e. it is
  * container-agnostic, not PNG-trained. Dimensions and channel count are
  * lossless in both formats, so the oracle is format-independent.
  *
  * x18 (video frames) stays on the honest stub surface for OPAQUE
  * payloads: media synthesized from text bytes (the ASCII corpus makes
  * byte length = char length, so the oracle derives identical metadata
  * from `length(text)`/`md5(text)`). x73 is the real-container version
  * (genuine MP4s, sample-table demux) and x74 the real audio version
  * (genuine WAVs, JDK codec decode) — both planted-value certified.
  */
object MultimodalQueries extends QueryPack {

  private def media(s: SparkSession, d: String): DataFrame =
    Multimodal.fromDocuments(table(s, d, "documents"))

  /** Encoded image corpora materialized this JVM, keyed by path (which
    * embeds the fixture dir). A media corpus is stored once and decoded
    * many times — re-synthesizing 50k PNG/JPEG containers per action
    * made x17/x19 measure the ENCODE of the test corpus instead of the
    * decode operator under test (Bench's warm rep pays the one-time
    * write; the timed reps then time the decode path). Per-JVM so a
    * stale warehouse from an earlier round never serves wrong bytes. */
  private val builtMedia = scala.collection.mutable.HashSet.empty[String]

  private def imageMediaTable(s: SparkSession,
                              d: String): org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = synchronized {
    val path = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"),
      "graft_image_media_" + d.replaceAll("[^A-Za-z0-9.]", "_")).toString
    if (!builtMedia.contains(path)) {
      Multimodal.imageMedia(table(s, d, "documents"))
        .write.mode("overwrite").parquet(path)
      builtMedia += path
    }
    import s.implicits._
    // respread: the stored corpus reads as few splits; decode cost must
    // scale with cores
    graft.operators.Parallelism.spreadToCores(s.read.parquet(path))
      .as[Multimodal.MediaRecord]
  }

  private[queries] def mp4MediaTable(s: SparkSession,
                            d: String): org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = synchronized {
    val path = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"),
      "graft_mp4_media_" + d.replaceAll("[^A-Za-z0-9.]", "_")).toString
    if (!builtMedia.contains(path)) {
      Multimodal.mp4Media(table(s, d, "documents"))
        .write.mode("overwrite").parquet(path)
      builtMedia += path
    }
    import s.implicits._
    graft.operators.Parallelism.spreadToCores(s.read.parquet(path))
      .as[Multimodal.MediaRecord]
  }

  /** MP4 corpus with REAL PNG frame payloads — the pixel-decode fixture
    * (x80); materialized once per JVM like the other media tables. */
  private def mp4PngMediaTable(s: SparkSession,
                               d: String): org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = synchronized {
    val path = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"),
      "graft_mp4png_media_" + d.replaceAll("[^A-Za-z0-9.]", "_")).toString
    if (!builtMedia.contains(path)) {
      Multimodal.mp4PngMedia(table(s, d, "documents"))
        .write.mode("overwrite").parquet(path)
      builtMedia += path
    }
    import s.implicits._
    graft.operators.Parallelism.spreadToCores(s.read.parquet(path))
      .as[Multimodal.MediaRecord]
  }

  private[queries] def wavMediaTable(s: SparkSession,
                                     d: String): org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = synchronized {
    val path = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"),
      "graft_wav_media_" + d.replaceAll("[^A-Za-z0-9.]", "_")).toString
    if (!builtMedia.contains(path)) {
      Multimodal.wavMedia(table(s, d, "documents"))
        .write.mode("overwrite").parquet(path)
      builtMedia += path
    }
    import s.implicits._
    graft.operators.Parallelism.spreadToCores(s.read.parquet(path))
      .as[Multimodal.MediaRecord]
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // REAL audio decode: payloads are genuine hand-assembled RIFF/WAV
    // containers with planted PCM; the engine decodes them through the
    // JDK's own WAV codec (javax.sound — an independent implementation
    // from the writer), reporting header facts and exact-integer
    // amplitude statistics the oracle replays from the planted formula.
    "x74_audio_decode" -> ((s: SparkSession, d: String) =>
      Multimodal.decodeAudioMeta(wavMediaTable(s, d))),

    // REAL ISO-BMFF demux: payloads are genuine MP4 containers whose
    // sample tables index planted frames; the engine parses the actual
    // box tree (stts/stsc/stsz/stco/stss) and resolves every frame's
    // byte range, pts and sync flag. DuckDB has no demuxer, so the
    // oracle replays the planted-geometry formula — a hash match proves
    // the demuxer recovered the planted values from real container
    // bytes (the x17 certification pattern, one level down the stack).
    "x73_video_demux" -> ((s: SparkSession, d: String) =>
      Multimodal.demuxFrameMeta(mp4MediaTable(s, d))),

    // Codec-level PIXEL DECODE of demuxed frames (the former honest
    // stub, closed): demux resolves each frame's (offset, size), the
    // slice decodes through the same ImageIO path as still images, and
    // the oracle replays the planted geometry AND constant fill color —
    // a hash match binds decoded pixels to the demuxed byte ranges.
    "x80_frame_pixels" -> ((s: SparkSession, d: String) =>
      Multimodal.decodeFrameMeta(mp4PngMediaTable(s, d))),

    "x17_multimodal_decode" -> ((s: SparkSession, d: String) =>
      Multimodal.decodeImageMeta(imageMediaTable(s, d))),

    "x18_multimodal_frames" -> ((s: SparkSession, d: String) =>
      Multimodal.sampleFrames(media(s, d))),

    "x19_multimodal_resize" -> ((s: SparkSession, d: String) =>
      Multimodal.resizeMeta(
        Multimodal.decodeImageMeta(imageMediaTable(s, d)), maxDim = 32)))

  override val oracleSql: Map[String, String] = Map(
    "x74_audio_decode" ->
      """WITH s AS (
        |  SELECT d.doc_id, abs((d.doc_id * 37 + t.k * 11) % 2048 - 1024) AS a
        |  FROM documents d, unnest(range(d.doc_id % 320 + 160)) AS t(k))
        |SELECT doc_id AS media_id, 8000::BIGINT AS sample_rate,
        |  1::BIGINT AS channels, count(*)::BIGINT AS n_samples,
        |  (count(*) * 1000 // 8000)::BIGINT AS duration_ms,
        |  max(a)::BIGINT AS peak_amp, sum(a)::BIGINT AS sum_abs
        |FROM s GROUP BY doc_id""".stripMargin,

    "x73_video_demux" ->
      """SELECT d.doc_id AS media_id, t.k AS frame_idx,
        |  (d.doc_id * 31 + t.k * 17) % 113 + 16 AS n_bytes,
        |  t.k * 40 AS pts_ms,
        |  t.k % 3 = 0 AS keyframe
        |FROM documents d, unnest(range(d.doc_id % 7 + 1)) AS t(k)""".stripMargin,

    "x80_frame_pixels" ->
      """SELECT d.doc_id AS media_id, t.k AS frame_idx,
        |  ((d.doc_id + 11 * t.k) % 14 + 2)::BIGINT AS width,
        |  ((d.doc_id * 3 + 7 * t.k) % 14 + 2)::BIGINT AS height,
        |  3::BIGINT AS channels,
        |  ((d.doc_id * 13 + t.k * 7) % 256)::BIGINT AS px_r,
        |  ((d.doc_id * 5 + t.k * 3) % 256)::BIGINT AS px_g,
        |  ((d.doc_id + t.k) % 256)::BIGINT AS px_b
        |FROM documents d, unnest(range(d.doc_id % 7 + 1)) AS t(k)""".stripMargin,

    // The planted-dimension replay: width/height below are the values the
    // PNG was ENCODED at; the Spark side reports what ImageIO DECODED.
    "x17_multimodal_decode" ->
      """SELECT doc_id AS media_id,
        |  (length(text) % 48 + 8)::BIGINT AS width,
        |  (doc_id % 48 + 8)::BIGINT AS height,
        |  3::BIGINT AS channels
        |FROM documents""".stripMargin,

    "x18_multimodal_frames" ->
      """SELECT doc_id AS media_id, f AS frame_idx,
        |  md5(text || '#' || f::VARCHAR) AS frame_hash
        |FROM documents, unnest(range(0, length(text) % 7 + 1)) AS t(f)
        |WHERE doc_id % 3 = 2""".stripMargin,

    // Same planted dims, then the identical single-rounded resize
    // arithmetic (divide, multiply, floor — IEEE-exact in both engines).
    "x19_multimodal_resize" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id,
        |    (length(text) % 48 + 8)::BIGINT AS width,
        |    (doc_id % 48 + 8)::BIGINT AS height
        |  FROM documents)
        |SELECT media_id, width, height,
        |  floor(width * s)::BIGINT AS out_width,
        |  floor(height * s)::BIGINT AS out_height,
        |  round(s, 6) AS scale
        |FROM (SELECT *, least(1.0::DOUBLE, 32.0::DOUBLE / greatest(width, height)) AS s FROM d)""".stripMargin)
}
