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
  * x18 (video frames) stays on the honest stub surface: media synthesized
  * from text bytes (the ASCII corpus makes byte length = char length, so
  * the oracle derives identical metadata from `length(text)`/`md5(text)`).
  */
object MultimodalQueries extends QueryPack {

  private def media(s: SparkSession, d: String): DataFrame =
    Multimodal.fromDocuments(table(s, d, "documents"))

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x17_multimodal_decode" -> ((s: SparkSession, d: String) =>
      Multimodal.decodeImageMeta(
        Multimodal.imageMedia(table(s, d, "documents")))),

    "x18_multimodal_frames" -> ((s: SparkSession, d: String) =>
      Multimodal.sampleFrames(media(s, d))),

    "x19_multimodal_resize" -> ((s: SparkSession, d: String) =>
      Multimodal.resizeMeta(
        Multimodal.decodeImageMeta(
          Multimodal.imageMedia(table(s, d, "documents"))), maxDim = 32)))

  override val oracleSql: Map[String, String] = Map(
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
