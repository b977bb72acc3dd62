package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Multimodal
import graft.sources.Sources.table

/** Multimodal queries: media synthesized from `documents` (payload =
  * UTF-8 bytes), decode/frames/resize stubs. The ASCII corpus makes byte
  * length = char length, so the DuckDB oracle derives identical metadata
  * from `length(text)`/`md5(text)`. */
object MultimodalQueries extends QueryPack {

  private def media(s: SparkSession, d: String): DataFrame =
    Multimodal.fromDocuments(table(s, d, "documents"))

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x17_multimodal_decode" -> ((s: SparkSession, d: String) =>
      Multimodal.decodeImageMeta(media(s, d))),

    "x18_multimodal_frames" -> ((s: SparkSession, d: String) =>
      Multimodal.sampleFrames(media(s, d))),

    "x19_multimodal_resize" -> ((s: SparkSession, d: String) =>
      Multimodal.resizeMeta(Multimodal.decodeImageMeta(media(s, d)), maxDim = 256)))

  override val oracleSql: Map[String, String] = Map(
    "x17_multimodal_decode" ->
      """SELECT doc_id AS media_id,
        |  ['image','audio','video'][(doc_id % 3 + 1)::INT] AS kind,
        |  (length(text) % 64) * 10 + 32 AS width,
        |  ((length(text) // 64) % 64) * 10 + 32 AS height,
        |  3::BIGINT AS channels, md5(text) AS content_hash
        |FROM documents""".stripMargin,

    "x18_multimodal_frames" ->
      """SELECT doc_id AS media_id, f AS frame_idx,
        |  md5(text || '#' || f::VARCHAR) AS frame_hash
        |FROM documents, unnest(range(0, length(text) % 7 + 1)) AS t(f)
        |WHERE doc_id % 3 = 2""".stripMargin,

    "x19_multimodal_resize" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id,
        |    (length(text) % 64) * 10 + 32 AS width,
        |    ((length(text) // 64) % 64) * 10 + 32 AS height
        |  FROM documents)
        |SELECT media_id, width, height,
        |  floor(width * s)::BIGINT AS out_width,
        |  floor(height * s)::BIGINT AS out_height,
        |  round(s, 6) AS scale
        |FROM (SELECT *, least(1.0::DOUBLE, 256.0::DOUBLE / greatest(width, height)) AS s FROM d)""".stripMargin)
}
