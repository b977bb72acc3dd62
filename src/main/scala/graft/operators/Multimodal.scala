package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus decode / frame-sample / resize operators.
  *
  * The container has no image/audio codecs, so the *decode kernels are
  * deterministic STUBS* (clearly marked below): they derive fake
  * dimensions from payload length and hash the bytes. Everything around
  * them — the schema (`binary` payload + metadata struct), the
  * partition-batched decode shape, the explode-per-frame layout, the
  * typed Dataset plumbing — is the real design a codec drop-in would
  * inherit unchanged.
  *
  * Scale notes: payloads stay opaque binary end-to-end (no driver
  * materialization); decode is `mapPartitions` with explicit micro-batches
  * so a real codec amortizes per-batch setup (model load, GPU transfer)
  * across rows, the same batch shape `mapInPandas`/`mapInArrow` give
  * Python UDFs; frame sampling explodes to one row per frame, keeping
  * downstream ops row-parallel.
  */
object Multimodal {

  final case class MediaMeta(n_bytes: Long, source: String)
  final case class MediaRecord(media_id: Long, kind: String,
                               payload: Array[Byte], meta: MediaMeta)
  final case class DecodedImage(media_id: Long, width: Long, height: Long,
                                channels: Long, content_hash: String)

  /** Synthesize a media table from `documents` (the driver ships no binary
    * table): payload = UTF-8 bytes of the text, kind cycles by id. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
                 (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      struct(length(col("text").cast("binary")).cast("long").as("n_bytes"),
             col("source").as("source")).as("meta"))

  // ---------------------------------------------------------------- STUB
  // Deterministic fake image decode: a real implementation replaces the
  // width/height/channels derivation with an actual codec call on
  // `payload`. Dimensions are a pure function of byte length so the
  // column path and the mapPartitions path are provably identical.
  private def fakeWidth(nBytes: Long): Long  = (nBytes % 64) * 10 + 32
  private def fakeHeight(nBytes: Long): Long = ((nBytes / 64) % 64) * 10 + 32
  private val FakeChannels = 3L
  // --------------------------------------------------------------- /STUB

  /** Column-path decode: pure codegen'd expressions (fast path when the
    * "decode" is metadata-derivable; oracle-checkable). */
  def decodeImageMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("kind"),
      ((col("meta.n_bytes") % 64) * 10 + 32).as("width"),
      (expr("meta.n_bytes div 64") % 64 * 10 + 32).as("height"),
      lit(FakeChannels).as("channels"),
      md5(col("payload")).as("content_hash"))

  /** mapPartitions decode: the batch shape for real codecs. Processes the
    * partition in micro-batches of `batchSize` records (where a real
    * kernel would decode the whole batch in one native/GPU call). */
  def decodeImagesBatched(media: Dataset[MediaRecord],
                          batchSize: Int = 64): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // STUB: a real codec decodes `batch.map(_.payload)` here in one call
        batch.map { r =>
          val digest = java.security.MessageDigest.getInstance("MD5")
          val hash = digest.digest(r.payload).map("%02x".format(_)).mkString
          DecodedImage(r.media_id, fakeWidth(r.meta.n_bytes),
                       fakeHeight(r.meta.n_bytes), FakeChannels, hash)
        }
      }
    }
  }

  /** Frame sampling for video payloads: one output row per sampled frame,
    * n_frames = n_bytes % 7 + 1 (STUB for container-derived frame count),
    * frame hash binds payload identity to the frame index. */
  def sampleFrames(media: DataFrame): DataFrame = {
    val nFrames = (col("meta.n_bytes") % 7 + 1).cast("int")
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("payload"),
              explode(sequence(lit(0), nFrames - 1)).as("frame_idx"))
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
              md5(concat(col("payload").cast("string"), lit("#"),
                         col("frame_idx").cast("string"))).as("frame_hash"))
  }

  /** Metadata-level resize: recompute target dimensions preserving aspect
    * ratio against a bounding box (pure arithmetic — runs at scan speed). */
  def resizeMeta(decoded: DataFrame, maxDim: Long): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim.toDouble) / greatest(col("width"), col("height")))
    decoded.select(
      col("media_id"), col("width"), col("height"),
      floor(col("width") * scale).cast("long").as("out_width"),
      floor(col("height") * scale).cast("long").as("out_height"),
      round(scale, 6).as("scale"))
  }

  /** Typed view of the synthesized media table. */
  def mediaDataset(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    fromDocuments(docs).as[MediaRecord]
  }
}
