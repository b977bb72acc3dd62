package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val media = Multimodal.fromDocuments(docs)

  test("media schema: opaque binary payload + typed metadata") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val kinds = media.select("kind").distinct()
      .collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("column-path decode and mapPartitions batch decode are identical") {
    val viaColumns = Multimodal.decodeImageMeta(media)
      .select("media_id", "width", "height", "channels", "content_hash")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                           r.getLong(3), r.getString(4))).toSet
    val viaBatches = Multimodal.decodeImagesBatched(
        Multimodal.mediaDataset(spark, docs), batchSize = 32)
      .collect().map(d => (d.media_id, d.width, d.height, d.channels,
                           d.content_hash)).toSet
    assert(viaColumns == viaBatches)
  }

  test("frame sampling: only videos, 1..7 frames each, distinct hashes") {
    val frames = Multimodal.sampleFrames(media)
    val perVideo = frames.groupBy("media_id").count().collect()
    assert(perVideo.nonEmpty)
    assert(perVideo.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 7))
    val n = frames.count()
    assert(frames.select("frame_hash").distinct().count() == n,
      "frame hashes must bind payload identity to frame index")
    val videoIds = media.filter(col("kind") === "video")
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(frames.select("media_id").distinct()
      .collect().map(_.getLong(0)).toSet == videoIds)
  }

  test("resize preserves aspect ratio within the bounding box") {
    val resized = Multimodal.resizeMeta(Multimodal.decodeImageMeta(media), maxDim = 256)
    val bad = resized.filter(col("out_width") > 256 || col("out_height") > 256)
    assert(bad.count() == 0)
    // anything already within bounds is untouched (scale 1.0)
    val untouched = resized.filter(col("scale") === 1.0)
      .filter(col("out_width") =!= col("width") || col("out_height") =!= col("height"))
    assert(untouched.count() == 0)
  }
}
