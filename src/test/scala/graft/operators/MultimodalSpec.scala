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

  test("pngMedia payloads are genuine PNGs; decode recovers planted dimensions") {
    val png = Multimodal.pngMedia(docs, batchSize = 32)
    // payload starts with the PNG magic — these are real containers
    val first = png.head()
    val magic = Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte)
    assert(first.payload.take(4).sameElements(magic),
      "payload must be an actual PNG container")
    // javax.imageio decode must recover exactly the planted (w, h, 3)
    val decoded = Multimodal.decodeImages(png, batchSize = 32)
      .collect().map(d => d.media_id -> (d.width, d.height, d.channels)).toMap
    val expected = docs.selectExpr("doc_id", "length(text)").collect()
      .map(r => r.getLong(0) ->
        ((Multimodal.plantedWidth(r.getInt(1).toLong).toLong,
          Multimodal.plantedHeight(r.getLong(0)).toLong, 3L))).toMap
    assert(decoded == expected)
  }

  test("imageMedia cycles real PNG and JPEG containers; decode is format-agnostic") {
    val mixed = Multimodal.imageMedia(docs, batchSize = 32)
    val byId = mixed.collect().map(r => r.media_id -> r.payload).toMap
    val pngMagic = Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte)
    val jpegMagic = Array(0xff, 0xd8, 0xff).map(_.toByte)
    assert(byId.nonEmpty)
    byId.foreach { case (id, payload) =>
      if (id % 2 == 0)
        assert(payload.take(4).sameElements(pngMagic), s"id $id must be PNG")
      else
        assert(payload.take(3).sameElements(jpegMagic), s"id $id must be JPEG")
    }
    // both container families decode to exactly the planted (w, h, 3)
    val decoded = Multimodal.decodeImages(mixed, batchSize = 32)
      .collect().map(d => d.media_id -> (d.width, d.height, d.channels)).toMap
    val expected = docs.selectExpr("doc_id", "length(text)").collect()
      .map(r => r.getLong(0) ->
        ((Multimodal.plantedWidth(r.getInt(1).toLong).toLong,
          Multimodal.plantedHeight(r.getLong(0)).toLong, 3L))).toMap
    assert(decoded == expected)
    assert(decoded.keys.exists(_ % 2 == 0) && decoded.keys.exists(_ % 2 == 1),
      "the corpus must actually exercise both formats")
  }

  test("decode reads the actual bytes, not metadata: a hand-built 17x5 PNG") {
    import spark.implicits._
    // dimensions deliberately off-formula — only a real header parse
    // can report them
    val img = new java.awt.image.BufferedImage(
      17, 5, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val rec = Multimodal.MediaRecord(99L, "image", baos.toByteArray,
      Multimodal.MediaMeta(baos.size().toLong, "hand"))
    val out = Multimodal.decodeImages(Seq(rec).toDS()).head()
    assert((out.width, out.height, out.channels) == ((17L, 5L, 3L)))
    // an undecodable payload fails loudly instead of inventing metadata
    val bogus = Multimodal.MediaRecord(100L, "image",
      "not a png".getBytes("UTF-8"), Multimodal.MediaMeta(9L, "hand"))
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImages(Seq(bogus).toDS()).collect()
    }
    assert(e.getMessage.contains("not a decodable image") ||
           Option(e.getCause).exists(_.getMessage.contains("not a decodable image")))
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

  test("pixel decode of demuxed frames recovers the planted colors") {
    import spark.implicits._
    val sample = docs.limit(24)
    val decoded = Multimodal.decodeFrames(
      Multimodal.mp4PngMedia(sample, batchSize = 8)).collect()
    assert(decoded.nonEmpty)
    decoded.foreach { f =>
      val id = f.media_id; val k = f.frame_idx.toInt
      assert(f.width == Multimodal.plantedPxWidth(id, k).toLong &&
             f.height == Multimodal.plantedPxHeight(id, k).toLong,
        s"frame ($id, $k): geometry ${f.width}x${f.height} != planted")
      val (r, g, b) = Multimodal.plantedPxColor(id, k)
      assert((f.px_r, f.px_g, f.px_b) == ((r.toLong, g.toLong, b.toLong)),
        s"frame ($id, $k): decoded color != planted — range/pixel binding broken")
      assert(f.channels == 3L)
    }
    // every demuxed frame of every sampled video decoded
    val wantFrames = sample.select("doc_id").collect().map(_.getLong(0))
      .map(id => id -> Multimodal.plantedFrameCount(id)).toMap
    val gotFrames = decoded.groupBy(_.media_id).view.mapValues(_.length).toMap
    assert(gotFrames == wantFrames)
  }

  test("pixel decode fails loudly when a demuxed range is not an image") {
    import spark.implicits._
    // a genuine MP4 whose sample payload is NOT a PNG: the decode must
    // refuse, never invent pixels (the range/codec binding's other half)
    val bogus = Mp4.build(Seq(Array.tabulate[Byte](64)(_.toByte)))
    val media = Seq(Multimodal.MediaRecord(
      1L, "video", bogus, Multimodal.MediaMeta(bogus.length.toLong, "src0"))).toDS()
    val e = intercept[org.apache.spark.SparkException](
      Multimodal.decodeFrames(media).collect())
    assert(e.getMessage.contains("not a decodable image") ||
      Option(e.getCause).exists(_.getMessage.contains("not a decodable image")))
  }

  test("resize preserves aspect ratio within the bounding box") {
    val resized = Multimodal.resizeMeta(
      Multimodal.decodeImageMeta(Multimodal.pngMedia(docs)), maxDim = 32)
    val bad = resized.filter(col("out_width") > 32 || col("out_height") > 32)
    assert(bad.count() == 0)
    // anything already within bounds is untouched (scale 1.0)
    val untouched = resized.filter(col("scale") === 1.0)
      .filter(col("out_width") =!= col("width") || col("out_height") =!= col("height"))
    assert(untouched.count() == 0)
  }
}
