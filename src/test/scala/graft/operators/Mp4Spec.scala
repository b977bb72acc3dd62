package graft.operators

import graft.SparkSpec

/** Real ISO-BMFF build + demux: the sample tables written by
  * [[Mp4.build]] must resolve back to the exact frames, byte-for-byte,
  * through the generic table walk in [[Mp4.demux]]. */
class Mp4Spec extends SparkSpec {

  private def frames(n: Int, seed: Int = 7): Seq[Array[Byte]] =
    (0 until n).map { k =>
      Array.tabulate[Byte](16 + (seed * 13 + k * 5) % 40)(j =>
        ((seed + k * 31 + j) % 251).toByte)
    }

  test("demux recovers every frame's exact bytes, pts, and sync flag") {
    for (n <- Seq(1, 3, 4, 5, 7, 11)) {
      val fs = frames(n, seed = n)
      val bytes = Mp4.build(fs, frameDurMs = 40, keyEvery = 3)
      val out = Mp4.demux(bytes)
      assert(out.length == n)
      out.zipWithIndex.foreach { case (f, i) =>
        assert(f.idx == i)
        assert(f.ptsMs == i * 40L)
        assert(f.keyframe == (i % 3 == 0))
        assert(f.size == fs(i).length.toLong)
        val sliced = bytes.slice(f.offset.toInt, (f.offset + f.size).toInt)
        assert(java.util.Arrays.equals(sliced, fs(i)),
          s"frame $i of $n-frame file: bytes differ at offset ${f.offset}")
      }
    }
  }

  test("multi-chunk files (n > 4) exercise the stsc run resolution") {
    val fs = frames(7)
    val out = Mp4.demux(Mp4.build(fs))
    // chunk 2 starts at sample 4; its first frame must NOT be contiguous
    // with sample 3's end only by accident — verify against real layout:
    // all offsets strictly increase and every slice matches
    assert(out.map(_.offset) == out.map(_.offset).sorted)
    assert(out.length == 7)
  }

  test("timescale other than 1000 converts pts to ms") {
    // rebuild at 25 ms/frame: pts must be exact multiples of 25
    val out = Mp4.demux(Mp4.build(frames(4), frameDurMs = 25))
    assert(out.map(_.ptsMs) == Seq(0L, 25L, 50L, 75L))
  }

  test("corrupt containers fail loudly, never silently mis-slice") {
    val good = Mp4.build(frames(3))
    // truncate mid-moov: the sample tables are incomplete
    intercept[RuntimeException](Mp4.demux(good.take(good.length - 20)))
    // no video track at all
    intercept[RuntimeException](Mp4.demux(good.take(32)))
  }

  test("Spark surface: planted geometry round-trips through real containers") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Sources.table(spark, "/root/testdata/sf0.001", "documents")
      .limit(50)
    val media = Multimodal.mp4Media(docs)
    val got = Multimodal.demuxFrames(media).collect()
    val byId = got.groupBy(_.media_id)
    docs.select(col("doc_id")).collect().map(_.getLong(0)).foreach { id =>
      val fs = byId(id).sortBy(_.frame_idx)
      assert(fs.length == Multimodal.plantedFrameCount(id))
      fs.zipWithIndex.foreach { case (f, k) =>
        assert(f.n_bytes == Multimodal.plantedFrameSize(id, k).toLong)
        assert(f.pts_ms == k * 40L)
        assert(f.keyframe == (k % 3 == 0))
        // the hash binds to the actual sliced bytes: recompute from the
        // planted generator and compare
        val expectBytes = Array.tabulate[Byte](Multimodal.plantedFrameSize(id, k))(
          j => ((id * 131 + k * 29 + j) % 251).toByte)
        val md = java.security.MessageDigest.getInstance("MD5")
        val expectHash = md.digest(expectBytes).map("%02x".format(_)).mkString
        assert(f.frame_hash == expectHash,
          s"media $id frame $k: demuxed bytes differ from planted bytes")
      }
    }
  }
}
