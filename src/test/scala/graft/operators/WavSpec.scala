package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Real WAV audio: hand-assembled RIFF containers decoded through the
  * JDK's own `javax.sound` codec — writer and parser are independent
  * implementations, so agreement certifies the container bytes. */
class WavSpec extends SparkSpec {

  test("JDK codec parses the hand-assembled container and recovers planted PCM") {
    val docs = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.001", "documents").limit(40)
    val got = Multimodal.decodeAudio(Multimodal.wavMedia(docs)).collect()
      .map(a => a.media_id -> a).toMap
    docs.select(col("doc_id")).collect().map(_.getLong(0)).foreach { id =>
      val a = got(id)
      val n = Multimodal.plantedSampleCount(id)
      val samples = (0 until n).map(k => Multimodal.plantedSample(id, k))
      assert(a.sample_rate == 8000L && a.channels == 1L)
      assert(a.n_samples == n.toLong)
      assert(a.duration_ms == n.toLong * 1000L / 8000L)
      assert(a.peak_amp == samples.map(s => math.abs(s.toLong)).max)
      assert(a.sum_abs == samples.map(s => math.abs(s.toLong)).sum)
    }
  }

  test("non-PCM or truncated payloads fail loudly") {
    import spark.implicits._
    val junk = Seq(Multimodal.MediaRecord(
      1L, "audio", Array.fill[Byte](64)(0x42), Multimodal.MediaMeta(64L, "s"))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAudio(junk).collect()
    }
    assert(e.getMessage != null)
  }
}
