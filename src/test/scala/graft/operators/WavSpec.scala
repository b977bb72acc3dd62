package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Real WAV audio: hand-assembled RIFF containers decoded through the
  * JDK's own `javax.sound` codec — writer and parser are independent
  * implementations, so agreement certifies the container bytes. */
class WavSpec extends SparkSpec {

  test("decodeAudio recovers the planted PCM from the container bytes") {
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

  test("the JDK javax.sound codec agrees with parseWav on every container") {
    val docs = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.001", "documents").limit(40)
    Multimodal.wavMedia(docs).collect().foreach { r =>
      val ours = Multimodal.parseWav(r.payload, s"media ${r.media_id}")
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      try {
        val fmt = ais.getFormat
        assert(fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        assert(fmt.getSampleRate.toLong == ours.sampleRate)
        assert(fmt.getChannels.toLong == ours.channels)
        assert(fmt.getSampleSizeInBits == 16)
        val raw = ais.readAllBytes()
        val n = raw.length / 2
        assert(n.toLong / fmt.getChannels == ours.frames)
        var peak = 0L; var sumAbs = 0L
        var i = 0
        while (i < n) {
          val v = (((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff)).toShort).toInt
          val a = math.abs(v.toLong)
          if (a > peak) peak = a
          sumAbs += a
          i += 1
        }
        assert(peak == ours.peakAmp && sumAbs == ours.sumAbs,
          s"media ${r.media_id}: JDK-decoded PCM stats differ from parseWav")
      } finally ais.close()
    }
  }

  test("unknown and odd-sized RIFF chunks are skipped with word alignment") {
    // hand-splice a 3-byte LIST chunk (odd size → 1 pad byte) between
    // fmt and data; any conforming RIFF reader must skip it
    val docs = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.001", "documents").limit(1)
    val r = Multimodal.wavMedia(docs).collect().head
    val original = r.payload
    val dataIdx = {
      var i = 12
      while (!(original(i) == 'd' && original(i + 1) == 'a' &&
               original(i + 2) == 't' && original(i + 3) == 'a')) i += 1
      i
    }
    val junk = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = original.take(dataIdx) ++ junk ++ original.drop(dataIdx)
    // fix the RIFF size field (LE32 at offset 4)
    val riffLen = spliced.length - 8
    spliced(4) = (riffLen & 0xff).toByte
    spliced(5) = ((riffLen >> 8) & 0xff).toByte
    spliced(6) = ((riffLen >> 16) & 0xff).toByte
    spliced(7) = ((riffLen >> 24) & 0xff).toByte
    val want = Multimodal.parseWav(original, "original")
    val got = Multimodal.parseWav(spliced, "spliced")
    assert(got == want, "spliced junk chunk changed the parse")
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
