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

  test("a hostile >=2^31 chunk size fails loudly instead of looping/underflowing") {
    // chunk size 0xFFFFFFF8 as Int is negative: it would pass the bounds
    // check and advance p by 0 (infinite loop) or record a negative
    // dataLen (silent zero-sample success). The parser must reject it.
    def wavWithChunkSize(size: Long): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(56)
      b.put("WAVE".getBytes("US-ASCII"))
      b.put("JUNK".getBytes("US-ASCII")).putInt((size & 0xffffffffL).toInt)
      b.array()
    }
    for (size <- Seq(0xFFFFFFF8L, 0x80000000L, 0xFFFFFFFFL)) {
      val e = intercept[RuntimeException] {
        Multimodal.parseWav(wavWithChunkSize(size), "hostile")
      }
      assert(e.getMessage.contains("past end of payload"),
        s"chunk size $size: wrong failure '${e.getMessage}'")
    }
  }

  test("a zero sample rate fails loudly before any duration math") {
    // legit 16-bit PCM container whose fmt chunk declares rate 0: the
    // downstream frames*1000/rate would divide by zero
    val docs = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.001", "documents").limit(1)
    val payload = Multimodal.wavMedia(docs).collect().head.payload.clone()
    // sample rate is LE32 at fmt payload offset 4 → file offset 12+8+4=24
    payload(24) = 0; payload(25) = 0; payload(26) = 0; payload(27) = 0
    val e = intercept[RuntimeException] {
      Multimodal.parseWav(payload, "zero-rate")
    }
    assert(e.getMessage.contains("zero sample rate"))
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
