package graft

import java.io.ByteArrayOutputStream

import graft.operators.Audio

/** The WAV reader is held to more than the fixture encoder emits:
  * foreign chunk layouts (LIST before fmt, odd-size chunks with pad
  * bytes), 8-bit unsigned samples, stereo interleave, and malformed
  * containers (truncated, non-PCM, float format) must all resolve
  * correctly — plus inverse-property checks encoder→reader.
  */
class AudioSpec extends SparkSpec {
  import spark.implicits._

  test("encode→parse is the identity on the PCM header") {
    val b = Audio.encodePcmWav(nFrames = 120, sampleRate = 8000,
      seed = 7, channels = 2)
    val w = Audio.parseWav(b).get
    assert((w.sampleRate, w.channels, w.bits) === (8000, 2, 16))
    assert(w.nFrames === 120)
    assert(w.durationMs === 120 * 1000 / 8000)
    assert(b.length === 44 + 120 * 2 * 2)
  }

  test("duration is integer-exact (floor, never rounded up)") {
    val w = Audio.parseWav(Audio.encodePcmWav(999, 8000, 1)).get
    assert(w.durationMs === 124) // 999*1000/8000 = 124.875 -> 124
  }

  /** Hand-built WAV in another producer's idiom: LIST chunk first, an
    * odd-sized junk chunk (forcing the pad-byte step), 8-bit samples. */
  private def foreignWav(): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
    val data = Array.tabulate(10)(i => (128 + i).toByte) // 8-bit unsigned
    out.write("RIFF".getBytes); w32(4 + (8 + 4) + (8 + 5 + 1) + (8 + 16) + (8 + data.length))
    out.write("WAVE".getBytes)
    out.write("LIST".getBytes); w32(4); out.write("INFO".getBytes)
    out.write("junk".getBytes); w32(5); out.write(Array[Byte](1, 2, 3, 4, 5)); out.write(0) // pad to even
    out.write("fmt ".getBytes); w32(16)
    w16(1); w16(1); w32(11025); w32(11025); w16(1); w16(8)
    out.write("data".getBytes); w32(data.length); out.write(data)
    out.toByteArray
  }

  test("foreign chunk order, odd-size padding, and 8-bit samples parse") {
    val w = Audio.parseWav(foreignWav()).get
    assert((w.sampleRate, w.channels, w.bits) === (11025, 1, 8))
    assert(w.nFrames === 10)
  }

  test("malformed containers are rejected, not misread") {
    assert(Audio.parseWav(null).isEmpty)
    assert(Audio.parseWav("RIFFxxxxWAVE".getBytes).isEmpty) // no chunks
    val good = Audio.encodePcmWav(50, 8000, 3)
    assert(Audio.parseWav(good.take(50)).isEmpty) // truncated mid-data
    // IEEE-float format (3) is not integer PCM
    val floatFmt = good.clone
    floatFmt(20) = 3
    assert(Audio.parseWav(floatFmt).isEmpty)
    // adversarial: declared chunk size near Int.MaxValue must reject via
    // the Long-bounded guard, not wrap negative and crash the walk
    val huge = good.clone
    huge(16) = 0xF4.toByte; huge(17) = 0xFF.toByte
    huge(18) = 0xFF.toByte; huge(19) = 0x7F.toByte // fmt size 0x7FFFFFF4
    assert(Audio.parseWav(huge).isEmpty)
  }

  test("per-window RMS decodes real samples; raw fallback is arithmetic") {
    val rows = Seq(
      (1L, Audio.encodePcmWav(40, 8000, 5)),
      (2L, "not audio".getBytes)).toDF("id", "content")
    val feats = Audio.extractFeatures(rows, "content", windows = 2)
      .select("id", "audio_features").as[(Long, Seq[Float])]
      .collect().toMap
    // expected: exact Long sum of squares over each half of the stream
    val expected = (0 until 2).map { win =>
      val samples = (0L until 40L).filter(i => i * 2 / 40 == win)
        .map(i => ((5 + 31 * i) % 65536) - 32768)
      val rms = math.sqrt(samples.map(s => s * s).sum.toDouble / samples.size) / 32768.0
      BigDecimal(rms).setScale(6, BigDecimal.RoundingMode.HALF_UP).toFloat
    }
    assert(feats(1L) === expected)
    assert(feats(2L).length === 2) // deterministic non-audio fallback
    val n = "not audio".getBytes.length.toLong
    assert(feats(2L)(0) === (((n * 31) % 997) / 997.0).toFloat)
  }

  test("stereo interleave: frames count once, samples count per channel") {
    val rows = Seq((1L, Audio.encodePcmWav(30, 8000, 9, channels = 2)))
      .toDF("id", "content")
    val meta = Audio.withAudioMeta(rows, "content")
      .select("audio_meta.n_frames", "audio_meta.channels")
      .as[(Long, Int)].head()
    assert(meta === ((30L, 2)))
    // features see 60 interleaved samples
    val f = Audio.extractFeatures(rows, "content", windows = 3)
      .select("audio_features").as[Seq[Float]].head()
    assert(f.length === 3 && f.forall(v => v > 0f && v <= 1f))
  }
}
