package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Audio column plumbing — the audio leg of the multimodal design
  * (reference routes audio through external transcription providers,
  * ondine/knowledge/ocr.py-style; here the CONTAINER layer is real and
  * dependency-free, and the model hook is the decoded-batch seam):
  * WAV/RIFF PCM parses for real — chunk walk, fmt/data chunks, 8-bit
  * unsigned and 16-bit signed little-endian samples — while payloads no
  * JDK-free parser reads (mp3/ogg/opus) take the same clearly-documented
  * deterministic raw fallback as the image side, so the pipeline stays
  * total.
  *
  * Same 100 TB shape as [[Multimodal]]: batched partition passes
  * (`mapPartitions`, no shuffle), features land as `array<float>` and
  * feed the [[Similarity]] ANN/near-dup operators directly.
  */
object Audio {

  /** Batch size for the partition decode loop (see
    * [[Multimodal.DecodeBatchSize]]). */
  val DecodeBatchSize = 64

  val metaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("format", StringType, nullable = false)))

  def isWav(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Parsed PCM layout: where the interleaved samples live. */
  final case class WavInfo(sampleRate: Int, channels: Int, bits: Int,
                           dataOffset: Int, dataLength: Int) {
    def blockAlign: Int = channels * (bits / 8)
    /** Sample frames (one per channel set). */
    def nFrames: Long =
      if (blockAlign == 0) 0L else dataLength.toLong / blockAlign
    def durationMs: Long =
      if (sampleRate == 0) 0L else nFrames * 1000L / sampleRate
  }

  /** RIFF chunk walk: `fmt ` (must be audioFormat=1, integer PCM, 8 or 16
    * bit) and `data`. Chunk sizes pad to even per the RIFF spec. */
  def parseWav(b: Array[Byte]): Option[WavInfo] = {
    if (!isWav(b)) return None
    var off = 12
    var rate, ch, bits = 0
    var dataOff, dataLen = -1
    while (off + 8 <= b.length) {
      val id = new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(b, off + 4)
      // Long arithmetic: a near-Int.MaxValue declared size would wrap
      // `off + 8 + size` negative and sail past an Int comparison
      if (size < 0 || off.toLong + 8L + size > b.length) return None // truncated
      id match {
        case "fmt " if size >= 16 =>
          val audioFormat = le16(b, off + 8)
          if (audioFormat != 1) return None // only integer PCM
          ch = le16(b, off + 10)
          rate = le32(b, off + 12)
          bits = le16(b, off + 22)
        case "data" => dataOff = off + 8; dataLen = size
        case _ => () // LIST/INFO/etc — skipped
      }
      off += 8 + size + (size & 1)
    }
    if (rate > 0 && ch > 0 && (bits == 8 || bits == 16) && dataOff >= 0)
      Some(WavInfo(rate, ch, bits, dataOff, dataLen))
    else None
  }

  /** Interleaved samples as signed ints (8-bit unsigned recenters at
    * -128..127 by subtracting 128; 16-bit is signed LE). */
  private def sampleAt(b: Array[Byte], info: WavInfo, i: Long): Int =
    if (info.bits == 8) (b(info.dataOffset + i.toInt) & 0xff) - 128
    else {
      val o = info.dataOffset + 2 * i.toInt
      (le16(b, o) << 16) >> 16 // sign-extend
    }

  /** Attach decoded audio metadata as an `audio_meta` struct column.
    * Non-WAV payloads land as zeros + format "raw" — the seam where an
    * mp3/ogg decoder (or a transcription provider) would plug in. */
  def withAudioMeta(df: DataFrame, binaryCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add("audio_meta", metaSchema, nullable = false)
    val binAt = inSchema.fieldIndex(binaryCol)
    df.mapPartitions { rows =>
      rows.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map { r =>
          val bytes =
            if (r.isNullAt(binAt)) null else r.getAs[Array[Byte]](binAt)
          val n = if (bytes == null) 0L else bytes.length.toLong
          val meta = parseWav(bytes) match {
            case Some(w) =>
              Row(n, w.sampleRate, w.channels, w.bits, w.nFrames,
                w.durationMs, "wav")
            case None => Row(n, 0, 0, 0, 0L, 0L, "raw")
          }
          Row.fromSeq(r.toSeq :+ meta)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Feature extraction: `windows` per-window RMS values over the
    * interleaved sample stream (channel-agnostic), normalized to [0,1] by
    * the sample range. Sample i belongs to window `i*windows/nSamples`
    * (integer math); the squared sum accumulates EXACTLY in Long, so one
    * double division + sqrt + 6dp round reproduces bit-for-bit in SQL
    * regardless of summation order. Raw payloads keep the
    * length-arithmetic fallback of the image side. */
  def extractFeatures(df: DataFrame, binaryCol: String,
                      windows: Int = 8): DataFrame = {
    require(windows >= 1, "windows must be >= 1")
    val inSchema = df.schema
    val outSchema = inSchema
      .add("audio_features", ArrayType(FloatType, containsNull = false))
    val binAt = inSchema.fieldIndex(binaryCol)
    df.mapPartitions { rows =>
      rows.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map { r =>
          val bytes =
            if (r.isNullAt(binAt)) null else r.getAs[Array[Byte]](binAt)
          val feats: Array[Float] = parseWav(bytes) match {
            case Some(w) =>
              val nSamples = w.nFrames * w.channels
              val norm = if (w.bits == 8) 128.0 else 32768.0
              val sumsq = new Array[Long](windows)
              val cnt = new Array[Long](windows)
              var i = 0L
              while (i < nSamples) {
                val s = sampleAt(bytes, w, i).toLong
                val win = ((i * windows) / math.max(1L, nSamples)).toInt
                sumsq(win) += s * s
                cnt(win) += 1
                i += 1
              }
              Array.tabulate(windows) { k =>
                if (cnt(k) == 0) 0f
                else BigDecimal(
                  math.sqrt(sumsq(k).toDouble / cnt(k)) / norm)
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP)
                  .toFloat
              }
            case None =>
              val n = if (bytes == null) 0L else bytes.length.toLong
              Array.tabulate(windows)(d =>
                (((n * 31 + d * 7) % 997) / 997.0).toFloat)
          }
          Row.fromSeq(r.toSeq :+ feats.toSeq)
        }
      }
    }(Encoders.row(outSchema))
  }

  // --- deterministic fixture encoder ------------------------------------

  /** A real PCM WAV for synthesizing test audio IN QUERIES: 16-bit mono/
    * multi-channel, interleaved sample i = ((seed + 31*i) % 65536) - 32768
    * — a formula an SQL oracle reproduces exactly. */
  def encodePcmWav(nFrames: Long, sampleRate: Int, seed: Long,
                   channels: Int = 1): Array[Byte] = {
    require(nFrames >= 0 && sampleRate > 0 && channels >= 1 && seed >= 0,
      "invalid wav fixture params")
    val nSamples = nFrames * channels
    val dataLen = (nSamples * 2).toInt
    val out = new ByteArrayOutputStream(44 + dataLen)
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
    out.write("RIFF".getBytes); w32(36 + dataLen)
    out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); w32(16)
    w16(1); w16(channels); w32(sampleRate)
    w32(sampleRate * channels * 2); w16(channels * 2); w16(16)
    out.write("data".getBytes); w32(dataLen)
    var i = 0L
    while (i < nSamples) {
      w16((((seed + 31L * i) % 65536L) - 32768L).toInt & 0xffff)
      i += 1
    }
    out.toByteArray
  }
}
