package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Video column plumbing — the video leg of the multimodal design: the
  * CONTAINER layer is real and dependency-free for AVI (RIFF): the main
  * `avih` header yields width/height/frame-count/frame-interval, and
  * MJPEG streams yield actual frames — each `..dc` chunk in the `movi`
  * list is a standalone JPEG that [[Multimodal]]'s ImageIO path decodes
  * for real. Codecs that need native libraries (H.264 etc.) remain the
  * documented deterministic raw fallback, same seam as images/audio.
  *
  * Same 100 TB shape as the rest of the multimodal layer: batched
  * `mapPartitions` passes, no shuffle; frame explode is partition-local.
  */
object Video {

  val DecodeBatchSize = 64

  val metaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("us_per_frame", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("format", StringType, nullable = false)))

  def isAvi(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, StandardCharsets.US_ASCII)

  final case class AviInfo(width: Int, height: Int, nFrames: Int,
                           usPerFrame: Int) {
    def durationMs: Long = nFrames.toLong * usPerFrame / 1000L
  }

  /** Find the `avih` header: RIFF walk where `LIST` chunks recurse (their
    * body = 4-byte list type + subchunks) — the same walk real demuxers
    * do; chunk sizes pad to even. */
  def parseAvi(b: Array[Byte]): Option[AviInfo] = {
    if (!isAvi(b)) return None
    def walk(from: Int, to: Int): Option[AviInfo] = {
      var off = from
      while (off + 8 <= to) {
        val id = fourcc(b, off)
        val size = le32(b, off + 4)
        // Long arithmetic: huge declared sizes must not wrap negative
        if (size < 0 || off.toLong + 8L + size > to) return None
        if (id == "LIST" && size >= 4) {
          val found = walk(off + 12, off + 8 + size)
          if (found.isDefined) return found
        } else if (id == "avih" && size >= 40) {
          return Some(AviInfo(
            width = le32(b, off + 8 + 32),
            height = le32(b, off + 8 + 36),
            nFrames = le32(b, off + 8 + 16),
            usPerFrame = le32(b, off + 8)))
        }
        off += 8 + size + (size & 1)
      }
      None
    }
    walk(12, b.length)
  }

  /** Compressed-frame chunks (`..dc`) from the `movi` list, in stream
    * order — for MJPEG each payload is a standalone JPEG. */
  def frameChunks(b: Array[Byte]): Seq[Array[Byte]] = {
    if (!isAvi(b)) return Seq.empty
    val out = ArrayBuffer.empty[Array[Byte]]
    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id = fourcc(b, off)
        val size = le32(b, off + 4)
        if (size < 0 || off.toLong + 8L + size > to) return
        if (id == "LIST" && size >= 4) {
          val listType = fourcc(b, off + 8)
          walk(off + 12, off + 8 + size, inMovi || listType == "movi")
        } else if (inMovi && id.endsWith("dc")) {
          out += b.slice(off + 8, off + 8 + size)
        }
        off += 8 + size + (size & 1)
      }
    }
    walk(12, b.length, inMovi = false)
    out.toSeq
  }

  /** Attach decoded video metadata as a `video_meta` struct column; AVI
    * parses for real, anything else takes the zeros+raw fallback. */
  def withVideoMeta(df: DataFrame, binaryCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add("video_meta", metaSchema, nullable = false)
    val binAt = inSchema.fieldIndex(binaryCol)
    df.mapPartitions { rows =>
      rows.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map { r =>
          val bytes =
            if (r.isNullAt(binAt)) null else r.getAs[Array[Byte]](binAt)
          val n = if (bytes == null) 0L else bytes.length.toLong
          val meta = parseAvi(bytes) match {
            case Some(v) => Row(n, v.width, v.height, v.nFrames,
              v.usPerFrame, v.durationMs, "avi")
            case None => Row(n, 0, 0, 0, 0, 0L, "raw")
          }
          Row.fromSeq(r.toSeq :+ meta)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Frame sampling: one row per sampled frame (`frame_idx`, `frame` =
    * the codec payload — a standalone JPEG for MJPEG, feed it to
    * [[Multimodal.withDecodedMeta]] / ImageIO for pixel access). Sampled
    * indices 0, stride, 2*stride…; partition-local explode. Non-AVI
    * payloads emit nothing (a video-specific operator, unlike the
    * total-function meta pass — absence of frames IS the signal). */
  def sampleFrames(df: DataFrame, binaryCol: String,
                   stride: Int = 1): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    val inSchema = df.schema
    val outSchema = inSchema
      .add("frame_idx", IntegerType, nullable = false)
      .add("frame", BinaryType, nullable = true)
    val binAt = inSchema.fieldIndex(binaryCol)
    df.mapPartitions { rows =>
      rows.grouped(DecodeBatchSize).flatMap { batch =>
        batch.flatMap { r =>
          val bytes =
            if (r.isNullAt(binAt)) null else r.getAs[Array[Byte]](binAt)
          val frames = frameChunks(bytes)
          (0 until frames.length by stride).map { i =>
            Row.fromSeq(r.toSeq ++ Seq(i, frames(i)))
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  // --- deterministic fixture encoder ------------------------------------

  /** A real MJPEG AVI: frame f is the fixture gray image (seed + 17*f)
    * JPEG-encoded (lossy — oracles pin frame COUNT, dims, and JPEG
    * decodability, not pixel values), wrapped in the standard
    * hdrl(avih)/movi RIFF layout. */
  def encodeMjpegAvi(w: Int, h: Int, nFrames: Int, seed: Long,
                     fps: Int = 25): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames >= 1 && fps > 0, "invalid avi params")
    val jpegs = (0 until nFrames).map { f =>
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(
        Multimodal.grayFixtureImage(w, h, seed + 17L * f), "jpg", bos)
      bos.toByteArray
    }
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream(8 + body.length + 1)
      out.write(id.getBytes(StandardCharsets.US_ASCII))
      val n = body.length
      out.write(n & 0xff); out.write((n >> 8) & 0xff)
      out.write((n >> 16) & 0xff); out.write((n >> 24) & 0xff)
      out.write(body)
      if ((n & 1) == 1) out.write(0) // pad to even
      out.toByteArray
    }
    def list(listType: String, bodies: Seq[Array[Byte]]): Array[Byte] = {
      val inner = new ByteArrayOutputStream()
      inner.write(listType.getBytes(StandardCharsets.US_ASCII))
      bodies.foreach(inner.write)
      chunk("LIST", inner.toByteArray)
    }
    val avih = new Array[Byte](56)
    def put32(o: Int, v: Int): Unit = {
      avih(o) = (v & 0xff).toByte; avih(o + 1) = ((v >> 8) & 0xff).toByte
      avih(o + 2) = ((v >> 16) & 0xff).toByte
      avih(o + 3) = ((v >> 24) & 0xff).toByte
    }
    put32(0, 1000000 / fps) // dwMicroSecPerFrame
    put32(16, nFrames) // dwTotalFrames
    put32(24, 1) // dwStreams
    put32(32, w); put32(36, h)
    val hdrl = list("hdrl", Seq(chunk("avih", avih)))
    val movi = list("movi", jpegs.map(j => chunk("00dc", j)))
    val riffBody = new ByteArrayOutputStream()
    riffBody.write("AVI ".getBytes(StandardCharsets.US_ASCII))
    riffBody.write(hdrl); riffBody.write(movi)
    val payload = riffBody.toByteArray
    val out = new ByteArrayOutputStream(12 + payload.length)
    out.write("RIFF".getBytes(StandardCharsets.US_ASCII))
    val n = payload.length
    out.write(n & 0xff); out.write((n >> 8) & 0xff)
    out.write((n >> 16) & 0xff); out.write((n >> 24) & 0xff)
    out.write(payload)
    out.toByteArray
  }
}
