package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageReader}

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted in batched partition passes
  * (reference: ondine/knowledge/loader.py:96-150 image handling,
  * ocr.py:46-136 — re-expressed as Spark partition passes, no shuffle).
  *
  * Image containers (PNG/JPEG/GIF/BMP, sniffed by magic bytes) decode for
  * real through JDK ImageIO: metadata from the container header, frames
  * from multi-frame readers (animated GIF), resize by nearest-neighbor
  * resampling of the decoded raster. Payloads that are NOT a recognized
  * image (e.g. video codecs, which need native libs this environment lacks)
  * take a clearly-documented deterministic RAW fallback so the pipeline
  * shape stays total — swapping that fallback for an ffmpeg/JavaCV bridge
  * changes only `decodeOne`'s raw branch.
  */
object Multimodal {

  ImageIO.setUseCache(false) // keep decode in-memory; no /tmp spill files

  /** Batch size for the vectorized-decode loop — decoders amortize
    * per-call overhead across a batch, exactly like Arrow batches do for
    * mapInPandas. */
  val DecodeBatchSize = 64

  val metaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  // --- container sniffing + decode -------------------------------------

  /** Magic-byte container sniff; `raw` = not a recognized image. */
  def sniffFormat(b: Array[Byte]): String =
    if (b == null || b.length < 4) "raw"
    else if ((b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G') "png"
    else if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) "jpeg"
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') "gif"
    else if (b(0) == 'B' && b(1) == 'M') "bmp"
    else "raw"

  /** None when no JDK reader claims the bytes OR when a claimed decode
    * throws (valid magic, corrupt body — a truncated JPEG must take the
    * raw fallback, not fail the Spark task: the pipeline stays total). */
  private def withReader[A](bytes: Array[Byte])(f: ImageReader => A): Option[A] = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        r.setInput(iis)
        try Some(f(r))
        catch { case _: Exception => None } // corrupt body → raw fallback
        finally r.dispose()
      }
    } finally iis.close()
  }

  /** Decode one payload's metadata. Image containers parse for real
    * (header width/height, frame count from the multi-frame reader); the
    * raw branch is the documented deterministic fallback for payloads no
    * JDK codec reads (video etc.). */
  private def decodeOne(bytes: Array[Byte]): Row = {
    if (bytes == null) return Row(0L, 0, 0, 0, "null")
    val fmt = sniffFormat(bytes)
    val real =
      if (fmt == "raw") None
      else withReader(bytes) { r =>
        Row(bytes.length.toLong, r.getWidth(0), r.getHeight(0),
          r.getNumImages(true), fmt)
      }
    real.getOrElse {
      val n = bytes.length.toLong
      Row(n, ((n % 64) * 16 + 16).toInt, ((n % 48) * 16 + 16).toInt,
        (n % 30 + 1).toInt, "raw")
    }
  }

  private def decodeBatch(batch: Seq[Array[Byte]]): Seq[Row] =
    batch.map(decodeOne)

  /** 8-bit gray sample at (x,y): single-band rasters read the band
    * directly (exact for gray PNG/GIF); multi-band go through the packed
    * RGB's low byte. */
  private def graySample(img: BufferedImage, x: Int, y: Int): Int =
    if (img.getRaster.getNumBands == 1) img.getRaster.getSample(x, y, 0)
    else img.getRGB(x, y) & 0xFF

  /** Row-major 8-bit gray buffer of a decoded frame. */
  private def grayBytes(img: BufferedImage): Array[Byte] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out(y * w + x) = graySample(img, x, y).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  // --- operators --------------------------------------------------------

  /** Frame sampling: one output row per sampled frame (`frame_idx`,
    * `frame` binary). Image containers decode for real — the multi-frame
    * reader (animated GIF) yields each sampled frame as its row-major
    * 8-bit gray buffer. Raw payloads keep the deterministic 16-byte-slice
    * fallback (video codecs unavailable). The explode happens
    * partition-locally inside the same batched pass, no shuffle. Sampled
    * indices: 0, stride, 2*stride, ... < n_frames. */
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
          val fmt = if (bytes == null) "raw" else sniffFormat(bytes)
          val frames: Seq[(Int, Array[Byte])] =
            if (fmt != "raw") {
              withReader(bytes) { rd =>
                val n = rd.getNumImages(true)
                (0 until n by stride).map(i => (i, grayBytes(rd.read(i))))
              }.getOrElse(Seq((0, null)))
            } else {
              val n = if (bytes == null) 0L else bytes.length.toLong
              val nFrames = (n % 30 + 1).toInt
              (0 until nFrames by stride).map { i =>
                val frame =
                  if (bytes == null) null
                  else bytes.slice(math.min(i * 16, bytes.length),
                    math.min(i * 16 + 16, bytes.length))
                (i, frame)
              }
            }
          frames.map { case (i, frame) =>
            Row.fromSeq(r.toSeq ++ Seq(i, frame))
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Feature extraction: a `dim`-long float embedding per payload. Image
    * payloads decode and emit their normalized `dim`-bin gray histogram (a
    * real, deterministic visual feature); raw payloads keep the
    * length-arithmetic fallback (the seam where a vision model would run
    * on the decoded batch). Same batched partition pass, embedding lands
    * as array<float>. */
  def extractFeatures(df: DataFrame, binaryCol: String,
                      dim: Int = 16): DataFrame = {
    require(dim >= 1, "dim must be >= 1")
    val inSchema = df.schema
    val outSchema = inSchema
      .add("features", ArrayType(FloatType, containsNull = false))
    val binAt = inSchema.fieldIndex(binaryCol)
    df.mapPartitions { rows =>
      rows.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map { r =>
          val bytes =
            if (r.isNullAt(binAt)) null else r.getAs[Array[Byte]](binAt)
          val fmt = if (bytes == null) "raw" else sniffFormat(bytes)
          val feats: Array[Float] =
            (if (fmt != "raw") {
              withReader(bytes) { rd =>
                val img = rd.read(0)
                val hist = new Array[Long](dim)
                var y = 0
                while (y < img.getHeight) {
                  var x = 0
                  while (x < img.getWidth) {
                    hist((graySample(img, x, y) * dim) / 256) += 1
                    x += 1
                  }
                  y += 1
                }
                val total = math.max(1L, img.getWidth.toLong * img.getHeight)
                hist.map(c => (c.toDouble / total).toFloat)
              }
            } else None).getOrElse {
              val n = if (bytes == null) 0L else bytes.length.toLong
              Array.tabulate(dim)(d => (((n * 31 + d * 7) % 997) / 997.0).toFloat)
            }
          Row.fromSeq(r.toSeq :+ feats.toSeq)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Resize: image payloads decode and resample to a `width*height`
    * row-major 8-bit gray buffer by nearest-neighbor — src index
    * floor(x*srcW/dstW) (integer math, so an SQL oracle reproduces every
    * output pixel bit-for-bit; interpolating resamplers are
    * implementation-defined at edges). Raw payloads keep the
    * byte-cycling fallback. Output replaces the binary column's content
    * and carries a `resized_meta` struct with the target dimensions; same
    * batched partition pass, no shuffle. */
  def resizeTo(df: DataFrame, binaryCol: String,
               width: Int, height: Int): DataFrame = {
    require(width > 0 && height > 0, "target dims must be positive")
    val inSchema = df.schema
    val outSchema = inSchema.add("resized_meta", metaSchema, nullable = false)
    val binAt = inSchema.fieldIndex(binaryCol)
    val outLen = width * height
    df.mapPartitions { rows =>
      rows.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map { r =>
          val bytes =
            if (r.isNullAt(binAt)) Array.emptyByteArray
            else r.getAs[Array[Byte]](binAt)
          val fmt = sniffFormat(bytes)
          val decoded: Option[(Array[Byte], String)] =
            if (fmt == "raw") None
            else withReader(bytes) { rd =>
              val img = rd.read(0)
              val (sw, sh) = (img.getWidth, img.getHeight)
              val out = new Array[Byte](outLen)
              var y = 0
              while (y < height) {
                val sy = y * sh / height
                var x = 0
                while (x < width) {
                  out(y * width + x) = graySample(img, x * sw / width, sy).toByte
                  x += 1
                }
                y += 1
              }
              (out, "gray")
            }
          val (resized, outFmt) = decoded.getOrElse {
            val buf =
              if (bytes.isEmpty) new Array[Byte](outLen)
              else Array.tabulate(outLen)(i => bytes(i % bytes.length))
            (buf, "raw")
          }
          val meta = Row(outLen.toLong, width, height, 1, outFmt)
          Row.fromSeq(r.toSeq.updated(binAt, resized) :+ meta)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Attach decoded media metadata as a `media_meta` struct column.
    * Partition-local, batched, passthrough of all input columns. */
  def withDecodedMeta(df: DataFrame, binaryCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add("media_meta", metaSchema, nullable = false)
    val binAt = inSchema.fieldIndex(binaryCol)
    df.mapPartitions { rows =>
      rows.grouped(DecodeBatchSize).flatMap { batch =>
        val metas = decodeBatch(batch.map(r =>
          if (r.isNullAt(binAt)) null else r.getAs[Array[Byte]](binAt)))
        batch.lazyZip(metas).map((r, m) => Row.fromSeq(r.toSeq :+ m))
      }
    }(Encoders.row(outSchema))
  }

  // --- deterministic fixture encoders ----------------------------------
  // Real encoders for synthesizing test media IN QUERIES (the sandbox has
  // no media files): gray pixel(x,y) = (seed + 7x + 13y) % 251, a formula
  // an SQL oracle reproduces. Encoding is JDK ImageIO (measured
  // byte-deterministic); decode of these fixtures round-trips exactly.

  private def grayImage(w: Int, h: Int, seed: Long): BufferedImage = {
    require(seed >= 0, "fixture seed must be non-negative")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((seed + 7L * x + 13L * y) % 251L).toInt)
        x += 1
      }
      y += 1
    }
    img
  }

  /** The fixture raster for sibling encoders (e.g. [[Video]] MJPEG). */
  private[operators] def grayFixtureImage(w: Int, h: Int,
                                          seed: Long): BufferedImage =
    grayImage(w, h, seed)

  /** A real 8-bit grayscale PNG with the fixture pixel formula. */
  def encodeGrayPng(w: Int, h: Int, seed: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(grayImage(w, h, seed), "png", bos)
    bos.toByteArray
  }

  /** A real animated GIF: frame f uses seed + 17*f in the fixture
    * formula. Gray palettes round-trip exactly through the GIF writer
    * (≤256 distinct colors). */
  def encodeAnimatedGif(w: Int, h: Int, nFrames: Int, seed: Long): Array[Byte] = {
    require(nFrames >= 1, "nFrames must be >= 1")
    val bos = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until nFrames).foreach { f =>
      writer.writeToSequence(
        new IIOImage(grayImage(w, h, seed + 17L * f), null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }
}
