package graft.sources

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Raster OCR — the reference's OCR provider seam
  * (ondine/knowledge/ocr.py:46-136; image handling in loader.py:96-150),
  * re-expressed as a pluggable engine trait plus a batched Spark partition
  * pass (no shuffle, no driver I/O).
  *
  * The built-in engine, [[GlyphOcr]], is a REAL optical recognizer for
  * machine-set type in the fixed-metric model (the OCR-A/OCR-B idea:
  * page geometry is standardized so the hard problem is glyph
  * CLASSIFICATION, which is done visually — each 5x7 cell bitmap is
  * matched to the nearest font glyph by Hamming distance over pixels, so
  * moderate pixel noise still recognizes correctly; OcrSpec proves both
  * the exact round trip and noise tolerance). What it is NOT is a
  * natural-scene/scanned-page engine: freeform scans need a
  * Tesseract-class model this environment cannot host — that engine drops
  * in through [[OcrEngine]] without touching the Spark plumbing, exactly
  * the reference's provider swap.
  */
trait OcrEngine extends Serializable {
  /** Recognize text in a decoded raster. Never throws on unreadable
    * input — returns "" (the pipeline stays total, like Multimodal's
    * raw fallback). */
  def recognize(img: BufferedImage): String
}

/** Fixed-metric glyph OCR over the graft 5x7 monospace face.
  *
  * Page model (shared by [[render]] and [[recognize]], the way OCR-A
  * standardizes both the face and the page): 2 px margin, 6x9 px cell
  * (5x7 glyph + 1 px advance + 2 px leading), black ink on white paper.
  * Recognition reads ONLY pixels: binarize by luminance, slice the cell
  * grid from the image dimensions, lift each cell to a 35-bit bitmap,
  * and classify it as the nearest atlas glyph by pixel Hamming distance.
  * Higher-DPI input should be downsampled to native metrics first
  * (e.g. [[graft.operators.Multimodal.resizeTo]]).
  */
object GlyphOcr extends OcrEngine {

  val Margin = 2
  val CellW = 6
  val CellH = 9
  val GlyphW = 5
  val GlyphH = 7

  /** 5x7 face for printable ASCII, column-encoded: 5 bytes per glyph,
    * bit 0 = top row (the classic dot-matrix/LCD encoding — these shapes
    * are the long-public-domain 5x7 set every character generator ROM
    * shipped). OcrSpec asserts all 95 bitmaps are pairwise distinct, so
    * nearest-glyph classification of a clean render is unambiguous. */
  private val Face: Array[Array[Int]] = {
    val hex = Array(
      /* ' ' */ "00 00 00 00 00", /* ! */ "00 00 5F 00 00",
      /* " */ "00 07 00 07 00", /* # */ "14 7F 14 7F 14",
      /* $ */ "24 2A 7F 2A 12", /* % */ "23 13 08 64 62",
      /* & */ "36 49 55 22 50", /* ' */ "00 05 03 00 00",
      /* ( */ "00 1C 22 41 00", /* ) */ "00 41 22 1C 00",
      /* * */ "14 08 3E 08 14", /* + */ "08 08 3E 08 08",
      /* , */ "00 50 30 00 00", /* - */ "08 08 08 08 08",
      /* . */ "00 60 60 00 00", /* / */ "20 10 08 04 02",
      /* 0 */ "3E 51 49 45 3E", /* 1 */ "00 42 7F 40 00",
      /* 2 */ "42 61 51 49 46", /* 3 */ "21 41 45 4B 31",
      /* 4 */ "18 14 12 7F 10", /* 5 */ "27 45 45 45 39",
      /* 6 */ "3C 4A 49 49 30", /* 7 */ "01 71 09 05 03",
      /* 8 */ "36 49 49 49 36", /* 9 */ "06 49 49 29 1E",
      /* : */ "00 36 36 00 00", /* ; */ "00 56 36 00 00",
      /* < */ "08 14 22 41 00", /* = */ "14 14 14 14 14",
      /* > */ "00 41 22 14 08", /* ? */ "02 01 51 09 06",
      /* @ */ "32 49 79 41 3E", /* A */ "7E 11 11 11 7E",
      /* B */ "7F 49 49 49 36", /* C */ "3E 41 41 41 22",
      /* D */ "7F 41 41 22 1C", /* E */ "7F 49 49 49 41",
      /* F */ "7F 09 09 09 01", /* G */ "3E 41 49 49 7A",
      /* H */ "7F 08 08 08 7F", /* I */ "00 41 7F 41 00",
      /* J */ "20 40 41 3F 01", /* K */ "7F 08 14 22 41",
      /* L */ "7F 40 40 40 40", /* M */ "7F 02 0C 02 7F",
      /* N */ "7F 04 08 10 7F", /* O */ "3E 41 41 41 3E",
      /* P */ "7F 09 09 09 06", /* Q */ "3E 41 51 21 5E",
      /* R */ "7F 09 19 29 46", /* S */ "46 49 49 49 31",
      /* T */ "01 01 7F 01 01", /* U */ "3F 40 40 40 3F",
      /* V */ "1F 20 40 20 1F", /* W */ "3F 40 38 40 3F",
      /* X */ "63 14 08 14 63", /* Y */ "07 08 70 08 07",
      /* Z */ "61 51 49 45 43", /* [ */ "00 7F 41 41 00",
      /* \ */ "02 04 08 10 20", /* ] */ "00 41 41 7F 00",
      /* ^ */ "04 02 01 02 04", /* _ */ "40 40 40 40 40",
      /* ` */ "00 01 02 04 00", /* a */ "20 54 54 54 78",
      /* b */ "7F 48 44 44 38", /* c */ "38 44 44 44 20",
      /* d */ "38 44 44 48 7F", /* e */ "38 54 54 54 18",
      /* f */ "08 7E 09 01 02", /* g */ "0C 52 52 52 3E",
      /* h */ "7F 08 04 04 78", /* i */ "00 44 7D 40 00",
      /* j */ "20 40 44 3D 00", /* k */ "7F 10 28 44 00",
      /* l */ "00 41 7F 40 00", /* m */ "7C 04 18 04 78",
      /* n */ "7C 08 04 04 78", /* o */ "38 44 44 44 38",
      /* p */ "7C 14 14 14 08", /* q */ "08 14 14 18 7C",
      /* r */ "7C 08 04 04 08", /* s */ "48 54 54 54 20",
      /* t */ "04 3F 44 40 20", /* u */ "3C 40 40 20 7C",
      /* v */ "1C 20 40 20 1C", /* w */ "3C 40 30 40 3C",
      /* x */ "44 28 10 28 44", /* y */ "0C 50 50 50 3C",
      /* z */ "44 64 54 4C 44", /* { */ "00 08 36 41 00",
      /* | */ "00 00 7F 00 00", /* } */ "00 41 36 08 00",
      /* ~ */ "08 04 08 10 08")
    hex.map(_.split(" ").map(Integer.parseInt(_, 16)))
  }

  /** Glyph as a 35-bit pixel bitmap (bit = col * 7 + row). */
  private def bitmapOf(cols: Array[Int]): Long = {
    var bm = 0L
    var c = 0
    while (c < GlyphW) {
      var r = 0
      while (r < GlyphH) {
        if (((cols(c) >> r) & 1) != 0) bm |= 1L << (c * GlyphH + r)
        r += 1
      }
      c += 1
    }
    bm
  }

  /** char -> bitmap (render side) and the classification atlas
    * (recognize side). */
  private[graft] val Bitmaps: Array[Long] = Face.map(bitmapOf)

  def glyphBitmap(ch: Char): Long =
    if (ch >= 32 && ch <= 126) Bitmaps(ch - 32) else Bitmaps('?' - 32)

  /** A cell farther than this from EVERY glyph is not machine-set type in
    * this face (clean renders are distance 0; the noise the engine
    * tolerates stays well under it). */
  val MaxCellDistance = 6

  /** Fraction of cells allowed past [[MaxCellDistance]] before the page is
    * rejected as not-text (photos, diagrams, foreign scripts): recognition
    * must say "I can't read this" rather than emit deterministic garbage —
    * a text-layer-free PDF full of photos must OCR to "", not to 200k
    * noise chars that poison dedup and search downstream. */
  val MaxBadCellFraction = 0.125

  /** Nearest glyph by pixel Hamming distance, with the distance returned
    * so the caller can judge page-level confidence; ties resolve to the
    * lowest char code (deterministic — and unreachable for clean renders,
    * since the atlas is pairwise distinct). */
  private[sources] def classify(bitmap: Long): (Char, Int) = {
    var best = 0
    var bestD = Integer.MAX_VALUE
    var i = 0
    while (i < Bitmaps.length) {
      val d = java.lang.Long.bitCount(bitmap ^ Bitmaps(i))
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    ((best + 32).toChar, bestD)
  }

  // --- rendering (the fixture/printer side of the loop) ------------------

  /** Render text lines onto the standard page: 8-bit gray, ink 0 on
    * paper 255. Multi-line via '\n'; width fits the longest line. */
  def render(text: String): BufferedImage = {
    val lines = text.split("\n", -1)
    // zero columns for empty text: the page is margin-only and recognize
    // symmetrically reads "" back (not a phantom space)
    val cols = lines.map(_.length).max
    val w = 2 * Margin + cols * CellW
    val h = 2 * Margin + lines.length * CellH
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val g = img.getRaster
    // paper
    var y = 0
    while (y < h) { var x = 0; while (x < w) { g.setSample(x, y, 0, 255); x += 1 }; y += 1 }
    // ink
    var li = 0
    while (li < lines.length) {
      val line = lines(li)
      var ci = 0
      while (ci < line.length) {
        val bm = glyphBitmap(line.charAt(ci))
        var c = 0
        while (c < GlyphW) {
          var r = 0
          while (r < GlyphH) {
            if (((bm >> (c * GlyphH + r)) & 1L) != 0)
              g.setSample(Margin + ci * CellW + c, Margin + li * CellH + r, 0, 0)
            r += 1
          }
          c += 1
        }
        ci += 1
      }
      li += 1
    }
    img
  }

  /** Rendered page as PNG bytes (the loader-facing fixture shape). */
  def renderPng(text: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(render(text), "png", out)
    out.toByteArray
  }

  // --- recognition --------------------------------------------------------

  private def ink(img: BufferedImage, x: Int, y: Int): Boolean = {
    // single-band rasters read band 0 directly: getRGB gamma-converts
    // linear gray to sRGB, which would shift the stated sample-space
    // threshold (gray 100 reads back as sRGB ~168 — "paper")
    val lum =
      if (img.getRaster.getNumBands == 1) img.getRaster.getSample(x, y, 0)
      else {
        val rgb = img.getRGB(x, y)
        // integer luminance (Rec.601 weights)
        (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
          114 * (rgb & 0xFF)) / 1000
      }
    lum < 128
  }

  /** Read a page. Trailing spaces are stripped per line — a scanner
    * cannot distinguish trailing whitespace from the page margin, so the
    * honest output shape is the rtrimmed line (compare with `rtrim` on
    * the oracle side). Pages that are not machine-set type in this face
    * (photos, diagrams) return "" via the confidence rule rather than
    * deterministic garbage. */
  override def recognize(img: BufferedImage): String = {
    if (img == null) return ""
    val cols = (img.getWidth - 2 * Margin) / CellW
    val lines = (img.getHeight - 2 * Margin) / CellH
    if (lines <= 0) return ""
    if (cols <= 0) return "\n" * (lines - 1) // margin-only page: empty lines
    val sb = new StringBuilder
    var bad = 0
    var li = 0
    while (li < lines) {
      if (li > 0) sb.append('\n')
      val lineStart = sb.length
      var ci = 0
      while (ci < cols) {
        var bm = 0L
        var c = 0
        while (c < GlyphW) {
          var r = 0
          while (r < GlyphH) {
            if (ink(img, Margin + ci * CellW + c, Margin + li * CellH + r))
              bm |= 1L << (c * GlyphH + r)
            r += 1
          }
          c += 1
        }
        val (ch, d) = classify(bm)
        if (d > MaxCellDistance) bad += 1
        sb.append(ch)
        ci += 1
      }
      // rtrim the line in place
      var e = sb.length
      while (e > lineStart && sb.charAt(e - 1) == ' ') e -= 1
      sb.setLength(e)
      li += 1
    }
    if (bad > MaxBadCellFraction * (cols.toLong * lines)) "" else sb.toString
  }
}

/** The Spark side: batched partition pass appending recognized text for a
  * binary image column, and the DocumentLoader hook. Mirrors
  * [[graft.operators.Multimodal]]'s decode discipline: pure map, no
  * shuffle, unreadable payloads yield "" instead of failing the task. */
object Ocr {

  ImageIO.setUseCache(false)

  /** Decode + recognize one payload; total. */
  def recognizeBytes(bytes: Array[Byte], engine: OcrEngine = GlyphOcr): String = {
    if (bytes == null || bytes.length == 0) return ""
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null } // corrupt container → ""
    if (img == null) "" else engine.recognize(img)
  }

  /** Append `outCol` = recognized text of `binaryCol`. One batched
    * partition-local pass (Multimodal's decode shape). */
  def ocrImages(df: DataFrame, binaryCol: String, outCol: String = "ocr_text",
                engine: OcrEngine = GlyphOcr): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(outCol, StringType, nullable = false)
    val binAt = inSchema.fieldIndex(binaryCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(binAt)) null else r.getAs[Array[Byte]](binAt)
        Row.fromSeq(r.toSeq :+ recognizeBytes(bytes, engine))
      }
    }(Encoders.row(outSchema))
  }

  /** Column form for the DocumentLoader dispatch (a UDF by necessity —
    * ImageIO decode is inherently black-box, applied only on the image
    * branch). */
  def ocrColumn(c: Column, engine: OcrEngine = GlyphOcr): Column = {
    val fn = org.apache.spark.sql.functions.udf(
      (b: Array[Byte]) => recognizeBytes(b, engine))
    fn(c)
  }
}
