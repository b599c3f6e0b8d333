package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{Deflater, DeflaterOutputStream, Inflater, InflaterOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row}

/** Dependency-free PDF text source/sink — closes the reference's pdf
  * ingestion path (ondine/knowledge/loader.py:96-150 routes *.pdf through
  * pypdf/OCR). Born-digital text layers extract directly; pages with NO
  * text layer fall back to the [[OcrEngine]] seam over their embedded
  * image XObjects (DeviceGray/Flate decoded inline, DCT bodies through
  * ImageIO) — the scanned-document path, machine-set type readable by the
  * built-in [[GlyphOcr]], natural scans by whatever engine drops into the
  * seam.
  *
  * Reader: scans the raw bytes for `stream…endstream` sections, inflates
  * `/FlateDecode` bodies (raw bodies pass through), and interprets the
  * text-showing subset of the content-stream language — `BT…ET` blocks,
  * `Tj`/`'`/`"` shows, `TJ` arrays (kerning numbers ignored), literal
  * strings with nested parens + the eight escape pairs + octal escapes +
  * line continuations, hex strings, and line tracking via
  * `Td`, `TD`, `T*`, `TL`, `Tm` so vertical moves become newlines; the
  * next-line-show ops `'` and `"` too. Non-text streams
  * (fonts, xref streams) are skipped by the absence of `BT`.
  *
  * Writer: minimal well-formed PDF 1.4 — Catalog/Pages/Type1 Helvetica
  * (WinAnsi), one Flate-compressed content stream per page, one text line
  * per source line (`TL` + `T*` line advances; no soft wrapping, so
  * write→extract is the identity on Latin-1 text). Chars above U+00FF
  * have no WinAnsi byte and are written as '?' — the documented limit of
  * a simple-font writer.
  *
  * Scale: the reader is a pure `Array[Byte] => String` function applied
  * inside a `binaryFile` scan (see [[DocumentLoader]]) — a million-pdf
  * corpus extracts as an ordinary parallel scan with no driver I/O.
  */
object Pdf {

  // ---------------------------------------------------------------- writer

  private val Latin1 = StandardCharsets.ISO_8859_1

  /** Escape one source line into a PDF literal string body: the three
    * syntax chars get backslash pairs, control bytes go octal so raw
    * EOLs never enter the string. */
  private[graft] def escapeString(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => b.append("\\\\")
      case '(' => b.append("\\(")
      case ')' => b.append("\\)")
      case c if c < 0x20 => b.append(f"\\${c.toInt}%03o")
      case c if c > 0xff => b.append('?') // no WinAnsi byte for it
      case c => b.append(c)
    }
    b.toString
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(raw.length / 2 + 64)
    val out = new DeflaterOutputStream(bos, new Deflater(Deflater.BEST_SPEED))
    out.write(raw); out.close()
    bos.toByteArray
  }

  /** Render `text` into a complete PDF byte stream, one source line per
    * text line, `maxLinesPerPage` lines per page. Default 53: lines
    * render at y = 756 - 14j inside a 612x792 MediaBox, so j <= 53 keeps
    * every baseline on-page (a 60-line default put the last ~6 lines of
    * a full page below y=0 — extractText recovered them, but any real
    * viewer clips them). */
  def write(text: String, maxLinesPerPage: Int = 53): Array[Byte] = {
    require(maxLinesPerPage > 0, "maxLinesPerPage must be positive")
    val lines = text.split("\n", -1)
    val pages = lines.grouped(maxLinesPerPage).toArray
    val nPages = math.max(1, pages.length)

    // object ids: 1 catalog, 2 pages, 3 font, then (page, content) pairs
    val objs = ArrayBuffer.empty[Array[Byte]]
    def obj(id: Int, body: String): Array[Byte] =
      s"$id 0 obj\n$body\nendobj\n".getBytes(Latin1)

    val kids = (0 until nPages).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    objs += obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    objs += obj(2, s"<< /Type /Pages /Kids [$kids] /Count $nPages >>")
    objs += obj(3, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica" +
      " /Encoding /WinAnsiEncoding >>")

    val pageArrays = if (pages.isEmpty) Array(Array("")) else pages
    pageArrays.zipWithIndex.foreach { case (pageLines, i) =>
      val pageId = 4 + 2 * i
      val contentId = pageId + 1
      val shows = pageLines.zipWithIndex.map { case (l, j) =>
        if (j == 0) s"(${escapeString(l)}) Tj"
        else s"T* (${escapeString(l)}) Tj"
      }.mkString("\n")
      val content =
        s"BT\n/F1 11 Tf\n14 TL\n72 756 Td\n$shows\nET\n".getBytes(Latin1)
      val packed = deflate(content)
      objs += obj(pageId,
        s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]" +
          s" /Resources << /Font << /F1 3 0 R >> >> /Contents $contentId 0 R >>")
      val head = s"$contentId 0 obj\n<< /Length ${packed.length}" +
        s" /Filter /FlateDecode >>\nstream\n"
      val bos = new ByteArrayOutputStream()
      bos.write(head.getBytes(Latin1))
      bos.write(packed)
      bos.write("\nendstream\nendobj\n".getBytes(Latin1))
      objs += bos.toByteArray
    }

    val out = new ByteArrayOutputStream()
    out.write("%PDF-1.4\n%âãÏÓ\n".getBytes(Latin1))
    val offsets = ArrayBuffer.empty[Int]
    objs.foreach { o => offsets += out.size(); out.write(o) }
    val xrefAt = out.size()
    val sb = new StringBuilder
    sb.append(s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\n")
    sb.append(s"startxref\n$xrefAt\n%%EOF\n")
    out.write(sb.toString.getBytes(Latin1))
    out.toByteArray
  }

  /** "Scanned" PDF: one page carrying the text ONLY as pixels — a
    * DeviceGray 8-bit image XObject rendered by [[GlyphOcr.render]],
    * Flate-compressed samples, a content stream that just paints the
    * image (`cm` + `Do`, no `BT` anywhere). The writer side of the
    * scanned-document fixture loop: [[extractText]] finds no text layer
    * and must recover the content optically. */
  def writeScanned(text: String): Array[Byte] = {
    val img = GlyphOcr.render(if (text == null) "" else text)
    val (w, h) = (img.getWidth, img.getHeight)
    val samples = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        samples(y * w + x) = img.getRaster.getSample(x, y, 0).toByte
        x += 1
      }
      y += 1
    }
    val packedImg = deflate(samples)
    // paint at native pixel size in the bottom-left corner of the page
    val content = s"q $w 0 0 $h 0 0 cm /Im1 Do Q\n".getBytes(Latin1)

    val objs = ArrayBuffer.empty[Array[Byte]]
    def obj(id: Int, body: String): Array[Byte] =
      s"$id 0 obj\n$body\nendobj\n".getBytes(Latin1)
    def streamObj(id: Int, dict: String, data: Array[Byte]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      bos.write(s"$id 0 obj\n<< $dict /Length ${data.length} >>\nstream\n"
        .getBytes(Latin1))
      bos.write(data)
      bos.write("\nendstream\nendobj\n".getBytes(Latin1))
      bos.toByteArray
    }
    objs += obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    objs += obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    objs += obj(3, s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]" +
      s" /Resources << /XObject << /Im1 4 0 R >> >> /Contents 5 0 R >>")
    objs += streamObj(4, s"/Type /XObject /Subtype /Image /Width $w" +
      s" /Height $h /ColorSpace /DeviceGray /BitsPerComponent 8" +
      s" /Filter /FlateDecode", packedImg)
    objs += streamObj(5, "", content)

    val out = new ByteArrayOutputStream()
    out.write("%PDF-1.4\n%âãÏÓ\n".getBytes(Latin1))
    val offsets = ArrayBuffer.empty[Int]
    objs.foreach { o => offsets += out.size(); out.write(o) }
    val xrefAt = out.size()
    val sb = new StringBuilder
    sb.append(s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\n")
    sb.append(s"startxref\n$xrefAt\n%%EOF\n")
    out.write(sb.toString.getBytes(Latin1))
    out.toByteArray
  }

  /** Write one PDF per row to `dir` as `<id>.pdf` — executed on the
    * executors (`foreachPartition`), so a large corpus renders in
    * parallel; `dir` must be a shared filesystem path on a real cluster
    * (local FS under local[*]). `render` picks the page shape — the
    * born-digital [[write]] default or [[writeScanned]]. */
  def writeDocs(df: DataFrame, dir: String,
                idCol: String = "doc_id", textCol: String = "text",
                render: String => Array[Byte] = write(_)): Unit = {
    val root = new java.io.File(dir)
    if (root.exists()) {
      Option(root.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".pdf")).foreach(_.delete())
    }
    root.mkdirs()
    // spread the render: a filtered scan of a small id range often
    // arrives as ONE split, serializing every file-create in one task
    // (event-log: a 2000-file corpus rendered 17 s single-task, pure FS
    // latency). ensure() repartitions up only when the incoming split
    // count is far below the session's parallelism — at scale it is a
    // no-op and the render stays shuffle-free.
    graft.ops.Parallelism.ensure(df.select(idCol, textCol))
      .foreachPartition { it: Iterator[Row] =>
      it.foreach { r =>
        val id = r.get(0).toString
        val text = Option(r.getString(1)).getOrElse("")
        val f = java.nio.file.Paths.get(dir, s"$id.pdf")
        java.nio.file.Files.write(f, render(text))
      }
    }
  }

  // ---------------------------------------------------------------- reader

  /** Direct `/Length 123` (not the indirect `/Length 12 0 R` form). */
  private val DirectLength = """/Length\s+(\d+)\b(?!\s+\d+\s+R)""".r

  private def inflate(raw: Array[Byte]): Option[Array[Byte]] =
    try {
      val bos = new ByteArrayOutputStream(raw.length * 4 + 64)
      val out = new InflaterOutputStream(bos, new Inflater())
      out.write(raw); out.close()
      Some(bos.toByteArray)
    } catch { case _: Exception => None }

  /** Inflate with a hard output cap: None once `maxOut` is exceeded, so a
    * crafted stream can't expand into an allocation that kills the task
    * (OutOfMemoryError is an Error no `catch Exception` recovers). */
  private def inflateBounded(raw: Array[Byte], maxOut: Int): Option[Array[Byte]] =
    try {
      val inf = new Inflater()
      inf.setInput(raw)
      val bos = new ByteArrayOutputStream(math.min(raw.length * 4 + 64, maxOut))
      val buf = new Array[Byte](64 * 1024)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return None // stuck (dict needed etc.)
        if (bos.size() + n > maxOut) return None
        bos.write(buf, 0, n)
      }
      inf.end()
      Some(bos.toByteArray)
    } catch { case _: Exception => None }

  def extractText(bytes: Array[Byte]): String = extractText(bytes, None)

  /** Extract the text layer of a PDF. Streams appear in file order —
    * page order for linearly-written files (ours included); pages join
    * with a newline. A document with NO text layer anywhere falls back to
    * `ocr` over its embedded image XObjects (the scanned-document path;
    * "" when no engine is supplied — the pre-OCR behavior). The fallback
    * is document-level, like the reference's loader: pages with text
    * keep their extraction, decorative images in born-digital files are
    * never OCR-noise. */
  def extractText(bytes: Array[Byte], ocr: Option[OcrEngine]): String = {
    val s = new String(bytes, Latin1)
    val parts = ArrayBuffer.empty[String]
    // (dict, dataStart, dataEnd) offsets only — bodies are sliced lazily
    // inside the fallback, so a photo-heavy born-digital PDF never copies
    // its image megabytes just to discard them
    val images = ArrayBuffer.empty[(String, Int, Int)]
    var from = 0
    while ({
      val at = s.indexOf("stream", from)
      if (at < 0) false
      else {
        // skip the keyword + the single EOL the spec requires after it
        var dataStart = at + "stream".length
        if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
        // the governing dict sits between the previous object head and
        // `stream`; FlateDecode there selects inflation
        val dictFrom = math.max(0, math.max(
          s.lastIndexOf("obj", at), s.lastIndexOf("endstream", at)))
        val dict = s.substring(dictFrom, at)
        // prefer a direct /Length to locate the data end (binary stream
        // bodies may contain the bytes "endstream" by chance); fall back
        // to the keyword scan when /Length is an indirect reference
        val directLen = DirectLength.findFirstMatchIn(dict).map(_.group(1).toInt)
          .filter(l => dataStart + l <= s.length &&
            s.indexOf("endstream", dataStart + l) >= 0)
        val end = directLen.map(l => s.indexOf("endstream", dataStart + l))
          .getOrElse(s.indexOf("endstream", dataStart))
        if (end < 0) false
        else {
          var dataEnd = directLen.map(dataStart + _).getOrElse {
            // spec: EOL before `endstream` is not stream data
            var e = end
            if (e > dataStart && s.charAt(e - 1) == '\n') e -= 1
            if (e > dataStart && s.charAt(e - 1) == '\r') e -= 1
            e
          }
          if (dataEnd > end) dataEnd = end
          if (dict.contains("/Image")) {
            // decode lazily — only a text-layer-free document pays for it
            if (ocr.isDefined) images += ((dict, dataStart, dataEnd))
          } else {
            val raw = bytes.slice(dataStart, dataEnd)
            val body =
              if (dict.contains("/FlateDecode")) inflate(raw)
              else Some(raw)
            body.map(new String(_, Latin1)).foreach { content =>
              if (content.contains("BT")) {
                // a corrupt stream must cost its own text only, never the
                // scan — the loader applies this over arbitrary files
                val t = try extractFromContent(content)
                  catch { case _: Exception => "" }
                if (t.nonEmpty) parts += t
              }
            }
          }
          from = end + "endstream".length
          true
        }
      }
    }) ()
    if (parts.isEmpty && images.nonEmpty) ocr match {
      case Some(engine) =>
        images.flatMap { case (dict, ds, de) =>
          decodeImageXObject(dict, bytes.slice(ds, de))
            .map(engine.recognize).filter(_.nonEmpty)
        }.mkString("\n")
      case None => ""
    }
    else parts.mkString("\n")
  }

  /** Integer dict value with the same indirect-reference guard as
    * [[DirectLength]]: `/Width 12 0 R` must be a skip, not Width=12. */
  private val DictInt = """/(Width|Height|BitsPerComponent)\s+(\d+)\b(?!\s+\d+\s+R)""".r

  /** A page raster larger than this is not a page we OCR (64M samples
    * ≈ a 600-dpi A4 page area with headroom); also the inflate cap, so a
    * crafted zlib bomb in a text-free PDF can't balloon a small stream
    * into gigabytes mid-scan. */
  private val MaxImageSamples = 64 << 20

  /** Image XObject body → raster: DCT bodies are whole JPEG files (ImageIO
    * reads them directly); otherwise inflate-if-Flate and rebuild the
    * DeviceGray 8-bit sample grid. Unsupported color spaces / truncated
    * bodies / absurd declared dimensions yield None — the scan never
    * fails on someone else's PDF. */
  private def decodeImageXObject(dict: String,
                                 raw: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try {
      if (dict.contains("/DCTDecode")) {
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(raw)))
      } else {
        val ints = DictInt.findAllMatchIn(dict)
          .map(m => m.group(1) -> m.group(2).toInt).toMap
        for {
          w <- ints.get("Width") if w > 0
          h <- ints.get("Height") if h > 0
          // Long math: declared 50000x50000 must fail the cap, not
          // overflow Int into a negative bound every length passes
          if w.toLong * h <= MaxImageSamples
          if ints.getOrElse("BitsPerComponent", 8) == 8
          if dict.contains("/DeviceGray")
          samples <- if (dict.contains("/FlateDecode"))
            inflateBounded(raw, MaxImageSamples) else Some(raw)
          if samples.length >= w * h
        } yield {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.getRaster.setSample(x, y, 0, samples(y * w + x) & 0xFF)
              x += 1
            }
            y += 1
          }
          img
        }
      }
    } catch { case _: Exception => None }

  private object ArrayMark // TJ '[' sentinel (can't collide with data)

  /** Interpret the text operators of one content stream. */
  private[graft] def extractFromContent(content: String): String = {
    val out = new StringBuilder
    val operands = ArrayBuffer.empty[Any] // String | Double | ArrayMark
    var inText = false
    var shown = false // any glyphs shown since last line move
    var leading = 0.0
    var lineY = Double.NaN
    var i = 0
    val n = content.length

    def newlineIfShown(): Unit = if (shown) { out.append('\n'); shown = false }

    def moveTo(y: Double): Unit = {
      if (!lineY.isNaN && y != lineY) newlineIfShown()
      lineY = y
    }

    def num(k: Int): Double = {
      // k-th numeric operand from the end (0 = last)
      var seen = -1
      var idx = operands.length - 1
      while (idx >= 0) {
        operands(idx) match {
          case d: Double => seen += 1; if (seen == k) return d
          case _ =>
        }
        idx -= 1
      }
      0.0
    }

    def showString(str: String): Unit = { out.append(str); shown = true }

    def parseLiteral(): String = {
      // content(i) == '('
      i += 1
      val b = new StringBuilder
      var depth = 1
      while (i < n && depth > 0) {
        content.charAt(i) match {
          case '\\' if i + 1 < n =>
            i += 1
            content.charAt(i) match {
              case 'n' => b.append('\n'); i += 1
              case 'r' => b.append('\r'); i += 1
              case 't' => b.append('\t'); i += 1
              case 'b' => b.append('\b'); i += 1
              case 'f' => b.append('\f'); i += 1
              case '(' => b.append('('); i += 1
              case ')' => b.append(')'); i += 1
              case '\\' => b.append('\\'); i += 1
              case '\r' => // line continuation: swallow EOL
                i += 1; if (i < n && content.charAt(i) == '\n') i += 1
              case '\n' => i += 1
              case d if d >= '0' && d <= '7' =>
                var v = 0; var k = 0
                while (k < 3 && i < n && content.charAt(i) >= '0' &&
                  content.charAt(i) <= '7') {
                  v = v * 8 + (content.charAt(i) - '0'); i += 1; k += 1
                }
                b.append((v & 0xff).toChar)
              case other => b.append(other); i += 1 // spec: drop the backslash
            }
          case '(' => depth += 1; b.append('('); i += 1
          case ')' =>
            depth -= 1; if (depth > 0) b.append(')')
            i += 1
          case '\r' => // raw EOL inside string normalizes to \n
            b.append('\n'); i += 1
            if (i < n && content.charAt(i) == '\n') i += 1
          case c => b.append(c); i += 1
        }
      }
      b.toString
    }

    def parseHex(): String = {
      // content(i) == '<' (single)
      i += 1
      val digits = new StringBuilder
      while (i < n && content.charAt(i) != '>') {
        val c = content.charAt(i)
        if (Character.digit(c, 16) >= 0) digits.append(c)
        i += 1
      }
      i += 1 // '>'
      if (digits.length % 2 == 1) digits.append('0')
      val b = new StringBuilder
      var k = 0
      while (k < digits.length) {
        b.append(Integer.parseInt(digits.substring(k, k + 2), 16).toChar)
        k += 2
      }
      b.toString
    }

    while (i < n) {
      val c = content.charAt(i)
      if (c == '%') { // comment to EOL
        while (i < n && content.charAt(i) != '\n' && content.charAt(i) != '\r') i += 1
      } else if (c.isWhitespace) i += 1
      else if (c == '(') operands += parseLiteral()
      else if (c == '<' && i + 1 < n && content.charAt(i + 1) == '<') {
        i += 2 // dict open — not an operand we track
      } else if (c == '>' && i + 1 < n && content.charAt(i + 1) == '>') i += 2
      else if (c == '<') operands += parseHex()
      else if (c == '[') { operands += ArrayMark; i += 1 }
      else if (c == ']') i += 1
      else if (c == '/') { // name — skip
        i += 1
        while (i < n && !content.charAt(i).isWhitespace &&
          !"()<>[]{}/%".contains(content.charAt(i))) i += 1
      } else if (c == '+' || c == '-' || c == '.' || c.isDigit) {
        val start = i
        i += 1
        while (i < n && (content.charAt(i).isDigit || content.charAt(i) == '.')) i += 1
        // a lone sign/dot (malformed or an unknown op) is not a number —
        // drop it rather than throw inside a million-file scan
        val tok = content.substring(start, i)
        try operands += tok.toDouble
        catch { case _: NumberFormatException => () }
      } else {
        // operator: ' and " are single-char; everything else a letter/* word
        val op =
          if (c == '\'' || c == '"') { i += 1; c.toString }
          else {
            val start = i
            while (i < n && (content.charAt(i).isLetter ||
              content.charAt(i) == '*')) i += 1 // Tf, T*, B*, W*, …
            if (i == start) { i += 1; content.substring(start, start + 1) }
            else content.substring(start, i)
          }
        op match {
          case "BT" => inText = true // lineY persists: a later absolute
          // move (Tm) at a different y still registers as a line break
          case "ET" => inText = false
          case "BI" => // inline image: skip through EI
            val ei = content.indexOf("EI", i)
            i = if (ei < 0) n else ei + 2
          case "Td" | "TD" if inText =>
            val ty = num(0)
            if (op == "TD") leading = -ty
            if (lineY.isNaN) lineY = ty else moveTo(lineY + ty)
          case "Tm" if inText =>
            moveTo(num(0)) // f (ty) is the last numeric operand
          case "T*" if inText =>
            newlineIfShown(); if (!lineY.isNaN) lineY -= leading
          case "TL" => leading = num(0)
          case "Tj" if inText =>
            operands.reverseIterator.collectFirst { case s: String => s }
              .foreach(showString)
          case "'" | "\"" if inText =>
            newlineIfShown(); if (!lineY.isNaN) lineY -= leading
            operands.reverseIterator.collectFirst { case s: String => s }
              .foreach(showString)
          case "TJ" if inText =>
            // strings since the matching '[' in order, kern numbers dropped
            val mark = operands.lastIndexOf(ArrayMark)
            val arr = if (mark >= 0) operands.drop(mark + 1) else operands.toSeq
            arr.foreach { case s: String => showString(s); case _ => }
          case _ => // graphics/state op — irrelevant to text
        }
        operands.clear()
      }
    }
    out.toString
  }
}
