package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.sources.{DocumentLoader, Pdf}

/** The reader is held to MORE than the writer emits: a hand-crafted
  * uncompressed PDF in other producers' idioms — TJ kerning arrays, hex
  * strings, octal escapes, `'` line-show, Td/TD moves, multiple BT
  * blocks — so the round-trip oracle (q95) isn't self-consistent by
  * construction. Plus inverse-property checks writer→reader over the
  * tricky string space.
  */
class PdfSpec extends SparkSpec {

  private def rt(s: String): String = Pdf.extractText(Pdf.write(s))

  test("write→extract is the identity on Latin-1 text") {
    val cases = Seq(
      "hello world",
      "parens (nested (deep)) and \\ backslash",
      "line one\nline two\n\nline four after a blank",
      "trailing spaces   \n  leading too",
      "control\ttab and bell\u0007 char",
      "accented: café naïve ß straße",
      "",
      "\n",
      "ends with newline\n")
    cases.foreach { c => assert(rt(c) === c, s"roundtrip failed for ${c.take(40)}") }
  }

  test("chars above U+00FF degrade to ? (documented simple-font limit)") {
    assert(rt("snow ☃ man") === "snow ? man")
  }

  test("multi-page split at the line boundary reassembles") {
    val text = (1 to 130).map(i => s"line $i body").mkString("\n")
    val bytes = Pdf.write(text, maxLinesPerPage = 50)
    assert(new String(bytes, StandardCharsets.ISO_8859_1)
      .split("/Type /Page[^s]").length > 3) // 3 pages
    assert(Pdf.extractText(bytes) === text)
  }

  test("reads foreign idioms: TJ arrays, hex strings, octal, quote-show, TD") {
    val content =
      """BT
        |/F1 12 Tf
        |14 TL
        |72 720 Td
        |[(Hel) -30 (lo) 120 ( wor) (ld)] TJ
        |0 -14 TD
        |<48657820626F6479> Tj
        |(next via quote) '
        |T*
        |(oct: \101\102\103 done) Tj
        |ET
        |BT
        |1 0 0 1 72 600 Tm
        |(second block) Tj
        |ET""".stripMargin
    val pdf = rawPdf(content)
    val txt = Pdf.extractText(pdf)
    assert(txt ===
      "Hello world\nHex body\nnext via quote\noct: ABC done\nsecond block")
  }

  test("literal-string edge cases: continuation, raw EOL, unknown escape") {
    val content =
      "BT (split \\\nover lines) Tj (raw\nEOL) Tj (drop\\q) Tj ET"
    assert(Pdf.extractFromContent(content) === "split over linesraw\nEOLdropq")
  }

  test("adversarial content never throws: bad tokens, unclosed strings") {
    // lone sign/dot tokens, an unclosed literal, stray brackets
    assert(Pdf.extractFromContent("BT - . + (ok) Tj ET") === "ok")
    assert(Pdf.extractFromContent("BT (never closed") === "")
    assert(Pdf.extractFromContent("] >> BT <zz> Tj ET") === "")
    // corrupt flate body inside an otherwise-valid shell -> empty, no throw
    val shell = rawPdf("BT (x) Tj ET")
    val corrupt = new String(shell, StandardCharsets.ISO_8859_1)
      .replace("<< /Length", "<< /Filter /FlateDecode /Length")
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(Pdf.extractText(corrupt) === "")
  }

  test("non-text streams are skipped; missing text layer yields empty") {
    // a stream with no BT (e.g. font program bytes) → no text
    val pdf = rawPdf("0 0 612 792 re f")
    assert(Pdf.extractText(pdf) === "")
  }

  test("DocumentLoader dispatches .pdf through the extractor") {
    val dir = Files.createTempDirectory("graft_pdf_load")
    Files.write(dir.resolve("a.pdf"), Pdf.write("alpha doc"))
    Files.write(dir.resolve("b.pdf"), Pdf.write("beta doc"))
    Files.write(dir.resolve("c.txt"), "gamma doc".getBytes(StandardCharsets.UTF_8))
    val rows = DocumentLoader.load(spark, dir.toString)
      .select("ext", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows === Set(("pdf", "alpha doc"), ("pdf", "beta doc"),
      ("txt", "gamma doc")))
  }

  /** One-page uncompressed PDF around a verbatim content stream. */
  private def rawPdf(content: String): Array[Byte] = {
    val body =
      s"""%PDF-1.4
         |1 0 obj
         |<< /Type /Catalog /Pages 2 0 R >>
         |endobj
         |2 0 obj
         |<< /Type /Pages /Kids [3 0 R] /Count 1 >>
         |endobj
         |3 0 obj
         |<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >>
         |endobj
         |4 0 obj
         |<< /Length ${content.getBytes(StandardCharsets.ISO_8859_1).length} >>
         |stream
         |$content
         |endstream
         |endobj
         |trailer
         |<< /Size 5 /Root 1 0 R >>
         |%%EOF
         |""".stripMargin
    body.getBytes(StandardCharsets.ISO_8859_1)
  }
}
