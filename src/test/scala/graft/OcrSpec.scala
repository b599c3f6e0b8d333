package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DocumentLoader, GlyphOcr, Ocr}

/** Fixed-metric glyph OCR: atlas integrity, the exact optical round trip,
  * noise-tolerant classification (the property separating recognition
  * from decoding), and the DocumentLoader image branch. */
class OcrSpec extends AnyFunSuite {

  private val Printable = (32 to 126).map(_.toChar).mkString

  test("atlas: all 95 printable-ASCII glyph bitmaps are pairwise distinct") {
    val bms = GlyphOcr.Bitmaps
    for (i <- bms.indices; j <- (i + 1) until bms.length)
      assert(bms(i) != bms(j),
        s"glyphs '${(i + 32).toChar}' and '${(j + 32).toChar}' collide")
  }

  test("optical round trip: every printable ASCII char renders and reads back") {
    // chunks of 32 to keep pages small; the full alphabet in one line too
    Printable.grouped(32).foreach { chunk =>
      assert(GlyphOcr.recognize(GlyphOcr.render(chunk)) == chunk)
    }
    assert(GlyphOcr.recognize(GlyphOcr.render(Printable)) == Printable)
  }

  test("round trip survives the PNG container") {
    val s = "The quick brown fox jumps over the lazy dog! 0123456789"
    assert(Ocr.recognizeBytes(GlyphOcr.renderPng(s)) == s)
  }

  test("multi-line pages read back line by line") {
    val s = "line one\nline two!\nand #3"
    val out = GlyphOcr.recognize(GlyphOcr.render(s))
    // fixed-grid reader pads short lines with recognized spaces — strip
    // per line before comparing (an empty line IS spaces to a grid reader)
    assert(out.split("\n", -1).map(_.replaceAll(" +$", "")).mkString("\n") == s)
  }

  test("empty text is a margin-only page, not a phantom space") {
    assert(GlyphOcr.recognize(GlyphOcr.render("")) == "")
    assert(Ocr.recognizeBytes(GlyphOcr.renderPng("")) == "")
  }

  test("classification is nearest-neighbor: flipped pixels still recognize") {
    // Use a subset whose pairwise Hamming distance is >= 3, so a 1-pixel
    // flip is guaranteed recoverable; assert the margin first so the test
    // can't silently weaken if the face changes.
    val subset = "ACDEFGHJKLMNPQRSTUWXYZ2345679#&@"
    val idx = subset.map(c => c - 32)
    for (i <- idx.indices; j <- (i + 1) until idx.length) {
      val d = java.lang.Long.bitCount(
        GlyphOcr.Bitmaps(idx(i)) ^ GlyphOcr.Bitmaps(idx(j)))
      assert(d >= 3, s"'${subset(i)}' vs '${subset(j)}' distance $d < 3")
    }
    val img = GlyphOcr.render(subset)
    // deterministically flip one pixel inside each glyph cell
    subset.indices.foreach { ci =>
      val x = GlyphOcr.Margin + ci * GlyphOcr.CellW + (ci * 7) % GlyphOcr.GlyphW
      val y = GlyphOcr.Margin + (ci * 3) % GlyphOcr.GlyphH
      val r = img.getRaster
      r.setSample(x, y, 0, if (r.getSample(x, y, 0) < 128) 255 else 0)
    }
    assert(GlyphOcr.recognize(img) == subset)
  }

  test("unreadable payloads yield empty text, never a task failure") {
    assert(Ocr.recognizeBytes(null) == "")
    assert(Ocr.recognizeBytes(Array[Byte]()) == "")
    assert(Ocr.recognizeBytes("not an image".getBytes) == "")
    // valid PNG magic, corrupt body
    assert(Ocr.recognizeBytes(Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 0, 0)) == "")
  }

  test("ocrImages appends recognized text in a shuffle-free partition pass") {
    val spark = SparkSpec.session
    import spark.implicits._
    val texts = Seq("alpha 123", "Beta_Two!", "")
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, GlyphOcr.renderPng(t)) }
      .toDF("id", "page")
    val out = Ocr.ocrImages(df, "page").orderBy("id")
    assert(out.select("ocr_text").as[String].collect().toSeq == texts)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") || plan.contains("rangepartitioning"),
      s"unexpected shuffle in OCR pass:\n$plan")
  }

  test("scanned PDF: no text layer, text recovered optically from the XObject") {
    import graft.sources.Pdf
    val msg = "Invoice #4711 total: $123.45 (net)"
    val pdf = Pdf.writeScanned(msg)
    // no text layer: the plain extraction honestly returns nothing
    assert(Pdf.extractText(pdf) == "")
    // with the engine, the pixels read back exactly
    assert(Pdf.extractText(pdf, Some(GlyphOcr)) == msg)
    // born-digital pages keep their text layer and never OCR-noise
    val digital = Pdf.write("typed text")
    assert(Pdf.extractText(digital, Some(GlyphOcr)) == "typed text")
  }

  test("DocumentLoader routes text-layer-free PDFs through OCR") {
    val spark = SparkSpec.session
    val dir = Files.createTempDirectory("scanned_docs")
    val msg = "FAX page 1 of 1"
    Files.write(dir.resolve("fax.pdf"), graft.sources.Pdf.writeScanned(msg))
    val rows = DocumentLoader.load(spark, dir.toString).select("text").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq(msg))
  }

  test("DocumentLoader reads image files through the OCR branch") {
    val spark = SparkSpec.session
    val dir = Files.createTempDirectory("ocr_docs")
    val msg = "Scanned memo: approve budget 42"
    Files.write(dir.resolve("memo.png"), GlyphOcr.renderPng(msg))
    Files.write(dir.resolve("note.txt"), "plain note".getBytes)
    val docs = DocumentLoader.load(spark, dir.toString)
      .select("ext", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(docs("png") == msg)
    assert(docs("txt") == "plain note")
  }
}
