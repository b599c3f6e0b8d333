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

  test("multi-line pages round-trip exactly (trailing pad cells rtrimmed)") {
    val s = "line one\nline two!\nand #3"
    assert(GlyphOcr.recognize(GlyphOcr.render(s)) == s)
    // blank middle line survives as an empty line, not as spaces
    val t = "top\n\nbottom"
    assert(GlyphOcr.recognize(GlyphOcr.render(t)) == t)
  }

  test("empty text is a margin-only page, not a phantom space") {
    assert(GlyphOcr.recognize(GlyphOcr.render("")) == "")
    assert(Ocr.recognizeBytes(GlyphOcr.renderPng("")) == "")
  }

  test("faded grayscale ink reads by sample value, not gamma-shifted sRGB") {
    val img = GlyphOcr.render("FADED 42")
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      if (img.getRaster.getSample(x, y, 0) < 128)
        img.getRaster.setSample(x, y, 0, 100) // ink at gray 100 — still < 128
    assert(GlyphOcr.recognize(img) == "FADED 42")
  }

  test("RGB rasters recognize through the luminance branch") {
    val gray = GlyphOcr.render("RGB path")
    val rgb = new java.awt.image.BufferedImage(
      gray.getWidth, gray.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
    rgb.getGraphics.drawImage(gray, 0, 0, null)
    assert(GlyphOcr.recognize(rgb) == "RGB path")
  }

  test("a photo is rejected as not-text, never emitted as garbage glyphs") {
    // deterministic noise "photo": cells land far from every glyph
    val img = new java.awt.image.BufferedImage(
      124, 49, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var seed = 12345L
    for (y <- 0 until 49; x <- 0 until 124) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      img.getRaster.setSample(x, y, 0, ((seed >>> 33) & 0xFF).toInt)
    }
    assert(GlyphOcr.recognize(img) == "")
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
    val pass = Ocr.ocrImages(df, "page")
    // assert the pass itself is shuffle-free BEFORE the test's own orderBy
    // adds its range exchange (which would make any plan check vacuous)
    val plan = pass.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in OCR pass:\n$plan")
    assert(pass.orderBy("id").select("ocr_text").as[String].collect().toSeq == texts)
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

  test("DCT (JPEG) scanned pages decode through ImageIO and recognize") {
    import graft.sources.Pdf
    val msg = "JPEG SCAN 99"
    val img = GlyphOcr.render(msg)
    val bos = new java.io.ByteArrayOutputStream()
    // high-quality JPEG — the realistic scanned-page encoding; the OCR
    // nearest-match tolerance absorbs the residual codec noise
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.95f)
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    w.dispose(); ios.close()
    val jpeg = bos.toByteArray
    val head = ("%PDF-1.4\n1 0 obj\n<< /Type /XObject /Subtype /Image" +
      s" /Width ${img.getWidth} /Height ${img.getHeight}" +
      " /ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /DCTDecode" +
      s" /Length ${jpeg.length} >>\nstream\n").getBytes("ISO-8859-1")
    val pdf = head ++ jpeg ++ "\nendstream\nendobj\n".getBytes("ISO-8859-1")
    assert(Pdf.extractText(pdf, Some(GlyphOcr)) == msg)
  }

  test("hostile image dicts are skipped: huge declared dims, indirect refs") {
    import graft.sources.Pdf
    def fakePdf(dict: String, body: String): Array[Byte] =
      (s"%PDF-1.4\n1 0 obj\n<< /Type /XObject /Subtype /Image $dict" +
        s" /Length ${body.length} >>\nstream\n$body\nendstream\nendobj\n")
        .getBytes("ISO-8859-1")
    // 50000x50000 would overflow Int w*h; must skip, not allocate
    assert(Pdf.extractText(fakePdf(
      "/Width 50000 /Height 50000 /ColorSpace /DeviceGray /BitsPerComponent 8",
      "AAAAA"), Some(GlyphOcr)) == "")
    // indirect-reference dims must be a skip, not Width=12
    assert(Pdf.extractText(fakePdf(
      "/Width 12 0 R /Height 13 0 R /ColorSpace /DeviceGray /BitsPerComponent 8",
      "A" * 200), Some(GlyphOcr)) == "")
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

  // ---- sidecar engine (the Tesseract-class drop-in seam) ----

  private def python3: Option[String] =
    Seq("/usr/bin/python3", "/usr/local/bin/python3").find(p =>
      new java.io.File(p).canExecute)

  /** Deterministic mock OCR sidecar: replies "dim:WxH:sha8" computed from
    * the ACTUAL decoded PNG bytes (w/h unpacked from the IHDR), so the
    * arc proves an intact raster crossed the process boundary; a 1-px-wide
    * image draws a per-image error; a 2-px-wide image kills the child. */
  private lazy val sidecar: java.nio.file.Path = {
    val p = Files.createTempFile("graft_ocr_sidecar", ".py")
    Files.writeString(p,
      """import sys, json, base64, hashlib, struct
        |for line in sys.stdin:
        |    req = json.loads(line)
        |    raw = base64.b64decode(req["png_b64"])
        |    w, h = struct.unpack(">II", raw[16:24])
        |    if w == 1:
        |        out = {"id": req["id"], "error": "unreadable"}
        |    elif w == 2:
        |        sys.exit(3)
        |    else:
        |        out = {"id": req["id"],
        |               "text": "dim:%dx%d:%s" % (w, h, hashlib.sha1(raw).hexdigest()[:8])}
        |    sys.stdout.write(json.dumps(out) + "\n")
        |    sys.stdout.flush()
        |""".stripMargin)
    p
  }

  private def withSidecarEngine[A](f: graft.sources.ProcessOcrEngine => A): A = {
    val py = python3.getOrElse(cancel("python3 not available"))
    val e = new graft.sources.ProcessOcrEngine(
      Seq(py, sidecar.toString), timeoutMs = 15000L)
    try f(e) finally graft.sources.ProcessOcrEngine.shutdownAll()
  }

  private def pngSha8(img: java.awt.image.BufferedImage): String = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    java.security.MessageDigest.getInstance("SHA-1")
      .digest(bos.toByteArray).map("%02x".format(_)).mkString.take(8)
  }

  test("sidecar engine round-trips the exact raster to a real child process") {
    withSidecarEngine { e =>
      val img = GlyphOcr.render("HELLO 42")
      assert(e.recognize(img) ===
        s"dim:${img.getWidth}x${img.getHeight}:${pngSha8(img)}")
    }
  }

  test("sidecar per-image error yields empty text (pipeline stays total)") {
    withSidecarEngine { e =>
      val bad = new java.awt.image.BufferedImage(1, 5,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      assert(e.recognize(bad) === "")
      // and the child is still healthy for the next image
      val ok = GlyphOcr.render("X")
      assert(e.recognize(ok).startsWith("dim:"))
    }
  }

  test("a dead sidecar fails the call loudly, then respawns on the next one") {
    withSidecarEngine { e =>
      val killer = new java.awt.image.BufferedImage(2, 5,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      intercept[RuntimeException](e.recognize(killer))
      // respawned child serves the follow-up call
      val ok = GlyphOcr.render("BACK")
      assert(e.recognize(ok).startsWith("dim:"))
    }
  }

  /** Sidecar that sleeps 250 ms before every reply — healthy but busy:
    * pages queue behind each other on the serialized stdin. */
  private lazy val slowSidecar: java.nio.file.Path = {
    val p = Files.createTempFile("graft_ocr_slow_sidecar", ".py")
    Files.writeString(p,
      """import sys, json, time
        |for line in sys.stdin:
        |    req = json.loads(line)
        |    time.sleep(0.25)
        |    sys.stdout.write(json.dumps({"id": req["id"], "text": "slowpage"}) + "\n")
        |    sys.stdout.flush()
        |""".stripMargin)
    p
  }

  test("queue wait behind a busy-but-replying sidecar does not evict the shared child") {
    val py = python3.getOrElse(cancel("python3 not available"))
    // 6 pages, 250 ms serialized each: the LAST page's reply lands ~1.5 s
    // in — far past the 600 ms single-window timeout. The old first-raw-
    // timeout eviction close()d the shared child here, failAll()ing every
    // other in-flight page; the activity-aware deadline keeps waiting
    // while replies flow, so every page must succeed on ONE child.
    val e = new graft.sources.ProcessOcrEngine(
      Seq(py, slowSidecar.toString), timeoutMs = 600L)
    try {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
      val futs = (0 until 6).map { i =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String = e.recognize(GlyphOcr.render(s"PAGE $i"))
        })
      }
      val texts = futs.map(_.get(30, java.util.concurrent.TimeUnit.SECONDS))
      pool.shutdown()
      assert(texts.forall(_ == "slowpage"),
        s"all queued pages must survive one slow neighbor: $texts")
    } finally graft.sources.ProcessOcrEngine.shutdownAll()
  }

  /** Sidecar that consumes requests and never replies — truly wedged. */
  private lazy val wedgedSidecar: java.nio.file.Path = {
    val p = Files.createTempFile("graft_ocr_wedged_sidecar", ".py")
    Files.writeString(p,
      """import sys
        |for line in sys.stdin:
        |    pass
        |""".stripMargin)
    p
  }

  test("a truly wedged sidecar (zero replies for a full window) is evicted loudly") {
    val py = python3.getOrElse(cancel("python3 not available"))
    val e = new graft.sources.ProcessOcrEngine(
      Seq(py, wedgedSidecar.toString), timeoutMs = 400L)
    try {
      val ex = intercept[RuntimeException](e.recognize(GlyphOcr.render("X")))
      assert(ex.getMessage.contains("wedged"),
        s"expected wedged-eviction error, got: ${ex.getMessage}")
    } finally graft.sources.ProcessOcrEngine.shutdownAll()
  }

  test("ocrImages runs the sidecar engine inside executor tasks") {
    withSidecarEngine { e =>
      val spark = SparkSpec.session
      import scala.jdk.CollectionConverters._
      val rows = (0 until 8).map { i =>
        org.apache.spark.sql.Row(i, GlyphOcr.renderPng(s"ROW $i"))
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("img",
          org.apache.spark.sql.types.BinaryType)))
      val df = spark.createDataFrame(rows.asJava, schema).repartition(4)
      val out = Ocr.ocrImages(df, "img", engine = e)
        .select("id", "ocr_text").collect()
      assert(out.length == 8)
      assert(out.forall(_.getString(1).startsWith("dim:")),
        "every task must reach the shared per-JVM sidecar")
    }
  }
}
