package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Path-based document loading — the reference's knowledge loader
  * (ondine/knowledge/loader.py:34-211): txt / md / html / csv / pdf
  * files plus raster images (loader.py:96-150), single path or recursive
  * directory walk, one document per file. PDF covers born-digital text
  * layers via [[Pdf.extractText]]; image files go through the
  * [[OcrEngine]] seam — the built-in [[GlyphOcr]] reads machine-set
  * fixed-metric type from pixels; natural scans need a Tesseract-class
  * engine dropped into the same seam (SURVEY §7.6).
  *
  * Spark-first: the walk is a `binaryFile` scan (distributed listing +
  * read, no driver-side I/O); decoding and html-stripping are Catalyst
  * expressions and pdf extraction a pure bytes→text function, so a
  * million-file corpus loads as a normal parallel scan.
  * Output: (doc_id BIGINT = xxhash64(path), path, ext, text).
  */
object DocumentLoader {

  val SupportedGlob = "*.{txt,md,markdown,html,htm,csv,pdf,png,bmp,gif,jpg,jpeg}"

  private val ImageExts = Seq("png", "bmp", "gif", "jpg", "jpeg")

  /** PDF text layer as a column fn — a UDF by necessity (streaming
    * parser state), applied only on the pdf branch of the dispatch.
    * Text-layer-free documents fall back to OCR over their embedded
    * page images (the scanned-document path). */
  private def extractPdf(engine: OcrEngine) =
    udf((b: Array[Byte]) =>
      if (b == null) "" else Pdf.extractText(b, Some(engine)))

  /** Strip html to text: drop script/style blocks, tags, decode the
    * common entities, collapse runs of whitespace (loader.py's
    * html2text-lite equivalent). */
  def stripHtml(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val noScript = regexp_replace(c, "(?is)<(script|style)[^>]*>.*?</\\1>", " ")
    val noTags = regexp_replace(noScript, "(?s)<[^>]*>", " ")
    val decoded = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(noTags,
        "&quot;", "\""), "&#39;", "'"), "&lt;", "<"), "&gt;", ">"),
      "&amp;", "&")
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** csv-to-text: cells joined by spaces, rows by newlines — the loader's
    * "csv rows become text lines" shape (loader.py:150-170). */
  private def csvToText(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(c, "[,;\\t]", " "))

  /** Load one file or a directory tree. `engine` is the OCR provider for
    * image files and text-layer-free (scanned) PDFs — the drop-in point
    * for a Tesseract-class model; the default reads machine-set
    * fixed-metric type. */
  def load(spark: SparkSession, path: String,
           recursive: Boolean = true,
           engine: OcrEngine = GlyphOcr): DataFrame = {
    val raw = spark.read.format("binaryFile")
      .option("pathGlobFilter", SupportedGlob)
      .option("recursiveFileLookup", recursive.toString)
      .load(path)
    val ext = lower(regexp_extract(col("path"), "\\.([A-Za-z]+)$", 1))
    val text0 = decode(col("content"), "UTF-8")
    val text = when(ext.isin("html", "htm"), stripHtml(text0))
      .when(ext === "csv", csvToText(text0))
      .when(ext === "pdf", extractPdf(engine)(col("content")))
      .when(ext.isin(ImageExts: _*), Ocr.ocrColumn(col("content"), engine))
      .otherwise(text0)
    raw.select(
      xxhash64(col("path")).as("doc_id"),
      col("path"),
      ext.as("ext"),
      text.as("text"))
  }
}
