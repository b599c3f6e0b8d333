package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Input text cleaning chain
  * (reference: ondine/utils/input_preprocessing.py:45-157 — NFC unicode
  * normalize → strip control chars → strip special marks/zero-width/quote
  * normalize → collapse whitespace → word-boundary truncate).
  *
  * Everything except NFC and word-boundary truncation compiles to built-in
  * `regexp_replace` chains (whole-stage codegen). NFC and truncation are
  * small Scala UDFs — both are pure per-value string functions, so the
  * plan stays narrow; the UDF boundary only breaks codegen locally.
  */
object Preprocess {

  private val nfcUdf = udf { (s: String) =>
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
  }

  /** Truncate at the last word boundary before maxLen (rfind-a-space logic,
    * reference :110-122). */
  private def truncUdf(maxLen: Int) = udf { (s: String) =>
    if (s == null || s.length <= maxLen) s
    else {
      val cut = s.lastIndexOf(' ', maxLen)
      if (cut > 0) s.substring(0, cut) else s.substring(0, maxLen)
    }
  }

  def nfcNormalize(c: Column): Column = nfcUdf(c)

  def stripControlChars(c: Column): Column =
    regexp_replace(c, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", "")

  /** ®™© marks, zero-width chars, smart-quote normalization. */
  def stripSpecialChars(c: Column): Column = {
    val noMarks = regexp_replace(c, "[\\u00ae\\u2122\\u00a9\\u200b\\u200c\\u200d\\ufeff]", "")
    val quotes1 = regexp_replace(noMarks, "[\\u2018\\u2019]", "'")
    regexp_replace(quotes1, "[\\u201c\\u201d]", "\"")
  }

  def collapseWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** The full chain. */
  def clean(c: Column, maxLength: Option[Int] = None): Column = {
    val base = collapseWhitespace(stripSpecialChars(stripControlChars(nfcNormalize(c))))
    maxLength match {
      case Some(m) => truncUdf(m)(base)
      case None    => base
    }
  }
}
