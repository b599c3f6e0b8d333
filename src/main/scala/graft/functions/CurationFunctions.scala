package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Corpus-curation column functions for pretraining-data pipelines:
  * within-document repetition signals (the Gopher/C4 family of filters)
  * and PII detection/redaction.
  *
  * Everything compiles to built-in Catalyst higher-order / regexp
  * expressions — codegen'd, zero UDFs, zero shuffles: each signal is a
  * pure map over the row, so the filters run at scan speed and compose
  * with predicate pushdown at 100 TB. The same arithmetic is expressible
  * in ANSI SQL (DuckDB list comprehensions / RE2 regexps), which is what
  * the driver's oracle verifies.
  *
  * Reference seed: the reference gates rows on quality/validity before
  * spending LLM calls (ondine/stages/quality.py analog); the repetition
  * rules follow the published Gopher (Rae et al. 2021, §A1.1) and C4
  * heuristics. Counts are exact integers; ratios are int/int IEEE
  * divisions so any engine reproduces them bit-for-bit.
  */
object CurationFunctions {

  /** Word 2-grams joined by a single space; <2 words → empty array.
    * Delegates to [[TextFunctions.shingles]] — one sliding-window
    * implementation keeps the cross-engine oracle arithmetic in exactly
    * one place. */
  def wordBigrams(words: Column): Column = TextFunctions.shingles(words, 2)

  /** Word 3-grams joined by single spaces; <3 words → empty array. */
  def wordTrigrams(words: Column): Column = TextFunctions.shingles(words, 3)

  /** Fraction of array elements that are duplicates of an earlier one:
    * (n - n_distinct) / n. 0 for empty arrays. */
  def dupFrac(arr: Column): Column =
    when(size(arr) === 0, 0.0).otherwise(
      (size(arr) - size(array_distinct(arr))).cast("double") / size(arr))

  /** Single sorted-run fold computing max over equal-runs of
    * `runValue(element, runLength)`: sort the array, walk it once with a
    * (prev, run, best) struct accumulator. O(n log n) per row vs the
    * naive O(distinct × n) double scan — the naive form cost q65 ~23 s
    * at sf0.1 (4.5 ms/doc in interpreted higher-order exprs); this fold
    * runs the same documents in ~2 s. Still one shuffle-free map.
    * STRING arrays only: the accumulator's `prev` slot is string-typed
    * (the Column API cannot introspect the element type to seed a typed
    * null); token/n-gram arrays are the only intended inputs. */
  private def maxRunFold(arr: Column,
      runValue: (Column, Column) => Column): Column = {
    val folded = aggregate(
      // drop nulls first: the naive formulation's ===-filter never counted
      // null elements, and null <=> null would otherwise tally null runs
      array_sort(filter(arr, x => x.isNotNull)),
      struct(lit(null).cast("string").as("prev"), lit(0).as("run"),
        lit(0).as("best")),
      (acc, x) => {
        val run = when(acc.getField("prev") <=> x,
          acc.getField("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), runValue(x, run)).as("best"))
      })
    folded.getField("best")
  }

  /** Occurrence count of the most frequent element (0 for empty). */
  def topCount(arr: Column): Column =
    when(size(arr) === 0, lit(0)).otherwise(
      maxRunFold(arr, (_, run) => run))

  /** Characters covered by the most-covering n-gram: max over distinct
    * grams of count(gram) × length(gram). The Gopher "fraction of chars
    * in the top n-gram" numerator, without needing a cross-engine argmax
    * (ties resolve by taking the max coverage, not a winner gram).
    * The run-max updates at every element of a run, so the run's final
    * element contributes the full count × length. */
  def topCoverage(grams: Column): Column =
    when(size(grams) === 0, lit(0)).otherwise(
      maxRunFold(grams, (x, run) => run * length(x)))

  /** Mean word length as an int/int double; 0 for empty. */
  def meanWordLen(words: Column): Column =
    when(size(words) === 0, 0.0).otherwise(
      aggregate(words, lit(0), (acc, w) => acc + length(w))
        .cast("double") / size(words))

  // --- PII ---------------------------------------------------------------

  /** Patterns kept to the regex subset with identical semantics in Java
    * (Spark codegen) and RE2 (DuckDB/Go): char classes, bounded repeats,
    * \b word boundaries. The driver-side telemetry scrubber
    * ([[graft.run.TraceSanitizer]]) carries a superset family; its email
    * pattern must stay case-aligned with [[EmailPattern]] — both use
    * [A-Za-z]{2,} TLDs (a lowercase-only TLD here once let
    * ALICE@EXAMPLE.COM through). Redaction order below matters: emails first
    * (their local/domain parts may contain '-' digit runs a phone
    * pattern could bite into), then phones, then IPs — phones and IPs
    * cannot overlap (dashes vs dots). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b\\d{3}-\\d{4}\\b"
  val IpPattern    = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def piiCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  /** Redact all three PII classes to typed placeholder tokens. */
  def redactPii(c: Column): Column = {
    val e = regexp_replace(c, EmailPattern, "<EMAIL>")
    val p = regexp_replace(e, PhonePattern, "<PHONE>")
    regexp_replace(p, IpPattern, "<IP>")
  }
}
