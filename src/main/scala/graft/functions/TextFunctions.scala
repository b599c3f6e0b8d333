package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language ID, document
  * fingerprinting, 64-bit token hashing for MinHash/SimHash.
  *
  * Everything here compiles to built-in Catalyst expressions (codegen'd, no
  * UDFs), so the functions vectorize inside whole-stage codegen and push
  * into scans where possible. The same arithmetic is expressible in ANSI
  * SQL, which is what makes the driver's DuckDB oracle able to verify them.
  *
  * Reference seeds: tokenize/term_frequency
  * (crates/ondine-core/src/text/mod.rs:3-23), TF-IDF cosine (:27-66),
  * sentence split (ondine/knowledge/chunker.py:29-32); the rest are the
  * standard operations a 100 TB pretraining-data pipeline needs.
  */
object TextFunctions {

  /** Whitespace tokenization; empty input → empty array (not [""]). */
  // native one-scan tokenizer — value-identical to the retired
  // filter(split(trim(c), "\\s+"), _ =!= "") chain (spec-compared: the
  // composition reduces to maximal runs of non-\s characters), so every
  // oracle's regexp_split_to_array replay is untouched; no JDK regex
  // engine per document
  def tokens(c: Column): Column =
    Expressions.whitespace_tokens(c)

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count estimate: word-piece regex split — closer to a
    * real tokenizer's count than char/4 for English-like text. */
  def subwordCount(c: Column): Column =
    size(filter(split(lower(c), "[^a-z0-9']+"), t => t =!= "")) +
      size(filter(split(c, "[a-zA-Z0-9'\\s]+"), t => t =!= ""))

  /** Occurrences of a literal substring, via the length-difference trick —
    * identical semantics in any SQL engine. */
  def countOccurrences(c: Column, needle: String): Column =
    ((length(c) - length(replace(c, lit(needle), lit("")))) /
      needle.length).cast("int")

  /** Ratio of punctuation chars to total chars. */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, 0.0).otherwise(
      (length(c) - length(regexp_replace(c, "[\\p{Punct}]", "")))
        .cast("double") / length(c))

  /** Ratio of English stopword tokens (quality signal). */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "for")

  def stopwordRatio(c: Column): Column = {
    val toks = tokens(lower(c))
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => t.isInCollection(EnglishStopwords)))
        .cast("double") / size(toks))
  }

  /** Composite document quality score in [0,1] — the shape of the
    * reference's quality gating (length / punctuation / stopword ratios),
    * deterministic closed-form so it oracles exactly. */
  /** Flesch reading ease + Flesch–Kincaid grade as one codegen'd map —
    * the classic readability gate (C4-era pipelines screen on it).
    * Sentences = runs of [.!?] (min 1); syllables = vowel groups per
    * word, min 1 (the standard heuristic — exact syllabification needs
    * a dictionary; the heuristic is the published norm and is
    * SQL-replayable: both engines count identical regex matches).
    * Returns (n_words, n_sentences, n_syllables, fk_grade, flesch);
    * grade/ease null for empty docs. One IEEE chain each, 6dp. */
  def readability(text: Column): Seq[Column] = {
    val w = tokens(lower(text))
    val wc = size(w)
    val sc = greatest(regexp_count(text, lit("[.!?]+")), lit(1))
    val syl = aggregate(
      transform(w, t => greatest(regexp_count(t, lit("[aeiouy]+")), lit(1))),
      lit(0), (a, x) => a + x)
    val wD = wc.cast("double")
    val sD = sc.cast("double")
    val yD = syl.cast("double")
    Seq(wc.as("n_words"), sc.as("n_sentences"), syl.as("n_syllables"),
      when(wc > 0, round(lit(0.39) * (wD / sD) + lit(11.8) * (yD / wD) -
        lit(15.59), 6)).otherwise(lit(null).cast("double")).as("fk_grade"),
      when(wc > 0, round(lit(206.835) - lit(1.015) * (wD / sD) -
        lit(84.6) * (yD / wD), 6)).otherwise(lit(null).cast("double"))
        .as("flesch"))
  }

  def qualityScore(c: Column): Column = {
    val lenScore = least(length(c).cast("double") / 500.0, lit(1.0))
    val punctPenalty = lit(1.0) - least(punctRatio(c) * 5.0, lit(1.0))
    val stopScore = least(stopwordRatio(c) * 4.0, lit(1.0))
    round((lenScore * 0.4 + punctPenalty * 0.3 + stopScore * 0.3), 6)
  }

  /** Per-language stopword markers for the n-gram language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "es" -> Seq(" el ", " la ", " de ", " los "),
    "fr" -> Seq(" le ", " la ", " et ", " les "),
    "de" -> Seq(" der ", " die ", " und ", " das "))

  /** Language-ID: count marker hits per language, argmax with 'und'
    * (undetermined) when nothing matches. Ties resolve in LangMarkers
    * order (stable in SQL via the same CASE ordering). */
  def langId(c: Column): Column = {
    val padded = concat(lit(" "), lower(c), lit(" "))
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> markers.map(m => countOccurrences(padded, m))
        .reduce(_ + _)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Canonical content fingerprint: md5 of lowercased alnum-only text —
    * the exact-dedup key that survives whitespace/punctuation jitter. */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(lower(c), "[^a-z0-9]", ""))

  /** Deterministic 60-bit hash of a string via md5 prefix — portable to any
    * engine with md5 + hex parsing (DuckDB: ('0x'||substr(md5,1,15))::UBIGINT). */
  def hash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Char k-gram 60-bit hashes of `text`, in order; < k chars → empty.
    * First stage of winnowing fingerprints — see [[winnowSelect]].
    *
    * Two hash tiers, the [[graft.operators.Sketches]] discipline:
    *  - portable (default): the salted md5 formula any engine replays —
    *    the oracle-verifiable tier, one substring + one md5 digest per
    *    k-gram;
    *  - fast: a native rolling-hash Expression
    *    ([[graft.functions.Expressions.kgram_rolling_hashes]]) computing
    *    ALL m gram hashes in one O(m) pass — no per-gram substring
    *    allocation, no per-gram digest, the two kernels that dominate
    *    the portable tier (BENCH_NOTES round-8: swapping only the digest
    *    for xxHash64 recovered ~10%, because the substring kernel is the
    *    cost). Same winnowing guarantee (equal grams hash equal; the
    *    window-min selection is hash-agnostic), but fingerprints are
    *    Spark-reproducible rather than any-engine-reproducible.
    *    Fingerprint SETS from different tiers never compare — producer
    *    and consumer must agree on the tier. */
  def kgramHashes(text: Column, k: Int, portable: Boolean = true): Column = {
    // coalesce: NULL text must yield an EMPTY array, not null — a null
    // condition would fall into otherwise() and produce null output that
    // downstream winnowSelect would turn into a spurious [null] window
    if (!portable)
      return coalesce(Expressions.kgram_rolling_hashes(text, k),
        array().cast("array<bigint>"))
    val m = coalesce(length(text) - (k - 1), lit(0)) // k-gram count
    when(m <= 0, array().cast("array<bigint>")).otherwise(
      transform(sequence(lit(1), m), i => hash64(text.substr(i, lit(k)))))
  }

  /** Winnowing selection (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — the
    * MOSS algorithm): slide a window of `w` consecutive k-gram hashes,
    * keep each window's minimum. The selected ~2/(w+1)-density set is
    * GUARANTEED to share a fingerprint with any other document
    * containing a common substring of ≥ w+k-1 chars — the shift-robust
    * fingerprint a rolling-hash pipeline computes, expressed
    * declaratively (the Rabin rolling recurrence is a constant-factor
    * optimization; the per-gram portable hash replaces it so DuckDB
    * replays identical arithmetic). Fewer than w hashes → one window
    * over what exists; empty in → empty out. Returned with duplicates
    * (adjacent window mins repeat); consumers wanting the set apply
    * array_distinct/array_sort.
    *
    * `hashes` MUST be a materialized column ([[kgramHashes]] staged
    * behind `Parallelism.barrier`), NOT an inline expression: a lambda
    * body re-evaluates its free subexpressions per element, so an
    * inlined k-gram chain would re-hash the whole document once per
    * window — O(m²) digests instead of O(m). `private[graft]` for that
    * reason: external callers go through [[winnowFingerprints]], which
    * stages the barrier itself and cannot be misused into the O(m²)
    * shape. */
  private[graft] def winnowSelect(hashes: Column, w: Int): Column =
    // native monotonic-deque window-min (O(m), one pass, no per-window
    // slice allocation) — value-identical to the declarative
    // transform/array_min/slice form the oracle replays, under both
    // hash tiers; null array (null text upstream) → empty fingerprints
    coalesce(Expressions.window_mins(hashes, w), array().cast("array<bigint>"))

  /** Winnowed (MOSS) document fingerprints as a DataFrame transform:
    * appends `outCol` = the sorted distinct fingerprint set of `textCol`
    * (k-char grams, window w — see [[winnowSelect]] for the guarantee).
    * This is the supported entry point: both barrier stages are applied
    * HERE — the k-gram hash array materializes before window selection
    * and the fingerprint set materializes before whatever consumes it —
    * so callers cannot accidentally inline the k-gram chain into the
    * window lambda and pay O(m²) digests per document (the trap that
    * made the raw Column form private). */
  def winnowFingerprints(df: org.apache.spark.sql.DataFrame,
                         textCol: String, k: Int = 8, w: Int = 4,
                         outCol: String = "fingerprints",
                         portable: Boolean = true):
      org.apache.spark.sql.DataFrame = {
    require(k > 0 && w > 0, "k and w must be positive")
    val kh = "__graft_winnow_kh"
    val staged = graft.ops.Parallelism.barrier(
      df.withColumn(kh, kgramHashes(col(textCol), k, portable)))
    graft.ops.Parallelism.barrier(
      staged.withColumn(outCol,
        array_sort(array_distinct(winnowSelect(col(kh), w))))
        .drop(kh))
  }

  /** Word k-shingles ("w1 w2 w3" strings) for n-gram similarity.
    * Native one-pass kernel — value-identical to the declarative
    * `transform(sequence…, concat_ws(slice))` form (spec-compared), so
    * every oracle over shingle strings is untouched; avoids the per-
    * position slice-array + join-machinery allocation that dominated
    * the winnowing family's portable tier before its same treatment. */
  def shingles(toks: Column, k: Int): Column =
    Expressions.word_shingles(toks, k)

  /** Exact Jaccard similarity of two string sets. */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    val inter = size(array_intersect(da, db)).cast("double")
    val uni = size(array_union(da, db)).cast("double")
    when(uni === 0, 0.0).otherwise(round(inter / uni, 6))
  }
}
