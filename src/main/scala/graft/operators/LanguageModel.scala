package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.ops.Parallelism

/** Corpus-trained n-gram language-model quality scoring — the CCNet-style
  * curation step (Wenzek et al. 2020 score web pages with a KenLM model
  * and keep the low-perplexity head; this is the same shape with the LM
  * trained on the corpus itself): an add-one-smoothed bigram model is
  * counted over the whole corpus, then every document is scored by its
  * mean per-bigram negative log2 probability ("bits per bigram" — low =
  * fluent/common phrasing, high = rare or garbled phrasing).
  *
  * Determinism across engines: a floating-point SUM of log terms is
  * order-dependent, so each per-bigram log2 term is first rounded to
  * integer MICRO-bits (round(term * 1e6) as long) and the per-document
  * accumulation is exact integer arithmetic — reproducible under any
  * partitioning and re-computable independently in DuckDB/any SQL engine.
  * The only cross-engine float ops left are one division and one log2 per
  * DISTINCT (bigram, unigram) count pair, each a single IEEE op chain.
  *
  * Scale shape: two word-count aggregations (map-side combined; only
  * token/bigram strings and counts shuffle, never document text), one
  * key-co-partitioned join of exploded bigrams against the count tables,
  * and one (id, long) aggregation. The vocabulary size V is one
  * metadata-cheap distinct-count job. At 100 TB the documented
  * approximation seam is pruning the LM to top-N bigrams with an OOV
  * floor and broadcasting it — same scoring expression, no shuffle join.
  */
object LanguageModel {

  private val Dup = "__graft_"

  /** Per-document bigram-LM score: (idCol, n_bigrams, lm_bits).
    * `lm_bits` = mean negative log2 P(w2|w1) over the doc's bigrams with
    * add-one smoothing (P = (c12+1)/(c1+V)); null when the doc has < 2
    * tokens (no bigrams). Tokenization = lowercased whitespace split,
    * matching [[TextFunctions.tokens]]. */
  def bigramBits(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      TextFunctions.tokens(lower(col(textCol))).as(s"${Dup}w"))
    val w = col(s"${Dup}w")
    // bigram list per doc: "w1 w2" strings (tokens cannot contain spaces)
    val bigrams = toks.select(col(idCol),
      when(size(w) >= 2,
        zip_with(slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
          (a, b) => concat(a, lit(" "), b)))
        .otherwise(array().cast("array<string>")).as(s"${Dup}bg"))
      .select(col(idCol), explode(col(s"${Dup}bg")).as(s"${Dup}bg"))
      .withColumn(s"${Dup}w1", substring_index(col(s"${Dup}bg"), " ", 1))
    // staged: the unigram table feeds two consumers (vocab count + the
    // scoring join) — materialize once instead of re-counting the corpus
    val uni = Parallelism.stage(toks.select(explode(w).as(s"${Dup}t"))
      .groupBy(col(s"${Dup}t")).agg(count(lit(1)).as(s"${Dup}c1")))
    val big = bigrams.groupBy(col(s"${Dup}bg"))
      .agg(count(lit(1)).as(s"${Dup}c12"))
    val vocab = uni.count() // cheap: counts the staged table, not the corpus
    val term = log2((col(s"${Dup}c12") + 1).cast("double") /
      (col(s"${Dup}c1") + lit(vocab)))
    val scored = bigrams
      .join(big, Seq(s"${Dup}bg"))
      .join(uni, bigrams(s"${Dup}w1") === uni(s"${Dup}t"))
      .withColumn(s"${Dup}micro", round(term * 1e6, 0).cast("long"))
      .groupBy(col(idCol))
      .agg(sum(col(s"${Dup}micro")).as(s"${Dup}s"),
        count(lit(1)).as("n_bigrams"))
      .withColumn("lm_bits",
        round((-col(s"${Dup}s")).cast("double") / col("n_bigrams") / 1e6, 6))
    df.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("lm_bits"))
  }

  /** CCNet-style head selection: keep documents whose bits-per-bigram is
    * at or below `maxBits` (docs too short to score are kept — no
    * evidence against them, the reference pipelines' usual choice). */
  def filterByBits(df: DataFrame, idCol: String, textCol: String,
      maxBits: Double): DataFrame = {
    val keep = bigramBits(df, idCol, textCol)
      .filter(col("lm_bits").isNull || col("lm_bits") <= maxBits)
      .select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }
}
