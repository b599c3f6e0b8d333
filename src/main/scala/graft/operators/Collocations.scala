package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus collocation mining (PMI) and per-document keyword extraction
  * (TF-IDF) — the two classic corpus-analytics signals a training-data
  * pipeline reads before choosing tokenizer merges or building topic
  * mixes. (Reference anchor: the corpus-statistics surface around
  * ondine/ops/quality.py — aggregate signals over the full corpus; PMI
  * and keyword extraction are the standard public formulations, Church
  * & Hanks 1990 for PMI.)
  *
  * Scale shape, both operators: everything is censuses and key-
  * partitioned joins — the LanguageModel discipline. Document text
  * never crosses an exchange; only (term, count) / (bigram, count)
  * pairs shuffle, each map-side combined. No operator here sorts rows
  * globally: PMI ranks a vocabulary-sized table, keywords rank within
  * per-document groups.
  *
  * Determinism: counts are exact integers; each score is ONE IEEE
  * double chain rounded once at 6dp — both engines replay it
  * identically (the q103/q137 discipline).
  */
object Collocations {

  private val Dup = "__graft_"

  /** Pointwise mutual information of corpus bigrams:
    * pmi = log2( (c12 / B) / ((c1 / T) · (c2 / T)) ) with T = total
    * token occurrences, B = total bigram occurrences. Output: (w1, w2,
    * c12, pmi) for bigrams with c12 ≥ minCount, one row per distinct
    * bigram. High PMI = words that co-occur far more than chance — the
    * collocation ("new york") signal.
    *
    * Plan: one token census + one bigram census (both map-side
    * combined), two key-partitioned joins of the bigram table against
    * the unigram table, a scalar (T, B) cross of a 1-row aggregate. */
  def pmi(docs: DataFrame, textCol: String, minCount: Long = 2L): DataFrame = {
    val toks = TextFunctions.tokens(lower(col(textCol)))
    // two censuses = two passes over the text, both map-side combined
    // and both vocab-sized afterwards; staged so the totals and the
    // scored table read the census, not the corpus, a second time
    val uni = graft.ops.Parallelism.stage(
      docs.select(explode(toks).as("w"))
        .groupBy("w").agg(count(lit(1)).as(s"${Dup}c")))
    val biAll = graft.ops.Parallelism.stage(
      docs.select(explode(
          graft.functions.Expressions.word_shingles(toks, 2)).as(s"${Dup}bg"))
        .groupBy(s"${Dup}bg").agg(count(lit(1)).as("c12")))
    val bi = biAll
      .filter(col("c12") >= minCount)
      .withColumn("w1", split_part(col(s"${Dup}bg"), lit(" "), lit(1)))
      .withColumn("w2", split_part(col(s"${Dup}bg"), lit(" "), lit(2)))
    // scalar totals: 1-row aggregates of the CENSUSES (B = Σ c12 over
    // the unfiltered census ≡ total bigram occurrences), crossed in —
    // the bounded driver-free form of a broadcast literal
    val totals = uni.agg(sum(col(s"${Dup}c")).as(s"${Dup}T"))
      .crossJoin(biAll.agg(sum(col("c12")).as(s"${Dup}B")))
    val scored = bi
      .join(uni.select(col("w").as("w1"), col(s"${Dup}c").as(s"${Dup}c1")), "w1")
      .join(uni.select(col("w").as("w2"), col(s"${Dup}c").as(s"${Dup}c2")), "w2")
      .crossJoin(broadcast(totals))
    val pmiCol = round(
      log2((col("c12").cast("double") / col(s"${Dup}B").cast("double")) /
        ((col(s"${Dup}c1").cast("double") / col(s"${Dup}T").cast("double")) *
          (col(s"${Dup}c2").cast("double") / col(s"${Dup}T").cast("double")))),
      6)
    scored.select(col("w1"), col("w2"), col("c12"), pmiCol.as("pmi"))
  }

  /** Dunning (1993) log-likelihood-ratio collocations — the
    * significance-calibrated sibling of [[pmi]]: PMI over-ranks rare
    * pairs (two hapaxes co-occurring once score maximal PMI), G²
    * weighs the evidence, so high-G² pairs are both associated AND
    * well-attested — the standard collocation extractor for building
    * phrase vocabularies from a corpus.
    *
    * Each bigram gets its own 2×2 contingency over BIGRAM POSITIONS:
    * rows = "first word is w1", columns = "second word is w2",
    * marginals derived from the ONE bigram census by rollup (no second
    * corpus pass, no unigram census needed); G² = 2·Σ kᵢⱼ·ln(kᵢⱼ·B /
    * (rowᵢ·colⱼ)) with empty cells contributing 0. One IEEE chain per
    * census row, rounded at 6dp — no cross-row float accumulation
    * exists, so no rounding discipline is needed beyond the per-row
    * round. Census-only shuffles; the c12 ≥ minCount filter applies
    * AFTER marginals so the table stays exact. Output:
    * (w1, w2, c12, g2). */
  def logLikelihoodRatio(docs: DataFrame, textCol: String,
                         minCount: Long = 2L): DataFrame = {
    val toks = TextFunctions.tokens(lower(col(textCol)))
    val biAll = graft.ops.Parallelism.stage(
      docs.select(explode(
          graft.functions.Expressions.word_shingles(toks, 2)).as(s"${Dup}bg"))
        .groupBy(s"${Dup}bg").agg(count(lit(1)).as("c12"))
        .withColumn("w1", split_part(col(s"${Dup}bg"), lit(" "), lit(1)))
        .withColumn("w2", split_part(col(s"${Dup}bg"), lit(" "), lit(2))))
    val m1 = biAll.groupBy("w1").agg(sum(col("c12")).as(s"${Dup}r1"))
    val m2 = biAll.groupBy("w2").agg(sum(col("c12")).as(s"${Dup}c1"))
    val total = biAll.agg(sum(col("c12")).as(s"${Dup}B"))
    val scored = biAll.filter(col("c12") >= minCount)
      .join(m1, "w1").join(m2, "w2")
      .crossJoin(broadcast(total)) // 1-row metrics frame
    val dbl = (c: Column) => c.cast("double")
    val bTot = dbl(col(s"${Dup}B"))
    def cell(k: Column, r: Column, c: Column): Column =
      when(k > 0, dbl(k) * log(dbl(k) * bTot / (dbl(r) * dbl(c))))
        .otherwise(lit(0.0))
    val r1 = col(s"${Dup}r1")
    val r2 = col(s"${Dup}B") - col(s"${Dup}r1")
    val c1 = col(s"${Dup}c1")
    val c2 = col(s"${Dup}B") - col(s"${Dup}c1")
    val k11 = col("c12")
    val k12 = r1 - col("c12")
    val k21 = c1 - col("c12")
    val k22 = col(s"${Dup}B") - r1 - c1 + col("c12")
    val g2 = round(lit(2.0) * (cell(k11, r1, c1) + cell(k12, r1, c2) +
      cell(k21, r2, c1) + cell(k22, r2, c2)), 6)
    scored.select(col("w1"), col("w2"), col("c12"), g2.as("g2"))
  }

  /** Top-k TF-IDF keywords per document: tf = cnt/len,
    * idf = ln((N+1)/(df+1)) + 1 (the SparseIndex weighting), score
    * rounded at 6dp, ties to the lexicographically smaller term. Output:
    * (idCol, rank, term, score). The window partitions BY DOCUMENT —
    * G-parallel small sorts, never a global order.
    * PRECONDITION: one input row per `idCol` value (duplicate-id rows
    * post as independent documents — see SparseIndex.termPostings). */
  def keywords(docs: DataFrame, idCol: String, textCol: String,
               k: Int = 5): DataFrame = {
    val n = docs.count()
    // r12: the shared shuffle-free postings front half (in-row
    // term_counts; see SparseIndex.termPostings for the shape and the
    // one-row-per-id contract) — only the vocab-sized df census shuffles
    val (posted0, df0) =
      graft.rag.SparseIndex.termPostings(docs, idCol, textCol)
    val posted = posted0.select(col(s"${Dup}pid").as(idCol),
      col(s"${Dup}term").as("term"), col(s"${Dup}cnt"), col(s"${Dup}len"))
    val df_ = df0.select(col(s"${Dup}term").as("term"), col(s"${Dup}df"))
    val scored = posted
      .join(df_, "term")
      .withColumn("score", round(
        (col(s"${Dup}cnt").cast("double") / col(s"${Dup}len").cast("double")) *
          (log(lit((n + 1).toDouble) / (col(s"${Dup}df") + 1).cast("double"))
            + 1.0), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("score"))
  }

  private def log2(c: Column): Column = log(c) / log(lit(2.0))
}
