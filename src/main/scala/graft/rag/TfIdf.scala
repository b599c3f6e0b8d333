package graft.rag

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** TF-IDF text similarity, re-expressing the reference's Rust kernel
  * (crates/ondine-core/src/text/mod.rs:27-66 — tokenize, term_frequency,
  * 2-doc-corpus cosine used for grounding) as pure Catalyst expressions.
  *
  * Formula (documented, deterministic):
  *   tf(t, d)  = count(t in d) / |d|
  *   idf(t)    = ln(N / (1 + df(t))) + 1          (N = corpus size)
  *   w(t, d)   = tf * idf, cosine over the union vocabulary.
  *
  * For the pairwise (2-doc corpus) variant, N=2 and df ∈ {1,2}.
  * Accumulation runs left-to-right over the vocabulary ARRAY (higher-order
  * `aggregate`), a deterministic order any engine reproduces — unlike a
  * group-by double sum. (Group-sum variants in SparseIndex use
  * round-then-DECIMAL instead.)
  */
object TfIdf {

  /** Term frequency vector of `toks` over vocabulary `vocab` (both arrays):
    * counts each vocab term in toks, divided by |toks|. */
  private def tfOver(vocab: Column, toks: Column): Column =
    transform(vocab, t =>
      size(filter(toks, x => x === t)).cast("double") /
        greatest(size(toks), lit(1)).cast("double"))

  /** Pairwise TF-IDF cosine of two text columns under 2-doc-corpus IDF.
    * Output rounded to 6dp. */
  def tfidfCosine2(a: Column, b: Column): Column = {
    val ta = tokens(lower(a))
    val tb = tokens(lower(b))
    val vocab = array_union(array_distinct(ta), array_distinct(tb))
    // df(t) = 1 or 2 → idf = ln(2/(1+df))+1
    val idf = transform(vocab, t =>
      when(array_contains(ta, t) && array_contains(tb, t),
        log(lit(2.0) / 3.0) + 1.0).otherwise(log(lit(2.0) / 2.0) + 1.0))
    val wa = zip_with(tfOver(vocab, ta), idf, (tf, i) => tf * i)
    val wb = zip_with(tfOver(vocab, tb), idf, (tf, i) => tf * i)
    def seqSum(arr: Column): Column =
      aggregate(arr, lit(0.0), (acc, v) => acc + v)
    val dot = seqSum(zip_with(wa, wb, (x, y) => x * y))
    val na = seqSum(transform(wa, x => x * x))
    val nb = seqSum(transform(wb, x => x * x))
    val denom = sqrt(na) * sqrt(nb)
    when(denom === 0.0, 0.0).otherwise(round(dot / denom, 6))
  }
}
