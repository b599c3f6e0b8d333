package graft.rag

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Positional inverted index + exact phrase search — the search-engine
  * primitive TF-IDF ranking ([[SparseIndex]]) cannot answer: "which
  * documents contain THIS exact token sequence, where?". Complements
  * the RAG retrieval stack (sparse ranks, dense ranks, THIS verifies
  * exact quotes — e.g. grounding a claimed citation to its source).
  *
  * The index is the classic (term, doc, pos) postings relation; a
  * k-term phrase is k−1 EQUI-joins of term-pruned postings, each right
  * side pre-shifted by its phrase offset so adjacency becomes plain
  * key equality on (doc, start). At scale each join's inputs are only
  * the two terms' postings (selectivity does the work, exactly like
  * every production positional index), the joins co-key on (doc,
  * start) so Catalyst plans one shuffle stage per term — and a rare
  * phrase prunes to near-nothing after the first join under AQE.
  */
object PhraseIndex {

  /** Build the postings: (term, doc, pos), pos 0-based within the
    * lowercased whitespace tokenization (the corpus-wide tokenizer). */
  def build(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc"),
        posexplode(coalesce(TextFunctions.tokens(lower(col(textCol))),
          array().cast("array<string>"))))
      .select(col("col").as("term"), col("doc"), col("pos").cast("long"))

  /** All exact occurrences of `phrase` (whitespace-tokenized, matched
    * case-insensitively against the index tokenizer): one row per
    * match, (doc, start). */
  def phraseOccurrences(index: DataFrame, phrase: String): DataFrame = {
    val terms = phrase.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    require(terms.nonEmpty, "empty phrase")
    val start = index.filter(col("term") === terms(0))
      .select(col("doc"), col("pos").as("start"))
    terms.zipWithIndex.drop(1).foldLeft(start) { case (acc, (t, i)) =>
      acc.join(index.filter(col("term") === t)
        .select(col("doc"), (col("pos") - i).as("start")),
        Seq("doc", "start"))
    }
  }

  /** Per-document phrase hits: (doc, n_matches, first_pos). */
  def phraseSearch(index: DataFrame, phrase: String): DataFrame =
    phraseOccurrences(index, phrase)
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_matches"), min(col("start")).as("first_pos"))
}
