package graft.verify

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.rag.SparseIndex

/** Evidence-retrieval stage (reference:
  * ondine/stages/evidence_retrieval_stage.py:57-113): every input row gets
  * `_evidence_context` (top-k relevant evidence texts, rank-ordered,
  * blank-line separated) and `_evidence_count` system columns, with a
  * minimum-relevance cutoff.
  *
  * Spark-first shape: the reference loops rows against its store; here
  * retrieval is ONE distributed top-k sparse search where the query set is
  * the input table itself — postings join + per-row window, no driver loop,
  * no per-row store round-trips. The corpus index builds once per run; at
  * scale the (small) claims corpus ends up broadcast by AQE while the big
  * input table streams.
  */
object EvidenceRetrieval {

  /** Returns `df` + `_evidence_context` / `_evidence_count`. `idCol` must
    * uniquely key rows (the enricher's `_row_index`); `queryCol` is the
    * retrieval text. Rows with no evidence >= minScore get ("", 0). */
  def attach(df: DataFrame, idCol: String, queryCol: String,
             corpus: DataFrame, corpusIdCol: String, corpusTextCol: String,
             topK: Int, minScore: Double): DataFrame = {
    val index = SparseIndex.build(corpus, corpusIdCol, corpusTextCol)
    val hits = SparseIndex.search(index,
      df.select(col(idCol), col(queryCol)), idCol, queryCol, topK,
      broadcastQueries = false)
      .filter(col("score") >= minScore)
    val texts = corpus.select(col(corpusIdCol).as("id"),
      col(corpusTextCol).as("_ev_text"))
    val ctx = hits.join(texts, "id")
      .groupBy(col("query_id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("rank"), col("_ev_text")))),
            x => x.getField("_ev_text")),
          "\n\n").as("_evidence_context"),
        count(lit(1)).as("_evidence_count"))
    df.join(ctx, df(idCol) === ctx("query_id"), "left")
      .drop("query_id")
      .withColumn("_evidence_context",
        coalesce(col("_evidence_context"), lit("")))
      .withColumn("_evidence_count",
        coalesce(col("_evidence_count"), lit(0L)))
  }
}
