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
    * retrieval text. Rows with no evidence >= minScore get ("", 0).
    *
    * Context format matches evidence_retrieval_stage.py:74-81 exactly:
    * `[score=X.XX] (source: …)? text` entries joined by `\n---\n`, rank
    * order. The 2-decimal score renders via integer math (round(score*100)
    * then d.dd assembly) so an SQL oracle reproduces it bit-for-bit —
    * `%.2f` would expose JVM-vs-C rounding-mode differences at ties. */
  def attach(df: DataFrame, idCol: String, queryCol: String,
             corpus: DataFrame, corpusIdCol: String, corpusTextCol: String,
             topK: Int, minScore: Double,
             corpusSourceCol: Option[String] = None): DataFrame = {
    val index = SparseIndex.build(corpus, corpusIdCol, corpusTextCol)
    val hits = SparseIndex.search(index,
      df.select(col(idCol), col(queryCol)), idCol, queryCol, topK,
      broadcastQueries = false)
      .filter(col("score") >= minScore)
    val srcCols = corpusSourceCol.map(c => col(c).as("_ev_src")).toSeq
    val texts = corpus.select(Seq(col(corpusIdCol).as("id"),
      col(corpusTextCol).as("_ev_text")) ++ srcCols: _*)
    val cents = round(col("score") * 100).cast("long")
    val srcTag = corpusSourceCol match {
      case Some(_) => when(col("_ev_src").isNotNull &&
          length(col("_ev_src")) > 0,
        concat(lit(" (source: "), col("_ev_src"), lit(")"))).otherwise(lit(""))
      case None => lit("")
    }
    val part = concat(
      format_string("[score=%d.%02d]",
        (cents / 100).cast("long"), cents % 100),
      srcTag, lit(" "), col("_ev_text"))
    val ctx = hits.join(texts, "id")
      .withColumn("_ev_part", part)
      .groupBy(col("query_id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("rank"), col("_ev_part")))),
            x => x.getField("_ev_part")),
          "\n---\n").as("_evidence_context"),
        count(lit(1)).as("_evidence_count"))
    df.join(ctx, df(idCol) === ctx("query_id"), "left")
      .drop("query_id")
      .withColumn("_evidence_context",
        coalesce(col("_evidence_context"), lit("")))
      .withColumn("_evidence_count",
        coalesce(col("_evidence_count"), lit(0L)))
  }
}
