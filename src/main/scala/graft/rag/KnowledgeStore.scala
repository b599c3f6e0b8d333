package graft.rag

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._
import graft.llm.LlmClient
import graft.run.Enricher

/** The RAG facade (reference: ondine/knowledge/store.py:68-271):
  * ingest = load → chunk → index; search = query-transform → retrieve per
  * variant → best-score dedup → rerank.
  */
final class KnowledgeStore private (
    val chunks: DataFrame,
    val index: SparseIndex.SparseIndexFrames) {

  /** Multi-variant search: run the base query plus transforms, keep each
    * chunk's best score across variants (dedup — reference store.py:189-205),
    * then rerank the merged shortlist by direct query-chunk similarity. */
  def search(query: String, k: Int,
             client: Option[LlmClient] = None,
             multiQueryN: Int = 0): DataFrame = {
    val spark = chunks.sparkSession
    import spark.implicits._
    val variants = query +: client.toSeq.flatMap { c =>
      (if (multiQueryN > 0) QueryTransforms.multiQuery(c, query, multiQueryN)
       else Nil) :+ QueryTransforms.hyde(c, query)
    }
    val queriesDf = variants.zipWithIndex
      .map { case (q, i) => (i.toLong, q) }.toDF("qid", "qtext")
    val hits = SparseIndex.search(index, queriesDf, "qid", "qtext", k * 3)
    // best score per chunk across variants
    val best = hits.groupBy(col("id"))
      .agg(max(col("score")).as("best_score"))
    val reranked = Reranker.rerank(
      best.withColumn("query_id", lit(0L)).select(col("query_id"), col("id")),
      chunks.select(col("chunk_id").as("id"), col("chunk").as("text")),
      Seq((0L, query)).toDF("query_id", "qtext"),
      k)
    reranked.select(col("rank"), col("id").as("chunk_id"),
      col("rerank_score"))
  }
}

object KnowledgeStore {

  /** Ingest documents from a file or directory path (txt/md/html/csv,
    * recursive walk) — the reference's `with_knowledge_base("docs/")`
    * one-liner (knowledge/loader.py:34-211 via store.py:92-118; pdf/OCR
    * out of v1 scope). */
  def ingestPath(spark: SparkSession, path: String,
                 chunkSize: Int = 100, overlap: Int = 20): KnowledgeStore =
    ingest(graft.sources.DocumentLoader.load(spark, path),
      "doc_id", "text", chunkSize, overlap)

  /** Ingest a corpus: token-window chunking + sparse index build.
    * (Any DataFrame with (id, text) ingests; `ingestPath` routes
    * txt/md/html/csv/pdf through the DocumentLoader — raster OCR stays
    * out, SURVEY §7.6.) */
  def ingest(docs: DataFrame, idCol: String, textCol: String,
             chunkSize: Int = 100, overlap: Int = 20): KnowledgeStore = {
    val chunks = Chunker.chunkCorpus(docs, idCol, textCol, chunkSize, overlap)
      .withColumn("chunk_id", xxhash64(
        concat_ws("#", col(idCol).cast("string"),
          col("chunk_idx").cast("string"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val index = SparseIndex.build(chunks, "chunk_id", "chunk")
    new KnowledgeStore(chunks, index)
  }
}

/** LLM-judge RAG evaluation (reference: ondine/knowledge/eval.py:45-99 +
  * knowledge_retrieval_stage.py:98-146): score faithfulness / relevancy /
  * context-precision 0-1 per row via the SAME enrichment operator, landing
  * as `_kb_eval_*` system columns.
  */
object KbEval {
  def evaluate(df: DataFrame, answerCol: String, contextCol: String,
               client: LlmClient): DataFrame = {
    val spec = PipelineSpec(
      dataset = DatasetSpec(Seq(answerCol, contextCol)),
      prompt = PromptSpec(
        s"Rate faithfulness, relevancy, context_precision (0-1, JSON) " +
          s"for answer {$answerCol} against context {$contextCol}"),
      output = OutputSpec(
        Seq("_kb_eval_faithfulness", "_kb_eval_relevancy",
          "_kb_eval_context_precision"),
        responseFormat = ResponseFormat.Json))
    new Enricher(spec, client).enrich(df).data
  }
}
