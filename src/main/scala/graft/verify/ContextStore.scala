package graft.verify

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.rag.TfIdf

/** DataFrame-backed evidence/claim store — the anti-hallucination context
  * store (reference: protocol ondine/context/protocol.py:50-114
  * store/retrieve/search/ground/add_contradiction/get_contradictions;
  * claim model crates/ondine-core/src/types/mod.rs:5-49; SQLite evidence
  * graph store.rs:47-212).
  *
  * Claims live in an append-only parquet directory (the Spark-native
  * durable store: task-commit atomicity, no serialized index); search is
  * TF-IDF cosine against the claim text; grounding delegates to
  * ContextVerification; contradiction edges are rows referencing claim ids.
  */
final class ContextStore(spark: SparkSession, dir: String) {

  import ContextStore._

  private def claimsDir = s"$dir/claims"
  private def contraDir = s"$dir/contradictions"

  /** Append claims: (claim_id, text, claim_type, source_ref, support). */
  def store(claims: DataFrame): Unit =
    claims.select(
      col("claim_id").cast("long"),
      col("text").cast("string"),
      coalesce(col("claim_type"), lit("Factual")).as("claim_type"),
      coalesce(col("source_ref"), lit("")).as("source_ref"),
      coalesce(col("support_count"), lit(0L)).as("support_count"))
      .write.mode("append").parquet(claimsDir)

  def claims: DataFrame =
    if (exists(claimsDir)) spark.read.parquet(claimsDir)
    else spark.emptyDataFrame

  /** Top-k claims by TF-IDF cosine relevance to the query, min-score
    * filtered — the evidence-retrieval shape (reference:
    * evidence_retrieval_stage.py:57-113). Scores every claim against the
    * one query (fine for interactive probes; for query SETS use
    * [[searchAll]], which probes an inverted index instead). */
  def search(query: String, k: Int, minScore: Double = 0.0): DataFrame = {
    val scored = claims.withColumn("relevance",
      TfIdf.tfidfCosine2(lit(query), col("text")))
      .filter(col("relevance") >= minScore)
    scored.orderBy(col("relevance").desc, col("claim_id")).limit(k)
  }

  /** Batch search: top-k claims per query row via the sparse inverted
    * index (the FTS5 side-index equivalent — store.rs:260-335): postings
    * join touches only matching terms, never the full claim table per
    * query. `queries`: (qidCol, qtextCol); output: query_id, rank,
    * claim_id, score. */
  def searchAll(queries: DataFrame, qidCol: String, qtextCol: String,
                k: Int, minScore: Double = 0.0): DataFrame = {
    val index = graft.rag.SparseIndex.build(claims, "claim_id", "text")
    graft.rag.SparseIndex.search(index, queries, qidCol, qtextCol, k,
      broadcastQueries = false)
      .filter(col("score") >= minScore)
      .withColumnRenamed("id", "claim_id")
  }

  /** Ground a response against stored claims: best-claim cosine as the
    * grounding score (reference: memory_store.py:71-114). */
  def ground(response: String): Double = {
    val r = claims.select(max(
      TfIdf.tfidfCosine2(lit(response), col("text"))).as("g")).head()
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }

  /** Record a contradiction edge between two claims. */
  def addContradiction(claimA: Long, claimB: Long): Unit = {
    import spark.implicits._
    Seq((claimA, claimB)).toDF("claim_a", "claim_b")
      .write.mode("append").parquet(contraDir)
  }

  def contradictions: DataFrame =
    if (exists(contraDir)) spark.read.parquet(contraDir)
    else spark.emptyDataFrame
}

object ContextStore {
  private def exists(p: String): Boolean = new java.io.File(p).exists()
}
