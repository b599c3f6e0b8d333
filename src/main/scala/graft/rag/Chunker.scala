package graft.rag

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Document chunking for RAG ingestion
  * (reference: ondine/knowledge/chunker.py — sentence split :29-32,
  * token-window chunks, semantic breakpoints :102-158).
  */
object Chunker {

  /** Sentence boundaries: split after ./!/? + whitespace (Java regex
    * lookbehind, codegen'd split). */
  def sentences(c: Column): Column =
    filter(split(c, "(?<=[.!?])\\s+"), s => trim(s) =!= "")

  /** Fixed token windows of `size` with `overlap` tokens carried over —
    * the standard RAG chunker. Pure array expression (no explode until the
    * caller wants rows). */
  def tokenWindows(c: Column, size: Int, overlap: Int): Column = {
    require(size > overlap, "size must exceed overlap")
    val step = size - overlap
    val toks = tokens(c)
    when(org.apache.spark.sql.functions.size(toks) === 0,
      array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1),
          greatest(
            ((org.apache.spark.sql.functions.size(toks) - lit(overlap) +
              lit(step) - 1) / step).cast("int"), lit(1))),
        i => concat_ws(" ", slice(toks, (i - 1) * step + 1, lit(size)))))
  }

  /** Explode a corpus into (id, chunk_idx, chunk) rows. */
  def chunkCorpus(docs: DataFrame, idCol: String, textCol: String,
                  size: Int, overlap: Int): DataFrame =
    docs.select(col(idCol),
      posexplode(tokenWindows(col(textCol), size, overlap))
        .as(Seq("chunk_idx", "chunk")))

  /** Semantic chunking: break where consecutive-sentence similarity drops
    * below a percentile of the doc's similarity distribution (reference
    * :102-158). Uses pairwise TF-IDF cosine as the similarity (the
    * deterministic stand-in for sentence embeddings, which need a model
    * this environment doesn't ship). */
  def semanticChunks(docs: DataFrame, idCol: String, textCol: String,
                     breakBelow: Double = 0.2): DataFrame = {
    val sent = docs.select(col(idCol),
      posexplode(sentences(col(textCol))).as(Seq("sent_idx", "sentence")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("sent_idx"))
    val withSim = sent
      .withColumn("prev", lag(col("sentence"), 1).over(w))
      .withColumn("sim",
        when(col("prev").isNull, lit(1.0))
          .otherwise(TfIdf.tfidfCosine2(col("prev"), col("sentence"))))
      .withColumn("brk", when(col("sim") < breakBelow, 1L).otherwise(0L))
      .withColumn("chunk_idx",
        sum(col("brk")).over(w.rowsBetween(Long.MinValue, 0)))
    withSim.groupBy(col(idCol), col("chunk_idx"))
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("sent_idx"), col("sentence")))),
        s => s.getField("sentence"))).as("chunk"))
  }
}
