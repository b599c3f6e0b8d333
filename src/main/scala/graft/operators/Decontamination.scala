package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Benchmark decontamination: flag training documents that share any
  * word n-gram with an evaluation set — the standard pretraining hygiene
  * step (n-gram overlap decontamination, as published for GPT-3/PaLM
  * style pipelines; n is chosen relative to document length).
  *
  * Scale shape (100 TB): the eval side is always tiny relative to the
  * corpus, so its distinct shingles BROADCAST; the train side explodes
  * shingles map-side and hash-joins against the broadcast — no shuffle
  * of corpus text at all. The only shuffle is the per-doc match count
  * over the (rare) hit triples. Contamination at scale is sparse, so
  * that aggregate is small by construction.
  */
object Decontamination {

  /** Per-train-doc distinct-shingle match count + contaminated flag.
    * Output: idCol, matched_shingles (long), contaminated (0/1). */
  def flagContaminated(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame = {
    def shingled(df: DataFrame): DataFrame =
      df.select(col(idCol),
        TextFunctions.shingles(TextFunctions.tokens(col(textCol)), k)
          .as("sh"))
    val evalGrams = shingled(eval)
      .select(explode(col("sh")).as("g")).distinct()
    val trainSh = shingled(train)
    val hits = trainSh
      .select(col(idCol), explode(col("sh")).as("g")).distinct()
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy(idCol).agg(count(lit(1)).as("matched_shingles"))
    trainSh.select(idCol).join(hits, Seq(idCol), "left").select(
      col(idCol),
      coalesce(col("matched_shingles"), lit(0L)).as("matched_shingles"),
      when(col("matched_shingles").isNotNull, 1).otherwise(0)
        .as("contaminated"))
  }
}
