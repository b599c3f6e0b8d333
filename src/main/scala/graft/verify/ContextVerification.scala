package graft.verify

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.rag.TfIdf

/** Anti-hallucination operators (reference: ondine/api/pipeline.py:981-1105,
  * crates/ondine-core/src/evidence/grounding.rs:44-112,
  * ondine/context/memory_store.py:71-145):
  *
  *  - grounding: TF-IDF cosine of a response against its source text;
  *    below-threshold responses are flagged or discarded;
  *  - confidence: sigmoid / grounding-only / default weighted formula;
  *  - contradiction detection: group rows by key columns, compare value
  *    columns pairwise with optional numeric tolerance.
  *
  * All column expressions — they compose into enrichment output frames as
  * `_grounding_score`, `_confidence_score`, `_contradiction` system columns
  * (the reference's underscore convention).
  */
object ContextVerification {

  /** Grounding score: best-sentence TF-IDF cosine vs the source.
    * v1 scores against the whole source text (the reference's rust path
    * maxes over source sentences; whole-text is the deterministic,
    * shuffle-free variant — sentence-max available via Chunker.sentences +
    * explode when needed). */
  def groundingScore(response: Column, source: Column): Column =
    TfIdf.tfidfCosine2(response, source)

  /** Flag (or null out) responses whose grounding is below `threshold`
    * (reference: discard-or-flag, pipeline.py:1002-1022). */
  def withGrounding(df: DataFrame, responseCol: String, sourceCol: String,
                    threshold: Double, discard: Boolean): DataFrame = {
    val scored = df.withColumn("_grounding_score",
      groundingScore(col(responseCol), col(sourceCol)))
    if (discard)
      scored.withColumn(responseCol,
        when(col("_grounding_score") < threshold, lit(null))
          .otherwise(col(responseCol)))
    else
      scored.withColumn("_grounded",
        col("_grounding_score") >= threshold)
  }

  /** Sigmoid confidence: 1/(1+exp(-10*(gs-0.3)))
    * (reference: pipeline.py:1071-1074). */
  def sigmoidConfidence(gs: Column): Column =
    round(lit(1.0) / (lit(1.0) + exp(lit(-10.0) * (gs - lit(0.3)))), 6)

  /** Default confidence: 0.7*grounding + 0.3*min(support,5)/5
    * (reference: pipeline.py:1061-1090). */
  def defaultConfidence(gs: Column, supportCount: Column): Column =
    round(gs * 0.7 + least(supportCount, lit(5)).cast("double") / 5.0 * 0.3, 6)

  /** Contradiction detection: within each key group, a row contradicts
    * when another row in the group carries a different value — numeric
    * values compare with tolerance `|a-b| > tol`, everything else exact
    * (reference: pipeline.py:1024-1059, _values_contradict :73-89).
    *
    * Self-join-free: one aggregation per key computing min/max of the
    * numeric cast and distinct count of the raw value, broadcast back.
    * Emits `_contradiction` boolean per row. */
  def withContradictions(df: DataFrame, keyCols: Seq[String],
                         valueCol: String,
                         numericTolerance: Option[Double]): DataFrame = {
    val v = col(valueCol)
    val groups = numericTolerance match {
      case Some(tol) =>
        df.groupBy(keyCols.map(col): _*)
          .agg(
            max(v.cast("double")).as("_vmax"),
            min(v.cast("double")).as("_vmin"),
            countDistinct(v).as("_nvals"),
            count(when(v.cast("double").isNull && v.isNotNull, 1)).as("_nonnum"))
          .withColumn("_contradiction",
            // numeric spread beyond tolerance, or any non-castable value
            // with >1 distinct raw values (falls back to exact compare)
            (col("_vmax") - col("_vmin") > tol) ||
              (col("_nonnum") > 0 && col("_nvals") > 1))
          .select((keyCols.map(col) :+ col("_contradiction")): _*)
      case None =>
        df.groupBy(keyCols.map(col): _*)
          .agg((countDistinct(v) > 1).as("_contradiction"))
    }
    // no broadcast hint: the per-key frame can be as wide as the key space;
    // AQE broadcasts it when it is actually small
    df.join(groups, keyCols, "left")
      .withColumn("_contradiction",
        coalesce(col("_contradiction"), lit(false)))
  }
}
