package graft.run

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{PipelineSpec, TemplateCompiler}

/** Pre-run cost estimation: render prompts for a small sample, count
  * tokens, price, scale linearly to the full row count
  * (reference: ondine/api/pipeline.py:224-269 — 10-row sample,
  * `confidence="sample-based"`).
  */
final case class CostEstimate(
    totalRows: Long,
    sampleRows: Long,
    estTokensIn: Long,
    estTokensOut: Long,
    estCost: java.math.BigDecimal,
    confidence: String,
    /** None = the mega-prompt batch fits the model's context window;
      * Some(actionable message) when batchSize x avg tokens overflows
      * (reference: batch_aggregator_stage.py:124-137 first-batch check). */
    batchFit: Option[String] = None)

object CostEstimator {

  /** length/4 token heuristic as a column (the estimator's cheap path —
    * unified_litellm_client.py:1015-1020). */
  def tokenEstimate(c: Column): Column =
    greatest(lit(1L), (length(c) / lit(4)).cast("long"))

  def estimate(df: DataFrame, spec: PipelineSpec, sampleRows: Int = 10,
               expectedOutputTokensPerRow: Long = 64L): CostEstimate = {
    val total = df.count()
    val n = math.min(sampleRows.toLong, total)
    if (n == 0)
      return CostEstimate(0, 0, 0, 0, java.math.BigDecimal.ZERO, "empty")
    val sampleTokens = df.limit(sampleRows)
      .select(tokenEstimate(
        TemplateCompiler.compileFull(spec.prompt)).as("t"))
      .agg(sum("t")).head().getLong(0)
    val scale = total.toDouble / n
    val estIn = math.round(sampleTokens * scale)
    val estOut = expectedOutputTokensPerRow * total
    val cost = graft.llm.CostCalculator.cost(estIn, estOut,
      spec.llm.inputCostPer1k, spec.llm.outputCostPer1k)
    val fit = graft.llm.ModelContextLimits.validateBatchSize(
      spec.llm.model, spec.prompt.batchSize, sampleTokens / n)
      .left.toOption
    CostEstimate(total, n, estIn, estOut, cost, "sample-based", fit)
  }
}
