package graft.llm

/** Model context-window registry for batch-size validation — the
  * reference keeps the same table to stop a mega-prompt from silently
  * overflowing the model's window (ondine/utils/model_context_limits.py
  * :13-165, wired at the first batch in batch_aggregator_stage.py:124).
  * Values are public provider-documented token limits; unknown models
  * fall back to a conservative 4k so validation fails safe.
  */
object ModelContextLimits {

  val DefaultLimit = 4096

  /** Exact-id table. Family prefixes below catch dated/suffixed variants. */
  val Limits: Map[String, Int] = Map(
    "gpt-4o" -> 128000,
    "gpt-4o-mini" -> 128000,
    "gpt-4-turbo" -> 128000,
    "gpt-4-32k" -> 32768,
    "gpt-4" -> 8192,
    "gpt-3.5-turbo" -> 16385,
    "claude-3-5-sonnet" -> 200000,
    "claude-3-opus" -> 200000,
    "claude-3-haiku" -> 200000,
    "claude-sonnet-4" -> 200000,
    "claude-opus-4" -> 200000,
    "llama-3.1-70b" -> 131072,
    "llama-3.1-8b" -> 131072,
    "llama-3.3-70b" -> 131072,
    "mixtral-8x7b" -> 32768,
    "mixtral-8x22b" -> 65536,
    "mistral-7b" -> 8192,
    "gemma-7b" -> 8192,
    "qwen-72b" -> 32768,
    "qwen-14b" -> 8192,
    "qwen-7b" -> 8192)

  /** Exact match, then longest family key CONTAINED IN the model id
    * (handles "claude-3-5-sonnet-20241022" and "openai/gpt-4o"), then
    * the conservative default. Deliberately one-directional: matching a
    * model id that is a prefix of a table key ("mixtral", "") would have
    * to GUESS a window, and an ambiguous guess that resolves large
    * defeats the overflow check — unknown and ambiguous ids must fail
    * SAFE to 4k, as the scaladoc promises. */
  def contextLimit(model: String): Int = {
    val m = model.toLowerCase
    Limits.get(m).orElse {
      val hits = Limits.filter { case (k, _) => m.contains(k.toLowerCase) }
      if (hits.isEmpty) None
      else Some(hits.maxBy(_._1.length)._2)
    }.getOrElse(DefaultLimit)
  }

  /** Right(()) when batchSize × avgPromptTokens fits inside the safety
    * margin of the window; Left(actionable message) otherwise. */
  def validateBatchSize(model: String, batchSize: Int,
      avgPromptTokens: Long, safetyMargin: Double = 0.8): Either[String, Unit] = {
    val safe = (contextLimit(model) * safetyMargin).toLong
    val est = batchSize * avgPromptTokens
    if (est <= safe) Right(())
    else Left(
      s"batch too large for $model: $batchSize rows x $avgPromptTokens " +
      s"tokens/row = $est tokens > ${(safetyMargin * 100).toInt}% of the " +
      s"context window ($safe); reduce batch_size to " +
      s"${math.max(1, safe / math.max(1, avgPromptTokens))} or less")
  }

  /** Largest batch that fits the margin, capped at 500 like the
    * reference's suggest_optimal_batch_size. */
  def suggestBatchSize(model: String, avgPromptTokens: Long,
      safetyMargin: Double = 0.8, cap: Int = 500): Int = {
    val safe = (contextLimit(model) * safetyMargin).toLong
    math.min(cap.toLong, math.max(1L, safe / math.max(1L, avgPromptTokens)))
      .toInt
  }
}
