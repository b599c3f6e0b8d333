package graft.llm

import java.math.{BigDecimal => JBigDecimal, MathContext}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.concurrent.atomic.AtomicLong

/** One model response (reference IR: LLMResponse, ondine/core/models.py:21-32). */
final case class LlmResponse(
    text: String,
    tokensIn: Long,
    tokensOut: Long,
    model: String,
    cost: JBigDecimal,
    latencyMs: Double)

/** Error taxonomy driving retry decisions
  * (reference: ondine/core/error_handler.py + llm_invocation_stage.py:581-636 —
  * auth/quota/model-not-found are non-retryable; rate-limit/network are).
  */
class LlmError(msg: String, val retryable: Boolean) extends RuntimeException(msg)
class RateLimitError(msg: String, val retryAfterMs: Option[Long] = None)
  extends LlmError(msg, retryable = true)
class NetworkError(msg: String) extends LlmError(msg, retryable = true)
class AuthError(msg: String) extends LlmError(msg, retryable = false)
/** Out of credit/budget with the provider — retrying cannot help and
  * burns the rate budget of healthy runs; distinct from the retryable
  * 429 a quota reply often travels with. */
class QuotaError(msg: String) extends LlmError(msg, retryable = false)
/** Unknown/decommissioned model id. Non-retryable for a single client;
  * [[RouterClient]] fails over past it (the reference remaps this to
  * retryable when a router is present — same effect). */
class ModelNotFoundError(msg: String) extends LlmError(msg, retryable = false)

/** Provider client interface (reference: ondine/adapters/llm_client.py:29-178).
  * Implementations must be thread-safe: the Invoke operator calls concurrently
  * from many partition threads on one executor.
  */
trait LlmClient extends Serializable {
  def model: String
  /** Synchronous single invocation; concurrency is supplied by the operator. */
  def invoke(prompt: String, systemMessage: Option[String]): LlmResponse
  /** length/4 heuristic, the reference's cheap fallback
    * (ondine/adapters/unified_litellm_client.py:1015-1020). */
  def estimateTokens(text: String): Long = math.max(1L, text.length / 4L)
}

/** Exact decimal cost accounting
  * (reference: ondine/utils/cost_calculator.py:22-58 — Decimal is a hard
  * requirement; never float).
  */
object CostCalculator {
  private val MC = new MathContext(28)
  private val THOUSAND = new JBigDecimal(1000)
  def cost(tokensIn: Long, tokensOut: Long,
           inPer1k: BigDecimal, outPer1k: BigDecimal): JBigDecimal = {
    val in = new JBigDecimal(tokensIn).divide(THOUSAND, MC)
      .multiply(inPer1k.bigDecimal, MC)
    val out = new JBigDecimal(tokensOut).divide(THOUSAND, MC)
      .multiply(outPer1k.bigDecimal, MC)
    in.add(out, MC)
  }
}

/** Deterministic mock client — the default in a zero-egress environment and
  * the test double, mirroring the reference's MockLLMClient
  * (tests/conftest.py:87-143: canned deterministic replies, fixed token
  * counts) and the crash-benchmark's in-process LLM (benchmarks/RESULTS.md:45-52).
  *
  * Reply = lowercase hex md5 of the prompt, which makes end-to-end pipeline
  * output SQL-expressible (DuckDB `md5()`), so the driver's oracle can verify
  * the full template→batch→invoke→disaggregate→parse→merge chain.
  *
  * Batch awareness: a mega-prompt (see BatchAggregator) carries rows as a
  * JSON array of {"id":N,"prompt":"..."}; the mock answers with a JSON array
  * of {"id":N,"result":md5(prompt)} — the contract a real model is prompted
  * to follow (reference: ondine/strategies/json_batch_strategy.py:35-99).
  */
class MockLlmClient(
    override val model: String = "mock",
    inPer1k: BigDecimal = BigDecimal("0.001"),
    outPer1k: BigDecimal = BigDecimal("0.002"),
    /** Artificial per-call latency, to make batching ratios measurable. */
    simulatedLatencyMs: Long = 0L,
    /** Fail every Nth call with a retryable error (0 = never) — for retry
      * and error-policy tests. */
    failEveryN: Long = 0L,
    /** Omit every Nth item from mega-prompt replies (0 = never) — models a
      * real LLM skipping batch items; exercises null-padding + auto-retry
      * (reference: batch_disaggregator_stage.py:158-163). Only the FIRST
      * call for a given payload drops items, so retries succeed. */
    dropEveryNthBatchItem: Int = 0,
    /** Reply with a JSON object {"label": md5(prompt), "score": len%100}
      * instead of bare md5 — deterministic structured output, variably
      * wrapped (plain / code-fenced / chatty prefix keyed on prompt
      * length) to exercise the full extraction fallback chain. */
    structuredJson: Boolean = false,
    /** First reply for any given prompt is unparseable garbage; repeats
      * succeed — models structural rejection healed by auto-retry. */
    malformedFirstReply: Boolean = false) extends LlmClient {

  import MockLlmClient._

  /** Deterministic per-item reply (single or batch member). */
  private def replyFor(p: String): String = {
    if (malformedFirstReply && seenPrompts.add(md5Hex(p)))
      return "I'm sorry, I can't produce JSON right now."
    if (!structuredJson) md5Hex(p)
    else {
      val json = s"""{"label":"${md5Hex(p)}","score":${p.length % 100}}"""
      p.length % 3 match {
        case 0 => "```json\n" + json + "\n```"
        case 1 => "Sure! Here is the JSON: " + json
        case _ => json
      }
    }
  }

  def invoke(prompt: String, systemMessage: Option[String]): LlmResponse = {
    val n = calls.incrementAndGet()
    if (failEveryN > 0 && n % failEveryN == 0)
      throw new NetworkError(s"simulated transient failure on call $n")
    if (simulatedLatencyMs > 0) Thread.sleep(simulatedLatencyMs)
    val t0 = System.nanoTime()
    val reply =
      // planner dispatch keys on the EXACT PlannerSystem constant — a
      // user config whose system message merely starts with the same
      // English must get the normal deterministic reply, not draft JSON
      if (systemMessage.contains(graft.run.IntentPlanner.PlannerSystem))
        draftReply(prompt)
      else if (prompt.startsWith(BatchAggregatorMarker)) batchReply(prompt)
      else replyFor(prompt)
    val tIn = estimateTokens(prompt) + systemMessage.map(estimateTokens).getOrElse(0L)
    val tOut = estimateTokens(reply)
    LlmResponse(reply, tIn, tOut, model,
      CostCalculator.cost(tIn, tOut, inPer1k, outPer1k),
      (System.nanoTime() - t0) / 1e6)
  }

  /** Deterministic IntentPlanner draft (keyed on the planner's system
    * message): feed the first available column into a one-placeholder
    * template. Keeps the "describe the task, get a pipeline" front door
    * drivable offline — a real model sees the identical prompt. */
  private def draftReply(prompt: String): String = {
    val colsRe = """(?s)Available columns:\s*\n(\[.*?\])""".r
    val first = colsRe.findFirstMatchIn(prompt)
      .map(_.group(1))
      .flatMap { arr =>
        """"([^"]+)"""".r.findFirstMatchIn(arr).map(_.group(1))
      }
      .getOrElse("text")
    s"""{"input_columns":["$first"],"output_columns":["answer"],""" +
      s""""prompt_template":"Process: {$first}","system_message":null,""" +
      s""""response_format":"raw",""" +
      s""""rationale":"deterministic mock draft over column '$first'"}"""
  }

  /** Parse the mega-prompt's JSON payload and answer item-by-item. */
  private def batchReply(prompt: String): String = {
    val items = BatchCodec.decodeItems(prompt)
    val firstTime = seenBatches.add(md5Hex(prompt))
    val answered =
      if (dropEveryNthBatchItem > 0 && firstTime)
        items.zipWithIndex.collect {
          case (it, i) if (i + 1) % dropEveryNthBatchItem != 0 => it
        }
      else items
    BatchCodec.encodeResults(answered.map { case (id, p) => (id, replyFor(p)) })
  }
}

object MockLlmClient {
  /** Process-wide call counter: tests assert call counts (batching ratio,
    * resume-without-reinvocation) across executor threads in local mode. */
  val calls = new AtomicLong(0)

  /** JVM-global first-seen sets: client instances re-serialize into every
    * task closure, so "have I seen this payload before" state must live on
    * the (per-executor) companion, not the instance. */
  val seenBatches =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  val seenPrompts =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Alias of the codec's marker (tests reference it here). */
  val BatchAggregatorMarker: String = BatchCodec.BatchMarker

  def md5Hex(s: String): String = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    d.map("%02x".format(_)).mkString
  }
}
