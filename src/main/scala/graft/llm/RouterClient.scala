package graft.llm

import java.util.concurrent.atomic.AtomicLong

/** Multi-deployment router at the client seam (reference:
  * ondine/core/router_strategies.py:10-84 — weighted pick across
  * deployments, round-robin, and ordered failover). Routing happens
  * per call inside the Invoke operator's partition threads, so the
  * strategy must be thread-safe and cheap.
  *
  * Strategies:
  *  - Weighted: deterministic weighted pick keyed on the prompt hash —
  *    stable across retries of the same row (a retry lands on the same
  *    deployment unless it fails over), reproducible in tests.
  *  - RoundRobin: atomic counter across all partition threads.
  *  - On a deployment error the call fails over through the remaining
  *    deployments in declaration order before propagating the last error
  *    (router_strategies.py fallback chain). RateLimitError is NOT
  *    failed over: it propagates so the retry handler can honor
  *    retry-after and penalize the shared bucket.
  */
final class RouterClient(
    deployments: Seq[(LlmClient, Double)],
    strategy: RouterClient.Strategy = RouterClient.Weighted)
    extends LlmClient {

  require(deployments.nonEmpty, "router needs at least one deployment")
  require(deployments.forall(_._2 > 0), "weights must be positive")

  private val totalWeight = deployments.map(_._2).sum
  private val rr = new AtomicLong(0)

  override def model: String =
    deployments.map(_._1.model).mkString("router[", ",", "]")

  private def pick(prompt: String): LlmClient = strategy match {
    case RouterClient.RoundRobin =>
      deployments((rr.getAndIncrement() % deployments.size).toInt)._1
    case RouterClient.Weighted =>
      // deterministic: hash the prompt into [0, totalWeight)
      val h = scala.util.hashing.MurmurHash3.stringHash(prompt)
      val u = ((h.toLong & 0xffffffffL).toDouble / (1L << 32)) * totalWeight
      var acc = 0.0
      deployments.find { case (_, w) => acc += w; u < acc }
        .getOrElse(deployments.last)._1
  }

  def invoke(prompt: String, systemMessage: Option[String]): LlmResponse = {
    val first = pick(prompt)
    val order = first +: deployments.map(_._1).filterNot(_ eq first)
    var lastErr: Throwable = null
    order.foreach { c =>
      try return c.invoke(prompt, systemMessage)
      catch {
        case e: RateLimitError => throw e // retry-after handled upstream
        case e: LlmError       => lastErr = e
      }
    }
    throw lastErr
  }
}

object RouterClient {
  sealed trait Strategy
  case object Weighted extends Strategy
  case object RoundRobin extends Strategy
}
