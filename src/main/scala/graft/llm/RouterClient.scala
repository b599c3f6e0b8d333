package graft.llm

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Multi-deployment router at the client seam (reference:
  * ondine/core/router_strategies.py:10-84 — weighted pick, round-robin,
  * latency-based, usage-based, cost-based and least-busy selection — plus
  * the circuit breaker in unified_litellm_client.py:553-705: allowed_fails
  * consecutive failures put a deployment into a cooldown window and emit a
  * cooldown event for observability). Routing happens per call inside the
  * Invoke operator's partition threads, so every strategy must be
  * thread-safe and cheap.
  *
  * Strategies:
  *  - Weighted: deterministic weighted pick keyed on the prompt hash —
  *    stable across retries of the same row (a retry lands on the same
  *    deployment unless it fails over), reproducible in tests.
  *  - RoundRobin: atomic counter across all partition threads.
  *  - LatencyBased: lowest EWMA of observed per-deployment latency
  *    (alpha 0.3); deployments with no samples yet are probed first in
  *    declaration order, so every deployment gets measured before the
  *    EWMA comparison starts.
  *  - LeastBusy: fewest in-flight calls right now (ties to declaration
  *    order) — real-time load balancing for deployments of unequal
  *    capacity.
  *  - UsageBased: lowest cumulative total tokens routed so far — evens
  *    out long-run utilization.
  *  - CostBased: lowest EWMA of observed per-call cost (unmeasured
  *    deployments probed first) — steers spend to the cheapest
  *    deployment using the costs clients actually report.
  *
  * Latency signal: `Measured` (default) is the router's own wall-clock
  * around the call — what this process actually waits. `Reported` reads
  * `LlmResponse.latencyMs` (the client/provider-reported figure) —
  * deterministic under mocks and useful when a gateway reports
  * server-side latency.
  *
  * Circuit breaker: `allowedFails` CONSECUTIVE failures of one deployment
  * start a `cooldownMs` window during which it is skipped by pick() and
  * failover — unless every deployment is cooling, in which case the
  * router fails open and routes anyway (matching litellm: a cooldown
  * must degrade, never halt). A success resets the streak. Entering
  * cooldown notifies `onCooldown` (the reference's ProviderCooldownEvent
  * seam). RateLimitError counts toward the streak (a deployment
  * drowning in 429s is unhealthy) but still propagates immediately —
  * never failed over — so the retry handler can honor retry-after and
  * penalize the shared bucket.
  *
  * Routing state (EWMAs, in-flight, usage, cooldowns) lives on the
  * companion keyed by a serialization-stable router id: task closures
  * deserialize fresh RouterClient copies per task, and per-EXECUTOR
  * shared state is the reference's per-process router semantics.
  */
final class RouterClient(
    deployments: Seq[(LlmClient, Double)],
    strategy: RouterClient.Strategy = RouterClient.Weighted,
    allowedFails: Int = 3,
    cooldownMs: Long = 60000L,
    onCooldown: RouterClient.CooldownListener = RouterClient.NoListener,
    latencySource: RouterClient.LatencySource = RouterClient.Measured,
    /** Injectable clock (ms) for deterministic cooldown tests. */
    nowMs: () => Long = () => System.currentTimeMillis())
    extends LlmClient {

  import RouterClient._

  require(deployments.nonEmpty, "router needs at least one deployment")
  require(deployments.forall(_._2 > 0), "weights must be positive")
  require(allowedFails > 0, "allowedFails must be > 0")

  private val totalWeight = deployments.map(_._2).sum
  /** Serialization-stable identity: every task-closure copy of this
    * router shares one per-JVM state array. */
  private val routerId = java.util.UUID.randomUUID().toString

  override def model: String =
    deployments.map(_._1.model).mkString("router[", ",", "]")

  private def states: RouterState =
    RouterClient.stateFor(routerId, deployments.size)

  /** Deployment indices eligible right now: everyone outside a cooldown
    * window, or everyone (fail open) when all are cooling. */
  private def eligible(st: RouterState): IndexedSeq[Int] = {
    val now = nowMs()
    val open = deployments.indices.filter(i => !st(i).cooling(now))
    if (open.nonEmpty) open else deployments.indices
  }

  private def pick(prompt: String, st: RouterState): Int = {
    val cands = eligible(st)
    strategy match {
      case RoundRobin =>
        // the cursor lives in the shared per-JVM state: every task-closure
        // copy of this router advances ONE sequence, so a multi-partition
        // run still alternates globally instead of each task restarting at
        // deployment 0
        cands(((st.rr.getAndIncrement() % cands.size) + cands.size).toInt % cands.size)
      case Weighted =>
        // deterministic: hash the prompt into [0, sum of candidate weights)
        val w = cands.map(i => deployments(i)._2)
        val h = scala.util.hashing.MurmurHash3.stringHash(prompt)
        val u = ((h.toLong & 0xffffffffL).toDouble / (1L << 32)) * w.sum
        var acc = 0.0
        cands.zip(w).find { case (_, wi) => acc += wi; u < acc }
          .map(_._1).getOrElse(cands.last)
      case LatencyBased =>
        pickProbeAware(cands, st, i => st(i).hasLatency,
          i => st(i).ewmaLatencyMs)
      case LeastBusy =>
        cands.minBy(i => st(i).inFlight.get())
      case UsageBased =>
        cands.minBy(i => st(i).totalTokens.get())
      case CostBased =>
        pickProbeAware(cands, st, i => st(i).hasCost, i => st(i).ewmaCost)
    }
  }

  /** Measured-EWMA strategies probe every unmeasured deployment before
    * comparing averages. Cold-start diversity: among the unmeasured, take
    * the one with the FEWEST in-flight calls (ties to declaration order)
    * — a plain `find` would stampede every concurrent partition thread
    * onto the first unmeasured deployment until its first sample lands,
    * because none of them has a measurement yet. inFlight increments
    * before the call, so concurrent cold threads fan out across the
    * unmeasured set instead. */
  private def pickProbeAware(cands: IndexedSeq[Int], st: RouterState,
      measured: Int => Boolean, score: Int => Double): Int = {
    val unmeasured = cands.filterNot(measured)
    if (unmeasured.nonEmpty) unmeasured.minBy(i => st(i).inFlight.get())
    else cands.minBy(score)
  }

  private def recordSuccess(s: DeploymentState, r: LlmResponse,
                            wallMs: Double): Unit = {
    val lat = latencySource match {
      case Measured => wallMs
      case Reported => r.latencyMs
    }
    s.sampleLatency(lat)
    s.sampleCost(r.cost.doubleValue)
    s.totalTokens.addAndGet(r.tokensIn + r.tokensOut)
    s.consecFails.set(0)
  }

  private def recordFailure(idx: Int, s: DeploymentState,
                            e: Throwable): Unit = {
    // incrementAndGet hands each integer of a streak to exactly ONE
    // thread, so trip on == (not >=): concurrent failures can never fire
    // duplicate cooldown events, and the additive reset preserves
    // increments that raced past the threshold instead of erasing them
    val fails = s.consecFails.incrementAndGet()
    if (fails == allowedFails) {
      s.cooldownUntil.set(nowMs() + cooldownMs)
      s.consecFails.addAndGet(-allowedFails)
      // truncate like the reference's ProviderCooldownEvent
      // (str(exception)[:500]) — a huge provider error body must not
      // flow verbatim into every observer and executor-log line
      try onCooldown.onCooldown(deployments(idx)._1.model, fails,
        cooldownMs, String.valueOf(e.getMessage).take(500))
      catch { case _: Exception => () } // observability must never break routing
    }
  }

  def invoke(prompt: String, systemMessage: Option[String]): LlmResponse = {
    val st = states
    val first = pick(prompt, st)
    // failover: remaining non-cooling deployments in declaration order;
    // cooling ones are appended last so a fully-cooling router still
    // drains through every deployment before giving up
    val now = nowMs()
    val rest = deployments.indices.filterNot(_ == first)
    val order = first +: (rest.filterNot(i => st(i).cooling(now)) ++
      rest.filter(i => st(i).cooling(now)))
    var lastErr: Throwable = null
    order.foreach { i =>
      val s = st(i)
      s.inFlight.incrementAndGet()
      val t0 = System.nanoTime()
      try {
        val r = deployments(i)._1.invoke(prompt, systemMessage)
        recordSuccess(s, r, (System.nanoTime() - t0) / 1e6)
        return r
      } catch {
        case e: RateLimitError =>
          recordFailure(i, s, e)
          throw e // retry-after handled upstream, never failed over
        case e: LlmError =>
          recordFailure(i, s, e)
          lastErr = e
      } finally s.inFlight.decrementAndGet()
    }
    throw lastErr
  }

  /** Snapshot for tests/diagnostics: (model, inFlight, totalTokens,
    * ewmaLatencyMs or NaN, cooling-now). */
  private[graft] def stateSnapshot: Seq[(String, Int, Long, Double, Boolean)] = {
    val st = states
    val now = nowMs()
    deployments.indices.map { i =>
      val s = st(i)
      (deployments(i)._1.model, s.inFlight.get(), s.totalTokens.get(),
        s.ewmaLatencyMs, s.cooling(now))
    }
  }
}

object RouterClient {
  sealed trait Strategy
  case object Weighted extends Strategy
  case object RoundRobin extends Strategy
  case object LatencyBased extends Strategy
  case object LeastBusy extends Strategy
  case object UsageBased extends Strategy
  case object CostBased extends Strategy

  sealed trait LatencySource extends Serializable
  /** Router-side wall clock around the call (default). */
  case object Measured extends LatencySource
  /** Client/provider-reported LlmResponse.latencyMs. */
  case object Reported extends LatencySource

  /** Cooldown observability seam (reference: ProviderCooldownEvent,
    * unified_litellm_client.py:662-705). Must be serializable — the
    * router rides task closures. */
  trait CooldownListener extends Serializable {
    def onCooldown(model: String, failCount: Int, cooldownMs: Long,
                   reason: String): Unit
  }
  object NoListener extends CooldownListener {
    def onCooldown(model: String, failCount: Int, cooldownMs: Long,
                   reason: String): Unit = ()
  }

  /** Bridges trips into the observer stack as
    * [[graft.run.ProviderCooldown]] events. The dispatcher itself is
    * driver-side and non-serializable, so the listener carries only a
    * registry KEY: where the router fires in the driver JVM (local mode,
    * driver-side calls) the key resolves and the event reaches every
    * registered observer; on a remote executor the lookup misses and the
    * trip writes to the executor log instead — a cooldown never silently
    * vanishes, and closures never drag the dispatcher across the wire. */
  final class BridgedCooldownListener(key: String, runId: String = "")
      extends CooldownListener {
    def onCooldown(model: String, failCount: Int, cooldownMs: Long,
                   reason: String): Unit = {
      val d = bridges.get(key)
      if (d != null)
        d.emit(graft.run.ProviderCooldown(runId, model, failCount,
          cooldownMs, reason))
      else
        System.err.println(s"[graft] provider cooldown: $model " +
          s"($failCount consecutive failures, ${cooldownMs}ms): $reason")
    }
  }
  /** Driver-side registration for [[BridgedCooldownListener]] keys. */
  def registerCooldownBridge(key: String,
                             d: graft.run.ObserverDispatcher): Unit =
    bridges.put(key, d)
  def unregisterCooldownBridge(key: String): Unit = bridges.remove(key)
  private val bridges =
    new ConcurrentHashMap[String, graft.run.ObserverDispatcher]()

  private val EwmaAlpha = 0.3

  /** Per-deployment routing state. Latency/cost EWMAs are updated under
    * the state's own monitor (two doubles — nanoseconds of contention);
    * counters are atomics. */
  private final class DeploymentState {
    val inFlight = new AtomicInteger(0)
    val totalTokens = new AtomicLong(0)
    val consecFails = new AtomicInteger(0)
    val cooldownUntil = new AtomicLong(0L)
    @volatile private var latencyEwma: Double = Double.NaN
    @volatile private var costEwma: Double = Double.NaN

    def cooling(now: Long): Boolean = cooldownUntil.get() > now
    def hasLatency: Boolean = !latencyEwma.isNaN
    def hasCost: Boolean = !costEwma.isNaN
    def ewmaLatencyMs: Double = latencyEwma
    def ewmaCost: Double = costEwma
    def sampleLatency(ms: Double): Unit =
      if (!ms.isNaN) synchronized {
        latencyEwma = if (latencyEwma.isNaN) ms
          else (1 - EwmaAlpha) * latencyEwma + EwmaAlpha * ms
      }
    def sampleCost(c: Double): Unit =
      if (!c.isNaN) synchronized {
        costEwma = if (costEwma.isNaN) c
          else (1 - EwmaAlpha) * costEwma + EwmaAlpha * c
      }
  }

  /** One router's shared per-JVM state: per-deployment stats plus the
    * round-robin cursor (shared so task-closure copies advance one
    * global sequence). */
  private final class RouterState(n: Int) {
    private val ds = Array.fill(n)(new DeploymentState)
    val rr = new AtomicLong(0)
    def apply(i: Int): DeploymentState = ds(i)
  }

  /** JVM-wide (per-executor) routing state, keyed by router id — shared
    * across the task-closure copies of one router. Entries are tiny but
    * routers can be constructed per pipeline run, so the map is BOUNDED:
    * past MaxStates the LEAST-RECENTLY-USED entry is evicted (access-order
    * LinkedHashMap) — eviction pressure from churned short-lived routers
    * lands on genuinely idle states, never on a router that is actively
    * invoking (every invoke touches its state, moving it to the tail), so
    * a live router's breaker/EWMA/cooldown state survives arbitrarily many
    * later constructions. An evicted-then-revived router restarts from
    * fresh counters — graceful degradation, never unbounded growth. One
    * short lock per invoke; invocations are network-latency-scale, so the
    * monitor is uncontended in practice. */
  private val MaxStates = 65536
  private val states =
    new java.util.LinkedHashMap[String, RouterState](1024, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, RouterState]): Boolean =
        size() > MaxStates
    }
  private def stateFor(id: String, n: Int): RouterState = states.synchronized {
    val s = states.get(id) // access-order get = LRU touch
    if (s != null) s
    else { val ns = new RouterState(n); states.put(id, ns); ns }
  }
  /** Test hook: current registry size. */
  private[graft] def stateCount: Int = states.synchronized(states.size())
}
