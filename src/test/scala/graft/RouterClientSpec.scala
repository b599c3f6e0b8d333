package graft

import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.scalatest.funsuite.AnyFunSuite

import graft.llm._

/** Routing-strategy semantics and the circuit breaker
  * (reference: ondine/core/router_strategies.py:10-84,
  * unified_litellm_client.py:553-705). Latency arcs inject REPORTED
  * latencies (RouterClient.Reported) so assertions are exact, not
  * wall-clock-dependent; concurrency arcs hammer from many threads the
  * way Invoke's partition threads do. */
class RouterClientSpec extends AnyFunSuite {

  /** Deterministic client: fixed reported latency, fixed token counts,
    * fixed per-call cost, optional scripted failures. */
  private final class FixedClient(
      name: String,
      reportMs: Double,
      tokens: Long = 10L,
      costPerCall: java.math.BigDecimal = java.math.BigDecimal.ZERO,
      failFirstN: Int = 0) extends LlmClient {
    val calls = new AtomicInteger(0)
    def model: String = name
    def invoke(prompt: String, sys: Option[String]): LlmResponse = {
      val n = calls.incrementAndGet()
      if (n <= failFirstN) throw new NetworkError(s"$name scripted fail $n")
      LlmResponse(s"$name:$prompt", tokens / 2, tokens - tokens / 2, name,
        costPerCall, reportMs)
    }
  }

  private def latencyRouter(ds: (LlmClient, Double)*) =
    new RouterClient(ds, RouterClient.LatencyBased,
      latencySource = RouterClient.Reported)

  test("latency-based: probes unmeasured deployments once, then routes to the fastest") {
    val slow = new FixedClient("m-slow", 100.0)
    val fast = new FixedClient("m-fast", 1.0)
    val r = latencyRouter(slow -> 1.0, fast -> 1.0)
    (1 to 20).foreach(i => r.invoke(s"p$i", None))
    // call 1 probes m-slow, call 2 probes m-fast, 3..20 all go fast
    assert(slow.calls.get() == 1)
    assert(fast.calls.get() == 19)
  }

  test("latency-based: the split SHIFTS inside one router when a deployment degrades") {
    // m-a is fast for its first 10 calls, then degrades to 500 ms
    val aCalls = new AtomicInteger(0)
    val a = new LlmClient {
      def model = "m-a"
      def invoke(p: String, s: Option[String]): LlmResponse = {
        val n = aCalls.incrementAndGet()
        LlmResponse("a", 1, 1, model, java.math.BigDecimal.ZERO,
          if (n <= 10) 1.0 else 500.0)
      }
    }
    val b = new FixedClient("m-b", 50.0)
    val r = latencyRouter(a -> 1.0, b -> 1.0)
    (1 to 10).foreach(i => r.invoke(s"x$i", None))
    // probe, probe, then all to the fast deployment
    assert(aCalls.get() == 9 && b.calls.get() == 1)
    // a degrades: one 500 ms sample pushes a's EWMA (0.7*1 + 0.3*500 ≈ 151)
    // past b's 50 ms — every later call shifts to b
    (1 to 10).foreach(i => r.invoke(s"y$i", None))
    assert(b.calls.get() >= 8, s"traffic must shift to m-b, got b=${b.calls.get()}")
    assert(aCalls.get() <= 12)
  }

  test("least-busy: a blocked deployment sheds concurrent calls to the idle one") {
    val inA = new CountDownLatch(1)
    val releaseA = new CountDownLatch(1)
    val aCalls = new AtomicInteger(0)
    val blockingA = new LlmClient {
      def model = "m-block"
      def invoke(p: String, s: Option[String]): LlmResponse = {
        aCalls.incrementAndGet()
        inA.countDown()
        releaseA.await(10, TimeUnit.SECONDS)
        LlmResponse("a", 1, 1, model, java.math.BigDecimal.ZERO, 1.0)
      }
    }
    val idle = new FixedClient("m-idle", 1.0)
    val r = new RouterClient(Seq(blockingA -> 1.0, idle -> 1.0),
      RouterClient.LeastBusy)
    val pool = Executors.newFixedThreadPool(2)
    try {
      // first call ties at 0 in-flight -> declaration order -> m-block
      pool.submit(new Runnable { def run(): Unit = r.invoke("one", None) })
      assert(inA.await(10, TimeUnit.SECONDS), "first call must reach m-block")
      // while m-block holds one in-flight, new calls must go to m-idle
      (1 to 5).foreach(i => r.invoke(s"two$i", None))
      assert(aCalls.get() == 1)
      assert(idle.calls.get() == 5)
    } finally { releaseA.countDown(); pool.shutdown() }
  }

  test("usage-based: cumulative token load evens out across unequal responders") {
    val heavy = new FixedClient("m-heavy", 1.0, tokens = 100L)
    val light = new FixedClient("m-light", 1.0, tokens = 10L)
    val r = new RouterClient(Seq(heavy -> 1.0, light -> 1.0),
      RouterClient.UsageBased)
    (1 to 22).foreach(i => r.invoke(s"u$i", None))
    // heavy costs 10x tokens per call, so light should serve ~10x calls
    assert(light.calls.get() > heavy.calls.get() * 5,
      s"light=${light.calls.get()} heavy=${heavy.calls.get()}")
    assert(heavy.calls.get() >= 2, "heavy still probed as usage accrues")
  }

  test("cost-based: routes to the observed-cheapest deployment after probing") {
    val pricey = new FixedClient("m-pricey", 1.0,
      costPerCall = new java.math.BigDecimal("0.10"))
    val cheap = new FixedClient("m-cheap", 1.0,
      costPerCall = new java.math.BigDecimal("0.01"))
    val r = new RouterClient(Seq(pricey -> 1.0, cheap -> 1.0),
      RouterClient.CostBased)
    (1 to 20).foreach(i => r.invoke(s"c$i", None))
    assert(pricey.calls.get() == 1 && cheap.calls.get() == 19)
  }

  test("circuit breaker: allowedFails consecutive failures cool the deployment down, " +
    "cooldown excludes it, expiry re-probes it") {
    val clock = new AtomicLong(1000000L)
    val bad = new FixedClient("m-bad", 1.0, failFirstN = Int.MaxValue)
    val good = new FixedClient("m-good", 50.0)
    val events = new ConcurrentLinkedQueue[(String, Int, Long)]()
    val listener = new RouterClient.CooldownListener {
      def onCooldown(m: String, f: Int, cd: Long, reason: String): Unit =
        events.add((m, f, cd))
    }
    val r = new RouterClient(Seq(bad -> 1.0, good -> 1.0),
      RouterClient.LatencyBased, allowedFails = 2, cooldownMs = 5000L,
      onCooldown = listener, latencySource = RouterClient.Reported,
      nowMs = () => clock.get())
    // c1: bad probed (unmeasured first), fails #1, fails over to good
    // c2: bad still unmeasured -> probed again, fails #2 -> COOLDOWN, over to good
    r.invoke("c1", None); r.invoke("c2", None)
    assert(bad.calls.get() == 2)
    assert(events.size() == 1)
    val (m, f, cd) = events.peek()
    assert(m == "m-bad" && f == 2 && cd == 5000L)
    // c3/c4: bad is cooling -> good picked DIRECTLY (bad untouched)
    r.invoke("c3", None); r.invoke("c4", None)
    assert(bad.calls.get() == 2)
    assert(good.calls.get() == 4)
    // clock past the window: bad is eligible again and (still unmeasured)
    // probed first
    clock.addAndGet(6000L)
    r.invoke("c5", None)
    assert(bad.calls.get() == 3, "expired cooldown must re-probe the deployment")
  }

  test("fail open: when every deployment is cooling, the router still serves") {
    val clock = new AtomicLong(50000L)
    val flaky = new FixedClient("m-flaky", 1.0, failFirstN = 2)
    val r = new RouterClient(Seq(flaky -> 1.0),
      RouterClient.RoundRobin, allowedFails = 2, cooldownMs = 60000L,
      nowMs = () => clock.get())
    intercept[LlmError](r.invoke("f1", None))
    intercept[LlmError](r.invoke("f2", None)) // enters cooldown
    // sole deployment cooling -> fail open, call still lands (and heals)
    val resp = r.invoke("f3", None)
    assert(resp.text.startsWith("m-flaky"))
  }

  test("rate-limit errors count toward cooldown but are never failed over") {
    val limited = new LlmClient {
      val calls = new AtomicInteger(0)
      def model = "m-429"
      def invoke(p: String, s: Option[String]): LlmResponse = {
        calls.incrementAndGet()
        throw new RateLimitError("429", Some(1000L))
      }
    }
    val backup = new FixedClient("m-backup", 1.0)
    val r = new RouterClient(Seq(limited -> 1.0, backup -> 1.0),
      RouterClient.RoundRobin, allowedFails = 1, cooldownMs = 60000L)
    intercept[RateLimitError](r.invoke("rl", None))
    assert(backup.calls.get() == 0, "429 must propagate, not fail over")
    // the 429 streak cooled m-429 down: next pick skips it entirely
    r.invoke("rl2", None)
    assert(backup.calls.get() == 1)
  }

  test("thread safety: 16 threads x 200 calls, counters conserve and in-flight drains") {
    val a = new FixedClient("t-a", 1.0)
    val b = new FixedClient("t-b", 2.0)
    for (strategy <- Seq[RouterClient.Strategy](RouterClient.Weighted,
      RouterClient.RoundRobin, RouterClient.LeastBusy,
      RouterClient.UsageBased, RouterClient.LatencyBased)) {
      a.calls.set(0); b.calls.set(0)
      val r = new RouterClient(Seq(a -> 1.0, b -> 1.0), strategy,
        latencySource = RouterClient.Reported)
      val pool = Executors.newFixedThreadPool(16)
      val done = new CountDownLatch(16)
      val errs = new ConcurrentLinkedQueue[Throwable]()
      (1 to 16).foreach { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            try (1 to 200).foreach(i => r.invoke(s"t$t-$i", None))
            catch { case e: Throwable => errs.add(e) }
            finally done.countDown()
          }
        })
      }
      assert(done.await(60, TimeUnit.SECONDS), s"$strategy hung")
      pool.shutdown()
      assert(errs.isEmpty, s"$strategy threw: ${errs.peek()}")
      assert(a.calls.get() + b.calls.get() == 3200, s"$strategy lost calls")
      assert(r.stateSnapshot.forall(_._2 == 0), s"$strategy leaked in-flight")
    }
  }

  test("round-robin over two deployments still alternates strictly when single-threaded") {
    val a = new FixedClient("rr-a", 1.0)
    val b = new FixedClient("rr-b", 1.0)
    val r = new RouterClient(Seq(a -> 1.0, b -> 1.0), RouterClient.RoundRobin)
    (1 to 10).foreach(i => r.invoke(s"r$i", None))
    assert(a.calls.get() == 5 && b.calls.get() == 5)
  }

  test("cooldown trips bridge into the observer stack as ProviderCooldown events") {
    val collector = new graft.run.CollectingObserver
    val dispatcher = new graft.run.ObserverDispatcher().register(collector)
    val key = "rcs-bridge-test"
    RouterClient.registerCooldownBridge(key, dispatcher)
    try {
      val bad = new FixedClient("m-trip", 1.0, failFirstN = 2)
      val ok = new FixedClient("m-ok", 1.0)
      val r = new RouterClient(Seq(bad -> 1.0, ok -> 1.0),
        RouterClient.RoundRobin, allowedFails = 2, cooldownMs = 60000L,
        onCooldown = new RouterClient.BridgedCooldownListener(key, "run-7"))
      // round-robin alternation: c1 -> bad (fail#1, over to ok), c2 -> ok,
      // c3 -> bad (fail#2 -> TRIP, over to ok)
      (1 to 3).foreach(i => r.invoke(s"b$i", None))
      import scala.jdk.CollectionConverters._
      val cooldowns = collector.events.asScala.collect {
        case e: graft.run.ProviderCooldown => e }.toSeq
      assert(cooldowns.size == 1)
      assert(cooldowns.head ==
        graft.run.ProviderCooldown("run-7", "m-trip", 2, 60000L,
          cooldowns.head.reason))
      assert(cooldowns.head.reason.contains("scripted fail"))
      // unregistered key degrades to the executor-log path, never throws
      RouterClient.unregisterCooldownBridge(key)
      val bad2 = new FixedClient("m-trip2", 1.0, failFirstN = 2)
      val r2 = new RouterClient(Seq(bad2 -> 1.0, ok -> 1.0),
        RouterClient.RoundRobin, allowedFails = 2, cooldownMs = 60000L,
        onCooldown = new RouterClient.BridgedCooldownListener(key))
      (1 to 3).foreach(i => r2.invoke(s"c$i", None))
      assert(collector.events.asScala.collect {
        case e: graft.run.ProviderCooldown => e }.size == 1)
    } finally RouterClient.unregisterCooldownBridge(key)
  }

  test("concurrent failures fire exactly ONE cooldown event per trip") {
    // 16 threads each fail once against a single always-failing deployment
    // (fail-open keeps routing to it); allowedFails=16 means the atomic
    // counter hands the value 16 to exactly one thread -> exactly one event
    val bad = new FixedClient("m-race", 1.0, failFirstN = Int.MaxValue)
    val events = new ConcurrentLinkedQueue[String]()
    val listener = new RouterClient.CooldownListener {
      def onCooldown(m: String, f: Int, cd: Long, reason: String): Unit =
        events.add(m)
    }
    val r = new RouterClient(Seq(bad -> 1.0), RouterClient.RoundRobin,
      allowedFails = 16, cooldownMs = 60000L, onCooldown = listener)
    val pool = Executors.newFixedThreadPool(16)
    val done = new CountDownLatch(16)
    (1 to 16).foreach { t =>
      pool.submit(new Runnable {
        def run(): Unit = {
          try r.invoke(s"race$t", None)
          catch { case _: LlmError => () }
          finally done.countDown()
        }
      })
    }
    assert(done.await(30, TimeUnit.SECONDS))
    pool.shutdown()
    assert(events.size() == 1,
      s"one trip must fire one event, got ${events.size()}")
  }

  test("round-robin cursor is SHARED across serialized task copies") {
    val r = new RouterClient(
      Seq((new MockLlmClient("rr-x"), 1.0), (new MockLlmClient("rr-y"), 1.0)),
      RouterClient.RoundRobin)
    // java-serialize the router the way a task closure would
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(r)
    val copy = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[RouterClient]
    // interleave calls across the original and the copy: a per-instance
    // cursor would give xyxy from EACH (skewing multi-partition runs);
    // the shared cursor keeps one strict global alternation
    val models = (1 to 8).map { i =>
      (if (i % 2 == 0) copy else r).invoke(s"m$i", None).model
    }
    assert(models.count(_ == "rr-x") == 4 && models.count(_ == "rr-y") == 4)
    assert(models.sliding(2).forall(p => p.head != p(1)),
      s"strict global alternation expected, got $models")
  }

  /** Client that blocks inside invoke until released — the cold-start
    * stampede probe: while thread 1 is still measuring deployment 0, a
    * find()-first rule would send thread 2 to deployment 0 TOO. */
  private final class BlockingClient(name: String, release: CountDownLatch,
      started: ConcurrentLinkedQueue[String]) extends LlmClient {
    def model: String = name
    def invoke(p: String, s: Option[String]): LlmResponse = {
      started.add(name)
      release.await(10, TimeUnit.SECONDS)
      LlmResponse(name, 1, 1, name, java.math.BigDecimal.ZERO, 1.0)
    }
  }

  private def coldStartArc(strategy: RouterClient.Strategy): Unit = {
    val started = new ConcurrentLinkedQueue[String]()
    val release = new CountDownLatch(1)
    val r = new RouterClient(
      Seq(new BlockingClient("m-a", release, started) -> 1.0,
        new BlockingClient("m-b", release, started) -> 1.0),
      strategy, latencySource = RouterClient.Reported)
    val pool = Executors.newFixedThreadPool(2)
    try {
      val f1 = pool.submit(new Runnable {
        def run(): Unit = r.invoke("p1", None) })
      // wait until thread 1 is INSIDE m-a's invoke (inFlight(m-a)=1), so
      // thread 2's pick sees the in-flight probe deterministically
      val t0 = System.nanoTime()
      while (started.size() < 1 && System.nanoTime() - t0 < 10e9)
        Thread.sleep(2)
      assert(started.size() == 1, "thread 1 never started")
      val f2 = pool.submit(new Runnable {
        def run(): Unit = r.invoke("p2", None) })
      val t1 = System.nanoTime()
      while (started.size() < 2 && System.nanoTime() - t1 < 10e9)
        Thread.sleep(2)
      release.countDown()
      f1.get(10, TimeUnit.SECONDS); f2.get(10, TimeUnit.SECONDS)
      import scala.jdk.CollectionConverters._
      assert(started.asScala.toSet == Set("m-a", "m-b"),
        s"concurrent cold threads must probe DIFFERENT unmeasured " +
          s"deployments, got ${started.asScala.toList}")
    } finally { release.countDown(); pool.shutdown() }
  }

  test("latency-based cold start: concurrent threads fan out across unmeasured deployments") {
    coldStartArc(RouterClient.LatencyBased)
  }

  test("cost-based cold start: concurrent threads fan out across unmeasured deployments") {
    coldStartArc(RouterClient.CostBased)
  }

  test("state registry eviction is LRU: an actively-invoking router survives 66k churned routers") {
    val keeper = new RouterClient(
      Seq(new FixedClient("m-keep", 1.0) -> 1.0), RouterClient.RoundRobin)
    keeper.invoke("p", None)
    assert(keeper.stateSnapshot.head._3 == 10L) // tokens from call 1
    // churn one-shot routers past the 65536-state bound, touching the
    // keeper every 8192 constructions: under FIFO eviction the keeper
    // (oldest key) dies regardless of activity and its counters restart;
    // under LRU every touch moves it to the tail and its state survives
    val touches = (1 to 66000).count { i =>
      new RouterClient(Seq(new FixedClient(s"m-churn-$i", 1.0) -> 1.0))
        .invoke("p", None)
      if (i % 8192 == 0) { keeper.invoke("p", None); true } else false
    }
    assert(keeper.stateSnapshot.head._3 == 10L * (1 + touches),
      "keeper's accumulated token counter must survive the churn intact")
    assert(RouterClient.stateCount <= 65536, "registry must stay bounded")
  }
}
