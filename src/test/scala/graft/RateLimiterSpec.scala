package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{RateLimiter, RetryHandler, NetworkError, AuthError}

class RateLimiterSpec extends AnyFunSuite {

  test("burst tokens are granted immediately, then throttled") {
    val rl = new RateLimiter(requestsPerMinute = 6000, burst = 5) // 100/s
    val t0 = System.nanoTime()
    (1 to 5).foreach(_ => rl.acquire()) // burst
    val burstMs = (System.nanoTime() - t0) / 1e6
    assert(burstMs < 200, s"burst should be instant, took $burstMs ms")
    rl.acquire() // 6th must wait ~10ms for refill
    val totalMs = (System.nanoTime() - t0) / 1e6
    assert(totalMs >= 5, s"6th acquire should throttle, total $totalMs ms")
  }

  test("penalize stalls all callers until the deadline") {
    val rl = new RateLimiter(requestsPerMinute = 60000, burst = 10)
    rl.penalize(150)
    val t0 = System.nanoTime()
    rl.acquire()
    val waited = (System.nanoTime() - t0) / 1e6
    assert(waited >= 100, s"expected >=100ms penalty stall, got $waited")
  }

  test("retry handler: retryable errors retry, non-retryable do not") {
    var attempts = 0
    val r = RetryHandler.withRetries(3, 1, 10, None) {
      attempts += 1
      if (attempts < 3) throw new NetworkError("flaky")
      "ok"
    }
    assert(r == "ok" && attempts == 3)

    var authAttempts = 0
    intercept[AuthError] {
      RetryHandler.withRetries(3, 1, 10, None) {
        authAttempts += 1
        throw new AuthError("bad key")
      }
    }
    assert(authAttempts == 1, "non-retryable must not retry")
  }

  test("backoff grows exponentially and caps") {
    assert(RetryHandler.backoff(0, 100, 60000) == 100)
    assert(RetryHandler.backoff(1, 100, 60000) == 200)
    assert(RetryHandler.backoff(3, 100, 60000) == 800)
    assert(RetryHandler.backoff(20, 100, 60000) == 60000)
  }
}
