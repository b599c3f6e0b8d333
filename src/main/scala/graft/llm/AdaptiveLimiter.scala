package graft.llm

/** Gradient2-style adaptive concurrency control
  * (reference: ondine/utils/adaptive_limiter.py:68-242):
  *
  *   gradient = clamp(2 * rtt_noload / rtt_smoothed, 0.5, 2.0)
  *   newLimit = limit * gradient (+ sqrt growth only when saturated)
  *   on 429: limit *= 0.9, with a cooldown before further shrinks.
  *
  * Used inside the Invoke operator's admission control as an alternative to
  * the fixed semaphore: call `acquireSlot`/`release` around each request,
  * `onSuccess(rttMs)` / `onRateLimit()` after.
  */
final class AdaptiveLimiter(
    minLimit: Int = 1,
    maxLimit: Int = 64,
    initialLimit: Int = 8,
    smoothing: Double = 0.2,
    shrinkCooldownMs: Long = 200L) {

  private var limit: Double = initialLimit.toDouble
  private var rttNoLoad: Double = Double.MaxValue
  private var rttSmoothed: Double = 0.0
  private var inFlight: Int = 0
  private var lastShrinkMs: Long = 0L

  def currentLimit: Int = synchronized(math.round(limit).toInt)

  /** Try to admit a request; false = over the adaptive cap. */
  def acquireSlot(): Boolean = synchronized {
    if (inFlight < currentLimit) { inFlight += 1; true } else false
  }

  /** Block until admitted. */
  def acquireBlocking(): Unit = {
    while (!acquireSlot()) Thread.sleep(1)
  }

  def release(): Unit = synchronized { inFlight = math.max(0, inFlight - 1) }

  def onSuccess(rttMs: Double): Unit = synchronized {
    rttNoLoad = math.min(rttNoLoad, rttMs)
    rttSmoothed =
      if (rttSmoothed == 0.0) rttMs
      else (1 - smoothing) * rttSmoothed + smoothing * rttMs
    val gradient = math.max(0.5, math.min(2.0,
      2.0 * rttNoLoad / math.max(rttSmoothed, 1e-9)))
    var next = limit * gradient
    // grow only when we're actually using the window (saturation rule)
    if (gradient >= 1.0 && inFlight >= currentLimit - 1)
      next += math.sqrt(limit)
    limit = math.max(minLimit.toDouble, math.min(maxLimit.toDouble, next))
  }

  /** 0.9x shrink on 429, rate-limited by a cooldown
    * (reference :200-221). */
  def onRateLimit(): Unit = synchronized {
    val now = System.nanoTime() / 1000000L
    if (now - lastShrinkMs >= shrinkCooldownMs) {
      lastShrinkMs = now
      limit = math.max(minLimit.toDouble, limit * 0.9)
    }
  }
}
