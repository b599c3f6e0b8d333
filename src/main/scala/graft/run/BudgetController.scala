package graft.run

import java.math.{BigDecimal => JBigDecimal}

class BudgetExceededException(msg: String) extends RuntimeException(msg)

/** Hard cost cap with warning thresholds
  * (reference: ondine/utils/budget_controller.py:20-131 — warn at 75% and
  * 90%, raise over cap; checked between chunks, mirroring the streaming
  * cumulative budget ondine/api/pipeline.py:1460-1462).
  *
  * Executors cannot be stopped mid-job from an accumulator, so enforcement
  * is driver-side between chunks (SURVEY §7.6 option (a)); spend is computed
  * from the durable call ledger, which is exact and idempotent under task
  * retry — never from at-least-once accumulators.
  */
final class BudgetController(max: Option[BigDecimal]) {
  @volatile private var warned75 = false
  @volatile private var warned90 = false

  def check(spent: JBigDecimal): Unit = max.foreach { m =>
    val cap = m.bigDecimal
    if (spent.compareTo(cap) > 0)
      throw new BudgetExceededException(
        s"budget exceeded: spent=$spent cap=$cap")
    val ratio = spent.doubleValue() / math.max(cap.doubleValue(), 1e-18)
    if (ratio >= 0.90 && !warned90) {
      warned90 = true
      System.err.println(f"[graft] budget 90%% reached: $$${spent}")
    } else if (ratio >= 0.75 && !warned75) {
      warned75 = true
      System.err.println(f"[graft] budget 75%% reached: $$${spent}")
    }
  }
}
