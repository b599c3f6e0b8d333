package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** CUSUM changepoint detection over hourly event rates — the classic
  * one-sided cumulative-sum control chart (Page 1954): per key,
  *
  *   S_h = max(0, S_{h−1} + (x_h − μ − slack))
  *
  * where x_h is the key's event count in hour h and μ its mean hourly
  * rate over the observed span. A sustained rate INCREASE accumulates
  * in S and alarms fast even when no single hour is individually
  * anomalous — the feed-breakage/traffic-burst monitor next to
  * [[Recency.burstiness]] (which scores gap dispersion, not level
  * shifts).
  *
  * The recurrence looks imperative but has an exact declarative form:
  * with P_h the running sum of y_h = x_h − μ − slack,
  * S_h = P_h − min(0, min_{j≤h} P_j) — a running sum plus a running
  * min, two frames of ONE window partitioned by key and ordered by
  * hour. Cells per partition = the observed hour span (a domain
  * constant — ~9 k hours/year — never row-count-scaled; the q169
  * stickiness discipline), keys hash-partition across the cluster.
  *
  * Exactness: μ = T/H is rational, so everything is scaled by H
  * (y'_h = H·(x_h − slack) − T) and carried in DECIMAL(38,0) — no
  * float enters at all; `cusum_scaled` = S_h·H is an exact integer
  * any engine replays bit-for-bit. Missing hours count 0 via an
  * explicit (key × hour-spine) frame — CUSUM over only the observed
  * hours would miss the silence side of a breakage; the spine and the
  * span length both derive declaratively from one 1-row bounds
  * aggregate (no driver timestamp literal, no TZ reinterpretation).
  * Output: one row per (key, hour): (keyCol, hour, n_events,
  * cusum_scaled). Callers alarm on cusum_scaled > H·threshold in
  * their own units. */
object Changepoint {

  private val Dup = "__graft_"

  def cusumHourly(events: DataFrame, keyCol: String, tsCol: String,
                  slack: Long = 0L): DataFrame = {
    require(slack >= 0L, s"slack=$slack negative")
    val rows = events.filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol), date_trunc("hour", col(tsCol)).as(s"${Dup}h"))
    val counts = rows.groupBy(col(keyCol), col(s"${Dup}h"))
      .agg(count(lit(1)).as(s"${Dup}x"))
    // hour spine + span length from ONE 1-row bounds aggregate; both
    // stay DataFrames (broadcast 1-row / span-row frames), so no driver
    // timestamp ever round-trips through a JVM-TZ literal.
    // bounds/keys derive from `counts`, not the raw rows: every subtree
    // then shares the one scan+aggregate (ReuseExchange dedupes it)
    // instead of re-scanning the events table three times with different
    // projections (r14; guide §2.4). The span is arithmetic off the
    // bounds — hours are date_trunc'd, so hi−lo is whole hours and
    // timestampdiff(HOUR)+1 equals the exploded sequence length the
    // retired span aggregate counted.
    val bounds = counts.agg(min(col(s"${Dup}h")).as(s"${Dup}lo"),
      max(col(s"${Dup}h")).as(s"${Dup}hi"))
    val hours = bounds.filter(col(s"${Dup}lo").isNotNull)
      .select(explode(sequence(col(s"${Dup}lo"), col(s"${Dup}hi"),
        expr("INTERVAL 1 HOUR"))).as(s"${Dup}h"))
    val span = bounds.filter(col(s"${Dup}lo").isNotNull)
      .select(expr(s"timestampdiff(HOUR, ${Dup}lo, ${Dup}hi) + 1")
        .cast("long").as(s"${Dup}hspan"))
    val keys = counts.select(col(keyCol)).distinct()
    // barrier: the spine and the counts share the raw rows' lineage, and
    // joining them would otherwise trip the self-join ambiguity check;
    // the identity pass mints fresh attribute ids on the (bounded
    // keys × hours) frame
    val spine = graft.ops.Parallelism.barrier(
      keys.crossJoin(broadcast(hours)))
    val perKey = counts.groupBy(col(keyCol))
      .agg(sum(col(s"${Dup}x")).as(s"${Dup}T"))
    val w = W.partitionBy(col(keyCol)).orderBy(col(s"${Dup}h"))
      .rowsBetween(W.unboundedPreceding, 0)
    val stepped = spine
      .join(counts, Seq(keyCol, s"${Dup}h"), "left")
      .join(perKey, Seq(keyCol))
      .crossJoin(broadcast(span))
      .select(col(keyCol), col(s"${Dup}h"),
        coalesce(col(s"${Dup}x"), lit(0L)).as(s"${Dup}x"),
        (col(s"${Dup}hspan").cast("decimal(38,0)") *
          (coalesce(col(s"${Dup}x"), lit(0L)) - lit(slack))
            .cast("decimal(38,0)") -
          col(s"${Dup}T").cast("decimal(38,0)")).as(s"${Dup}y"))
      .withColumn(s"${Dup}p", sum(col(s"${Dup}y")).over(w))
      .withColumn(s"${Dup}floor",
        least(lit(0L).cast("decimal(38,0)"), min(col(s"${Dup}p")).over(w)))
    stepped.select(col(keyCol), col(s"${Dup}h").as("hour"),
      col(s"${Dup}x").as("n_events"),
      (col(s"${Dup}p") - col(s"${Dup}floor")).cast("decimal(38,0)")
        .as("cusum_scaled"))
  }
}
