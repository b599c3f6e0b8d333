package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exponential recency-decay scoring — the standard "how active is
  * this user/source NOW" signal (recommendation freshness, churn
  * screens, crawl re-visit priority): each event contributes
  * `2^(−age/halfLife)`, so an event one half-life old counts half as
  * much as one from just now.
  *
  * Determinism discipline: a float SUM of decayed weights is
  * order-dependent, so each event's weight rounds to integer MICRO
  * units first and the per-key accumulation is exact integer math
  * (the LanguageModel micro-bit rule) — partitioning-independent and
  * engine-replayable; the only float work is one pow-chain per event.
  * The reference instant is the corpus max timestamp (a 1-row
  * metrics frame crossed in), so the score is a pure function of the
  * data, not of wall-clock at run time.
  *
  * Scale shape: one scan + one map-side-combinable aggregation keyed
  * by `userCol`; nothing else shuffles. */
object Recency {

  /** Inter-arrival burstiness per key — Goh & Barabási 2008:
    * B = (σ−μ)/(σ+μ) over the gaps between consecutive events, in
    * [−1, 1] (−1 = metronome, 0 = Poisson, →1 = bursty). The signal
    * behind bot/scraper detection (machine traffic is periodic) and
    * session-model sanity checks.
    *
    * Exactness: gaps are integer microseconds (sorted-order
    * consecutive differences — a DETERMINISTIC MULTISET even under
    * timestamp ties, since the sorted value sequence is tie-order
    * independent); Σg stays a long, Σg² rides DECIMAL(38,0) (a 30-day
    * gap squared overflows a long), and the variance numerator
    * n·Σg² − (Σg)² is computed exactly in decimal before the ONE
    * IEEE chain (sqrt is correctly rounded per IEEE-754, so even the
    * σ step replays bit-for-bit). Per-key lag window + one
    * aggregation; keys with < 2 events have no gaps and drop out.
    * Output: (userCol, n_gaps, mean_gap_s, cv, burstiness), all
    * rounded at 6dp (the mean in SECONDS — a µs mean in the 1e10 range
    * has a ulp coarser than 6dp, so its decimal rounding would not be
    * engine-stable); cv/burstiness null when μ = 0 (all gaps zero). */
  def burstiness(events: DataFrame, userCol: String,
                 tsCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol))
    val gaps = events
      .withColumn("__graft_g",
        unix_micros(col(tsCol)) - lag(unix_micros(col(tsCol)), 1).over(w))
      .filter(col("__graft_g").isNotNull)
    val d = col("__graft_g").cast("decimal(38,0)")
    val agg = gaps.groupBy(col(userCol)).agg(
      count(lit(1)).as("n_gaps"),
      sum(col("__graft_g")).as("__graft_s"),
      sum(d * d).as("__graft_ssq"))
    val n = col("n_gaps")
    val s = col("__graft_s")
    val mean = s.cast("double") / n.cast("double")
    val varNum = (n.cast("decimal(38,0)") * col("__graft_ssq") -
      s.cast("decimal(38,0)") * s.cast("decimal(38,0)"))
    val variance = varNum.cast("double") / (n * n).cast("double")
    val sigma = sqrt(variance)
    agg.select(col(userCol), n,
      round(mean / lit(1e6), 6).as("mean_gap_s"),
      when(s > 0, round(sigma / mean, 6)).otherwise(lit(null).cast("double"))
        .as("cv"),
      when(s > 0, round((sigma - mean) / (sigma + mean), 6))
        .otherwise(lit(null).cast("double")).as("burstiness"))
  }

  /** Per-key decayed activity: (userCol, n_events, recency_score),
    * score = Σ 2^(−age_µs / halfLife_µs) rounded at 6dp. */
  def recencyScores(events: DataFrame, userCol: String, tsCol: String,
      halfLifeDays: Double = 7.0): DataFrame = {
    require(halfLifeDays > 0.0, s"halfLifeDays=$halfLifeDays must be > 0")
    val hlMicros = halfLifeDays * 86400.0 * 1e6
    val maxTs = events.agg(max(unix_micros(col(tsCol))).as("__graft_mx"))
    val age = (col("__graft_mx") - unix_micros(col(tsCol))).cast("double")
    val weight = pow(lit(2.0), -(age / lit(hlMicros)))
    events.crossJoin(broadcast(maxTs)) // 1-row metrics frame
      .withColumn("__graft_w", round(weight * lit(1e6), 0).cast("long"))
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col("__graft_w")).as("__graft_s"))
      .select(col(userCol), col("n_events"),
        round(col("__graft_s").cast("double") / lit(1e6), 6)
          .as("recency_score"))
  }
}
