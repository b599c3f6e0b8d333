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
