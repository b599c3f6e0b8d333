package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

import graft.functions.Expressions

/** Exact classifier evaluation metrics at corpus scale. AUC here is
  * the Mann–Whitney form — the probability a random positive outscores
  * a random negative, ties at half credit — computed EXACTLY from the
  * (score, pos, neg) histogram: Σ_s pos(s)·(2·negBelow(s) + neg(s))
  * over 2·P·N. Exact integer numerator ⇒ deterministic under any
  * partitioning and replayable in any engine (a sampled or
  * trapezoidal-approximation AUC can never hash-verify).
  *
  * The scale problem is negBelow: a cumulative sum over the distinct
  * score values, whose count grows with corpus size — the
  * single-reducer window shape the [[RankCuts]] scaladoc bans. The
  * replacement is a TWO-LEVEL prefix sum with both levels bounded (the
  * CMS bound discipline applied to prefix sums): scores bucket by
  * `(s − min) div width` with `width = ceil(range/2^16)`, so there are
  * ≤ 2^16 buckets AND ≤ 2^16 distinct values per bucket whenever the
  * integer score RANGE is ≤ 2^32 (`require`-guarded — micro-unit
  * probabilities span 1e6). Bucket offsets are one ordered window over
  * the ≤ 2^16 bucket rows; within-bucket cumulation windows partition
  * BY BUCKET — never SinglePartition, never more than `width` distinct
  * values per partition. Wider integer ranges re-quantize upstream.
  */
object Eval {

  private val Dup = "__graft_"

  /** One-row exact AUC: (n_pos, n_neg, auc). `labelCol` is boolean
    * (true = positive), `scoreCol` integral; null labels/scores are
    * excluded; auc is null when either class is empty. */
  def aucExact(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val rows = df.filter(col(labelCol).isNotNull && col(scoreCol).isNotNull)
      .select(col(labelCol).cast("boolean").as(s"${Dup}y"),
        col(scoreCol).cast("long").as(s"${Dup}s"))
    val hist = graft.ops.Parallelism.stage(
      rows.groupBy(col(s"${Dup}s"))
        .agg(sum(when(col(s"${Dup}y"), 1L).otherwise(0L)).as(s"${Dup}p"),
          sum(when(col(s"${Dup}y"), 0L).otherwise(1L)).as(s"${Dup}n")))
    val bounds = hist.agg(min(col(s"${Dup}s")), max(col(s"${Dup}s")))
      .head()
    if (bounds.isNullAt(0)) // empty input
      return rows.sparkSession.sql(
        "SELECT CAST(0 AS BIGINT) n_pos, CAST(0 AS BIGINT) n_neg, " +
          "CAST(NULL AS DOUBLE) auc")
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    require(hi - lo >= 0 && hi - lo <= (1L << 32),
      s"score range ${hi - lo} exceeds 2^32: re-quantize upstream " +
        "(the two-level prefix sum bounds both levels at 2^16)")
    val width = math.max(1L, ((hi - lo) >> 16) + 1)
    val bucketed = hist.withColumn(s"${Dup}b",
      Expressions.int_div(col(s"${Dup}s") - lit(lo), lit(width)))
    // level 1: ≤2^16 bucket rows, one bounded ordered window
    val offsets = bucketed.groupBy(col(s"${Dup}b"))
      .agg(sum(col(s"${Dup}n")).as(s"${Dup}bn"))
      .withColumn(s"${Dup}off",
        coalesce(sum(col(s"${Dup}bn")).over(
          W.orderBy(col(s"${Dup}b"))
            .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .drop(s"${Dup}bn")
    // level 2: per-bucket cumulation, ≤width distinct values/partition
    val wInB = W.partitionBy(col(s"${Dup}b")).orderBy(col(s"${Dup}s"))
      .rowsBetween(W.unboundedPreceding, -1)
    val scored = bucketed.join(offsets, Seq(s"${Dup}b"))
      .withColumn(s"${Dup}below",
        col(s"${Dup}off") + coalesce(sum(col(s"${Dup}n")).over(wInB), lit(0L)))
    val agg = scored.agg(
      sum(col(s"${Dup}p")).as(s"${Dup}P"),
      sum(col(s"${Dup}n")).as(s"${Dup}N"),
      sum(col(s"${Dup}p") * (lit(2L) * col(s"${Dup}below") + col(s"${Dup}n")))
        .as(s"${Dup}num2"))
    agg.select(col(s"${Dup}P").as("n_pos"), col(s"${Dup}N").as("n_neg"),
      when(col(s"${Dup}P") > 0 && col(s"${Dup}N") > 0,
        round(col(s"${Dup}num2").cast("double") /
          (lit(2.0) * col(s"${Dup}P").cast("double") *
            col(s"${Dup}N").cast("double")), 6))
        .otherwise(lit(null).cast("double")).as("auc"))
  }
}
