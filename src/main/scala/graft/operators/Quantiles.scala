package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact per-group percentiles as a first-class operator — the
  * hash-verifiable alternative to `approxQuantile` (whose sampled
  * answer drifts run to run and can never oracle): percentile p of a
  * group = the smallest value whose cumulative count reaches
  * `ceil(p·n/100)`, the integer rank rule shared with [[Winsorize]] /
  * CCNet terciles, resolved through [[RankCuts]]' bounded radix search —
  * one (group, value) histogram aggregation plus up to four
  * ≤2^16-cell passes, no per-group sort, no unbounded ordered window,
  * one-giant-group safe. Null metric values are excluded (a group with
  * only nulls is absent from the output). */
object Quantiles {

  /** One row per group: groupCol ++ `p<pct>` columns typed like
    * `valCol`. Percentiles are integers in [1, 100]. */
  def exactPercentiles(df: DataFrame, groupCol: String, valCol: String,
                       pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts == pcts.distinct,
      "percentile list must be non-empty and duplicate-free")
    require(pcts.forall(p => p >= 1 && p <= 100),
      s"percentiles out of [1,100]: $pcts")
    val hist = df.groupBy(col(groupCol), col(valCol))
      .agg(count(lit(1)).as("__graft_c"))
    RankCuts.rankValues(hist, Seq(groupCol), valCol, "__graft_c",
      pcts.map(p => s"p$p" -> RankCuts.ceilRank(p, 100)))
  }
}
