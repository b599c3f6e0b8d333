package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group winsorization — clip a metric to its group's exact
  * [pLo, pHi] percentile band, the standard outlier treatment before a
  * metric feeds a threshold, a mixture weight, or a training target
  * (heavy-tailed web metrics otherwise hand a handful of pages the
  * whole budget).
  *
  * Percentiles are EXACT and engine-replayable via the q115 broadcast
  * cut discipline: one (group, value) histogram aggregation, cut =
  * min value whose cumulative count reaches `ceil(pct·n/100)` (integer
  * rank arithmetic, no interpolation) resolved through [[RankCuts]]'
  * bounded radix search, cuts broadcast back over the scan. No
  * per-group sort of rows, no ordered window over anything unbounded —
  * even a ONE-giant-group corpus (the case a per-group histogram window
  * still serializes) cuts through ≤2^16-cell passes. An
  * `approxQuantile` clip can't hash-verify and drifts with sampling;
  * this one is a pure function of the data. Null metric values take no
  * part in the percentile ranks and clip to null.
  */
object Winsorize {

  /** Add `<valCol>_clipped`, `cut_lo`, `cut_hi` per `groupCol`.
    * `loPct`/`hiPct` are integer percentiles, 0 < lo < hi <= 100. */
  def winsorize(df: DataFrame, groupCol: String, valCol: String,
                loPct: Int, hiPct: Int): DataFrame = {
    require(loPct > 0 && hiPct > loPct && hiPct <= 100,
      s"bad percentile band [$loPct, $hiPct]")
    val hist = df.groupBy(col(groupCol), col(valCol))
      .agg(count(lit(1)).as("__graft_c"))
    val cuts = RankCuts.rankValues(hist, Seq(groupCol), valCol, "__graft_c",
      Seq("cut_lo" -> RankCuts.ceilRank(loPct, 100),
        "cut_hi" -> RankCuts.ceilRank(hiPct, 100)))
    df.join(broadcast(cuts), Seq(groupCol))
      .withColumn(s"${valCol}_clipped",
        least(greatest(col(valCol), col("cut_lo")), col("cut_hi")))
  }
}
