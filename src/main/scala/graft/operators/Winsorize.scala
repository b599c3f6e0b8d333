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

  /** Robust per-group outlier scoring — the median/MAD "modified
    * z-score" (Iglewicz & Hoaglin 1993): z = 0.6745·(x − med)/MAD,
    * outlier at |z| > cutoff. The robust sibling of the mean/stddev
    * z-score (q139): one 5000-char page in a group of tweets drags a
    * mean-based z toward itself and can mask its own outlierness;
    * median and MAD ignore the tail entirely.
    *
    * Both order statistics are EXACT lower-medians (min value whose
    * cumulative count reaches ceil(n/2) — the integer rank rule) and
    * resolve through [[RankCuts]]' bounded radix search: no per-group
    * sort, no unbounded ordered window, safe for the one-giant-group
    * corpus. Two histogram aggregations (values, then absolute
    * deviations), cuts broadcast back over the scan. MAD = 0 (over
    * half the group identical) yields null z / false outlier —
    * documented, not NaN. Output: df's columns + (med, mad, robust_z,
    * is_outlier); the outlier test compares the UNROUNDED chain so the
    * boundary is deterministic in any engine. */
  def madOutliers(df: DataFrame, groupCol: String, valCol: String,
                  cutoff: Double = 3.5): DataFrame = {
    require(cutoff > 0.0, s"cutoff=$cutoff must be > 0")
    val hist = df.groupBy(col(groupCol), col(valCol))
      .agg(count(lit(1)).as("__graft_c"))
    val med = RankCuts.rankValues(hist, Seq(groupCol), valCol, "__graft_c",
      Seq("med" -> RankCuts.ceilRank(1, 2)))
    val dev = df.join(broadcast(med), Seq(groupCol))
      .withColumn("__graft_ad", abs(col(valCol) - col("med")))
    val dhist = dev.groupBy(col(groupCol), col("__graft_ad"))
      .agg(count(lit(1)).as("__graft_c"))
    val mad = RankCuts.rankValues(dhist, Seq(groupCol), "__graft_ad",
      "__graft_c", Seq("mad" -> RankCuts.ceilRank(1, 2)))
    val z = lit(0.6745) * (col(valCol) - col("med")) / col("mad")
    dev.join(broadcast(mad), Seq(groupCol))
      .withColumn("robust_z",
        when(col("mad") === 0, lit(null).cast("double"))
          .otherwise(round(z, 6)))
      .withColumn("is_outlier",
        when(col("mad") === 0, lit(false)).otherwise(abs(z) > lit(cutoff)))
      .drop("__graft_ad")
  }
}
