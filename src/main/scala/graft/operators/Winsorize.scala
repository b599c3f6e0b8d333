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
  * cut discipline: one (group, value) histogram aggregation, cumulative
  * counts per group, cut = min value whose cumulative count reaches
  * `ceil(pct·n/100)` (integer rank arithmetic, no interpolation), cuts
  * broadcast back over the scan. No per-group sort of rows, no window
  * over the data — the only shuffles carry histogram cells. An
  * `approxQuantile` clip can't hash-verify and drifts with sampling;
  * this one is a pure function of the data.
  */
object Winsorize {

  /** Add `<valCol>_clipped`, `cut_lo`, `cut_hi` per `groupCol`.
    * `loPct`/`hiPct` are integer percentiles, 0 < lo < hi <= 100. */
  def winsorize(df: DataFrame, groupCol: String, valCol: String,
                loPct: Int, hiPct: Int): DataFrame = {
    require(loPct > 0 && hiPct > loPct && hiPct <= 100,
      s"bad percentile band [$loPct, $hiPct]")
    import org.apache.spark.sql.expressions.Window
    val hist = df.groupBy(col(groupCol), col(valCol))
      .agg(count(lit(1)).as("__graft_c"))
    val cum = hist.withColumn("__graft_cum",
      sum("__graft_c").over(
        Window.partitionBy(groupCol).orderBy(valCol)))
    val tot = hist.groupBy(col(groupCol))
      .agg(sum("__graft_c").as("__graft_n"))
    val cuts = cum.join(tot, Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        min(when(expr(s"__graft_cum >= ($loPct * __graft_n + 99) div 100"),
          col(valCol))).as("cut_lo"),
        min(when(expr(s"__graft_cum >= ($hiPct * __graft_n + 99) div 100"),
          col(valCol))).as("cut_hi"))
    df.join(broadcast(cuts), Seq(groupCol))
      .withColumn(s"${valCol}_clipped",
        least(greatest(col(valCol), col("cut_lo")), col("cut_hi")))
  }
}
