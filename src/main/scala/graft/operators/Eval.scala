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

  /** Reliability table + expected calibration error for MICRO-unit
    * probability scores (s ∈ [0, 1e6] = P(positive)·1e6; out-of-range
    * scores clamp into the edge bins). Equal-width bins; per bin the observed
    * positive rate vs the mean claimed confidence. The usual ECE
    * Σ (n_b/N)·|acc_b − conf_b| telescopes to the EXACT integer form
    * Σ_b |acc_b·1e6 − conf_b_micro_sum| / (N·1e6) — no per-bin float
    * division, ONE division total, so the metric is deterministic and
    * engine-replayable (a float per-bin sum would be order-dependent).
    * Output: one row per non-empty bin (bin, n, acc_rate, conf_rate,
    * gap_micro) + the corpus ECE repeated on each row. */
  def calibration(df: DataFrame, labelCol: String, scoreCol: String,
                  bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= (1 << 16), s"bins=$bins out of [2, 2^16]")
    val rows = df.filter(col(labelCol).isNotNull && col(scoreCol).isNotNull)
      .select(col(labelCol).cast("boolean").as(s"${Dup}y"),
        col(scoreCol).cast("long").as(s"${Dup}s"))
    // truly equal widths: floor(s·bins/1e6) capped into the top bin, so
    // every bin spans exactly 1e6/bins micro-units and only the exact
    // score 1e6 folds into bin bins−1 (the ADVICE r8 fix — the old
    // //1000001 form gave bin 0 one extra micro-unit of width)
    val binCol = least(greatest(
      Expressions.int_div(col(s"${Dup}s") * lit(bins.toLong), lit(1000000L)),
      lit(0L)), lit(bins.toLong - 1))
    val perBin = rows
      .withColumn(s"${Dup}b", binCol)
      .groupBy(col(s"${Dup}b"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(s"${Dup}y"), 1L).otherwise(0L)).as(s"${Dup}acc"),
        sum(col(s"${Dup}s")).as(s"${Dup}conf"))
      .withColumn("gap_micro",
        abs(col(s"${Dup}acc") * lit(1000000L) - col(s"${Dup}conf")))
    val total = perBin.agg(sum(col("n")).as(s"${Dup}N"),
      sum(col("gap_micro")).as(s"${Dup}g"))
    perBin.crossJoin(broadcast(total)) // 1-row metrics frame
      .select(col(s"${Dup}b").as("bin"), col("n"),
        round(col(s"${Dup}acc").cast("double") / col("n").cast("double"), 6)
          .as("acc_rate"),
        round(col(s"${Dup}conf").cast("double") /
          (col("n").cast("double") * lit(1e6)), 6).as("conf_rate"),
        col("gap_micro"),
        round(col(s"${Dup}g").cast("double") /
          (col(s"${Dup}N").cast("double") * lit(1e6)), 6).as("ece"))
  }

  /** Truncated rank-biased overlap RBO@k (Webber et al. 2010, p=0.9) —
    * the top-weighted agreement measure between two rankings: how
    * similarly do two scoring functions ORDER the corpus, with early
    * ranks counting geometrically more. The eval for "does the cheap
    * ranker agree with the expensive one where it matters" (ANN vs
    * exact, heuristic quality vs LM).
    *
    *   RBO@k = (1−p) · Σ_{d=1..k} p^(d−1) · |A_1..d ∩ B_1..d| / d
    *
    * Exactness: an item appearing at ranks (ra, rb) in the two lists
    * joins every prefix depth d ≥ max(ra, rb), so its total
    * contribution is w(m) = Σ_{d=m..k} p^(d−1)/d — and with p = 9/10
    * every w(m) is an EXACT RATIONAL over D = 10^(k−1)·lcm(1..k).
    * The scaled integer weights embed as a k-entry literal, the
    * per-item sum is exact integer math, and the single float op is
    * the final (1−p)·S/D division — fully engine-replayable (k ≤ 10
    * keeps the scaled sums inside a long). Truncated form: no
    * extrapolation past k, items outside both top-k contribute 0.
    * Output: one row (k, n_common, rbo). */
  def rboTruncated(a: DataFrame, b: DataFrame, idCol: String,
                   rankCol: String, k: Int = 10): DataFrame = {
    require(k >= 1 && k <= 10, s"k=$k out of [1,10] (long-exact weights)")
    val lcm = (1 to k).foldLeft(BigInt(1))((l, d) => l * d / l.gcd(BigInt(d)))
    val denom = BigInt(10).pow(k - 1) * lcm
    // w_scaled(m) = Σ_{d=m..k} 9^(d−1) · (lcm/d) · 10^(k−d), exact
    val weights = (1 to k).map { m =>
      (m to k).map { d =>
        BigInt(9).pow(d - 1) * (lcm / d) * BigInt(10).pow(k - d)
      }.sum.toLong
    }
    def side(df: DataFrame, r: String) =
      df.filter(col(rankCol) <= k)
        .select(col(idCol).as(s"${Dup}id"), col(rankCol).cast("int").as(r))
    val joined = side(a, s"${Dup}ra").join(side(b, s"${Dup}rb"), Seq(s"${Dup}id"))
      .withColumn(s"${Dup}w",
        element_at(lit(weights.toArray),
          greatest(col(s"${Dup}ra"), col(s"${Dup}rb"))))
    joined.agg(count(lit(1)).as("n_common"),
      coalesce(sum(col(s"${Dup}w")), lit(0L)).as(s"${Dup}s"))
      .select(lit(k).as("k"), col("n_common"),
        round(lit(0.1) * col(s"${Dup}s").cast("double") /
          lit(denom.toDouble), 6).as("rbo"))
  }

  /** Population stability index between a reference and a current
    * score population over equal-width MICRO-unit bins — the standard
    * "did the score distribution move" production-monitoring metric
    * (PSI < 0.1 stable, > 0.25 shifted). Add-one smoothing on the bin
    * counts so empty bins are defined; each bin's (p−q)·ln(p/q) term
    * micro-rounds to an integer before the cross-bin sum (the
    * LanguageModel discipline — a float Σ over bins is
    * order-dependent). Output: one row per bin — ALL `bins` bins, not
    * just the occupied ones: a generated bin spine outer-joins the two
    * count sets, so a bin empty in BOTH populations still contributes
    * its (nonzero when the totals differ) add-one term and the sum
    * matches the documented all-bins add-one definition exactly (the
    * ADVICE r8 fix). Columns (bin, n_ref, n_cur, psi_term_micro) +
    * the total PSI repeated on each row. */
  def psi(ref: DataFrame, cur: DataFrame, scoreCol: String,
          bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= (1 << 16), s"bins=$bins out of [2, 2^16]")
    def binned(df: DataFrame, cnt: String) = {
      val s = col(scoreCol).cast("long")
      df.filter(s.isNotNull)
        .withColumn(s"${Dup}b", least(greatest(
          Expressions.int_div(s * lit(bins.toLong), lit(1000000L)),
          lit(0L)), lit(bins.toLong - 1)))
        .groupBy(col(s"${Dup}b")).agg(count(lit(1)).as(cnt))
    }
    val spine = ref.sparkSession.range(bins.toLong)
      .select(col("id").as(s"${Dup}b"))
    val joined = spine
      .join(broadcast(binned(ref, "n_ref")), Seq(s"${Dup}b"), "left")
      .join(broadcast(binned(cur, "n_cur")), Seq(s"${Dup}b"), "left")
      .select(col(s"${Dup}b"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = joined.agg(
      (sum(col("n_ref")) + lit(bins.toLong)).as(s"${Dup}tr"),
      (sum(col("n_cur")) + lit(bins.toLong)).as(s"${Dup}tc"))
    val p = (col("n_ref") + lit(1L)).cast("double") /
      col(s"${Dup}tr").cast("double")
    val q = (col("n_cur") + lit(1L)).cast("double") /
      col(s"${Dup}tc").cast("double")
    val termMicro = round((p - q) * log(p / q) * lit(1e6), 0).cast("long")
    val terms = joined.crossJoin(broadcast(totals))
      .withColumn("psi_term_micro", termMicro)
    val total = terms.agg(sum(col("psi_term_micro")).as(s"${Dup}sum"))
    terms.crossJoin(broadcast(total))
      .select(col(s"${Dup}b").as("bin"), col("n_ref"), col("n_cur"),
        col("psi_term_micro"),
        round(col(s"${Dup}sum").cast("double") / lit(1e6), 6).as("psi"))
  }

  /** Exact two-sample z-test (Welch form with population variances)
    * between variant 1 and variant 0 of an experiment — the A/B
    * decision primitive next to [[aucExact]]. The built-in avg/stddev
    * accumulate float moments in partition order and can never
    * hash-verify; here all five moments per variant are EXACT integer/
    * decimal sums over MICRO-quantized values (the q177 Pearson
    * discipline) and the z statistic is ONE pinned IEEE chain:
    *
    *   z = (m₁ − m₀) / √((n₁·ss₁ − s₁²)/n₁³ + (n₀·ss₀ − s₀²)/n₀³)
    *
    * (z is invariant to the 1e-6 quantization gauge — numerator and
    * denominator scale together). The n³ factors divide OUT in double
    * (an integer n³ overflows 128-bit at ~1e13 rows; the divide-chain
    * form never does). Inputs: `variantCol` integral 0/1 (other values
    * excluded), `valueMicroCol` integral micro units. Output one row:
    * (n_0, n_1, mean_0, mean_1, z) — means in original units, z null
    * when either arm is empty or both variances are 0. */
  def abZTest(df: DataFrame, variantCol: String,
              valueMicroCol: String): DataFrame = {
    val v = col(variantCol).cast("long")
    val x = col(valueMicroCol).cast("long")
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val m = df.filter(v.isin(0L, 1L) && x.isNotNull)
      .agg(
        sum(when(v === 0L, 1L).otherwise(0L)).as("n0"),
        sum(when(v === 0L, x).otherwise(0L)).as("s0"),
        sum(when(v === 0L, d(x) * d(x)).otherwise(d(lit(0L)))).as("ss0"),
        sum(when(v === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when(v === 1L, x).otherwise(0L)).as("s1"),
        sum(when(v === 1L, d(x) * d(x)).otherwise(d(lit(0L)))).as("ss1"))
    def varOverN(n: org.apache.spark.sql.Column, s: org.apache.spark.sql.Column,
                 ss: org.apache.spark.sql.Column) =
      (d(n) * ss - d(s) * d(s)).cast("double") /
        n.cast("double") / n.cast("double") / n.cast("double")
    val den = sqrt(varOverN(col("n1"), col("s1"), col("ss1")) +
      varOverN(col("n0"), col("s0"), col("ss0")))
    val mean = (s: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =>
      round(s.cast("double") / n.cast("double") / lit(1e6), 6)
    m.select(
      col("n0").as("n_0"), col("n1").as("n_1"),
      when(col("n0") > 0, mean(col("s0"), col("n0")))
        .otherwise(lit(null).cast("double")).as("mean_0"),
      when(col("n1") > 0, mean(col("s1"), col("n1")))
        .otherwise(lit(null).cast("double")).as("mean_1"),
      when(col("n0") > 0 && col("n1") > 0 && den > 0,
        round((col("s1").cast("double") / col("n1").cast("double") -
          col("s0").cast("double") / col("n0").cast("double")) / den, 6))
        .otherwise(lit(null).cast("double")).as("z"))
  }
}
