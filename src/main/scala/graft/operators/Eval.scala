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
    require(hi - lo >= 0 && hi - lo < (1L << 32),
      s"score range ${hi - lo} reaches 2^32: re-quantize upstream " +
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

  /** Doubled tie-averaged ranks for every distinct value of `vCol`:
    * avg-rank(v) = below(v) + (cnt(v)+1)/2, kept integral as
    * r2 = 2·below + cnt + 1. The prefix sum runs [[aucExact]]'s
    * two-level bounded discipline (≤2^16 buckets × ≤2^16 values,
    * range ≤ 2^32 require-guarded, never SinglePartition). Input:
    * non-null longs; returns (vCol, <out>). */
  private def avgRank2(rows: DataFrame, vCol: String,
                       out: String): DataFrame = {
    val hist = graft.ops.Parallelism.stage(
      rows.groupBy(col(vCol)).agg(count(lit(1)).as(s"${Dup}c")))
    val bounds = hist.agg(min(col(vCol)), max(col(vCol))).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    require(hi - lo >= 0 && hi - lo < (1L << 32),
      s"value range ${hi - lo} reaches 2^32: re-quantize upstream " +
        "(the two-level prefix sum bounds both levels at 2^16)")
    val width = math.max(1L, ((hi - lo) >> 16) + 1)
    val bucketed = hist.withColumn(s"${Dup}b",
      Expressions.int_div(col(vCol) - lit(lo), lit(width)))
    val offsets = bucketed.groupBy(col(s"${Dup}b"))
      .agg(sum(col(s"${Dup}c")).as(s"${Dup}bn"))
      .withColumn(s"${Dup}off",
        coalesce(sum(col(s"${Dup}bn")).over(
          W.orderBy(col(s"${Dup}b"))
            .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .drop(s"${Dup}bn")
    val wInB = W.partitionBy(col(s"${Dup}b")).orderBy(col(vCol))
      .rowsBetween(W.unboundedPreceding, -1)
    bucketed.join(offsets, Seq(s"${Dup}b"))
      .withColumn(out,
        lit(2L) * (col(s"${Dup}off") +
          coalesce(sum(col(s"${Dup}c")).over(wInB), lit(0L))) +
          col(s"${Dup}c") + lit(1L))
      .select(col(vCol), col(out))
  }

  /** Exact Spearman rank correlation between two integral columns —
    * the robust sibling of the q177 exact Pearson: invariant to any
    * monotone transform of either variable, so it answers "does
    * quality rise with length AT ALL" where Pearson answers "linearly".
    * Built-in rank-then-corr can never hash-verify (float moments in
    * partition order, and a global rank() window is the SinglePartition
    * shape this engine bans).
    *
    * Exactness: tie-averaged ranks are half-integers, so DOUBLED ranks
    * r2 = 2·below + cnt + 1 are exact integers (Pearson is invariant
    * to the ×2 gauge); each variable's below() runs the [[aucExact]]
    * two-level bounded prefix sum over its value census, rows join
    * their ranks back by value (two value-keyed shuffles), and the
    * five moments are exact DECIMAL(38,0) sums with ONE final IEEE
    * chain (r2 ≤ 2n+1 keeps n·Σr2² inside DECIMAL(38,0) to ~1e9 rows —
    * beyond that, re-quantize or shard). Output one row: (n, rho),
    * rho null when either variable is constant or n = 0. */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val rows = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("long").as(s"${Dup}x"),
        col(yCol).cast("long").as(s"${Dup}y"))
    if (rows.limit(1).count() == 0) // bounded 1-row probe
      return rows.sparkSession.sql(
        "SELECT CAST(0 AS BIGINT) n, CAST(NULL AS DOUBLE) rho")
    val rx = avgRank2(rows.select(col(s"${Dup}x")), s"${Dup}x", s"${Dup}rx")
    val ry = avgRank2(rows.select(col(s"${Dup}y")), s"${Dup}y", s"${Dup}ry")
    val ranked = rows.join(rx, Seq(s"${Dup}x")).join(ry, Seq(s"${Dup}y"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val m = ranked.agg(count(lit(1)).as("n"),
      sum(col(s"${Dup}rx")).as("sx"), sum(col(s"${Dup}ry")).as("sy"),
      sum(d(col(s"${Dup}rx")) * d(col(s"${Dup}rx"))).as("sxx"),
      sum(d(col(s"${Dup}ry")) * d(col(s"${Dup}ry"))).as("syy"),
      sum(d(col(s"${Dup}rx")) * d(col(s"${Dup}ry"))).as("sxy"))
    val num = (d(col("n")) * col("sxy") - d(col("sx")) * d(col("sy")))
      .cast("double")
    val vx = (d(col("n")) * col("sxx") - d(col("sx")) * d(col("sx")))
      .cast("double")
    val vy = (d(col("n")) * col("syy") - d(col("sy")) * d(col("sy")))
      .cast("double")
    m.select(col("n"),
      when(vx > 0 && vy > 0, round(num / sqrt(vx * vy), 6))
        .otherwise(lit(null).cast("double")).as("rho"))
  }

  /** Brown–Forsythe test statistic (the median-based Levene) between
    * two variants — the VARIANCE-equality companion to [[abZTest]]
    * (mean) and [[ksTest]] (whole distribution): did the treatment
    * change the SPREAD? W is the one-way ANOVA F on absolute
    * deviations from each group's median; the median variant is the
    * robust form (Brown & Forsythe 1974).
    *
    * Exactness: group medians are exact lower medians through
    * [[RankCuts]]' bounded radix search (no per-group sort); the
    * deviations are exact integers, the three moments per variant
    * (n, Σz, Σz²) are exact DECIMAL(38,0) sums, and W's between/within
    * sums are cleared of rationals by the common factor n₀·n₁·N:
    *
    *   B' = S₀²n₁N + S₁²n₀N − S²n₀n₁
    *   W' = Q·n₀n₁N − S₀²n₁N − S₁²n₀N
    *   W  = (N−2) · B' / W'   (one pinned IEEE chain)
    *
    * The DECIMAL(38,0) bound on S²·n·N means values should be
    * quantized so Σ|z| stays ≲ 1e15 at the target row count (centi
    * units for a ~500-range metric at 1e9 rows) — the usual
    * re-quantize-upstream contract. Output one row:
    * (n_0, n_1, med_0, med_1, w) — w null when either arm is empty,
    * N ≤ 2, or the within-group deviation sum is 0. */
  def brownForsythe(df: DataFrame, variantCol: String,
                    valueCol: String): DataFrame = {
    val v = col(variantCol).cast("long")
    val x = col(valueCol).cast("long")
    val rows = df.filter(v.isin(0L, 1L) && x.isNotNull)
      .select(v.as(s"${Dup}v"), x.as(s"${Dup}s"))
    val hist = rows.groupBy(col(s"${Dup}v"), col(s"${Dup}s"))
      .agg(count(lit(1)).as(s"${Dup}c"))
    val med = RankCuts.rankValues(hist, Seq(s"${Dup}v"), s"${Dup}s",
      s"${Dup}c", Seq(s"${Dup}med" -> RankCuts.ceilRank(1, 2)))
    val dev = rows.join(broadcast(med), Seq(s"${Dup}v"))
      .withColumn(s"${Dup}z", abs(col(s"${Dup}s") - col(s"${Dup}med")))
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val z = col(s"${Dup}z")
    def side(i: Long, c: org.apache.spark.sql.Column) =
      when(col(s"${Dup}v") === i, c)
    val m = dev.agg(
      sum(side(0L, lit(1L)).otherwise(0L)).as("n0"),
      sum(side(0L, z).otherwise(0L)).as("s0"),
      sum(side(0L, d(z) * d(z)).otherwise(d(lit(0L)))).as("q0"),
      max(side(0L, col(s"${Dup}med"))).as("med0"),
      sum(side(1L, lit(1L)).otherwise(0L)).as("n1"),
      sum(side(1L, z).otherwise(0L)).as("s1"),
      sum(side(1L, d(z) * d(z)).otherwise(d(lit(0L)))).as("q1"),
      max(side(1L, col(s"${Dup}med"))).as("med1"))
    val nn = col("n0") + col("n1")
    val ss = col("s0") + col("s1")
    val qq = col("q0") + col("q1")
    val b = d(col("s0")) * d(col("s0")) * d(col("n1")) * d(nn) +
      d(col("s1")) * d(col("s1")) * d(col("n0")) * d(nn) -
      d(ss) * d(ss) * d(col("n0")) * d(col("n1"))
    val w = qq * d(col("n0")) * d(col("n1")) * d(nn) -
      d(col("s0")) * d(col("s0")) * d(col("n1")) * d(nn) -
      d(col("s1")) * d(col("s1")) * d(col("n0")) * d(nn)
    m.select(col("n0").as("n_0"), col("n1").as("n_1"),
      col("med0").as("med_0"), col("med1").as("med_1"),
      when(col("n0") > 0 && col("n1") > 0 && nn > 2 && w =!= d(lit(0L)),
        round((nn - lit(2L)).cast("double") * b.cast("double") /
          w.cast("double"), 6))
        .otherwise(lit(null).cast("double")).as("w"))
  }

  /** Exact mean reciprocal rank at k — the first-relevant-result
    * retrieval metric (the companion to [[rboTruncated]]: RBO compares
    * two rankings, MRR scores one ranking against relevance labels).
    * Input: pre-ranked results (`rankCol` 1-based within each
    * `queryCol` group, any upstream ranker) with a boolean
    * `relevantCol`. A query's contribution is 1/m for m the smallest
    * relevant rank ≤ k, else 0; queries with no relevant hit still
    * count in the denominator (the standard convention).
    *
    * Exactness: 1/m is rational, so each hit contributes the INTEGER
    * weight lcm(1..k)/m and the whole metric is exact integer math +
    * ONE final division — engine-replayable where a float Σ of
    * reciprocals is order-dependent (k ≤ 20 keeps lcm(1..20) =
    * 232 792 560 and the corpus sum inside a long up to ~4e10
    * queries). Scale shape: one filtered per-query min aggregation +
    * one distinct count, both map-side combined; no windows, no
    * driver loops. Output one row: (k, n_queries, n_hit, mrr). */
  def mrr(df: DataFrame, queryCol: String, rankCol: String,
          relevantCol: String, k: Int = 10): DataFrame = {
    require(k >= 1 && k <= 20, s"k=$k out of [1,20] (long-exact weights)")
    val lcm = (1 to k).foldLeft(BigInt(1))((l, d) => l * d / l.gcd(BigInt(d)))
    val weights = (1 to k).map(m => (lcm / m).toLong).toArray
    // null queries are excluded at the operator boundary, matching the
    // null-handling contract of aucExact/cohenKappa/ksTest
    val base = df.filter(col(queryCol).isNotNull)
    val hits = base
      .filter(col(relevantCol).cast("boolean") &&
        col(rankCol).cast("long").between(1L, k.toLong))
      .groupBy(col(queryCol))
      .agg(min(col(rankCol).cast("int")).as(s"${Dup}m"))
      .agg(count(lit(1)).as(s"${Dup}hit"),
        coalesce(sum(element_at(lit(weights), col(s"${Dup}m"))), lit(0L))
          .as(s"${Dup}w"))
    val nq = base.select(col(queryCol)).distinct()
      .agg(count(lit(1)).as(s"${Dup}q"))
    hits.crossJoin(broadcast(nq)) // 1-row metrics frames
      .select(lit(k).as("k"), col(s"${Dup}q").as("n_queries"),
        col(s"${Dup}hit").as("n_hit"),
        when(col(s"${Dup}q") > 0,
          round(col(s"${Dup}w").cast("double") /
            (col(s"${Dup}q").cast("double") * lit(lcm.toDouble)), 6))
          .otherwise(lit(null).cast("double")).as("mrr"))
  }

  /** Normalized discounted cumulative gain at k, one row per query —
    * the graded-relevance ranking metric next to [[mrr]]'s binary one.
    * `rankCol` is the PRESENTED 1-based rank, `gainCol` an integral
    * non-negative gain (caller quantizes); the ideal ordering re-ranks
    * the query's full item set by gain (ties broken by presented rank,
    * so the ideal list is deterministic) and truncates both lists at k.
    *
    * The discount is 1/ln(1+r) in BOTH sums — ndcg is exactly the
    * textbook log2 value (every term scales by the same ln 2, which
    * cancels in the ratio) while ln() is the one transcendental this
    * engine already replays bit-exactly in DuckDB (log2() is a
    * different libm entry point with different rounding). Each term
    * rounds to the integer GAIN grid before exact integer per-query
    * sums (the [[Drift.klDrift]] discipline) — deliberately NOT an
    * extra 1e6 finer: at 1e13-scale terms the double ulp is ~0.008 and
    * exact-half boundaries occur at ~2^-7 per term, where a 1-ulp
    * engine difference flips the round (observed); at gain scale the
    * ulp is ~1e-8 and a boundary hit is measure-zero. Scale shape: the
    * a per-QUERY window (millions of small partitions, never
    * SinglePartition); everything else is map-side-combined
    * aggregation. Output: (queryCol, dcg_micro, idcg_micro, ndcg) —
    * ndcg null when idcg = 0 (no positive gain anywhere). */
  def ndcgAt(df: DataFrame, queryCol: String, rankCol: String,
             gainCol: String, k: Int = 10): DataFrame = {
    require(k >= 1 && k <= (1 << 16), s"k=$k out of [1, 2^16]")
    val g = greatest(col(gainCol).cast("long"), lit(0L))
    val rows = df.filter(col(queryCol).isNotNull &&
        col(rankCol).isNotNull && col(gainCol).isNotNull)
      .select(col(queryCol), col(rankCol).cast("long").as(s"${Dup}r"), g.as(s"${Dup}g"))
    def termMicro(rank: org.apache.spark.sql.Column) =
      round(col(s"${Dup}g").cast("double") /
        log(rank.cast("double") + lit(1.0)), 0).cast("long")
    val ideal = W.partitionBy(col(queryCol))
      .orderBy(col(s"${Dup}g").desc, col(s"${Dup}r").asc)
    val termed = rows
      .withColumn(s"${Dup}ir", row_number().over(ideal).cast("long"))
      .withColumn(s"${Dup}dcg",
        // between(1, k): a malformed 0/negative presented rank must not
        // reach the ln(1+r) discount (ln(1) = 0 divides to infinity)
        when(col(s"${Dup}r").between(1L, k.toLong),
          termMicro(col(s"${Dup}r"))).otherwise(lit(0L)))
      .withColumn(s"${Dup}idcg",
        when(col(s"${Dup}ir") <= k.toLong, termMicro(col(s"${Dup}ir")))
          .otherwise(lit(0L)))
    termed.groupBy(col(queryCol))
      .agg(sum(col(s"${Dup}dcg")).as("dcg_micro"),
        sum(col(s"${Dup}idcg")).as("idcg_micro"))
      .select(col(queryCol), col("dcg_micro"), col("idcg_micro"),
        when(col("idcg_micro") > 0,
          round(col("dcg_micro").cast("double") /
            col("idcg_micro").cast("double"), 6))
          .otherwise(lit(null).cast("double")).as("ndcg"))
  }

  /** Cohen's kappa between two binary raters — chance-corrected
    * agreement, the standard "do the cheap gate and the expensive gate
    * actually agree" statistic (raw accuracy flatters any pair of
    * raters that both say 'pass' 95% of the time). Rows with either
    * rating null are excluded.
    *
    *   κ = (p_o − p_e)/(1 − p_e)
    *     = (n·(n11+n00) − [(n11+n10)(n11+n01) + (n01+n00)(n10+n00)])
    *       / (n² − [...])
    *
    * — a ratio of two EXACT integers (DECIMAL(38,0) products, safe to
    * ~1e18 rows) with ONE final division; a float p_o/p_e chain would
    * round twice and drift. Output one row:
    * (n, n_both, n_neither, n_only_a, n_only_b, po, pe, kappa) —
    * kappa null when the denominator is 0 (both raters constant). */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val a = col(aCol).cast("boolean")
    val b = col(bCol).cast("boolean")
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val m = df.filter(a.isNotNull && b.isNotNull).agg(
      sum(when(a && b, 1L).otherwise(0L)).as("n11"),
      sum(when(a && !b, 1L).otherwise(0L)).as("n10"),
      sum(when(!a && b, 1L).otherwise(0L)).as("n01"),
      sum(when(!a && !b, 1L).otherwise(0L)).as("n00"))
    val n = col("n11") + col("n10") + col("n01") + col("n00")
    val eSum = d(col("n11") + col("n10")) * d(col("n11") + col("n01")) +
      d(col("n01") + col("n00")) * d(col("n10") + col("n00"))
    val num = d(n) * d(col("n11") + col("n00")) - eSum
    val den = d(n) * d(n) - eSum
    m.select(
      n.as("n"), col("n11").as("n_both"), col("n00").as("n_neither"),
      col("n10").as("n_only_a"), col("n01").as("n_only_b"),
      when(n > 0, round((col("n11") + col("n00")).cast("double") /
        n.cast("double"), 6)).otherwise(lit(null).cast("double")).as("po"),
      when(n > 0, round(eSum.cast("double") /
        (n.cast("double") * n.cast("double")), 6))
        .otherwise(lit(null).cast("double")).as("pe"),
      when(den =!= d(lit(0L)),
        round(num.cast("double") / den.cast("double"), 6))
        .otherwise(lit(null).cast("double")).as("kappa"))
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic — the
    * whole-distribution A/B test next to [[abZTest]] (z asks "did the
    * mean move", KS asks "did the DISTRIBUTION move anywhere"):
    * D = max over the merged support of |F₁(x) − F₂(x)|.
    *
    * Exactness: at each distinct value, F₁ − F₂ = (cum₁·n₂ − cum₂·n₁)
    * / (n₁·n₂) with an EXACT integer numerator, so D is the integer
    * max of |cum₁·n₂ − cum₂·n₁| over distinct values followed by ONE
    * division — deterministic and engine-replayable where a float CDF
    * walk is order-dependent. The inclusive cumulative counts run the
    * [[aucExact]] two-level bounded prefix sum over the shared value
    * census (≤2^16 buckets × ≤2^16 values, range ≤ 2^32
    * require-guarded, never an unbounded SinglePartition; numerator ≤
    * n₁·n₂ caps at DECIMAL(38,0) far past any corpus). `variantCol`
    * integral 0/1, other values excluded. Output one row:
    * (n_0, n_1, d_stat) — d_stat null when either sample is empty. */
  def ksTest(df: DataFrame, variantCol: String,
             valueCol: String): DataFrame = {
    val v = col(variantCol).cast("long")
    val x = col(valueCol).cast("long")
    val rows = df.filter(v.isin(0L, 1L) && x.isNotNull)
      .select(v.as(s"${Dup}v"), x.as(s"${Dup}s"))
    val hist = graft.ops.Parallelism.stage(
      rows.groupBy(col(s"${Dup}s"))
        .agg(sum(when(col(s"${Dup}v") === 0L, 1L).otherwise(0L))
          .as(s"${Dup}c0"),
          sum(when(col(s"${Dup}v") === 1L, 1L).otherwise(0L))
            .as(s"${Dup}c1")))
    val bounds = hist.agg(min(col(s"${Dup}s")), max(col(s"${Dup}s"))).head()
    if (bounds.isNullAt(0)) // empty input
      return rows.sparkSession.sql(
        "SELECT CAST(0 AS BIGINT) n_0, CAST(0 AS BIGINT) n_1, " +
          "CAST(NULL AS DOUBLE) d_stat")
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    require(hi - lo >= 0 && hi - lo < (1L << 32),
      s"value range ${hi - lo} reaches 2^32: re-quantize upstream " +
        "(the two-level prefix sum bounds both levels at 2^16)")
    val width = math.max(1L, ((hi - lo) >> 16) + 1)
    val bucketed = hist.withColumn(s"${Dup}b",
      Expressions.int_div(col(s"${Dup}s") - lit(lo), lit(width)))
    val offsets = bucketed.groupBy(col(s"${Dup}b"))
      .agg(sum(col(s"${Dup}c0")).as(s"${Dup}b0"),
        sum(col(s"${Dup}c1")).as(s"${Dup}b1"))
      .select(col(s"${Dup}b"),
        coalesce(sum(col(s"${Dup}b0")).over(
          W.orderBy(col(s"${Dup}b"))
            .rowsBetween(W.unboundedPreceding, -1)), lit(0L))
          .as(s"${Dup}off0"),
        coalesce(sum(col(s"${Dup}b1")).over(
          W.orderBy(col(s"${Dup}b"))
            .rowsBetween(W.unboundedPreceding, -1)), lit(0L))
          .as(s"${Dup}off1"))
    val wInB = W.partitionBy(col(s"${Dup}b")).orderBy(col(s"${Dup}s"))
      .rowsBetween(W.unboundedPreceding, 0) // INCLUSIVE cdf
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val cum = bucketed.join(offsets, Seq(s"${Dup}b"))
      .select(
        (col(s"${Dup}off0") + sum(col(s"${Dup}c0")).over(wInB))
          .as(s"${Dup}cum0"),
        (col(s"${Dup}off1") + sum(col(s"${Dup}c1")).over(wInB))
          .as(s"${Dup}cum1"))
    val totals = hist.agg(sum(col(s"${Dup}c0")).as("n_0"),
      sum(col(s"${Dup}c1")).as("n_1"))
    cum.crossJoin(broadcast(totals)) // 1-row metrics frame
      .agg(max(col("n_0")).as("n_0"), max(col("n_1")).as("n_1"),
        max(abs(d(col(s"${Dup}cum0")) * d(col("n_1")) -
          d(col(s"${Dup}cum1")) * d(col("n_0")))).as(s"${Dup}num"))
      .select(col("n_0"), col("n_1"),
        when(col("n_0") > 0 && col("n_1") > 0,
          round(col(s"${Dup}num").cast("double") /
            (col("n_0").cast("double") * col("n_1").cast("double")), 6))
          .otherwise(lit(null).cast("double")).as("d_stat"))
  }

  /** Fleiss' kappa for m ≥ 2 binary raters — the multi-rater
    * generalization of [[cohenKappa]]: the agreement statistic for a
    * JUDGE PANEL (m quality gates, m LLM judges) where Cohen's handles
    * only a pair. Each row is one subject; `raterCols` are boolean
    * verdicts; rows with ANY null verdict are excluded (Fleiss assumes
    * complete panels).
    *
    * With binary categories the whole statistic is rational in three
    * integer sums (N subjects, T = Σ true-votes, S2 = Σ per-subject
    * (n_true² + n_false²)): P̄ = (S2 − Nm)/(Nm(m−1)), P̄e = (T² +
    * (M−T)²)/M² with M = Nm, and κ = (P̄ − P̄e)/(1 − P̄e) reduces to a
    * ratio of two EXACT DECIMAL(38,0) integers with ONE final division
    * (safe to ~1e11 subjects at m ≤ 8). Output one row:
    * (n_subjects, m, p_true, pbar, pe, kappa) — kappa null when every
    * vote is identical (P̄e = 1). */
  def fleissKappa(df: DataFrame, raterCols: Seq[String]): DataFrame = {
    require(raterCols.size >= 2 && raterCols.size <= 64,
      s"${raterCols.size} raters out of [2, 64]")
    val m = raterCols.size.toLong
    val complete = raterCols.map(c => col(c).isNotNull).reduce(_ && _)
    val ntExpr = raterCols
      .map(c => when(col(c).cast("boolean"), 1L).otherwise(0L))
      .reduce(_ + _)
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val rows = df.filter(complete).select(ntExpr.as(s"${Dup}nt"))
    val agg = rows.agg(count(lit(1)).as("n"),
      sum(col(s"${Dup}nt")).as("t"),
      sum(d(col(s"${Dup}nt")) * d(col(s"${Dup}nt")) +
        d(lit(m) - col(s"${Dup}nt")) * d(lit(m) - col(s"${Dup}nt")))
        .as("s2"))
    val bigM = d(col("n")) * d(lit(m))
    val pe2 = d(col("t")) * d(col("t")) +
      (bigM - d(col("t"))) * (bigM - d(col("t"))) // P̄e · M²
    val pbarDen = d(col("n")) * d(lit(m)) * d(lit(m - 1))
    val num = (col("s2") - bigM) * bigM * bigM - pe2 * pbarDen
    val den = pbarDen * (bigM * bigM - pe2)
    agg.select(col("n").as("n_subjects"), lit(m).as("m"),
      when(col("n") > 0, round(col("t").cast("double") /
        bigM.cast("double"), 6)).otherwise(lit(null).cast("double"))
        .as("p_true"),
      when(col("n") > 0, round((col("s2") - bigM).cast("double") /
        pbarDen.cast("double"), 6)).otherwise(lit(null).cast("double"))
        .as("pbar"),
      when(col("n") > 0, round(pe2.cast("double") /
        (bigM.cast("double") * bigM.cast("double")), 6))
        .otherwise(lit(null).cast("double")).as("pe"),
      when(den =!= d(lit(0L)),
        round(num.cast("double") / den.cast("double"), 6))
        .otherwise(lit(null).cast("double")).as("kappa"))
  }

  /** Pearson chi-square independence test between two categorical
    * columns — the frequency-table sibling of [[abZTest]] ("did the
    * treatment change the event MIX", where the z-test asks about a
    * mean) and the significance layer under [[Drift.mutualInformation]]
    * (MI measures dependence strength, χ² calibrates it against
    * sampling noise). Null categories are excluded.
    *
    * Per cell, (O−E)²/E with E = R·C/T rewritten over a COMMON exact
    * numerator: (O·T − R·C)² / (T·R·C) — the squared term is exact in
    * DECIMAL(38,0) (|O·T| ≤ 1e19 squares inside 1e38), each cell's
    * term micro-rounds before the exact integer total. Zero-observed
    * cells contribute E, so the cell frame is the FULL |A|×|B| spine
    * (two broadcast marginal tables crossed — bounded domain
    * taxonomies, require-guarded ≤ 2^22 cells total, never row-scale).
    * Output: one row per spine cell (aCol, bCol, n_ab,
    * chi2_term_micro) + (n, dof, chi2) repeated — the
    * [[Drift.mutualInformation]] report shape. */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = graft.ops.Parallelism.stage(
      df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
        .groupBy(col(aCol), col(bCol))
        .agg(count(lit(1)).as(s"${Dup}nab")))
    val byA = cells.groupBy(col(aCol)).agg(sum(col(s"${Dup}nab")).as(s"${Dup}na"))
    val byB = cells.groupBy(col(bCol)).agg(sum(col(s"${Dup}nab")).as(s"${Dup}nb"))
    val total = cells.agg(sum(col(s"${Dup}nab")).as(s"${Dup}n"))
    val Seq(nA, nB) = Seq(byA, byB).map(_.count()) // bounded: marginal tables
    require(nA * nB <= (1L << 22),
      s"$nA x $nB cells exceed 2^22: chi-square needs the full spine")
    val spine = broadcast(byA).crossJoin(broadcast(byB)) // bounded taxonomy cross
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val o = coalesce(col(s"${Dup}nab"), lit(0L))
    val diff = d(o) * d(col(s"${Dup}n")) - d(col(s"${Dup}na")) * d(col(s"${Dup}nb"))
    val term = round((diff * diff).cast("double") /
      (col(s"${Dup}n").cast("double") * col(s"${Dup}na").cast("double") *
        col(s"${Dup}nb").cast("double")) * lit(1e6), 0).cast("long")
    val termed = spine
      .join(cells, Seq(aCol, bCol), "left")
      .crossJoin(broadcast(total)) // 1-row metrics frame
      .select(col(aCol), col(bCol), o.as("n_ab"), term.as("chi2_term_micro"))
    val tot = termed.agg(sum(col("n_ab")).as("n"),
      sum(col("chi2_term_micro")).as(s"${Dup}s"))
    termed.crossJoin(broadcast(tot)) // 1-row metrics frame
      .select(col(aCol), col(bCol), col("n_ab"), col("chi2_term_micro"),
        col("n"), lit((nA - 1) * (nB - 1)).as("dof"),
        round(col(s"${Dup}s").cast("double") / lit(1e6), 6).as("chi2"))
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
