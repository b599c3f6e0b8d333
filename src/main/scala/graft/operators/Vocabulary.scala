package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

import graft.functions.{Expressions, TextFunctions}
import graft.ops.Parallelism

/** Token-frequency distribution SHAPE per group — the two numbers that
  * summarize whether a source's vocabulary usage looks like natural
  * language: the exact Gini coefficient of the type-frequency
  * distribution (how concentrated token mass is on few types — 0 =
  * perfectly uniform, →1 = a handful of types dominate; template spam
  * and boilerplate skew high, tag soup skews low) and the power-law
  * exponent of the frequency distribution via the Clauset–Shalizi–
  * Newman MLE (natural text sits near Zipf's α ≈ 2; generated or
  * templated corpora drift). The distribution-shape monitor next to
  * [[Drift.klDrift]] (which compares AGAINST a reference; this one
  * needs none).
  *
  * Scale shape: everything derives from the per-group type census
  * (one corpus pass, map-side combined). The census then collapses by
  * FREQUENCY — and a census with N tokens has at most √(2N) distinct
  * frequency values (frequencies f₁>f₂>… distinct ⇒ Σfᵢ ≥ k(k+1)/2),
  * so the table every rank statistic reads is ~4.5 M rows at 10¹³
  * tokens, never vocabulary-sized. The Gini rank prefix-sum runs the
  * [[Eval.aucExact]] two-level bounded discipline over that table
  * (≤2^16 bucket rows per group for level 1; level-2 partitions hold
  * ≤ min(width, √(2N)) rows — never SinglePartition, never the
  * vocabulary).
  *
  * Exactness: with ties grouped, the types at frequency f (m of them,
  * S types below) contribute f·(m·S + m(m+1)/2) to Σᵢ i·fᵢ — exact
  * integers carried in DECIMAL(38,0) (the sum is ≤ N·V ≤ 10²² at
  * 100 TB); Gini = 2·Σᵢi·fᵢ/(V·N) − (V+1)/V is ONE final IEEE chain.
  * The MLE α = 1 + V / Σ_types ln(f/f_min) uses f_min = 1 (a token
  * census always has hapaxes' floor) and rounds each distinct
  * frequency's ln(f) to integer NANO-nats before the exact integer
  * Σ m·ln(f) (the [[Drift]] discipline — a float Σ over types is
  * order-dependent). α is null when every type has f = 1 (no
  * evidence). Shannon entropy rides along for one more integer sum —
  * H = ln N − (Σ f·ln f)/N in the same nano-nat discipline (ln V for
  * a uniform vocabulary, → 0 as one type dominates). Output:
  * (groupCol, n_tokens, n_types, gini, zipf_alpha, entropy_nats),
  * one row per group present in the input, null metrics for groups
  * with no tokens. */
object Vocabulary {

  private val Dup = "__graft_"

  def frequencyShape(df: DataFrame, groupCol: String,
                     textCol: String): DataFrame = {
    val g = col(groupCol)
    val toks = df.select(g,
      explode(TextFunctions.tokens(lower(col(textCol)))).as(s"${Dup}t"))
    val census = toks.groupBy(g, col(s"${Dup}t"))
      .agg(count(lit(1)).as(s"${Dup}f"))
    // the ≤√(2N)-row table everything below reads; staged — totals,
    // prefix ranks and the MLE all re-read it
    val byf = Parallelism.stage(census.groupBy(g, col(s"${Dup}f"))
      .agg(count(lit(1)).as(s"${Dup}m")))
    val bounds = byf.agg(max(col(s"${Dup}f"))).head() // 1-long collect
    if (bounds.isNullAt(0))
      return df.select(g).distinct()
        .select(g, lit(0L).as("n_tokens"), lit(0L).as("n_types"),
          lit(null).cast("double").as("gini"),
          lit(null).cast("double").as("zipf_alpha"),
          lit(null).cast("double").as("entropy_nats"))
        .orderBy(g)
    val width = math.max(1L, ((bounds.getLong(0) - 1L) >> 16) + 1L)
    val bucketed = byf.withColumn(s"${Dup}b",
      Expressions.int_div(col(s"${Dup}f") - lit(1L), lit(width)))
    // level 1: ≤2^16 bucket rows per group, G parallel ordered windows
    val offsets = bucketed.groupBy(g, col(s"${Dup}b"))
      .agg(sum(col(s"${Dup}m")).as(s"${Dup}bm"))
      .withColumn(s"${Dup}off",
        coalesce(sum(col(s"${Dup}bm")).over(
          W.partitionBy(g).orderBy(col(s"${Dup}b"))
            .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .drop(s"${Dup}bm")
    // level 2: within-bucket cumulation, partitioned by (group, bucket)
    val wInB = W.partitionBy(g, col(s"${Dup}b")).orderBy(col(s"${Dup}f"))
      .rowsBetween(W.unboundedPreceding, -1)
    val ranked = bucketed.join(offsets, Seq(groupCol, s"${Dup}b"))
      .withColumn(s"${Dup}s",
        col(s"${Dup}off") + coalesce(sum(col(s"${Dup}m")).over(wInB), lit(0L)))
    // n_tokens/n_types exact longs; Σ i·f_i in DECIMAL(38,0);
    // Σ m·ln(f) in exact nano-nats (ln(1) = 0 — hapaxes drop out)
    val shaped = ranked.groupBy(g).agg(
      sum(col(s"${Dup}f") * col(s"${Dup}m")).as("n_tokens"),
      sum(col(s"${Dup}m")).as("n_types"),
      sum(col(s"${Dup}f").cast("decimal(38,0)") *
        (col(s"${Dup}m") * col(s"${Dup}s") +
          Expressions.int_div(col(s"${Dup}m") * (col(s"${Dup}m") + lit(1L)),
            lit(2L))).cast("decimal(38,0)")).as(s"${Dup}T"),
      sum(col(s"${Dup}m").cast("decimal(38,0)") *
        round(log(col(s"${Dup}f").cast("double")) * lit(1e9), 0).cast("long")
          .cast("decimal(38,0)")).as(s"${Dup}L"),
      // Σ f·m·ln(f) in nano-nats: Shannon entropy telescopes to
      // ln N − (Σ f·ln f)/N, so ONE more exact integer sum buys it
      sum(col(s"${Dup}f").cast("decimal(38,0)") *
        col(s"${Dup}m").cast("decimal(38,0)") *
        round(log(col(s"${Dup}f").cast("double")) * lit(1e9), 0).cast("long")
          .cast("decimal(38,0)")).as(s"${Dup}E"))
    val out = shaped.select(g, col("n_tokens"), col("n_types"),
      when(col("n_types") > 1,
        round(lit(2.0) * col(s"${Dup}T").cast("double") /
            (col("n_types").cast("double") * col("n_tokens").cast("double")) -
          (col("n_types") + lit(1L)).cast("double") /
            col("n_types").cast("double"), 6))
        .otherwise(lit(null).cast("double")).as("gini"),
      when(col(s"${Dup}L") > 0,
        round(lit(1.0) + col("n_types").cast("double") /
          (col(s"${Dup}L").cast("double") / lit(1e9)), 6))
        .otherwise(lit(null).cast("double")).as("zipf_alpha"),
      round(log(col("n_tokens").cast("double")) -
        col(s"${Dup}E").cast("double") / lit(1e9) /
          col("n_tokens").cast("double"), 6).as("entropy_nats"))
    df.select(g).distinct()
      .join(out, Seq(groupCol), "left")
      .select(g, coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        col("gini"), col("zipf_alpha"), col("entropy_nats"))
      .orderBy(g)
  }
}
