package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.ops.Parallelism

/** Distribution-drift scoring — KL divergence of each group's token
  * distribution from the corpus-wide one: the quantitative answer to
  * "which source/crawl/day stopped looking like the rest of the
  * corpus?" (domain shift, scraper breakage, language mix changes —
  * the monitoring twin of the DSIR importance weights, which use the
  * same log-ratio in the other direction).
  *
  * KL(P_g ‖ Q) = Σ_t p_t · ln(p_t/q_t), p from the group census, Q
  * from the corpus census. Every count is exact; the corpus census
  * derives from the group census by rollup (ONE corpus pass total,
  * map-side combined; everything downstream reads censuses, never the
  * corpus). Q dominates P by construction (every group token is a
  * corpus token), so no log(0) edge exists.
  *
  * Determinism: a float SUM over vocabulary terms is order-dependent,
  * so each term rounds to integer NANO-nats first (the LanguageModel
  * micro-bit discipline, 1e9 because per-term masses are small) and
  * the per-group accumulation is exact integer math — partitioning-
  * independent and replayable in any engine; the only float work is
  * one IEEE chain per DISTINCT (group, token) census row. */
object Drift {

  private val Dup = "__graft_"

  /** Per-group DISTINCTIVE terms — Monroe et al. 2008 ("Fightin'
    * Words") log-odds with a Dirichlet prior, z-scored: for each term,
    * the log-odds of the term in the group vs the REST of the corpus,
    * divided by its estimated standard error, ranked top-k per group.
    * The interpretable companion to [[klDrift]]: KL says "this source
    * drifted", this says "these words are why".
    *
    *   δ_t = ln((c1+α)/(n1+α0−c1−α)) − ln((c2+α)/(n2+α0−c2−α))
    *   z_t = δ_t / sqrt(1/(c1+α) + 1/(c2+α))
    *
    * with (c1,n1) the group census, (c2,n2) the rest (derived by
    * subtraction from the corpus rollup — still ONE corpus pass), α a
    * flat 0.01 prior, α0 = α·V. Same census-only shuffle shape as
    * [[klDrift]]; ranking is a per-group window over the census (G
    * parallel small sorts, never a global order), ties broken by term.
    * Output: (groupCol, rank, term, z) with z rounded at 6dp. */
  def distinctiveTerms(df: DataFrame, groupCol: String, textCol: String,
      k: Int = 3, alpha: Double = 0.01): DataFrame = {
    require(k >= 1 && k <= 1000, s"k=$k out of [1,1000]")
    val toks = df.select(col(groupCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as(s"${Dup}t"))
    val census = Parallelism.stage(
      toks.groupBy(col(groupCol), col(s"${Dup}t"))
        .agg(count(lit(1)).as(s"${Dup}c1")))
    val global = census.groupBy(col(s"${Dup}t"))
      .agg(sum(col(s"${Dup}c1")).as(s"${Dup}ct"))
    val perG = census.groupBy(col(groupCol))
      .agg(sum(col(s"${Dup}c1")).as(s"${Dup}n1"))
    val totals = global.agg(sum(col(s"${Dup}ct")).as(s"${Dup}n"),
      count(lit(1)).as(s"${Dup}v"))
    val a = lit(alpha)
    val a0 = a * col(s"${Dup}v").cast("double")
    val c1 = col(s"${Dup}c1").cast("double")
    val n1 = col(s"${Dup}n1").cast("double")
    val c2 = (col(s"${Dup}ct") - col(s"${Dup}c1")).cast("double")
    val n2 = (col(s"${Dup}n") - col(s"${Dup}n1")).cast("double")
    val delta = log((c1 + a) / (n1 + a0 - c1 - a)) -
      log((c2 + a) / (n2 + a0 - c2 - a))
    val z = delta / sqrt(lit(1.0) / (c1 + a) + lit(1.0) / (c2 + a))
    val scored = census
      .join(global, Seq(s"${Dup}t"))
      .join(perG, Seq(groupCol))
      .crossJoin(broadcast(totals))
      .withColumn(s"${Dup}z", z)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(s"${Dup}z").desc, col(s"${Dup}t").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(groupCol), col("rank"), col(s"${Dup}t").as("term"),
        round(col(s"${Dup}z"), 6).as("z"))
  }

  /** Per-group drift: (groupCol, n_tokens, kl_nats) — kl_nats ≥ 0,
    * rounded at 6dp, 0 for a group distributed exactly like the
    * corpus. Null text contributes no tokens; a group with no tokens
    * doesn't appear. */
  def klDrift(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(groupCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as(s"${Dup}t"))
    val census = Parallelism.stage(
      toks.groupBy(col(groupCol), col(s"${Dup}t"))
        .agg(count(lit(1)).as(s"${Dup}cgt")))
    val global = census.groupBy(col(s"${Dup}t"))
      .agg(sum(col(s"${Dup}cgt")).as(s"${Dup}ct"))
    val perG = census.groupBy(col(groupCol))
      .agg(sum(col(s"${Dup}cgt")).as(s"${Dup}ng"))
    val total = perG.agg(sum(col(s"${Dup}ng")).as(s"${Dup}n"))
    val p = col(s"${Dup}cgt").cast("double") / col(s"${Dup}ng").cast("double")
    val q = col(s"${Dup}ct").cast("double") / col(s"${Dup}n").cast("double")
    val nano = round(p * log(p / q) * lit(1e9), 0).cast("long")
    census
      .join(global, Seq(s"${Dup}t"))
      .join(perG, Seq(groupCol))
      .crossJoin(broadcast(total)) // 1-row metrics frame
      .withColumn(s"${Dup}nano", nano)
      .groupBy(col(groupCol))
      .agg(max(col(s"${Dup}ng")).as("n_tokens"), // constant within group
        sum(col(s"${Dup}nano")).as(s"${Dup}s"))
      .select(col(groupCol), col("n_tokens"),
        round(col(s"${Dup}s").cast("double") / lit(1e9), 6).as("kl_nats"))
  }

  /** Per-group Jensen–Shannon divergence from the corpus token
    * distribution — the SYMMETRIC, BOUNDED sibling of [[klDrift]]:
    * JSD ∈ [0, ln 2] always exists (KL blows up when the corpus has
    * mass the group lacks in the other direction and its scale is
    * unbounded), so JSD values are comparable across corpora and
    * thresholdable ("alert at 0.1 nats") where raw KL is not — the
    * usual reason production drift monitors publish JSD.
    *
    *   JSD(P‖Q) = ½ Σ p·ln(2p/(p+q)) + ½ Σ q·ln(2q/(p+q))
    *
    * Scale shape: identical to [[klDrift]] — censuses only, ONE corpus
    * pass. The subtlety is that the second sum ranges over the WHOLE
    * corpus vocabulary (q > 0 where p = 0), which would need a G×V
    * spine; but every absent-token term collapses to q·ln 2, so the
    * tail telescopes to the CLOSED FORM ½·ln 2·(1 − cov_g) with cov_g
    * the corpus mass of the group's own types (Σ ct over the group
    * census / N) — one extra rounded term per group, no spine. Present
    * tokens have p, q > 0, so no log(0) edge exists anywhere.
    *
    * Determinism: per-census-row terms round to integer nano-nats
    * before exact integer group sums (the [[klDrift]] discipline); the
    * ½·ln 2 constant embeds as the decimal literal both engines parse
    * to the same double. Output: (groupCol, n_tokens, jsd_nats),
    * 6dp, 0 for a group distributed exactly like the corpus. */
  def jsDrift(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val halfLn2 = 0.34657359027997264 // ln(2)/2, exact double literal
    val toks = df.select(col(groupCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as(s"${Dup}t"))
    val census = Parallelism.stage(
      toks.groupBy(col(groupCol), col(s"${Dup}t"))
        .agg(count(lit(1)).as(s"${Dup}cgt")))
    val global = census.groupBy(col(s"${Dup}t"))
      .agg(sum(col(s"${Dup}cgt")).as(s"${Dup}ct"))
    val perG = census.groupBy(col(groupCol))
      .agg(sum(col(s"${Dup}cgt")).as(s"${Dup}ng"))
    val total = perG.agg(sum(col(s"${Dup}ng")).as(s"${Dup}n"))
    val p = col(s"${Dup}cgt").cast("double") / col(s"${Dup}ng").cast("double")
    val q = col(s"${Dup}ct").cast("double") / col(s"${Dup}n").cast("double")
    val m = p + q // = 2·mixture mass
    val nano = round((p * log(lit(2.0) * p / m) +
      q * log(lit(2.0) * q / m)) * lit(5e8), 0).cast("long")
    val grouped = census
      .join(global, Seq(s"${Dup}t"))
      .join(perG, Seq(groupCol))
      .crossJoin(broadcast(total)) // 1-row metrics frame
      .withColumn(s"${Dup}nano", nano)
      .groupBy(col(groupCol))
      .agg(max(col(s"${Dup}ng")).as("n_tokens"), // constant within group
        sum(col(s"${Dup}nano")).as(s"${Dup}sin"),
        sum(col(s"${Dup}ct")).as(s"${Dup}cov"), // corpus mass of own types
        max(col(s"${Dup}n")).as(s"${Dup}nn"))
    val rem = round((col(s"${Dup}nn") - col(s"${Dup}cov")).cast("double") /
      col(s"${Dup}nn").cast("double") * lit(halfLn2) * lit(1e9), 0)
      .cast("long")
    grouped
      .select(col(groupCol), col("n_tokens"),
        round((col(s"${Dup}sin") + rem).cast("double") / lit(1e9), 6)
          .as("jsd_nats"))
  }

  /** Pairwise corpus similarity between groups — vocabulary Jaccard
    * and token-frequency cosine for every (source, source) pair: the
    * mixture-design diagnostic (two sources this similar are one
    * source for weighting purposes; a crawl snapshot cosine-drifting
    * from its predecessor is the corpus-level [[Snapshot]] signal).
    *
    * Scale shape: censuses only — the (group, token) census is built
    * once (ONE corpus pass) and pairs join through the TOKEN, so the
    * fan-out per token is ≤ G(G−1)/2 with G the (require-bounded ≤
    * 4096) group count; the pair table is ≤ G² rows. Σc², Σcₐ·c_b
    * carried exact in DECIMAL(38,0); jaccard = |A∩B|/(|A|+|B|−|A∩B|)
    * is exact-integer-over-integer, cosine ONE IEEE chain with
    * correctly-rounded sqrts. Pairs with no shared vocabulary don't
    * appear (their jaccard/cosine are 0 by definition — emitting G²
    * zero rows would defeat the census-only shape). Output:
    * (src_a, src_b, inter_types, jaccard, cosine), src_a < src_b. */
  def pairwiseSimilarity(df: DataFrame, groupCol: String,
                         textCol: String): DataFrame = {
    val toks = df.select(col(groupCol).cast("string").as(s"${Dup}g"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as(s"${Dup}t"))
    val census = Parallelism.stage(
      toks.groupBy(col(s"${Dup}g"), col(s"${Dup}t"))
        .agg(count(lit(1)).as(s"${Dup}c")))
    val perG = census.groupBy(col(s"${Dup}g"))
      .agg(count(lit(1)).as(s"${Dup}v"),
        sum(col(s"${Dup}c").cast("decimal(38,0)") *
          col(s"${Dup}c").cast("decimal(38,0)")).as(s"${Dup}sq"))
    val nG = perG.count() // bounded driver count on the group table
    require(nG <= 4096, s"$nG groups: the pair table is G² — regroup")
    // barrier: both sides descend from the same census lineage
    val left = census.select(col(s"${Dup}g").as("src_a"), col(s"${Dup}t"),
      col(s"${Dup}c").as(s"${Dup}ca"))
    val right = Parallelism.barrier(
      census.select(col(s"${Dup}g").as("src_b"), col(s"${Dup}t"),
        col(s"${Dup}c").as(s"${Dup}cb")))
    val pairs = left.join(right, Seq(s"${Dup}t"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("inter_types"),
        sum(col(s"${Dup}ca").cast("decimal(38,0)") *
          col(s"${Dup}cb").cast("decimal(38,0)")).as(s"${Dup}dot"))
    pairs
      .join(broadcast(perG.select(col(s"${Dup}g").as("src_a"),
        col(s"${Dup}v").as(s"${Dup}va"), col(s"${Dup}sq").as(s"${Dup}sqa"))),
        Seq("src_a"))
      .join(broadcast(perG.select(col(s"${Dup}g").as("src_b"),
        col(s"${Dup}v").as(s"${Dup}vb"), col(s"${Dup}sq").as(s"${Dup}sqb"))),
        Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("inter_types"),
        round(col("inter_types").cast("double") /
          (col(s"${Dup}va") + col(s"${Dup}vb") - col("inter_types"))
            .cast("double"), 6).as("jaccard"),
        round(col(s"${Dup}dot").cast("double") /
          (sqrt(col(s"${Dup}sqa").cast("double")) *
            sqrt(col(s"${Dup}sqb").cast("double"))), 6).as("cosine"))
  }

  /** Mutual information between two categorical columns — the
    * dependence monitor (is event mix a function of time-of-day? does
    * label depend on source?): I(A;B) = Σ_ab p_ab·ln(p_ab/(p_a·p_b)),
    * 0 iff independent. The bivariate sibling of [[klDrift]]: KL asks
    * "did this group drift from the corpus", MI asks "are these two
    * dimensions entangled at all" — the thing to check before
    * stratifying a sample on both.
    *
    * Scale shape: ONE pass builds the (a, b) cell census (map-side
    * combined; cells bounded by |A|·|B|, a product of domain
    * taxonomies, never row count); both marginals derive from the
    * cells by rollup. Null a/b values are excluded (MI over observed
    * categories). Exactness is the [[klDrift]] discipline: each cell's
    * p·ln(p/(q·r)) term rounds to integer NANO-nats before the exact
    * integer total — cells with n_ab ≥ 1 always have p_a, p_b ≥ p_ab
    * > 0, so no log(0) edge exists. Output: one row per observed cell
    * (aCol, bCol, n_ab, mi_term_nano) + the corpus totals (n, mi_nats)
    * repeated on each row — the [[Eval.psi]] report shape, so the full
    * dependence structure and the headline number hash together. */
  def mutualInformation(df: DataFrame, aCol: String,
                        bCol: String): DataFrame = {
    val cells = Parallelism.stage(
      df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
        .groupBy(col(aCol), col(bCol))
        .agg(count(lit(1)).as(s"${Dup}nab")))
    val byA = cells.groupBy(col(aCol)).agg(sum(col(s"${Dup}nab")).as(s"${Dup}na"))
    val byB = cells.groupBy(col(bCol)).agg(sum(col(s"${Dup}nab")).as(s"${Dup}nb"))
    val total = cells.agg(sum(col(s"${Dup}nab")).as(s"${Dup}n"))
    val pab = col(s"${Dup}nab").cast("double") / col(s"${Dup}n").cast("double")
    val ratio = col(s"${Dup}nab").cast("double") * col(s"${Dup}n").cast("double") /
      (col(s"${Dup}na").cast("double") * col(s"${Dup}nb").cast("double"))
    val termed = cells
      .join(byA, Seq(aCol))
      .join(byB, Seq(bCol))
      .crossJoin(broadcast(total)) // 1-row metrics frame
      .withColumn(s"${Dup}nano",
        round(pab * log(ratio) * lit(1e9), 0).cast("long"))
    val mi = termed.agg(max(col(s"${Dup}n")).as("n"),
      sum(col(s"${Dup}nano")).as(s"${Dup}s"))
    termed.crossJoin(broadcast(mi)) // 1-row metrics frame
      .select(col(aCol), col(bCol), col(s"${Dup}nab").as("n_ab"),
        col(s"${Dup}nano").as("mi_term_nano"), col("n"),
        round(col(s"${Dup}s").cast("double") / lit(1e9), 6).as("mi_nats"))
  }
}
