package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph centrality for corpus curation — the signal CCNet-era
  * pipelines and Common Crawl itself use to prioritize sources (their
  * harmonic-centrality ranking decides which hosts are worth crawling
  * and weighting; RefinedWeb inherits the idea as URL weighting). This
  * is PageRank in EXACT INTEGER micro arithmetic: every rank is a long
  * in 1e-6 units, each update round is
  *
  *   r'(v) = (1e6 − d) + (d · Σ_{u→v} (r(u) div outdeg(u))) div 1e6
  *
  * with `div` the floor division both engines share on the all-positive
  * operands — so the whole iteration, including its quantization, is
  * deterministic under any partitioning and replayable in DuckDB (q133
  * re-runs both rounds in SQL and must match every node's rank to the
  * micro). Float PageRank can never hash-verify: its per-node sum is
  * order-dependent.
  *
  * Scale shape per iteration (the Pregel message-passing shape in two
  * declarative shuffles): one join of the edge list against the rank
  * table keyed by source, one aggregation of contributions keyed by
  * destination — both map-side combinable; degrees are computed once.
  * Dangling mass is dropped (the classic simplification; add a sink
  * node when stray mass matters). Total mass `n · 1e6` must keep
  * `d · Σ` inside a long, hence the explicit node-count guard — at
  * 100 TB this operator runs over the DOMAIN/host graph (millions of
  * nodes), not the document graph.
  */
object Centrality {

  /** `iters` PageRank rounds over `edges(srcCol, dstCol)`. Nodes are
    * the distinct endpoints; every node starts at 1e6 micro. Returns
    * (id, rank_micro). Parallel edges count once per occurrence;
    * self-loops are legal. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, dampingMicro: Long = 850000L): DataFrame =
    pageRankLoop(edges, srcCol, dstCol, iters, dampingMicro, null)

  /** Per-iteration convergence report: (iter, max_delta_micro) with
    * `max_delta_micro = max_v |r_i(v) − r_{i−1}(v)|` — the stop-rule
    * data a production run reads to CHOOSE `iters` instead of guessing
    * (power iteration contracts the delta by ~the damping factor per
    * round, so the report shows exactly when extra rounds stop buying
    * precision). Each round's delta is ONE max over the (already
    * staged) previous and next rank tables joined by id — a 1-long
    * driver collect per round, the RankCuts collect discipline; the
    * ranks themselves are identical to [[pageRank]]'s (same integer
    * update, same staging), so a green rank oracle stays green. */
  def pageRankConvergence(edges: DataFrame, srcCol: String,
                          dstCol: String, iters: Int,
                          dampingMicro: Long = 850000L): DataFrame = {
    val spark = edges.sparkSession
    val deltas = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    pageRankLoop(edges, srcCol, dstCol, iters, dampingMicro,
      (i, d) => deltas += ((i, d)))
    import spark.implicits._
    deltas.toSeq.toDF("iter", "max_delta_micro")
  }

  private def pageRankLoop(edges: DataFrame, srcCol: String,
                           dstCol: String, iters: Int, dampingMicro: Long,
                           onDelta: (Int, Long) => Unit): DataFrame = {
    require(iters >= 1 && iters <= 64, s"iters=$iters out of [1,64]")
    require(dampingMicro >= 0 && dampingMicro <= 1000000L,
      s"dampingMicro=$dampingMicro out of [0, 1e6]")
    val e = edges.select(col(srcCol).cast("long").as("__graft_src"),
      col(dstCol).cast("long").as("__graft_dst"))
    val nodes = graft.ops.Parallelism.stage(
      e.select(col("__graft_src").as("id"))
        .union(e.select(col("__graft_dst").as("id")))
        .distinct())
    val n = nodes.count()
    require(n > 0, "empty graph")
    require(n <= 10000000L,
      s"$n nodes: micro-integer PageRank bounds total mass to keep " +
        "d*sum inside a long — run the domain graph, not the doc graph")
    val deg = graft.ops.Parallelism.stage(
      e.groupBy(col("__graft_src"))
        .agg(count(lit(1)).as("__graft_outdeg")))
    var ranks = nodes.withColumn("rank_micro", lit(1000000L))
    for (i <- 0 until iters) {
      val contrib = e
        .join(deg, "__graft_src")
        .join(ranks.select(col("id").as("__graft_src"),
          col("rank_micro").as("__graft_r")), "__graft_src")
        .select(col("__graft_dst").as("id"),
          expr("__graft_r div __graft_outdeg").as("__graft_c"))
        .groupBy(col("id"))
        .agg(sum(col("__graft_c")).as("__graft_s"))
      // stage each round: the update references the previous `ranks` plan
      // twice (contrib join + outer select), so without the barrier the
      // logical tree doubles per iteration and analysis hangs long before
      // any task runs at the allowed iters=64
      val next = graft.ops.Parallelism.stage(ranks.select(col("id"))
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(1000000L - dampingMicro) +
            expr(s"($dampingMicro * coalesce(__graft_s, 0L)) div 1000000"))
            .as("rank_micro")))
      if (onDelta != null) {
        val d = next.join(ranks.select(col("id"),
            col("rank_micro").as("__graft_prev")), "id")
          .agg(max(abs(col("rank_micro") - col("__graft_prev"))))
          .head().getLong(0)
        onDelta(i + 1, d)
      }
      ranks = next
    }
    ranks
  }

  /** HITS (Kleinberg 1999) in the same exact-integer discipline —
    * hubs-and-authorities for graphs where the two roles genuinely
    * differ (link directories vs cited content; curated source lists
    * vs the pages they endorse — PageRank's single score conflates
    * them). Each round:
    *
    *   a(v) = Σ_{u→v} h(u),  then max-normalized: a' = (a·1e6) div max(a)
    *   h(u) = Σ_{u→v} a'(v), then h' = (h·1e6) div max(h)
    *
    * Max-normalization (top score pinned to 1e6) instead of the
    * textbook L2: power iteration converges to the same dominant
    * eigenvector direction under ANY per-round rescaling, and an
    * integer floor-divided max-scale is deterministic and replayable
    * where an L2 norm (sqrt of a float sum) never hash-verifies.
    * Same Pregel shape as [[pageRank]] (join by one endpoint, aggregate
    * by the other, both map-side combinable), lineage staged per round.
    * Parallel edges count once per occurrence. Returns (id, auth_micro,
    * hub_micro). The n ≤ 1e6 guard keeps a·1e6 inside a long — the
    * domain graph, not the doc graph, at 100 TB. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int): DataFrame =
    hitsLoop(edges, srcCol, dstCol, iters, null)

  /** Per-iteration convergence report for [[hits]]: (iter,
    * max_delta_auth_micro, max_delta_hub_micro), each delta the max
    * absolute per-node change of the max-normalized score vs the
    * previous round (both vectors read as uniform 1e6 before round 1).
    * Same stop-rule purpose and same 2-longs-per-round collect
    * discipline as [[pageRankConvergence]]; scores are identical to
    * [[hits]]'s. */
  def hitsConvergence(edges: DataFrame, srcCol: String, dstCol: String,
                      iters: Int): DataFrame = {
    val spark = edges.sparkSession
    val deltas = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    hitsLoop(edges, srcCol, dstCol, iters,
      (i, da, dh) => deltas += ((i, da, dh)))
    import spark.implicits._
    deltas.toSeq
      .toDF("iter", "max_delta_auth_micro", "max_delta_hub_micro")
  }

  private def hitsLoop(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int,
                       onDelta: (Int, Long, Long) => Unit): DataFrame = {
    require(iters >= 1 && iters <= 64, s"iters=$iters out of [1,64]")
    val e = edges.select(col(srcCol).cast("long").as("__graft_src"),
      col(dstCol).cast("long").as("__graft_dst"))
    val nodes = graft.ops.Parallelism.stage(
      e.select(col("__graft_src").as("id"))
        .union(e.select(col("__graft_dst").as("id")))
        .distinct())
    val n = nodes.count()
    require(n > 0, "empty graph")
    require(n <= 1000000L,
      s"$n nodes: micro-integer HITS bounds sums·1e6 to a long — " +
        "run the domain graph, not the doc graph")
    def normalized(raw0: DataFrame, outCol: String): DataFrame = {
      // raw: (id, __graft_s) partial sums; absent id -> 0. Max over the
      // raw sums is a 1-row metrics frame crossed in; floor-divide
      // rescales the top node to exactly 1e6. The sums are STAGED first:
      // they feed both the max subquery and the node join, and the two
      // consumers otherwise re-run the whole edge-join aggregation —
      // twice per normalize, four times per HITS round (r14 plan audit;
      // guide §2.4 shared subtrees).
      val raw = graft.ops.Parallelism.stage(raw0)
      val m = raw.agg(max(col("__graft_s")).as("__graft_m"))
      nodes.join(raw, Seq("id"), "left")
        .crossJoin(broadcast(m))
        .select(col("id"),
          expr("(1000000 * coalesce(__graft_s, 0L)) div __graft_m")
            .as(outCol))
    }
    var hub = nodes.withColumn("hub_micro", lit(1000000L))
    var auth: DataFrame = nodes.withColumn("auth_micro", lit(1000000L))
    for (i <- 0 until iters) {
      val prevAuth = auth
      val prevHub = hub
      val aRaw = e
        .join(hub.select(col("id").as("__graft_src"),
          col("hub_micro").as("__graft_h")), "__graft_src")
        .groupBy(col("__graft_dst").as("id"))
        .agg(sum(col("__graft_h")).as("__graft_s"))
      auth = graft.ops.Parallelism.stage(normalized(aRaw, "auth_micro"))
      val hRaw = e
        .join(auth.select(col("id").as("__graft_dst"),
          col("auth_micro").as("__graft_a")), "__graft_dst")
        .groupBy(col("__graft_src").as("id"))
        .agg(sum(col("__graft_a")).as("__graft_s"))
      hub = graft.ops.Parallelism.stage(normalized(hRaw, "hub_micro"))
      if (onDelta != null) {
        def maxDelta(next: DataFrame, prev: DataFrame, c: String): Long =
          next.join(prev.select(col("id"), col(c).as("__graft_prev")), "id")
            .agg(max(abs(col(c) - col("__graft_prev")))).head().getLong(0)
        onDelta(i + 1, maxDelta(auth, prevAuth, "auth_micro"),
          maxDelta(hub, prevHub, "hub_micro"))
      }
    }
    auth.join(hub, Seq("id"))
      .select(col("id"), col("auth_micro"), col("hub_micro"))
  }
}
