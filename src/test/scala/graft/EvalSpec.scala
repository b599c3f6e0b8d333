package graft

import graft.operators.Eval

class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: Seq[(Boolean, Long)], parts: Int = 4): (Long, Long, Option[Double]) = {
    val r = Eval.aucExact(rows.toDF("y", "s").repartition(parts), "y", "s")
      .collect().head
    (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))
  }

  private def bruteForce(rows: Seq[(Boolean, Long)]): Double = {
    val pos = rows.filter(_._1).map(_._2)
    val neg = rows.filterNot(_._1).map(_._2)
    val num = (for (p <- pos; n <- neg) yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    BigDecimal(num / (pos.size.toDouble * neg.size))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("perfect, reversed, and all-tied orderings hit 1 / 0 / 0.5") {
    val perfect = Seq((true, 10L), (true, 9L), (false, 2L), (false, 1L))
    assert(auc(perfect) === ((2L, 2L, Some(1.0))))
    val reversed = perfect.map { case (y, s) => (!y, s) }
    assert(auc(reversed) === ((2L, 2L, Some(0.0))))
    val tied = Seq((true, 5L), (true, 5L), (false, 5L))
    assert(auc(tied) === ((2L, 1L, Some(0.5))))
  }

  test("matches an all-pairs brute force, including ties and wide ranges") {
    val rnd = new scala.util.Random(21)
    // narrow range (single bucket) and wide range (forces the two-level
    // bucket split: range >> 2^16) against the O(P*N) definition
    for (span <- Seq(40L, 1L << 28)) {
      val rows = Seq.fill(300)((rnd.nextBoolean(),
        // correlated scores so auc is far from 0.5
        0L.max(rnd.nextLong(span))))
        .map { case (y, s) => (y, if (y) s + span / 4 else s) }
      for (parts <- Seq(1, 7)) {
        val (_, _, got) = auc(rows, parts)
        assert(got === Some(bruteForce(rows)), s"span=$span parts=$parts")
      }
    }
  }

  test("degenerate inputs: one class empty or no rows give null auc") {
    assert(auc(Seq((true, 3L), (true, 7L)))._3 === None)
    assert(auc(Seq.empty[(Boolean, Long)])._3 === None)
  }

  test("a huge score range is rejected, not silently mis-bucketed") {
    intercept[IllegalArgumentException] {
      Eval.aucExact(Seq((true, 0L), (false, Long.MaxValue)).toDF("y", "s"),
        "y", "s").collect()
    }
  }

  test("calibration: perfectly calibrated scores give ECE 0, gaps exact") {
    // bin [500000,600000): 10 rows at conf 550000 with exactly 5.5... ->
    // use 4 rows at 750000 with 3 positives: acc 0.75 = conf 0.75 -> gap 0
    val perfect = Seq((true, 750000L), (true, 750000L), (true, 750000L),
      (false, 750000L))
    val out = Eval.calibration(perfect.toDF("y", "s"), "y", "s")
      .collect()
    assert(out.length === 1)
    assert(out.head.getLong(4) === 0L && out.head.getDouble(5) === 0.0)
    // overconfident bin: 2 rows claim 0.9, none positive ->
    // gap = |0*1e6 - 1800000| = 1800000; ece = 1800000/(2*1e6) = 0.9
    val over = Seq((false, 900000L), (false, 900000L))
    val o = Eval.calibration(over.toDF("y", "s"), "y", "s").collect().head
    assert(o.getLong(4) === 1800000L && o.getDouble(5) === 0.9)
    // invariance
    val rnd = new scala.util.Random(5)
    val big = Seq.fill(800)((rnd.nextBoolean(), rnd.nextLong(1000001L)))
    assert(Eval.calibration(big.toDF("y", "s"), "y", "s")
      .orderBy("bin").collect().toSeq ===
      Eval.calibration(big.toDF("y", "s").repartition(7), "y", "s")
        .orderBy("bin").collect().toSeq)
  }

  test("PSI: identical populations score exactly 0; a shift alarms") {
    val base = (0 until 1000).map(i => Tuple1((i * 997L) % 1000001L))
    val same = Eval.psi(base.toDF("s"), base.toDF("s"), "s")
      .collect()
    assert(same.forall(_.getLong(3) === 0L))
    assert(same.head.getDouble(4) === 0.0)
    // shift everything up 30%: classic "distribution moved" alarm
    val shifted = base.map(t => Tuple1(math.min(1000000L, t._1 + 300000L)))
    val psi = Eval.psi(base.toDF("s"), shifted.toDF("s"), "s")
      .collect().head.getDouble(4)
    assert(psi > 0.25, s"psi=$psi should alarm on a 30% shift")
  }

  test("RBO: identical lists hit the truncation ceiling, hand case exact") {
    import org.apache.spark.sql.functions.col
    def ranking(ids: Seq[Long]) =
      ids.zipWithIndex.map { case (id, i) => (id, i + 1) }.toDF("id", "rank")
    val a = ranking(1L to 10L)
    val self = Eval.rboTruncated(a, a, "id", "rank").collect().head
    // identical lists: truncated RBO = 1 - p^k = 1 - 0.9^10, exactly
    assert(self.getLong(1) === 10L)
    assert(self.getDouble(2) === BigDecimal(1.0 - math.pow(0.9, 10))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // disjoint lists: 0, no NaN
    val dis = Eval.rboTruncated(a, ranking(100L to 109L), "id", "rank")
      .collect().head
    assert(dis.getLong(1) === 0L && dis.getDouble(2) === 0.0)
    // hand case k=2, p=0.9: A=[1,2], B=[2,1]. Depth1 overlap 0, depth2
    // overlap 2 -> rbo = 0.1*(0.9*2/2) = 0.09
    val h = Eval.rboTruncated(ranking(Seq(1L, 2L)), ranking(Seq(2L, 1L)),
      "id", "rank", k = 2).collect().head
    assert(h.getLong(1) === 2L && h.getDouble(2) === 0.09)
    // order sensitivity: sharing items at EARLY ranks beats late ranks
    val early = Eval.rboTruncated(a, ranking((1L to 3L) ++ (200L to 206L)),
      "id", "rank").collect().head.getDouble(2)
    val late = Eval.rboTruncated(a, ranking((200L to 206L) ++ (1L to 3L)),
      "id", "rank").collect().head.getDouble(2)
    assert(early > late && late > 0.0)
  }

  test("no single-partition window on the per-score cumulation") {
    val rows = (0 until 2000).map(i => (i % 3 == 0, (i * 37L) % 100000L))
    val p = Eval.aucExact(rows.toDF("y", "s"), "y", "s")
      .queryExecution.executedPlan.toString
    // the only SinglePartition exchange allowed is the bounded
    // <=2^16-row bucket-offset level and the final 1-row aggregate;
    // the per-score window must be hash-partitioned by bucket
    val winLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.exists(_.contains("__graft_b")),
      s"per-score window not partitioned by bucket:\n$p")
  }

  test("abZTest: hand-computed z = 3, exact means, identical arms z = 0") {
    // v0 micro {0, 2e6}: mean 1.0, var/n = 5e11; v1 {3e6, 5e6}: mean
    // 4.0, var/n = 5e11 → den = 1e6, z = (4e6−1e6)/1e6 = 3
    val rows = Seq((0L, 0L), (0L, 2000000L), (1L, 3000000L), (1L, 5000000L))
    val r = Eval.abZTest(rows.toDF("v", "x"), "v", "x").head()
    assert((r.getLong(0), r.getLong(1)) === ((2L, 2L)))
    assert(r.getDouble(2) === 1.0 && r.getDouble(3) === 4.0)
    assert(r.getDouble(4) === 3.0)
    val same = (0 until 40).flatMap(i => Seq((0L, i * 1000L), (1L, i * 1000L)))
    assert(Eval.abZTest(same.toDF("v", "x"), "v", "x")
      .head().getDouble(4) === 0.0)
  }

  test("abZTest: empty arm, zero variance and out-of-domain variants") {
    val oneArm = Seq((1L, 5L), (1L, 7L), (2L, 9L)) // variant 2 excluded
    val r = Eval.abZTest(oneArm.toDF("v", "x"), "v", "x").head()
    assert(r.getLong(0) === 0L && r.getLong(1) === 2L)
    assert(r.isNullAt(2) && !r.isNullAt(3) && r.isNullAt(4))
    val const = Seq((0L, 4L), (0L, 4L), (1L, 4L), (1L, 4L))
    val c = Eval.abZTest(const.toDF("v", "x"), "v", "x").head()
    assert(c.isNullAt(4)) // both variances zero → undefined z
  }

  test("abZTest: partitioning invariance") {
    val rows = (0 until 500).map(i => (i % 2L, (i * 137L) % 90000L))
    val df = rows.toDF("v", "x")
    assert(Eval.abZTest(df, "v", "x").collect().toSeq ===
      Eval.abZTest(df.repartition(11), "v", "x").collect().toSeq)
  }

  test("mrr: hand case — 1/3, 1/2, and a miss average to 5/18") {
    // A hits first at rank 3; B has hits at 2 and 5 (min wins); C never
    val rows = Seq(
      ("A", 1, false), ("A", 2, false), ("A", 3, true), ("A", 4, true),
      ("B", 1, false), ("B", 2, true), ("B", 5, true),
      ("C", 1, false), ("C", 2, false))
    val r = Eval.mrr(rows.toDF("q", "rank", "rel"), "q", "rank", "rel", 10)
      .head()
    assert((r.getInt(0), r.getLong(1), r.getLong(2)) === ((10, 3L, 2L)))
    assert(r.getDouble(3) === 0.277778) // (1/3 + 1/2 + 0) / 3 = 5/18
  }

  test("mrr: hits beyond k don't count; no queries gives null") {
    val rows = Seq(("A", 11, true), ("A", 1, false))
    val r = Eval.mrr(rows.toDF("q", "rank", "rel"), "q", "rank", "rel", 10)
      .head()
    assert((r.getLong(1), r.getLong(2), r.getDouble(3)) === ((1L, 0L, 0.0)))
    val empty = Eval.mrr(Seq.empty[(String, Int, Boolean)]
      .toDF("q", "rank", "rel"), "q", "rank", "rel", 10).head()
    assert(empty.isNullAt(3))
  }

  test("mrr: partitioning invariance") {
    val rows = (0 until 400).map(i =>
      (s"q${i % 37}", i % 12 + 1, i % 5 == 0))
    val df = rows.toDF("q", "rank", "rel")
    assert(Eval.mrr(df, "q", "rank", "rel", 10).collect().toSeq ===
      Eval.mrr(df.repartition(9), "q", "rank", "rel", 10).collect().toSeq)
  }

  test("mrr/ndcg: null queries are excluded at the operator boundary") {
    // same contract as aucExact/cohenKappa/ksTest: a null query must
    // not count toward n_queries nor form its own hit group
    val rows = Seq(
      (Some("A"), 2, true), (Some("B"), 1, false), (None, 1, true))
    val df = rows.map { case (q, r, rel) => (q.orNull, r, rel) }
      .toDF("q", "rank", "rel")
    val clean = rows.collect { case (Some(q), r, rel) => (q, r, rel) }
      .toDF("q", "rank", "rel")
    assert(Eval.mrr(df, "q", "rank", "rel", 10).collect().toSeq ===
      Eval.mrr(clean, "q", "rank", "rel", 10).collect().toSeq)
    val g = Seq((Some("A"), 1, 5000000L), (Some("A"), 2, 1000000L),
      (None, 1, 9000000L))
    val gdf = g.map { case (q, r, x) => (q.orNull, r, x) }
      .toDF("q", "rank", "g")
    val gclean = g.collect { case (Some(q), r, x) => (q, r, x) }
      .toDF("q", "rank", "g")
    assert(Eval.ndcgAt(gdf, "q", "rank", "g", 10).collect().toSeq ===
      Eval.ndcgAt(gclean, "q", "rank", "g", 10).collect().toSeq)
  }

  test("ndcg: a perfectly ordered list scores exactly 1.0") {
    val rows = (1 to 8).map(r => ("A", r, (100 - r).toLong * 1000000L))
    val r = Eval.ndcgAt(rows.toDF("q", "rank", "g"), "q", "rank", "g", 10)
      .head()
    assert(r.getLong(1) === r.getLong(2)) // dcg == idcg term-for-term
    assert(r.getDouble(3) === 1.0)
  }

  test("ndcg: hand-computed reversed-order case and the truncation at k") {
    // presented gains ascending [1e6, 2e6, 3e6]; ideal is the reverse
    def term(g: Long, r: Int) = math.round(g.toDouble / math.log(r + 1.0))
    val rows = Seq(("A", 1, 1000000L), ("A", 2, 2000000L), ("A", 3, 3000000L))
    val r = Eval.ndcgAt(rows.toDF("q", "rank", "g"), "q", "rank", "g", 10)
      .head()
    val dcg = term(1000000L, 1) + term(2000000L, 2) + term(3000000L, 3)
    val idcg = term(3000000L, 1) + term(2000000L, 2) + term(1000000L, 3)
    assert((r.getLong(1), r.getLong(2)) === ((dcg, idcg)))
    assert(r.getDouble(3) === BigDecimal(dcg.toDouble / idcg.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // an item presented past k contributes to idcg (it belongs in the
    // ideal top) but not to dcg — ndcg correctly penalizes burying it
    val buried = Seq(("A", 1, 1000000L), ("A", 11, 9000000L))
    val b = Eval.ndcgAt(buried.toDF("q", "rank", "g"), "q", "rank", "g", 10)
      .head()
    assert(b.getLong(1) === term(1000000L, 1))
    assert(b.getLong(2) === term(9000000L, 1) + term(1000000L, 2))
  }

  test("ndcg: zero-gain query gives null; partitioning invariance") {
    val zero = Seq(("A", 1, 0L), ("A", 2, 0L))
    assert(Eval.ndcgAt(zero.toDF("q", "rank", "g"), "q", "rank", "g", 10)
      .head().isNullAt(3))
    val rows = (0 until 300).map(i =>
      (s"q${i % 23}", i % 15 + 1, (i * 91L) % 700000L))
    val df = rows.toDF("q", "rank", "g")
    assert(Eval.ndcgAt(df, "q", "rank", "g", 10).orderBy("q")
      .collect().toSeq ===
      Eval.ndcgAt(df.repartition(8), "q", "rank", "g", 10).orderBy("q")
        .collect().toSeq)
  }

  test("kappa: the classic 0.4 textbook table, perfect and degenerate") {
    // n11=20 n10=5 n01=10 n00=15: po=0.7, pe=0.5, kappa=0.4
    val rows = Seq.fill(20)((true, true)) ++ Seq.fill(5)((true, false)) ++
      Seq.fill(10)((false, true)) ++ Seq.fill(15)((false, false))
    val r = Eval.cohenKappa(rows.toDF("a", "b"), "a", "b").head()
    assert(r.getLong(0) === 50L && r.getLong(1) === 20L && r.getLong(2) === 15L)
    assert(r.getDouble(5) === 0.7 && r.getDouble(6) === 0.5)
    assert(r.getDouble(7) === 0.4)
    val perfect = Seq((true, true), (false, false), (true, true))
    assert(Eval.cohenKappa(perfect.toDF("a", "b"), "a", "b")
      .head().getDouble(7) === 1.0)
    val constant = Seq((true, true), (true, true)) // pe = 1 → undefined
    assert(Eval.cohenKappa(constant.toDF("a", "b"), "a", "b")
      .head().isNullAt(7))
  }

  test("kappa: null ratings excluded; partitioning invariance") {
    val rows = (0 until 200).map { i =>
      (if (i % 17 == 0) None else Some(i % 3 == 0),
        if (i % 19 == 0) None else Some(i % 4 == 0))
    }
    val df = rows.toDF("a", "b")
    val r = Eval.cohenKappa(df, "a", "b").head()
    assert(r.getLong(0) < 200L) // nulls dropped
    assert(Eval.cohenKappa(df, "a", "b").collect().toSeq ===
      Eval.cohenKappa(df.repartition(13), "a", "b").collect().toSeq)
  }

  test("chiSquare: independence is exactly 0; hand-computed 2x2 = 20") {
    val indep = Seq.fill(10)(("x", 0L)) ++ Seq.fill(10)(("x", 1L)) ++
      Seq.fill(10)(("y", 0L)) ++ Seq.fill(10)(("y", 1L))
    val i = Eval.chiSquare(indep.toDF("a", "b"), "a", "b").head()
    assert(i.getDouble(6) === 0.0)
    // O = [[30,10],[10,30]]: every E = 20, every term = 5 → chi2 = 20
    val rows = Seq.fill(30)(("x", 1L)) ++ Seq.fill(10)(("x", 0L)) ++
      Seq.fill(10)(("y", 1L)) ++ Seq.fill(30)(("y", 0L))
    val r = Eval.chiSquare(rows.toDF("a", "b"), "a", "b")
      .orderBy("a", "b").collect()
    assert(r.length === 4)
    assert(r.head.getLong(4) === 80L && r.head.getLong(5) === 1L)
    assert(r.head.getDouble(6) === 20.0)
    assert(r.forall(_.getLong(3) === 5000000L)) // each term exactly 5
  }

  test("chiSquare: zero-observed spine cells contribute their E") {
    // cell (y,1) never observed: E = 2.5 → its term alone is 2.5
    val rows = Seq.fill(5)(("x", 0L)) ++ Seq.fill(5)(("x", 1L)) ++
      Seq.fill(10)(("y", 0L))
    val r = Eval.chiSquare(rows.toDF("a", "b"), "a", "b")
      .orderBy("a", "b").collect()
    assert(r.length === 4) // full spine, including the absent cell
    val absent = r.find(x => x.getString(0) == "y" && x.getLong(1) == 1L).get
    assert(absent.getLong(2) === 0L)
    assert(absent.getLong(3) === 2500000L)
    assert(r.head.getDouble(6) === 6.666666) // Σ micro-rounded terms
  }

  test("ksTest: hand case 0.5, identical 0, disjoint 1, empty-arm null") {
    // sample0 = {1,2}, sample1 = {2,3}: max CDF gap at v=1 is 0.5
    val rows = Seq((0L, 1L), (0L, 2L), (1L, 2L), (1L, 3L))
    val r = Eval.ksTest(rows.toDF("v", "s"), "v", "s").head()
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) === ((2L, 2L, 0.5)))
    val same = (0 until 30).flatMap(i => Seq((0L, i * 7L), (1L, i * 7L)))
    assert(Eval.ksTest(same.toDF("v", "s"), "v", "s")
      .head().getDouble(2) === 0.0)
    val disjoint = Seq((0L, 1L), (0L, 2L), (1L, 10L), (1L, 11L))
    assert(Eval.ksTest(disjoint.toDF("v", "s"), "v", "s")
      .head().getDouble(2) === 1.0)
    val oneArm = Seq((0L, 5L), (0L, 6L))
    assert(Eval.ksTest(oneArm.toDF("v", "s"), "v", "s").head().isNullAt(2))
    assert(Eval.ksTest(Seq.empty[(Long, Long)].toDF("v", "s"), "v", "s")
      .head().isNullAt(2))
  }

  test("ksTest: matches a brute-force CDF walk incl. ties, wide ranges") {
    val rnd = new scala.util.Random(44)
    for (span <- Seq(50L, 1L << 28)) {
      val rows = Seq.fill(400)((rnd.nextInt(2).toLong, rnd.nextLong(span)))
        .map { case (v, s) => (v, if (v == 1L) s + span / 5 else s) }
      val s0 = rows.filter(_._1 == 0L).map(_._2).sorted
      val s1 = rows.filter(_._1 == 1L).map(_._2).sorted
      val support = (s0 ++ s1).distinct.sorted
      val expect = BigDecimal(support.map { x =>
        math.abs(s0.count(_ <= x).toDouble / s0.size -
          s1.count(_ <= x).toDouble / s1.size)
      }.max).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      for (parts <- Seq(1, 7)) {
        val got = Eval.ksTest(rows.toDF("v", "s").repartition(parts),
          "v", "s").head().getDouble(2)
        assert(got === expect, s"span=$span parts=$parts")
      }
    }
  }

  test("ksTest: a huge value range is rejected, not silently mis-bucketed") {
    intercept[IllegalArgumentException] {
      Eval.ksTest(Seq((0L, 0L), (1L, Long.MaxValue)).toDF("v", "s"),
        "v", "s").collect()
    }
  }

  test("brownForsythe: hand-computed 0.918987, identical arms 0, nulls") {
    // v0 = {0,10}: lower median 0, z = {0,10}; v1 = {0,2,4}: median 2,
    // z = {2,0,2}. B' = 484, W' = 1580, W = 3*484/1580 = 0.918987
    val rows = Seq((0L, 0L), (0L, 10L), (1L, 0L), (1L, 2L), (1L, 4L))
    val r = Eval.brownForsythe(rows.toDF("v", "x"), "v", "x").head()
    assert((r.getLong(0), r.getLong(1)) === ((2L, 3L)))
    assert((r.getLong(2), r.getLong(3)) === ((0L, 2L))) // lower medians
    assert(r.getDouble(4) === 0.918987)
    // identical value multisets: B' = 0 exactly
    val same = (0 until 40).flatMap(i => Seq((0L, i * 3L), (1L, i * 3L)))
    assert(Eval.brownForsythe(same.toDF("v", "x"), "v", "x")
      .head().getDouble(4) === 0.0)
    // zero within-group deviations: W' = 0 -> null
    val const = Seq((0L, 5L), (0L, 5L), (1L, 7L), (1L, 7L))
    assert(Eval.brownForsythe(const.toDF("v", "x"), "v", "x")
      .head().isNullAt(4))
    // empty arm -> null w, null med for the empty side
    val one = Seq((1L, 5L), (1L, 9L), (1L, 6L))
    val o = Eval.brownForsythe(one.toDF("v", "x"), "v", "x").head()
    assert(o.getLong(0) === 0L && o.isNullAt(2) && o.isNullAt(4))
  }

  test("brownForsythe: detects a spread change; partitioning invariance") {
    // same median, double the spread in arm 1
    val rows = (0 until 200).flatMap { i =>
      val d = i % 10 - 5
      Seq((0L, 100L + d), (1L, 100L + 2L * d))
    }
    val df = rows.toDF("v", "x")
    val r = Eval.brownForsythe(df, "v", "x").head()
    assert(r.getDouble(4) > 10.0) // strong variance signal
    assert(Eval.brownForsythe(df, "v", "x").collect().toSeq ===
      Eval.brownForsythe(df.repartition(9), "v", "x").collect().toSeq)
  }

  test("fleissKappa: hand-computed 0.55 case, perfect, degenerate") {
    // nt per subject = [3, 0, 2] with m=3: S2=23, T=5, N=3
    // num = 14*81 - 41*18 = 396, den = 18*(81-41) = 720, kappa = 0.55
    val rows = Seq((true, true, true), (false, false, false),
      (true, true, false))
    val r = Eval.fleissKappa(rows.toDF("a", "b", "c"), Seq("a", "b", "c"))
      .head()
    assert(r.getLong(0) === 3L && r.getLong(1) === 3L)
    assert(r.getDouble(2) === 0.555556) // p_true = 5/9
    assert(r.getDouble(3) === 0.777778) // pbar = 14/18
    assert(r.getDouble(4) === 0.506173) // pe = 41/81
    assert(r.getDouble(5) === 0.55)
    // unanimous mixed-subject panels: pbar = 1, kappa = 1
    val perfect = Seq((true, true), (false, false), (true, true))
    assert(Eval.fleissKappa(perfect.toDF("a", "b"), Seq("a", "b"))
      .head().getDouble(5) === 1.0)
    // every vote identical: pe = 1 → kappa undefined
    val const = Seq((true, true), (true, true))
    assert(Eval.fleissKappa(const.toDF("a", "b"), Seq("a", "b"))
      .head().isNullAt(5))
  }

  test("fleissKappa: incomplete panels excluded; invariance") {
    val rows: Seq[(Option[Boolean], Option[Boolean], Option[Boolean])] =
      (0 until 120).map { i =>
        (if (i % 11 == 0) None else Some(i % 2 == 0),
          Some(i % 3 == 0), Some(i % 2 == 0))
      }
    val df = rows.toDF("a", "b", "c")
    val r = Eval.fleissKappa(df, Seq("a", "b", "c")).head()
    assert(r.getLong(0) < 120L)
    assert(Eval.fleissKappa(df, Seq("a", "b", "c")).collect().toSeq ===
      Eval.fleissKappa(df.repartition(7), Seq("a", "b", "c"))
        .collect().toSeq)
  }

  test("spearman: monotone-nonlinear is exactly 1, reversed is -1") {
    // y = x^3 is monotone: Spearman 1.0 even though Pearson < 1
    val rows = Seq(3L, 1L, 4L, 2L, 5L).map(x => (x, x * x * x))
    val r = Eval.spearman(rows.toDF("x", "y"), "x", "y").head()
    assert(r.getLong(0) === 5L && r.getDouble(1) === 1.0)
    val rev = rows.map { case (x, y) => (x, -y) }
    assert(Eval.spearman(rev.toDF("x", "y"), "x", "y")
      .head().getDouble(1) === -1.0)
  }

  test("spearman: the textbook 0.6 case and a hand-computed tie case") {
    // x=[1,2,3,4], y=[2,1,4,3]: rho = 1 - 6*4/(4*15) = 0.6
    val rows = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L))
    assert(Eval.spearman(rows.toDF("x", "y"), "x", "y")
      .head().getDouble(1) === 0.6)
    // x=[1,1,2] ties at rank 1.5; y=[1,2,3]: rho = 1.5/sqrt(1.5*2)
    val tied = Seq((1L, 1L), (1L, 2L), (2L, 3L))
    assert(Eval.spearman(tied.toDF("x", "y"), "x", "y")
      .head().getDouble(1) === 0.866025)
  }

  test("spearman: matches a brute-force avg-rank Pearson on wide ranges") {
    val rnd = new scala.util.Random(33)
    // spans > 2^16 force the two-level bucket split on both variables
    val rows = Seq.fill(300)((rnd.nextLong(1L << 28),
      rnd.nextLong(1L << 28))).map { case (x, y) =>
      (x, if (x % 3 == 0) x / 2 + y / 4 else y) // correlated-ish
    }
    def avgRanks(vs: Seq[Long]): Map[Long, Double] = {
      val sorted = vs.sorted.zipWithIndex.map { case (v, i) => (v, i + 1.0) }
      sorted.groupBy(_._1).map { case (v, g) =>
        v -> g.map(_._2).sum / g.size }
    }
    val rxm = avgRanks(rows.map(_._1))
    val rym = avgRanks(rows.map(_._2))
    val (xs, ys) = rows.map { case (x, y) => (rxm(x), rym(y)) }.unzip
    val n = xs.size.toDouble
    val (mx, my) = (xs.sum / n, ys.sum / n)
    val cov = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
    val expect = BigDecimal(cov / math.sqrt(
      xs.map(a => (a - mx) * (a - mx)).sum *
        ys.map(b => (b - my) * (b - my)).sum))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (parts <- Seq(1, 7)) {
      val got = Eval.spearman(rows.toDF("x", "y").repartition(parts),
        "x", "y").head().getDouble(1)
      assert(math.abs(got - expect) < 2e-6, s"parts=$parts")
    }
  }

  test("spearman: constant column and empty input give null rho") {
    val const = Seq((1L, 5L), (2L, 5L), (3L, 5L))
    assert(Eval.spearman(const.toDF("x", "y"), "x", "y")
      .head().isNullAt(1))
    val empty = Eval.spearman(Seq.empty[(Long, Long)].toDF("x", "y"),
      "x", "y").head()
    assert(empty.getLong(0) === 0L && empty.isNullAt(1))
  }

  test("chiSquare: partitioning invariance") {
    val rows = (0 until 400).map(i => (s"t${i % 5}", i % 2L))
    val df = rows.toDF("a", "b")
    assert(Eval.chiSquare(df, "a", "b").orderBy("a", "b").collect().toSeq ===
      Eval.chiSquare(df.repartition(9), "a", "b").orderBy("a", "b")
        .collect().toSeq)
  }
}
