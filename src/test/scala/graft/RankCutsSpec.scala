package graft

import org.apache.spark.sql.functions._

import graft.functions.ExprHelpers
import graft.operators.{RankCuts, Winsorize}

/** The bounded radix rank search that replaced the cumulative-sum
  * windows in Dsir / Winsorize / perplexityBuckets. */
class RankCutsSpec extends SparkSpec {
  import spark.implicits._

  /** Ground truth: expand the histogram, sort ascending, pick the
    * rank-th element (1-based) — `min(v : cum(v) >= r)`. */
  private def bruteRank[T](hist: Seq[(T, Long)], rank: Long)
      (implicit ord: Ordering[T]): T = {
    val sorted = hist.sortBy(_._1)
    var cum = 0L
    sorted.find { case (_, c) => cum += c; cum >= rank }.get._1
  }

  test("doubleOrderKey is order-isomorphic over doubles incl. specials") {
    val rnd = new scala.util.Random(3)
    val vals = Seq(0.0, -0.0, Double.MinPositiveValue,
      -Double.MinPositiveValue, Double.MaxValue, -Double.MaxValue,
      Double.PositiveInfinity, Double.NegativeInfinity,
      1.0, -1.0, math.Pi, -math.Pi, 1e-300, -1e-300) ++
      Seq.fill(500)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(40) - 20))
    for (a <- vals; b <- vals)
      assert(java.lang.Double.compare(a, b).sign ===
        java.lang.Long.compare(ExprHelpers.doubleOrderKey(a),
          ExprHelpers.doubleOrderKey(b)).sign,
        s"order broken at ($a, $b)")
  }

  test("long-valued ranks match brute force: multi-group, negatives, 2^60") {
    val rnd = new scala.util.Random(17)
    val groups = Seq("a", "b", "c")
    val hist = for {
      g <- groups
      i <- 0 until 400
    } yield {
      val v = rnd.nextInt(5) match {
        case 0 => rnd.nextLong() % (1L << 60)  // huge, both signs
        case 1 => -(rnd.nextInt(1000).toLong)
        case _ => rnd.nextInt(100000).toLong
      }
      (g, v, rnd.nextInt(5).toLong + 1)
    }
    // distinct values per (group, value): collapse duplicates like a real
    // histogram would
    val collapsed = hist.groupBy(h => (h._1, h._2))
      .map { case ((g, v), rows) => (g, v, rows.map(_._3).sum) }.toSeq
    val df = collapsed.toDF("g", "v", "c")
    val out = RankCuts.rankValues(df, Seq("g"), "v", "c",
      Seq("p25" -> RankCuts.ceilRank(25, 100),
        "p75" -> RankCuts.ceilRank(75, 100),
        "first" -> (_ => lit(1L)),
        "last" -> (n => n)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    groups.foreach { g =>
      val gh = collapsed.filter(_._1 == g).map(t => (t._2, t._3))
      val n = gh.map(_._2).sum
      assert(out(g)._1 === bruteRank(gh, (25 * n + 99) / 100), s"$g p25")
      assert(out(g)._2 === bruteRank(gh, (75 * n + 99) / 100), s"$g p75")
      assert(out(g)._3 === gh.map(_._1).min, s"$g first")
      assert(out(g)._4 === gh.map(_._1).max, s"$g last")
    }
  }

  test("double-valued ranks match brute force, incl. negatives") {
    val rnd = new scala.util.Random(29)
    val hist = (0 until 3000).map { _ =>
      (math.rint(rnd.nextGaussian() * 1e6) / 1e6 *
        (if (rnd.nextBoolean()) 1 else -1), rnd.nextInt(3).toLong + 1)
    }.groupBy(_._1).map { case (v, rows) => (v, rows.map(_._2).sum) }.toSeq
    val df = hist.map { case (v, c) => ("all", v, c) }.toDF("g", "v", "c")
    val out = RankCuts.rankValues(df, Seq("g"), "v", "c",
      Seq("t1" -> RankCuts.ceilRank(1, 3), "t2" -> RankCuts.ceilRank(2, 3)))
      .collect().head
    val n = hist.map(_._2).sum
    assert(out.getDouble(1) === bruteRank(hist, (n + 2) / 3))
    assert(out.getDouble(2) === bruteRank(hist, (2 * n + 2) / 3))
  }

  test("ungrouped (global) ranks work and nulls are excluded") {
    val df = Seq((java.lang.Long.valueOf(5L), 2L),
      (java.lang.Long.valueOf(1L), 3L), (null.asInstanceOf[java.lang.Long], 9L),
      (java.lang.Long.valueOf(9L), 1L)).toDF("v", "c")
    val out = RankCuts.rankValues(df, Nil, "v", "c",
      Seq("median" -> RankCuts.ceilRank(1, 2)))
    assert(out.columns.toSeq === Seq("median"))
    // non-null mass = 6, rank ceil(6/2)=3 -> value 1 (cum 3)
    assert(out.collect().head.getLong(0) === 1L)
  }

  test("one giant group: winsorize cuts equal brute force at 50k rows") {
    // the shape the old per-group window serialized through one reducer:
    // a single group whose distinct-value count is the row count
    val rnd = new scala.util.Random(41)
    val vals = (0 until 50000).map(_ => rnd.nextInt(1 << 30).toLong)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, "one", v) }
      .toDF("id", "src", "len")
    val out = Winsorize.winsorize(df, "src", "len", 5, 95)
      .select("cut_lo", "cut_hi").distinct().collect()
    assert(out.length === 1)
    val hist = vals.groupBy(identity).map { case (v, g) => (v, g.size.toLong) }.toSeq
    val n = vals.size.toLong
    assert(out.head.getLong(0) === bruteRank(hist, (5 * n + 99) / 100))
    assert(out.head.getLong(1) === bruteRank(hist, (95 * n + 99) / 100))
  }

  test("giant single group terciles: perplexityBuckets matches rank rule") {
    // one language, distinct scores — the tercile cuts must follow the
    // same min(v: cum >= ceil(k·n/3)) rule the oracle replays
    val docs = (0L until 999L)
      .map(i => (i, s"w${i % 37} w${(i * 7) % 41} w${(i * 11) % 43}", "en"))
      .toDF("doc_id", "text", "lang")
    val out = graft.operators.LanguageModel.perplexityBuckets(
      docs, "doc_id", "text", "lang")
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getString(3)))
    assert(out.nonEmpty)
    val scores = out.map(_._2).sorted
    val n = scores.length
    val t1 = scores((n + 2) / 3 - 1)
    val t2 = scores((2 * n + 2) / 3 - 1)
    out.foreach { case (id, bits, bucket) =>
      val expect = if (bits <= t1) "head" else if (bits <= t2) "middle" else "tail"
      assert(bucket === expect, s"doc $id bits=$bits")
    }
    // real three-way split
    assert(out.map(_._3).distinct.toSet === Set("head", "middle", "tail"))
  }

  test("exactPercentiles operator matches brute force per group") {
    val rnd = new scala.util.Random(5)
    val rows = for (g <- Seq("x", "y"); i <- 0 until 701)
      yield (g, rnd.nextInt(10000))
    val out = graft.operators.Quantiles.exactPercentiles(
      rows.toDF("src", "len"), "src", "len", Seq(50, 90, 99))
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    for (g <- Seq("x", "y")) {
      val vs = rows.filter(_._1 == g).map(_._2).sorted
      val n = vs.length.toLong
      def pct(p: Int) = vs(((p * n + 99) / 100 - 1).toInt)
      assert(out(g) === ((pct(50), pct(90), pct(99))), s"group $g")
    }
    intercept[IllegalArgumentException] {
      graft.operators.Quantiles.exactPercentiles(
        rows.toDF("src", "len"), "src", "len", Seq(0))
    }
    intercept[IllegalArgumentException] {
      graft.operators.Quantiles.exactPercentiles(
        rows.toDF("src", "len"), "src", "len", Seq(50, 50))
    }
  }

  test("cut derivation plan: windows are bounded and never SinglePartition") {
    val df = (0L until 2000L).map(i => (i, "one", i % 701)).toDF("id", "src", "len")
    val p = Winsorize.winsorize(df, "src", "len", 5, 95)
      .queryExecution.executedPlan.toString
    assert(p.contains("Window"), s"expected radix-pass windows:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"cut derivation must not serialize onto one partition:\n$p")
    // the bounded windows key on (group, target), not on the value
    assert(p.contains("hashpartitioning(src"),
      s"radix window must partition by group + target:\n$p")
  }
}
