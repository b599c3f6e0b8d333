package graft

import org.apache.spark.sql.functions._

import graft.operators.Drift

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("a group distributed exactly like the corpus scores zero") {
    // both groups have the identical distribution {a:2, b:1} -> Q = P
    val df = Seq(("g1", "a a b"), ("g2", "a a b")).toDF("g", "text")
    val out = Drift.klDrift(df, "g", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out === Map("g1" -> ((3L, 0.0)), "g2" -> ((3L, 0.0))))
  }

  test("hand-computed divergence for a skewed group") {
    // g1 = {a:3, b:1}, g2 = {a:1, b:3}; Q = {a:1/2, b:1/2}
    // KL(g1||Q) = .75*ln(1.5) + .25*ln(.5)  (nano-rounded per term)
    val df = Seq(("g1", "a a a b"), ("g2", "a b b b")).toDF("g", "text")
    val out = Drift.klDrift(df, "g", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    def nano(x: Double) = math.round(x * 1e9)
    val expected = BigDecimal((nano(0.75 * math.log(1.5)) +
      nano(0.25 * math.log(0.5))).toDouble / 1e9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("g1") === expected)
    assert(out("g2") === expected) // symmetric construction
    assert(out("g1") > 0.0)
  }

  test("partitioning-independent; null text and empty groups drop out") {
    val rows = (0 until 200).map(i => (s"g${i % 4}", s"tok${i % 9} x y")) :+
      (("g9", null: String))
    val a = Drift.klDrift(rows.toDF("g", "text"), "g", "text")
      .orderBy("g").collect().toSeq
    val b = Drift.klDrift(rows.toDF("g", "text").repartition(7), "g", "text")
      .orderBy("g").collect().toSeq
    assert(a === b)
    assert(!a.exists(_.getString(0) == "g9")) // no tokens -> no row
  }

  test("distinctive terms: the planted word ranks first with high z") {
    // planted: heavy in gx, rare-but-present elsewhere — the realistic
    // over-representation case. (A word with c2 = 0 deliberately gets a
    // small z: 1/(c2+alpha) blows up the variance, which is the prior's
    // protection against crowning one-off hapaxes.)
    val rows = (0 until 60).map(i => (s"g${i % 3}", "common words here")) ++
      (0 until 20).map(_ => ("gx", "common planted planted")) :+
      (("g0", "planted appears rarely")) :+ (("g1", "planted again"))
    val out = Drift.distinctiveTerms(rows.toDF("g", "text"), "g", "text",
      k = 2).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getString(2), r.getDouble(3)))
      .toMap
    val (term, z) = out(("gx", 1))
    assert(term === "planted" && z > 3.0)
    // a group with the corpus-average mix has no strongly distinctive term
    assert(out(("g0", 1))._2 < z)
    // rank is dense 1..k per group with deterministic term tie-break
    assert(out.keySet.count(_._1 == "gx") === 2)
  }

  test("distinctive terms: partitioning-independent ranking") {
    val rows = (0 until 150).map(i => (s"g${i % 5}", s"w${i % 11} w${(i + 3) % 7} x"))
    val a = Drift.distinctiveTerms(rows.toDF("g", "text"), "g", "text", 3)
      .orderBy("g", "rank").collect().toSeq
    val b = Drift.distinctiveTerms(rows.toDF("g", "text").repartition(8),
      "g", "text", 3).orderBy("g", "rank").collect().toSeq
    assert(a === b)
  }

  test("an anomalous group scores strictly above its peers") {
    val rows = (0 until 90).map(i => (s"g${i % 3}", "common words here")) ++
      (0 until 30).map(i => ("gx", "common anomaly anomaly"))
    val out = Drift.klDrift(rows.toDF("g", "text"), "g", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(Seq("g0", "g1", "g2").forall(g => out("gx") > out(g)))
  }

  test("pairwise similarity: hand-computed Jaccard and cosine") {
    // A: {a:2, b:1}, B: {a:1, c:1} → inter {a}: 1; |A∪B| = 2+2−1 = 3
    // dot = 2·1 = 2; ||A||² = 5, ||B||² = 2 → cos = 2/√10
    val df = Seq(("A", "a a b"), ("B", "a c")).toDF("src", "text")
    val out = Drift.pairwiseSimilarity(df, "src", "text").collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getString(0), r.getString(1), r.getLong(2)) === (("A", "B", 1L)))
    def rnd(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) === rnd(1.0 / 3))
    assert(r.getDouble(4) === rnd(2.0 / (math.sqrt(5.0) * math.sqrt(2.0))))
  }

  test("pairwise similarity: identical sources hit 1.0; disjoint absent") {
    val df = Seq(("x", "p q r p"), ("y", "p q r p"), ("z", "unrelated"))
      .toDF("src", "text")
    val out = Drift.pairwiseSimilarity(df, "src", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(("x", "y")) === ((1.0, 1.0)))
    assert(!out.contains(("x", "z")) && !out.contains(("y", "z")))
    // invariance
    val a = Drift.pairwiseSimilarity(df, "src", "text")
      .orderBy("src_a", "src_b").collect().toSeq
    val b = Drift.pairwiseSimilarity(df.repartition(5), "src", "text")
      .orderBy("src_a", "src_b").collect().toSeq
    assert(a === b)
  }

  test("MI: independent columns score exactly zero") {
    // every (a, b) cell count factorizes (full product, equal counts)
    // → every ratio is exactly 1 → every nano term rounds to 0
    val rows = for (a <- Seq("x", "y"); b <- Seq(1L, 2L, 3L); _ <- 1 to 4)
      yield (a, b)
    val out = Drift.mutualInformation(rows.toDF("a", "b"), "a", "b")
      .collect()
    assert(out.length === 6)
    assert(out.forall(_.getLong(3) === 0L))
    assert(out.forall(_.getDouble(5) === 0.0))
  }

  test("MI: a deterministic relationship scores ln(k), hand-rounded") {
    // diagonal 3x3 with equal mass: each cell p=1/3, ratio=3
    // term_nano = round(ln(3)/3 * 1e9); MI = 3 terms / 1e9
    val rows = for (i <- Seq("p", "q", "r"); _ <- 1 to 5) yield (i, i)
    val out = Drift.mutualInformation(rows.toDF("a", "b"), "a", "b")
      .collect()
    val nano = math.round(math.log(3.0) / 3.0 * 1e9)
    assert(out.forall(_.getLong(3) === nano))
    val mi = BigDecimal(3.0 * nano / 1e9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.forall(_.getDouble(5) === mi))
    assert(out.forall(_.getLong(4) === 15L))
  }

  test("MI: nulls in either column are excluded; invariance") {
    val rows = Seq(("a", Some(1L)), ("a", None), (null, Some(2L)),
      ("b", Some(2L)), ("a", Some(1L)), ("b", Some(1L)))
    val df = rows.toDF("a", "b")
    val out = Drift.mutualInformation(df, "a", "b").collect()
    assert(out.map(_.getLong(2)).sum === 4L) // only 4 complete rows
    val again = Drift.mutualInformation(df.repartition(5), "a", "b")
      .orderBy("a", "b").collect().toSeq
    assert(Drift.mutualInformation(df, "a", "b").orderBy("a", "b")
      .collect().toSeq === again)
  }

  test("JSD: a group distributed exactly like the corpus scores zero") {
    val df = Seq(("g1", "a a b"), ("g2", "a a b")).toDF("g", "text")
    val out = Drift.jsDrift(df, "g", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out === Map("g1" -> ((3L, 0.0)), "g2" -> ((3L, 0.0))))
  }

  test("JSD: disjoint-vocabulary halves hit the hand-computed value") {
    // Two equal-mass groups with disjoint vocab. For each group, every
    // own-token has q = p/2, so the in-census half-sum telescopes to
    // (ln(4/3) + ln(2/3)/2)/2 and the absent-token tail is ln(2)/2 * 1/2;
    // total = 0.2157616 nats (cross-checked against the direct
    // 1/2*KL(P||A) + 1/2*KL(M||A) mixture computation).
    val df = Seq(("g1", "a b c d"), ("g2", "w x y z")).toDF("g", "text")
    val out = Drift.jsDrift(df, "g", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val expected = 0.5 * (math.log(4.0 / 3.0) + 0.5 * math.log(2.0 / 3.0)) +
      0.5 * math.log(2.0) * 0.5
    assert(math.abs(out("g1") - expected) < 2e-6)
    assert(out("g1") === out("g2")) // symmetric construction
    // bounded: JSD can never exceed ln 2, even for fully disjoint vocab
    assert(out("g1") <= math.log(2.0))
  }

  test("JSD: partitioning-independent and ranks the drifted group top") {
    val rows = (0 until 300).map(i => (s"g${i % 5}", "common words here")) ++
      (0 until 40).map(_ => ("g0", "anomaly anomaly anomaly"))
    val df = rows.toDF("g", "text")
    val a = Drift.jsDrift(df, "g", "text").orderBy("g").collect().toSeq
    val b = Drift.jsDrift(df.repartition(7), "g", "text")
      .orderBy("g").collect().toSeq
    assert(a === b)
    val byScore = a.map(r => r.getString(0) -> r.getDouble(2))
      .sortBy(-_._2)
    assert(byScore.head._1 === "g0") // the injected-anomaly group leads
    assert(byScore.head._2 > 0.0)
  }
}
