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

  test("an anomalous group scores strictly above its peers") {
    val rows = (0 until 90).map(i => (s"g${i % 3}", "common words here")) ++
      (0 until 30).map(i => ("gx", "common anomaly anomaly"))
    val out = Drift.klDrift(rows.toDF("g", "text"), "g", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(Seq("g0", "g1", "g2").forall(g => out("gx") > out(g)))
  }
}
