package graft

import org.apache.spark.sql.functions._

import graft.operators.Vocabulary

class VocabularySpec extends SparkSpec {
  import spark.implicits._

  private def shape(rows: Seq[(String, String)]) =
    Vocabulary.frequencyShape(rows.toDF("src", "text"), "src", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap

  private def entropyOf(rows: Seq[(String, String)], src: String) = {
    val r = Vocabulary.frequencyShape(rows.toDF("src", "text"),
        "src", "text")
      .filter(col("src") === src).head()
    if (r.isNullAt(5)) None else Some(r.getDouble(5))
  }

  test("hand-computed Gini and CSN alpha on a tiny census") {
    // census: a→3, b→1, c→1; sorted f = [1,1,3], V=3, N=5
    // Σ i·f_i = 1·1 + 2·1 + 3·3 = 12; G = 2·12/(3·5) − 4/3 = 4/15
    // L = 1·round(ln 3 · 1e9) = 1098612289; α = 1 + 3/(L/1e9)
    val out = shape(Seq(("s", "a a b c"), ("s", "a")))
    val (n, v, g, a) = out("s")
    assert(n === 5L && v === 3L)
    val gini = BigDecimal(2.0 * 12 / (3.0 * 5) - 4.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(g === Some(gini))
    val alpha = BigDecimal(1.0 + 3.0 / (1098612289L / 1e9))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(a === Some(alpha))
  }

  test("uniform frequencies give Gini exactly 0; all-hapax alpha is null") {
    // every type occurs exactly twice → Σi·f = c·V(V+1)/2 ⇒ G = 0
    val out = shape(Seq(("u", "x y z x y z")))
    assert(out("u")._3 === Some(0.0))
    // all types occur once → Σ m·ln(f) = 0 → no power-law evidence
    val hapax = shape(Seq(("h", "p q r")))
    assert(hapax("h")._3.isDefined) // Gini of uniform hapaxes is also 0
    assert(hapax("h")._3 === Some(0.0))
    assert(hapax("h")._4 === None)
  }

  test("single-type group: gini null (undefined), tokens counted") {
    val out = shape(Seq(("one", "w w w w")))
    assert(out("one")._1 === 4L && out("one")._2 === 1L)
    assert(out("one")._3 === None)
  }

  test("empty-text group present with zero counts and null metrics") {
    val out = shape(Seq(("e", "   "), ("f", "a b a")))
    assert(out("e") === ((0L, 0L, None, None)))
    assert(out("f")._1 === 3L && out("f")._2 === 2L)
    assert(entropyOf(Seq(("e", "   "), ("f", "a b a")), "e") === None)
  }

  test("entropy: ln V for uniform vocab, hand-computed skewed case, " +
      "0 for a single type") {
    def rnd(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // uniform hapaxes: H = ln 3 exactly (E-sum is 0, N = V = 3)
    assert(entropyOf(Seq(("u", "p q r")), "u") === Some(rnd(math.log(3.0))))
    // {a:3, b:1, c:1}: H = ln 5 − 3·round(ln3·1e9)/1e9/5
    val e = math.log(5.0) - 3.0 * math.round(math.log(3.0) * 1e9) / 1e9 / 5.0
    assert(entropyOf(Seq(("s", "a a b c"), ("s", "a")), "s") === Some(rnd(e)))
    // one type only: H = ln N − N·ln(N)/N = 0 exactly
    assert(entropyOf(Seq(("one", "w w w w")), "one") === Some(0.0))
  }

  test("skewed beats uniform on Gini; Zipfy text estimates a sane alpha") {
    val skew = shape(Seq(("s", ("dominant " * 60) +
      (1 to 12).map(i => s"rare$i").mkString(" "))))
    val unif = shape(Seq(("s", (1 to 12).map(i => s"t$i t$i").mkString(" "))))
    assert(skew("s")._3.get > unif("s")._3.get + 0.4)
    // true Zipf-ish frequencies 1/r: alpha should land in a plausible band
    val zipf = (1 to 50).flatMap(r => Seq.fill(200 / r)(s"w$r"))
    val z = shape(Seq(("z", zipf.mkString(" "))))
    assert(z("z")._4.get > 1.2 && z("z")._4.get < 4.0, z("z"))
  }

  test("partitioning invariance") {
    val docs = (0L until 80L)
      .map(i => (s"s${i % 3}", s"tok${i % 11} tok${(i * 7) % 5} filler"))
      .toDF("src", "text")
    val a = Vocabulary.frequencyShape(docs, "src", "text").collect().toSeq
    val b = Vocabulary.frequencyShape(docs.repartition(7), "src", "text")
      .collect().toSeq
    assert(a === b)
  }
}
