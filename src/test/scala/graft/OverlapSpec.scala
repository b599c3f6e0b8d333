package graft

import org.apache.spark.sql.functions._

import graft.operators.Overlap

class OverlapSpec extends SparkSpec {
  import spark.implicits._

  private def score(cand: String, ref: String): (Double, Double, Double, Double) = {
    val df = Seq((cand, ref)).toDF("c", "r")
      .select(Overlap.bleu2(
        graft.functions.TextFunctions.tokens(col("c")),
        graft.functions.TextFunctions.tokens(col("r"))): _*)
    val row = df.collect().head
    (row.getDouble(0), row.getDouble(1), row.getDouble(2), row.getDouble(3))
  }

  test("identical text scores exactly 1.0") {
    assert(score("the cat sat on the mat", "the cat sat on the mat") ===
      ((1.0, 1.0, 1.0, 1.0)))
  }

  test("clipping: repeated candidate grams cannot overclaim") {
    // Papineni's canonical degenerate case: "the the the the" vs a
    // reference with ONE 'the' -> p1 = 1/4, no bigram overlap -> bleu 0
    val (p1, p2, _, bleu) = score("the the the the", "a the b c")
    assert(p1 === 0.25 && p2 === 0.0 && bleu === 0.0)
  }

  test("hand-computed: partial overlap with short candidate") {
    // cand: "a b c" (3 unigrams, 2 bigrams: "a b","b c")
    // ref:  "a b x y" (4 tokens)
    // p1 = 2/3 (a,b match; c doesn't); p2 = 1/2 ("a b" matches)
    // bp = exp(1 - 4/3); bleu = bp * exp((ln(2/3)+ln(1/2))/2)
    val (p1, p2, bp, bleu) = score("a b c", "a b x y")
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(p1 === r6(2.0 / 3))
    assert(p2 === 0.5)
    assert(bp === r6(math.exp(1 - 4.0 / 3)))
    assert(bleu === r6(math.exp(1 - 4.0 / 3) *
      math.exp((math.log(2.0 / 3) + math.log(0.5)) / 2)))
  }

  test("long candidate takes no brevity penalty") {
    val (_, _, bp, _) = score("a b c d e f", "a b c")
    assert(bp === 1.0)
  }

  test("native clipped-count kernel equals the declarative chain") {
    val rnd = new scala.util.Random(13)
    val alpha = Vector("a", "b", "c", "dd", "e")
    val rows = (0 until 300).map { _ =>
      (Seq.fill(rnd.nextInt(12))(alpha(rnd.nextInt(alpha.size))),
        Seq.fill(rnd.nextInt(12))(alpha(rnd.nextInt(alpha.size))))
    }
    val df = rows.toDF("a", "b").select(
      graft.functions.Expressions.clipped_count(col("a"), col("b"))
        .as("native"),
      graft.operators.Overlap.clippedDeclarative(col("a"), col("b"))
        .as("decl"))
    assert(df.filter(col("native") =!= col("decl")).count() === 0)
  }

  test("ROUGE: hand-computed recall/F1, symmetry of the overlap") {
    def rougeOf(c: String, r: String): (Double, Double, Double, Double) = {
      val row = Seq((c, r)).toDF("c", "r").select(Overlap.rouge2(
          graft.functions.TextFunctions.tokens(col("c")),
          graft.functions.TextFunctions.tokens(col("r"))): _*)
        .head()
      (row.getDouble(0), row.getDouble(1), row.getDouble(2), row.getDouble(3))
    }
    // cand "a b c", ref "a b d e": ov1 = 2 → rec 2/4, prec 2/3, F1 4/7
    // bigrams: cand {ab, bc}, ref {ab, bd, de}: ov2 = 1 → rec 1/3,
    // prec 1/2, F1 2/5
    val (r1, f1, r2, f2) = rougeOf("a b c", "a b d e")
    def rnd(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r1 === rnd(0.5) && f1 === rnd(2.0 * (2.0 / 3) * 0.5 / (2.0 / 3 + 0.5)))
    assert(r2 === rnd(1.0 / 3) &&
      f2 === rnd(2.0 * 0.5 * (1.0 / 3) / (0.5 + 1.0 / 3)))
    // identical texts: recall = F1 = 1 at both orders
    assert(rougeOf("x y z", "x y z") === ((1.0, 1.0, 1.0, 1.0)))
    // empty/degenerate: zero, never NaN
    val z = rougeOf("", "a b")
    assert(z === ((0.0, 0.0, 0.0, 0.0)))
    assert(rougeOf("q", "q") === ((1.0, 1.0, 0.0, 0.0))) // no bigrams
  }

  test("degenerate rows score zero, not NaN") {
    assert(score("", "a b")._4 === 0.0)
    assert(score("a", "a")._4 === 0.0)       // under 2 tokens: no bigram
    assert(score("x y z", "p q r")._4 === 0.0) // fully disjoint
    val all = Seq(("", ""), ("a", ""), ("", "b")).toDF("c", "r")
      .select(Overlap.bleu2(
        graft.functions.TextFunctions.tokens(col("c")),
        graft.functions.TextFunctions.tokens(col("r"))): _*)
      .collect()
    all.foreach { row =>
      (0 until 4).foreach(i => assert(!row.getDouble(i).isNaN))
    }
  }
}
