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
