package graft

import org.apache.spark.sql.functions._

import graft.functions.Porter

class PorterSpec extends SparkSpec {
  import spark.implicits._

  // canonical pairs from the Porter 1980 paper's examples and the
  // published reference vocabulary
  private val vectors = Seq(
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    "happy" -> "happi", "sky" -> "sky",
    "relational" -> "relat", "conditional" -> "condit",
    "rational" -> "ration", "valenci" -> "valenc",
    "hesitanci" -> "hesit", "digitizer" -> "digit",
    "conformabli" -> "conform", "radicalli" -> "radic",
    "differentli" -> "differ", "vileli" -> "vile",
    "analogousli" -> "analog", "vietnamization" -> "vietnam",
    "predication" -> "predic", "operator" -> "oper",
    "feudalism" -> "feudal", "decisiveness" -> "decis",
    "hopefulness" -> "hope", "callousness" -> "callous",
    "formaliti" -> "formal", "sensitiviti" -> "sensit",
    "sensibiliti" -> "sensibl",
    "triplicate" -> "triplic", "formative" -> "form",
    "formalize" -> "formal", "electriciti" -> "electr",
    "electrical" -> "electr", "hopeful" -> "hope",
    "goodness" -> "good",
    "revival" -> "reviv", "allowance" -> "allow",
    "inference" -> "infer", "airliner" -> "airlin",
    "gyroscopic" -> "gyroscop", "adjustable" -> "adjust",
    "defensible" -> "defens", "irritant" -> "irrit",
    "replacement" -> "replac", "adjustment" -> "adjust",
    "dependent" -> "depend", "adoption" -> "adopt",
    "homologou" -> "homolog", "communism" -> "commun",
    "activate" -> "activ", "angulariti" -> "angular",
    "homologous" -> "homolog", "effective" -> "effect",
    "bowdlerize" -> "bowdler",
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll",
    "generalization" -> "gener", "oscillators" -> "oscil")

  test("canonical Porter vectors stem exactly") {
    vectors.foreach { case (in, want) =>
      assert(Porter.stem(in) === want, s"stem($in)")
    }
  }

  test("non-alpha, uppercase, and short tokens pass through unchanged") {
    for (w <- Seq("a", "is", "T5", "hello!", "Paris", "3rd", ""))
      assert(Porter.stem(w) === w)
  }

  test("the native expression equals the Scala function under codegen") {
    val words = vectors.map(_._1) ++ Seq("Paris", "ab", "x9y")
    val got = words.toDF("w")
      .select(col("w"), graft.functions.Expressions.porter_stem(col("w")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    words.foreach(w => assert(got(w) === Porter.stem(w), s"expr($w)"))
    // null propagates as null
    val n = Seq(Option.empty[String]).toDF("w")
      .select(graft.functions.Expressions.porter_stem(col("w"))).collect()
    assert(n.head.isNullAt(0))
  }
}
