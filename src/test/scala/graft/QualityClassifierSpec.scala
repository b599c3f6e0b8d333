package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityClassifier

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) = (0 until n).map { i =>
    if (i % 2 == 0)
      (i.toLong, s"the history of science volume $i covers early astronomy", 1.0)
    else
      (i.toLong, s"buy cheap pills now $i click here winner winner", 0.0)
  }.toDF("doc_id", "text", "label")

  test("separable classes: trained filter keeps the quality head") {
    val df = corpus(200)
    val m = QualityClassifier.train(df, "text", "label",
      numFeatures = 1 << 14)
    val scored = QualityClassifier.score(df, "text", m)
    assert(scored.columns.contains("quality_prob"))
    assert(scored.columns.toSet.intersect(
      Set("prediction", "rawPrediction", "__graft_prob")).isEmpty)
    val byLabel = scored.groupBy("label")
      .agg(min("quality_prob").as("lo"), max("quality_prob").as("hi"))
      .as[(Double, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(byLabel(1.0)._1 > 0.9, s"quality docs must score high: $byLabel")
    assert(byLabel(0.0)._2 < 0.1, s"junk docs must score low: $byLabel")
    val kept = QualityClassifier.filterByProb(df, "text", m, minProb = 0.5)
    assert(kept.count() == 100 &&
      kept.filter(col("label") === 0.0).count() == 0)
    assert(kept.columns.sameElements(df.columns), "filter must be transparent")
  }

  test("unseen docs score by phrasing similarity (generalization)") {
    val m = QualityClassifier.train(corpus(200), "text", "label",
      numFeatures = 1 << 14)
    val unseen = Seq(
      (900L, "the science of early history covers astronomy"),
      (901L, "click here cheap winner pills")).toDF("doc_id", "text")
    val s = QualityClassifier.score(unseen, "text", m)
      .orderBy("doc_id").select("quality_prob").as[Double].collect()
    assert(s(0) > 0.5 && s(1) < 0.5, s"generalization failed: ${s.toSeq}")
  }

  test("feature terms: uni+bigram map, empty and single-token safe") {
    val t = Seq((1L, "a b c"), (2L, "solo"), (3L, ""))
      .toDF("doc_id", "text")
      .select(QualityClassifier.terms(col("text")).as("t"))
      .as[Seq[String]].collect()
    assert(t(0) == Seq("a", "b", "c", "a b", "b c"))
    assert(t(1) == Seq("solo"))
    assert(t(2) == Seq.empty)
  }

  test("pinned scoring: exact integer dot product, bigram hits, bias-only miss") {
    val w = Map("good" -> 500000L, "bad" -> -300000L, "very good" -> 250000L)
    val df = Seq(
      (1L, "good very good"),    // good + very + good + "good very" + "very good"
      (2L, "bad"),
      (3L, "nothing matches")).toDF("doc_id", "text")
    val s = QualityClassifier.scorePinned(df, "text", w, microBias = 100000L)
      .orderBy("doc_id")
      .select("quality_micro", "quality_prob")
      .as[(Long, Double)].collect()
    // doc 1: 2*good + "very good" + bias = 1000000 + 250000 + 100000
    assert(s(0)._1 == 1350000L)
    assert(s(1)._1 == -200000L)
    assert(s(2)._1 == 100000L, "unmatched terms contribute exactly zero")
    // sigmoid of the micro total, one float op at the end
    assert(math.abs(s(0)._2 - 1.0 / (1.0 + math.exp(-1.35))) < 1e-12)
    assert(s(1)._2 < 0.5 && s(2)._2 > 0.5)
  }

  test("pinned scoring: literal-map and broadcast paths agree on the same weights") {
    val w = Map("good" -> 500000L, "bad" -> -300000L, "very good" -> 250000L,
      "science" -> 700000L, "click here" -> -900000L)
    val df = Seq(
      (1L, "good very good science"), (2L, "bad click here"),
      (3L, "nothing matches"), (4L, ""),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    def run(f: => org.apache.spark.sql.DataFrame) = f.orderBy("doc_id")
      .select("quality_micro", "quality_prob")
      .as[(Option[Long], Option[Double])].collect().toSeq
    val expr = run(QualityClassifier.scorePinnedExpr(df, "text", w, 100000L))
    val bcast = run(QualityClassifier.scorePinnedBroadcast(df, "text", w, 100000L))
    assert(expr == bcast, s"paths diverged:\n expr=$expr\n bcast=$bcast")
    // null text scores null on BOTH paths (the dispatch must not change
    // null-row output when the export crosses MaxLiteralTerms)
    assert(expr.last._1.isEmpty && expr.last._2.isEmpty)
  }

  test("a 100k-term export scores through the broadcast dispatch") {
    // the literal-map expression cannot hold a production-size export;
    // the dispatcher must route it to the broadcast path and score the
    // real terms among the filler identically
    val filler = (0 until 100000).map(i => s"zzfiller$i" -> 1L).toMap
    val w = filler ++ Map("good" -> 500000L, "bad" -> -300000L)
    assert(w.size > QualityClassifier.MaxLiteralTerms)
    val s = QualityClassifier.scorePinned(
      Seq((1L, "good good bad"), (2L, "zzfiller7")).toDF("doc_id", "text"),
      "text", w, microBias = 0L)
      .orderBy("doc_id").select("quality_micro").as[Long].collect()
    assert(s(0) == 2 * 500000L - 300000L)
    assert(s(1) == 1L)
  }
}
