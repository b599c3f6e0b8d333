package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bpe, Dedup, QualityClassifier}

/** Second smoke fixture (the round-6 verdict's SmokeSpec gap): the
  * sf0.001 SmokeSpec pass executes whichever branch each size dispatch
  * picks at smoke scale — invariably the driver/literal fast path. This
  * suite runs the dispatch operators against sf0.01 with every fast-path
  * bound forced to the distributed side, so BOTH branches of every
  * dispatch analyze AND execute inside `sbt test`: environment drift in
  * a distributed branch fails here by name instead of surfacing as a
  * shrunken correctness file (the round-5 events-table lesson, applied
  * to dispatch branches).
  *
  * Dispatches covered, by bound:
  *  - `Dedup.clusterLabels`         smallGraphPairs = 0  → propagation loop
  *  - `Bpe.train`                   smallVocabWords = 0  → per-round Spark jobs
  *  - `Bpe.encodeColumn`            merges > MaxExprMerges → broadcast encoder
  *  - `QualityClassifier.scorePinned` terms > MaxLiteralTerms → broadcast scoring
  * (LanguageModel's two scoring shapes are separate public entry points,
  * both declared queries — q103/q110 — so the driver exercises them.)
  */
class DispatchSmokeSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.01"
  private def documents = spark.read.parquet(s"$sfDir/documents.parquet")

  test("dispatch smoke sf0.01: clusterLabels distributed propagation = driver union-find") {
    val fast = Dedup.nearDupClusters(documents, "doc_id", "text",
      numBands = 8, shingleSize = 3, threshold = 0.12)
    val dist = Dedup.nearDupClusters(documents, "doc_id", "text",
      numBands = 8, shingleSize = 3, threshold = 0.12, smallGraphPairs = 0L)
    val f = fast.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d = dist.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f.size == documents.count())
    assert(f == d, "distributed propagation must produce the union-find labels")
  }

  test("dispatch smoke sf0.01: BPE distributed trainer = driver trainer") {
    val sample = documents.limit(50).select("doc_id", "text")
    val fast = Bpe.train(sample, "text", numMerges = 3)
    val dist = Bpe.train(sample, "text", numMerges = 3, smallVocabWords = 0L)
    assert(fast.size == 3 && fast == dist,
      s"trainer branches diverged on real data:\n fast=$fast\n dist=$dist")
  }

  test("dispatch smoke sf0.01: BPE broadcast encoder over the full documents table") {
    // a merge list over MaxExprMerges routes encodeColumn to the
    // broadcast rank-map encoder; executing over the whole table smokes
    // the memo + broadcast machinery at real-data scale. The sf0.01
    // corpus vocabulary may exhaust its learnable pairs early, so pad
    // with inert filler merges (never matching real text) to guarantee
    // the dispatch crosses the bound — the learned head still encodes.
    val learned = Bpe.train(documents, "text", numMerges = 300)
    assert(learned.nonEmpty)
    val merges = learned ++ (0 until (Bpe.MaxExprMerges + 1)).map(i =>
      Bpe.Merge(learned.size + i, s"zz$i", s"qq$i", 1L))
    assert(merges.size > Bpe.MaxExprMerges)
    val toks = documents.select(col("doc_id"),
      Bpe.encodeColumn(col("text"), merges).as("toks"))
    val n = toks.filter(size(col("toks")) > 0).count()
    assert(n > 0, "broadcast encoder produced no tokens at sf0.01")
  }

  test("dispatch smoke sf0.01: pinned-classifier broadcast scoring over documents") {
    val real = Map("the" -> 400000L, "and" -> -150000L, "data" -> 800000L)
    val filler = (0 until 11000).map(i => s"zzneverseen$i" -> 1L).toMap
    val weights = filler ++ real
    assert(weights.size > QualityClassifier.MaxLiteralTerms)
    val scored = QualityClassifier.scorePinned(
      documents, "text", weights, microBias = 50000L)
    // the broadcast path must score REAL terms among the filler exactly
    // as the literal-map path scores the real terms alone (filler terms
    // never occur in the corpus, so the two weight tables are
    // semantically identical on this data)
    val exprRef = QualityClassifier.scorePinnedExpr(
      documents, "text", real, microBias = 50000L)
    val a = scored.select("doc_id", "quality_micro").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = exprRef.select("doc_id", "quality_micro").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "broadcast scoring diverged from the literal map on sf0.01")
    assert(a.nonEmpty && a.values.exists(_ != 50000L),
      "real terms must actually fire at sf0.01")
  }
}
