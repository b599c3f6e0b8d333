package graft.operators

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Model-based document quality filtering — the fastText-style classifier
  * step of the GPT-3 / LLaMA / CCNet pipelines: train a linear classifier
  * to recognize "reference-quality" text (positives = a trusted corpus,
  * negatives = raw crawl), score every crawl document, keep the
  * high-probability head. Here it is the Spark-native formulation:
  * hashed bag of word uni+bigrams (fastText's feature map) into
  * `HashingTF`, `LogisticRegression` on top, scoring as a vectorized
  * model transform.
  *
  * Scale shape: feature hashing is a pure per-row map (no vocabulary
  * build, no shuffle — the reason fastText-style hashing beats TF-IDF
  * vocabularies at corpus scale); L-BFGS training aggregates gradients
  * tree-wise per iteration over the (usually small, labeled) training
  * frame; scoring the 100 TB corpus is one map over hashed features with
  * the coefficient vector broadcast by the model transform.
  *
  * Determinism note: gradient treeAggregate sums floats, so TRAINED
  * coefficients can wiggle at machine precision across partitionings —
  * training is verified behaviorally (QualityClassifierSpec). SCORING
  * against exported weights is deterministic: [[scorePinned]] uses
  * integer micro-weights so the declared query (q105) hash-matches a
  * DuckDB oracle exactly. */
object QualityClassifier {

  final case class QualityModel(lr: LogisticRegressionModel, numFeatures: Int)

  /** Word uni+bigram terms, the fastText feature recipe. */
  private[graft] def terms(textCol: Column): Column = {
    val w = TextFunctions.tokens(lower(textCol))
    // native one-pass shingle kernel — identical "w1 w2" strings to the
    // zip_with-of-two-slices form (see TextFunctions.shingles); empty
    // for < 2 tokens either way, null text -> null terms -> null score
    // (unchanged: tokens(null) is null and concat propagates)
    concat(w, graft.functions.Expressions.word_shingles(w, 2))
  }

  /** Train on a labeled frame: `labelCol` ∈ {0.0, 1.0} (1 = quality). */
  def train(labeled: DataFrame, textCol: String, labelCol: String,
      numFeatures: Int = 1 << 18, regParam: Double = 1e-4): QualityModel = {
    val tf = new HashingTF().setInputCol("__graft_terms")
      .setOutputCol("__graft_features").setNumFeatures(numFeatures)
    val feats = tf.transform(
      labeled.withColumn("__graft_terms", terms(col(textCol))))
    val lr = new LogisticRegression()
      .setFeaturesCol("__graft_features").setLabelCol(labelCol)
      .setRegParam(regParam).setMaxIter(100)
    QualityModel(lr.fit(feats), numFeatures)
  }

  /** Score: adds `quality_prob` = P(label=1 | text) per row. */
  def score(df: DataFrame, textCol: String, m: QualityModel): DataFrame = {
    val tf = new HashingTF().setInputCol("__graft_terms")
      .setOutputCol("__graft_features").setNumFeatures(m.numFeatures)
    m.lr.setProbabilityCol("__graft_prob")
      .transform(tf.transform(df.withColumn("__graft_terms", terms(col(textCol)))))
      .withColumn("quality_prob", element_at(
        org.apache.spark.ml.functions.vector_to_array(col("__graft_prob")), 2))
      .drop("__graft_terms", "__graft_features", "__graft_prob",
        m.lr.getRawPredictionCol, m.lr.getPredictionCol)
  }

  /** Keep documents the classifier rates at or above `minProb` —
    * GPT-3-style head selection (their pipeline additionally re-admits a
    * Pareto-sampled tail; that is a [[Sampling]] composition). */
  def filterByProb(df: DataFrame, textCol: String, m: QualityModel,
      minProb: Double): DataFrame =
    score(df, textCol, m).filter(col("quality_prob") >= minProb)
      .drop("quality_prob")

  /** Score with a PINNED linear model — the production corpus-scoring
    * shape: a classifier trained offline exports its (pruned) term
    * weights, and scoring is a pure per-row map with the weight table
    * broadcast, no vocabulary shuffle, no model object.
    *
    * Weights are integer MICRO-units (1e-6) so the per-document dot
    * product accumulates in exact integer math — order-independent,
    * partitioning-independent, and bit-replayable in SQL (the same trick
    * as [[LanguageModel.bigramBits]]); the one float op (sigmoid) happens
    * once on the final integer total. Adds `quality_micro` (the integer
    * dot product incl. bias) and `quality_prob` = sigmoid(micro / 1e6).
    *
    * Dispatches on export size ([[Bpe.encodeColumn]] discipline): the
    * literal map stays codegen-friendly up to [[MaxLiteralTerms]]; a
    * full 100k-term export ships once per executor as a broadcast and
    * scores through the same per-row integer accumulation — same
    * semantics (spec-proven equal), still no corpus shuffle, and no
    * plan-size blowup. */
  def scorePinned(df: DataFrame, textCol: String,
      microWeights: Map[String, Long], microBias: Long = 0L): DataFrame =
    if (microWeights.size <= MaxLiteralTerms)
      scorePinnedExpr(df, textCol, microWeights, microBias)
    else scorePinnedBroadcast(df, textCol, microWeights, microBias)

  /** Above this many exported terms, [[scorePinned]] leaves the baked
    * literal-map expression (whose plan grows with the table and stops
    * being codegen-friendly) for the broadcast path. */
  val MaxLiteralTerms = 10000

  /** Literal-map scoring: the weight table is baked into the expression
    * tree as a codegen'd map literal — zero serialization, whole-stage
    * codegen, bounded to ≤ [[MaxLiteralTerms]] terms. */
  def scorePinnedExpr(df: DataFrame, textCol: String,
      microWeights: Map[String, Long], microBias: Long = 0L): DataFrame = {
    val m = map(microWeights.toSeq.flatMap {
      case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val dot = aggregate(terms(col(textCol)), lit(0L),
      (acc, t) => acc + coalesce(element_at(m, t), lit(0L))) + lit(microBias)
    withProb(df.withColumn("quality_micro", dot))
  }

  /** Broadcast scoring — the production 100k-term shape: the exported
    * weight table ships to executors ONCE as a broadcast (one copy per
    * executor, not per task), and each document's integer dot product
    * accumulates map-side over the same [[terms]] recipe. Strictly no
    * exchange at all — beating even a broadcast JOIN on exploded terms,
    * which would still re-aggregate per-document partials across an
    * id-keyed exchange. Null text scores null on both paths. */
  def scorePinnedBroadcast(df: DataFrame, textCol: String,
      microWeights: Map[String, Long], microBias: Long = 0L): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(microWeights)
    val dot = udf((ts: Seq[String]) =>
      if (ts == null) null
      else {
        val m = bc.value
        var s = microBias
        ts.foreach(t => s += m.getOrElse(t, 0L))
        java.lang.Long.valueOf(s)
      })
    withProb(df.withColumn("quality_micro", dot(terms(col(textCol)))))
  }

  /** The single float op both pinned paths share: one sigmoid on the
    * exact integer total. */
  private def withProb(scored: DataFrame): DataFrame =
    scored.withColumn("quality_prob",
      lit(1.0) / (lit(1.0) +
        exp(-col("quality_micro").cast("double") / lit(1e6))))
}
