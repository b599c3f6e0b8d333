package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core._
import graft.llm.MockLlmClient
import graft.run.{Enricher, PipelineBuilder}

/** Runnable user journeys, mirroring the reference's examples/ directory
  * (01_quickstart, 03_structured_output, 04_with_cost_control,
  * 08_streaming_large_files, 21_multi_row_batching) so a reference user
  * can see their workflow 1:1 in this library. Compiled with the main
  * sources so they can never rot; each runs offline on the deterministic
  * mock client:
  *
  *   sbt "runMain graft.examples.Examples [quickstart|typed|budget|batch|curate|crawl]"
  */
object Examples {

  private def session(): SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]").appName("graft-examples")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** 01_quickstart: one-liner enrich over an in-memory frame. */
  def quickstart(spark: SparkSession): Unit = {
    import spark.implicits._
    val reviews = Seq("great phone", "battery died in a day", "ok for the price")
      .toDF("review")
    val r = Enricher.enrich(reviews,
      "Classify the sentiment of: {review}", Seq("sentiment"),
      new MockLlmClient())
    r.data.show(truncate = false)
    println(s"cost=${r.metrics.cost} calls=${r.metrics.calls}")
  }

  /** 03_structured_output: typed schema, strict→fenced→brace-scan parse
    * chain (the mock's structured mode emits variably-wrapped JSON). */
  def typed(spark: SparkSession): Unit = {
    import spark.implicits._
    val df = Seq("Alice, 34, engineer", "Bob, 51, chef").toDF("bio")
    val r = PipelineBuilder()
      .withTemplate("Label this bio: {bio}")
      .withOutputColumns("label", "score")
      .withResponseFormat(ResponseFormat.Typed)
      .withTypedSchema("label STRING, score INT")
      .withClient(new MockLlmClient(structuredJson = true))
      .run(df)
    r.data.printSchema()
    r.data.show(truncate = false)
  }

  /** 04_with_cost_control: estimate first, then run under a hard budget. */
  def budget(spark: SparkSession): Unit = {
    import spark.implicits._
    val df = (1 to 1000).map(i => s"document number $i").toDF("text")
    val rates = (BigDecimal("0.5"), BigDecimal("1.5")) // per 1k tokens
    val builder = PipelineBuilder()
      .withTemplate("Summarize: {text}")
      .withOutputColumns("summary")
      .withCosts(rates._1, rates._2) // estimator rates
      .withBudget(BigDecimal("2.00"))
      .withChunkRows(200)
      .withRunDir(java.nio.file.Files
        .createTempDirectory("graft-budget-example").toString)
      // the client bills with the same rates the estimator uses
      .withClient(new MockLlmClient(inPer1k = rates._1, outPer1k = rates._2))
    val est = graft.run.CostEstimator.estimate(df, builder.build())
    println(s"estimated cost: ${est.estCost} (${est.confidence}); " +
      s"batch fit: ${est.batchFit.getOrElse("ok")}")
    // the estimate says ~$100 against a $2 cap: the run HARD-STOPS at a
    // chunk boundary; completed chunks stay in the ledger, so raising the
    // budget and re-running the same runDir resumes where it stopped
    try builder.run(df)
    catch { case e: graft.run.BudgetExceededException =>
      println(s"stopped early as designed: ${e.getMessage}")
    }
  }

  /** 21_multi_row_batching: mega-prompts, N rows per call. */
  def batch(spark: SparkSession): Unit = {
    import spark.implicits._
    val df = (1 to 100).map(i => s"headline $i").toDF("headline")
    val r = PipelineBuilder()
      .withTemplate("Tag the topic of: {headline}")
      .withOutputColumns("topic")
      .withBatchSize(25) // 100 rows -> exactly 4 LLM calls
      .withClient(new MockLlmClient())
      .run(df)
    println(s"calls=${r.metrics.calls} (expect 4) rows=${r.metrics.rows}")
  }

  /** Beyond the reference: corpus curation before any LLM spend —
    * quality-gate, dedup, decontaminate, then pack for training. */
  def curate(spark: SparkSession): Unit = {
    import graft.functions.CurationFunctions._
    import graft.functions.TextFunctions
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val w = TextFunctions.tokens(col("text"))
    val gated = docs.filter(
      dupFrac(w) <= 0.55 && meanWordLen(w).between(3.0, 6.0))
    val deduped = graft.operators.Dedup
      .dropExactDuplicates(gated, "doc_id", "text")
    val clean = deduped.withColumn("text", redactPii(col("text")))
    val packed = graft.operators.Packing.packBins(
      clean.withColumn("ntok", TextFunctions.tokenCount(col("text"))),
      "doc_id", "ntok", capacity = 512, groups = 8)
    println(s"docs=${docs.count()} gated=${gated.count()} " +
      s"deduped=${deduped.count()} bins=" +
      packed.select("pack_group", "pack_bin").distinct().count())
  }

  /** The incremental crawl journey: a standing corpus kept only ledgers
    * (content fingerprints + band signatures — never text); a new crawl
    * drops exact-seen, then near-seen, then clusters its OWN mirrors and
    * keeps one canonical doc per cluster, then cuts to a token budget.
    * Every step is ledger-sized state + map-side pruning — the shape that
    * holds when the standing corpus is 100 TB and the crawl is 1 TB. */
  def crawl(spark: SparkSession): Unit = {
    import graft.operators.{Dedup, Packing}
    import graft.functions.TextFunctions
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val standing = docs.filter(col("doc_id") % 10 === 0)
    val crawlDf = docs.filter(col("doc_id") % 10 =!= 0)
    // the two ledgers a production pipeline would persist between crawls
    val fingerprints = Dedup.exactGroups(standing, "doc_id", "text")
    val bandLedger = Dedup.minhashSignatures(standing, "doc_id", "text", 4, 3)
    val noExact = Dedup.dropSeenBefore(crawlDf, fingerprints, "text")
    val noNear = Dedup.dropNearSeenBefore(noExact, bandLedger,
      "doc_id", "text", 4, 3)
    val clusters = Dedup.nearDupClusters(noNear, "doc_id", "text", 4, 3,
      threshold = 0.12)
    val canonical = noNear.join(
      clusters.filter(col("doc_id") === col("cluster_id")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val cut = Packing.takeTokenBudget(
      canonical.withColumn("ntok", TextFunctions.tokenCount(col("text"))),
      "doc_id", "ntok", budgetPerGroup = 2000L, groups = 8)
    println(s"crawl=${crawlDf.count()} afterExact=${noExact.count()} " +
      s"afterNear=${noNear.count()} canonical=${canonical.count()} " +
      s"kept=${cut.count()} tokens=" +
      cut.agg(coalesce(sum(col("n_tokens")), lit(0L))).head().getLong(0))
  }

  /** The corpus-statistics journey the round-7 additions enable:
    * target-match with DSIR, cross-check rarity with a count–min
    * sketch, clip the length metric, re-mix sources at temperature
    * α=1/2, and serve similarity through a TRAINED coarse quantizer —
    * every model here is a broadcast-sized artifact (bucket array,
    * sketch grid, percentile cuts, k×d centroids), which is what makes
    * the journey run at scan speed on a 100 TB corpus. */
  def stats(spark: SparkSession): Unit = {
    import graft.operators.{Dsir, KMeans, Sampling, Similarity, Winsorize}
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // 1. DSIR: which docs look like the two "reference" sources?
    val dsir = Dsir.importanceWeights(docs, "doc_id", "text",
      targetPred = col("source").isin("src0", "src1"))
    // 2. winsorize the length metric before it feeds anything
    val clipped = Winsorize.winsorize(
      docs.select("doc_id", "source", "n_chars"), "source", "n_chars", 5, 95)
    // 3. temperature re-mix so small sources keep a voice
    val mixed = Sampling.temperatureMixture(docs, "source", "doc_id",
      totalRows = docs.count())
    // 4. trained-quantizer ANN: k-means centroids, unchanged IVF plan
    val model = KMeans.fit(emb, "vec_id", "embedding", k = 4, iters = 2)
    val cents = spark.createDataFrame(
      model.centroids.zipWithIndex.toSeq.map { case (c, j) =>
        (j.toLong, c.map(_.toDouble / 1e6)) }).toDF("centroid_id", "centv")
    val nn = Similarity.ivfTopKWithCentroids(
      emb.filter(col("vec_id") < 3), emb, k = 5, cents, nProbe = 2)
    println(s"dsir_kept=${dsir.filter(col("kept") === 1).count()} " +
      s"clipped=${clipped.filter(col("n_chars") =!= col("n_chars_clipped")).count()} " +
      s"mixed=${mixed.count()} neighbors=${nn.count()}")
  }

  def main(args: Array[String]): Unit = {
    val spark = session()
    try args.headOption.getOrElse("quickstart") match {
      case "quickstart" => quickstart(spark)
      case "typed"      => typed(spark)
      case "budget"     => budget(spark)
      case "batch"      => batch(spark)
      case "curate"     => curate(spark)
      case "crawl"      => crawl(spark)
      case "stats"      => stats(spark)
      case other => System.err.println(
        s"unknown example: $other (quickstart|typed|budget|batch|curate|crawl|stats)")
    } finally spark.stop()
  }
}
