package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{KMeans, Similarity}

/** ANN recall probe (not part of the driver contract): recall@k of each
  * cascade against [[Similarity.bruteForceTopK]] over the given dir's
  * embeddings — the declared-query settings (q109/q111/q112/q131) plus
  * production-ish sqrt-rule operating points, so the recall/cost trade
  * is a RECORDED fact (BENCH_NOTES table), not a spec threshold.
  *
  *   runMain graft.tools.RecallProbe <sfDir> [nQueries=50] [k=10]
  *
  * Prints one line per (cascade, setting): name, recall@k, seconds.
  * RecallSpec pins per-cascade floors at the declared settings. */
object RecallProbe {

  /** Mean over queries of |predicted ∩ true-top-k| / |true-top-k|. */
  def recallOf(pred: DataFrame, truth: Map[Long, Set[Long]]): Double = {
    val by = pred.select(col("query_id"), col("neighbor_id")).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val per = truth.toSeq.map { case (q, t) =>
      if (t.isEmpty) 1.0
      else (by.getOrElse(q, Set.empty[Long]) intersect t).size.toDouble / t.size
    }
    per.sum / per.size
  }

  def truthOf(queries: DataFrame, corpus: DataFrame, k: Int): Map[Long, Set[Long]] =
    Similarity.bruteForceTopK(queries, corpus, k)
      .select(col("query_id"), col("neighbor_id")).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nQ = if (args.length > 1) args(1).toInt else 50
    val k = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < nQ)
    val n = emb.count()
    val truth = truthOf(queries, emb, k)
    val autoC = Similarity.autoCentroids(n)
    val autoP = math.max(1, math.ceil(math.sqrt(autoC.toDouble)).toInt)
    println(s"corpus=$n queries=$nQ k=$k autoCentroids=$autoC autoProbe=$autoP")

    def run(name: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = recallOf(f, truth)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"RECALL $name%-40s recall@$k=$r%.3f  $sec%.1f s")
    }

    // declared-query settings (the oracle-pinned shapes)
    run("ivf_sq8 c=8 p=3 r=4 (q109)") {
      Similarity.ivfInt8RefineTopK(queries, emb, k,
        numCentroids = 8, nProbe = 3, refine = 4) }
    val cb = Similarity.pqStrideCodebooks(emb, 4, 8)
    run("pq_adc m=4 k=8 r=4 (q111)") {
      Similarity.pqAdcRefineTopK(queries, emb, k, cb, refine = 4) }
    run("ivf_pq c=8 p=3 m=4 k=8 r=4 (q112)") {
      Similarity.ivfPqRefineTopK(queries, emb, k, cb,
        numCentroids = 8, nProbe = 3, refine = 4) }

    // production PQ shape: Lloyd-trained codebooks, 8 subspaces x 64
    // centroids, deeper refine — what a deployment would run instead of
    // the oracle-replayable m=4/k=8 toy codebooks
    val cbT = Similarity.pqTrain(emb, 8, 64, iters = 5,
      sampleCap = math.min(n, 100000L).toInt)
    run("pq_adc trained m=8 k=64 r=8") {
      Similarity.pqAdcRefineTopK(queries, emb, k, cbT, refine = 8) }
    run("ivf_pq trained m=8 k=64 c=8 p=3 r=8") {
      Similarity.ivfPqRefineTopK(queries, emb, k, cbT,
        numCentroids = 8, nProbe = 3, refine = 8) }

    // production-ish sqrt-rule points: recall as nProbe sweeps
    for (p <- Seq(math.max(2, autoP / 3), autoP, autoP * 2)) {
      run(s"ivf_sq8 c=$autoC p=$p r=4") {
        Similarity.ivfInt8RefineTopK(queries, emb, k,
          numCentroids = autoC, nProbe = p, refine = 4) }
    }

    // trained coarse quantizer (q131 settings + a production point)
    def trained(kk: Int): DataFrame = {
      val m = KMeans.fit(emb, "vec_id", "embedding", k = kk, iters = 2)
      spark.createDataFrame(m.centroids.zipWithIndex.toSeq.map {
        case (c, j) => (j.toLong, c.map(_.toDouble / 1e6)) })
        .toDF("centroid_id", "centv")
    }
    val t8 = trained(8)
    run("ivf_trained c=8 p=2 (q131)") {
      Similarity.ivfTopKWithCentroids(queries, emb, k, t8, nProbe = 2) }
    val tAuto = trained(autoC)
    run(s"ivf_trained c=$autoC p=$autoP") {
      Similarity.ivfTopKWithCentroids(queries, emb, k, tAuto, nProbe = autoP) }

    spark.stop()
  }
}
