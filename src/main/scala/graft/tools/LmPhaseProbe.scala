package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary phase-timing probe for perplexityBuckets under the Bench
  * session conf. runMain graft.operators.LmPhaseProbe <sfDir>
  */
object LmPhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .appName("lm-phase-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("PROBE_MPB", "8m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (rep <- 1 to 2) {
      val df = graft.queries.Tables.tp(spark, dir, "documents")
      val scored = t(s"rep$rep score") {
        LanguageModel.bigramBits(df, "doc_id", "text")
          .filter(col("lm_bits").isNotNull)
      }
      val joined = df.select(col("doc_id"), col("lang"))
        .join(scored.select(col("doc_id"), col("lm_bits")), Seq("doc_id"))
      val g =
        if (sys.env.contains("PROBE_PERSIST")) t(s"rep$rep persist") {
          val p = joined.persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          p.count()
          p
        }
        else t(s"rep$rep stage") { graft.ops.Parallelism.stage(joined) }
      val hist = g.groupBy(col("lang"), col("lm_bits"))
        .agg(count(lit(1)).as("__graft_c"))
      val cuts = t(s"rep$rep cuts") {
        RankCuts.rankValues(hist, Seq("lang"), "lm_bits", "__graft_c",
          Seq("__graft_t1" -> RankCuts.ceilRank(1, 3),
            "__graft_t2" -> RankCuts.ceilRank(2, 3)))
      }
      t(s"rep$rep join_out") {
        g.join(broadcast(cuts), Seq("lang"))
          .withColumn("bucket",
            when(col("lm_bits") <= col("__graft_t1"), "head")
              .when(col("lm_bits") <= col("__graft_t2"), "middle")
              .otherwise("tail"))
          .select(col("doc_id"), col("lang"), col("lm_bits"), col("bucket"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
