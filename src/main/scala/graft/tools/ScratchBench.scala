package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timing harness (not part of the driver contract):
  *   runMain graft.tools.ScratchBench <sfDir> <queryName> [reps]
  */
object ScratchBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .appName("graft-scratch")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    // ad-hoc component probes not in the driver contract
    val extras: Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame] = Map(
      "band_only" -> { (s, d) =>
        val docs = graft.queries.Tables.tp(s, d, "documents")
        val sigs = graft.operators.Dedup
          .minhashSignatures(docs, "doc_id", "text", 8, 3)
        val exploded = sigs.select(col("doc_id").as("id"),
          posexplode(array((0 until 8).map(b => col(s"band_$b")): _*))
            .as(Seq("band_idx", "band_val")))
        val qbands = exploded.filter(col("id") < 5)
          .select(col("id").as("query_id"), col("band_idx"), col("band_val"))
        broadcast(qbands).join(exploded, Seq("band_idx", "band_val"))
          .groupBy(col("query_id"), col("id"))
          .agg(count(lit(1)).as("band_score"))
      },
      "lex20_only" -> { (s, d) =>
        val docs = graft.queries.Tables.tp(s, d, "documents")
        val idx = graft.rag.SparseIndex.build(docs, "doc_id", "text")
        graft.rag.SparseIndex.search(idx,
          docs.filter(col("doc_id") < 5)
            .select(col("doc_id").as("qid"), col("text")),
          "qid", "text", 20)
      })
    val q = extras.getOrElse(name, graft.SparkEntry.queries(name))
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = q(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SCRATCH $name rep$i: $sec%.2f s ($n rows)")
    }
    spark.stop()
  }
}
