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
    val q = graft.SparkEntry.queries(name)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = q(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SCRATCH $name rep$i: $sec%.2f s ($n rows)")
    }
    spark.stop()
  }
}
