package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit helper (not part of the driver contract):
  *   runMain graft.tools.ExplainArm <sfDir> <q1,q2,...>
  * Prints each named query's formatted physical plan plus a one-line
  * verdict on the two structural anti-patterns the PlanSpec discipline
  * bans (single-partition exchanges outside the documented bounded
  * windows, cartesian products outside 1-row metric frames).
  */
object ExplainArm {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.split(",").foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString()
      val single = plan.linesIterator
        .count(_.contains("Exchange SinglePartition"))
      val cartesian = plan.linesIterator
        .count(l => l.contains("CartesianProduct") ||
          l.contains("BroadcastNestedLoopJoin"))
      println(s"=== $name: singlePartitionExchanges=$single " +
        s"nestedLoopJoins=$cartesian")
      println(plan)
    }
  }
}
