package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) join support — the zero-shuffle path for big
  * fact-to-fact joins that repeat across runs. Writing both sides
  * bucketed AND sorted by the join key lets every subsequent equi-join
  * run as a sort-merge join with NO exchange on either side: at 100 TB
  * the shuffle that usually dominates such joins is paid once at write
  * time and amortized over every downstream join/aggregation on the
  * same key. (Spark-native replacement for the repartition-per-query
  * pattern; complements broadcast for small dims and salting for skew.)
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted external table at `path`. The table
    * must be read back via the catalog ([[table]]) — plain
    * `spark.read.parquet(path)` loses bucket metadata. */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
                    keyCol: String, numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, keyCol)
      .sortBy(keyCol)
      .saveAsTable(tableName)

  def table(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)
}
