package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver-provided testdata dirs. */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Parallelism-ensured variant for CPU-heavy per-row queries: small
    * single-file tables otherwise run hash/shingle kernels on one core. */
  def tp(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.ops.Parallelism.ensure(t(spark, dir, name))

  /** The events table carries TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; read nanos as long and truncate to microseconds
    * (`div 1000` = floor), exactly DuckDB's ns→us conversion. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }
}
