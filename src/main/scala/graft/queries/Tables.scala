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

  /** The events table carries TIMESTAMP(NANOS). How Spark resolves that
    * physical type varies by release: older 4.x only reads it with
    * `nanosAsLong` (→ LongType, we truncate ns→us ourselves), while
    * 4.1.2+ resolves it natively as TIMESTAMP_NTZ (already truncated to
    * micros by the reader). Branch on the *resolved* schema so both
    * shapes normalize to a session-TZ TimestampType with DuckDB's ns→us
    * floor semantics (session TZ is UTC, so the NTZ→TZ cast is
    * value-preserving). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** Normalize the resolved `ts` column to a session-TZ TimestampType with
    * ns→us floor semantics, whichever shape the reader produced. Shared by
    * the batch reader above and the file-stream sources (whose explicit
    * schema is taken from the batch reader, so it drifts identically). */
  def normalizeTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
}
