package graft.ops

import org.apache.spark.sql.DataFrame

/** CPU-parallelism guard for compute-heavy per-row operators.
  *
  * A small parquet file arrives as ONE input split, so hash/shingle/TF-IDF
  * kernels would run on one core no matter how many the cluster has. When
  * the incoming partition count is well below the session's default
  * parallelism, repartition up — the shuffle moves only the (small) input,
  * the per-row compute then uses every core. At 100 TB inputs already carry
  * thousands of splits and this is a no-op.
  */
object Parallelism {
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // inputFiles is a metadata lookup; the file count bounds the scan's
    // split count from below, so a many-file (at-scale) frame skips the
    // expensive plan->RDD conversion entirely. Only when files are few (or
    // the lookup fails — non-file-backed plans) can the scan be
    // under-split — then check the real partition count (a single LARGE
    // file still splits by maxPartitionBytes).
    val files: Option[Int] =
      try Some(df.inputFiles.length) catch { case _: Throwable => None }
    if (files.exists(_.toLong * 2 >= target)) df
    else if (df.rdd.getNumPartitions * 2 < target) df.repartition(target)
    else df
  }
}
