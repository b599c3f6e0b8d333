package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch assembly: assign documents to
  * fixed-capacity token bins ("context windows") deterministically.
  *
  * A truly optimal packing is a sequential bin-pack — inherently serial.
  * The distributed formulation used at scale (and here) is G independent
  * packers: route each doc to a pack group by a deterministic key hash,
  * then run first-fit-in-id-order WITHIN each group via a partitioned
  * window cumsum. The window partitions by group, so all G packers run
  * in parallel and no single-partition global sort exists in the plan;
  * G scales with the cluster. Per-bin waste stays within one document of
  * the serial packer's for uniform-ish documents.
  */
object Packing {

  /** Adds pack_group / n_tokens / cum_tokens / pack_bin to each row,
    * PRESERVING every input column (the packed rows are usually
    * materialized into training sequences right after, so dropping the
    * payload would force a join back on id). `idCol` must be numeric —
    * the group route is `id % groups`; hash string ids first.
    * Bin rule: start-offset binning — a doc starting before a capacity
    * boundary joins that bin (docs longer than `capacity` occupy a bin
    * alone, fill > 1). Deterministic in (idCol % groups, idCol) order. */
  def packBins(df: DataFrame, idCol: String, tokenCol: String,
      capacity: Int, groups: Int): DataFrame = {
    val w = Window.partitionBy(col("pack_group")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("pack_group", col(idCol) % groups)
      .withColumn("n_tokens", col(tokenCol))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("pack_bin",
        floor((col("cum_tokens") - col("n_tokens")) / capacity))
  }

  /** Per-bin packing report: docs per bin, token total, fill fraction. */
  def binStats(packed: DataFrame, capacity: Int): DataFrame =
    packed.groupBy("pack_group", "pack_bin").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).as("bin_tokens"),
      round(sum(col("n_tokens")).cast("double") / capacity, 6).as("fill"))
}
