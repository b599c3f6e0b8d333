package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.hash64

/** Deterministic sampling and splitting for dataset curation — the ops a
  * training-data pipeline runs before anything expensive (enrich, embed,
  * dedup): carve out a reproducible X% slice, a train/val/test split, or
  * a per-group quota.
  *
  * All decisions are pure functions of a salted portable hash of the key
  * (`md5`-based, same formula the DuckDB oracles compute), NEVER
  * `rand()`: re-running on the same data gives the same rows regardless
  * of partitioning, task retries, or cluster size, and membership can be
  * recomputed engine-independently — the property that makes a sample
  * auditable at 100 TB. Sampling/splitting are narrow map-side filters
  * (no shuffle); the stratified quota pays one window shuffle by group,
  * which is the honest price of exact per-group counts.
  */
object Sampling {

  /** Hash in [0, 1000000) — six decimal digits of resolution. */
  private def bucket(keyCol: Column, salt: String): Column =
    pmod(hash64(concat(lit(salt), lit("|"), keyCol.cast("string"))),
      lit(1000000L))

  /** Keep ~`fraction` of rows, decided per key (0 <= fraction <= 1).
    * Same salt + key ⇒ same verdict forever (resumable pipelines keep
    * their sample across runs). */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double,
                          salt: String = "sample"): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    df.filter(bucket(col(keyCol), salt) <
      lit(math.round(fraction * 1000000).toLong))
  }

  /** Label each row with a split name by hash range — one pass, no
    * shuffle, mutually exclusive and exhaustive. `weights` need not be
    * normalized. */
  def withSplit(df: DataFrame, keyCol: String,
                weights: Seq[(String, Double)],
                salt: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    val total = weights.map(_._2).sum
    // cumulative integer thresholds over the 1e6 hash space; the last
    // split absorbs rounding so the ranges are exhaustive
    val cuts = weights.scanLeft(0L) { case (acc, (_, w)) =>
      acc + math.round(w / total * 1000000)
    }.tail.init
    val b = bucket(col(keyCol), salt)
    val expr0: Column = lit(weights.last._1)
    val labeled = weights.init.zip(cuts).foldRight(expr0) {
      case (((name, _), cut), els) => when(b < lit(cut), lit(name)).otherwise(els)
    }
    df.withColumn("split", labeled)
  }

  /** At most `quota` rows per group, chosen by hash rank — deterministic
    * and unbiased within the group (a `LIMIT` per group would be
    * partitioning-dependent). One window shuffle by `groupCol`. */
  def stratifiedQuota(df: DataFrame, groupCol: String, keyCol: String,
                      quota: Int, salt: String = "quota"): DataFrame = {
    require(quota >= 0, "quota must be >= 0")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(bucket(col(keyCol), salt), col(keyCol))
    df.withColumn("_sq_rank", row_number().over(w))
      .filter(col("_sq_rank") <= quota)
      .drop("_sq_rank")
  }
}
