package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range (interval) join — points joined to the intervals that
  * contain them. Spark's native plan for an inequality-only join is a
  * broadcast-nested-loop / cartesian (every point against every
  * interval — a job-killer once either side is large); re-expressed as
  * an EQUI-join on time buckets it shuffles/broadcasts by key like any
  * hash join.
  *
  * Mechanics: each interval replicates to `ceil(len/bucket)+1` bucket
  * keys, each point lands in exactly ONE bucket — so a (point, interval)
  * pair can meet at most once and no post-join dedup is needed (the
  * usual flaw in hand-rolled bucket joins duplicates pairs by exploding
  * both sides). Pick `bucketSeconds` near the typical interval length:
  * interval replication stays O(1) while bucket selectivity stays high.
  *
  * (Beyond the reference — SURVEY lists interval semantics under the
  * beyond-ref event-time surface, like AsOfJoin; same design family as
  * the LSH bucket joins: replicate the small structure, key the big
  * scan once.)
  */
object RangeJoin {

  /** Join `left` rows (point `tsCol`) to `right` rows (interval
    * `[loCol, hiCol)`), optionally also matching `extraKeys` equi-columns
    * (e.g. a tenant/user id, which further sharpens the shuffle key). */
  def bucketed(left: DataFrame, tsCol: String,
               right: DataFrame, loCol: String, hiCol: String,
               bucketSeconds: Long,
               extraKeys: Seq[String] = Nil): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val b = lit(bucketSeconds)
    val lb = left.withColumn("_rj_bucket",
      floor(unix_timestamp(col(tsCol)) / b))
    val rb = right.withColumn("_rj_bucket",
      explode(sequence(
        floor(unix_timestamp(col(loCol)) / b),
        floor(unix_timestamp(col(hiCol)) / b))))
    lb.join(rb, Seq("_rj_bucket") ++ extraKeys)
      .filter(col(tsCol) >= col(loCol) && col(tsCol) < col(hiCol))
      .drop("_rj_bucket")
  }
}
