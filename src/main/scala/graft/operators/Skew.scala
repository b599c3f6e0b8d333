package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key joins — the manual complement to AQE's
  * skew-join splitting, for when one build-side key is so hot that a single
  * reducer would own it (classic 100 TB failure mode).
  *
  * Salted broadcast-free join: the probe side gets a random-ish salt in
  * [0, salts) derived deterministically from the row (hash of all columns —
  * no RNG, so retries/resumes see identical assignments); the build side is
  * exploded `salts`× with every salt value. The join key becomes
  * (key, salt), spreading each hot key over `salts` reducers. Build-side
  * duplication costs salts× its size — use for small-to-medium build sides
  * with hot keys; for big-big skew prefer AQE skew handling.
  */
object Skew {

  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salts > 1, "salts must be > 1")
    val saltedProbe = probe.withColumn("_salt",
      pmod(hash(probe.columns.map(col): _*), lit(salts)))
    val saltedBuild = build
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedProbe.join(saltedBuild, Seq(key, "_salt"), joinType)
      .drop("_salt")
  }

  /** Drop every row whose `keys` bucket holds more than `maxBucketSize`
    * rows — the degenerate-bucket guard of the LSH pair operators —
    * WITHOUT routing hot buckets through single reducers.
    *
    * A count-over-window formulation (partitionBy(keys)) shuffles every
    * row of a hot bucket to ONE reducer just to count-and-drop it: a
    * boilerplate-heavy crawl where millions of docs share one band value
    * serializes that whole bucket through one task. Here the census is a
    * groupBy (partial aggregation pre-merges a hot key to one row per map
    * partition), and the hot-bucket list — structurally at most
    * rows/maxBucketSize entries and in practice a handful of boilerplate
    * values — drops its rows via broadcast anti-join MAP-SIDE: the input
    * never shuffles for capping at all. The census `count()` is a driver
    * action (precedent: BloomBuild, ivfTopK) that doubles as the
    * materializer for `df`'s cache when the caller persists it. A corpus
    * so degenerate the hot list outgrows a broadcast (> 4M hot buckets)
    * falls back to [[saltedJoin]]-style anti-join: the hot list
    * replicates `salts`× so a hot key's rows spread over `salts` reducers
    * instead of serializing on one.
    *
    * `df` is consumed twice (census + anti-join) — callers should stage
    * it (localCheckpoint/persist) first if upstream is expensive. The
    * census runs ONCE: the hot list is collected (it is broadcast-bound
    * by construction) and re-enters the plan as a literal relation, so
    * the anti-join does not replay the aggregation. */
  def dropHotBuckets(df: DataFrame, keys: Seq[String], maxBucketSize: Int,
                     salts: Int = 16,
                     broadcastableHot: Int = 4000000): DataFrame = {
    val keyCols = keys.map(col)
    val hot = df.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("_bsz"))
      .filter(col("_bsz") > maxBucketSize)
      .select(keyCols: _*)
    // limit(bound+1): the overflow row, if any, routes to the salted path
    // without ever pulling an unbounded list onto the driver
    val hotRows = hot.limit(broadcastableHot + 1).collect()
    if (hotRows.length <= broadcastableHot) {
      val local = df.sparkSession.createDataFrame(
        java.util.Arrays.asList(hotRows: _*), hot.schema)
      df.join(broadcast(local), keys, "left_anti")
    } else {
      // degenerate corpus: hot list itself is huge; spread each hot key
      // over `salts` reducers (the census re-runs lazily here — this
      // path trades one extra aggregation for never broadcasting > bound)
      val saltedDf = df.withColumn("_salt",
        pmod(hash(df.columns.map(col): _*), lit(salts)))
      val saltedHot = hot.withColumn("_salt",
        explode(sequence(lit(0), lit(salts - 1))))
      saltedDf.join(saltedHot, keys :+ "_salt", "left_anti").drop("_salt")
    }
  }
}
