package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** EXACT heavy hitters in bounded memory — Misra–Gries (1982) candidate
  * pruning plus one exact confirmation pass. Output: every item whose
  * count strictly exceeds N/k, with its EXACT count — deterministic
  * regardless of partitioning, unlike a sketch estimate.
  *
  * Why not just `groupBy(item).count().filter(...)`? At 100 TB that
  * shuffles the full distinct-key census (billions of keys) to find a
  * handful of rows. And why not the CMS route ([[Sketches]], q125)?
  * CMS gives OVERestimates — false positives survive. This operator is
  * the third point in the trade space: exact answers, bounded memory,
  * two scans:
  *
  *  1. CANDIDATES — per-partition Misra–Gries with k counters (the one
  *     genuinely imperative kernel here, hence `mapPartitions`: the
  *     decrement-all step has no declarative form). MG guarantees any
  *     item with partition count > n_p/(k+1) survives its partition;
  *     by pigeonhole an item with global count > N/k has some partition
  *     where c_p > n_p/k > n_p/(k+1), so the union of survivors is a
  *     SUPERSET of the true heavy hitters. ≤ partitions·k candidates,
  *     k counters of memory per task, no shuffle (the distinct() on
  *     candidates moves ≤ partitions·k rows).
  *  2. CONFIRM — one aggregation whose keys are candidates-or-null:
  *     non-candidates collapse into a single null bucket, so the
  *     shuffle carries ≤ candidates+1 keys per partition while still
  *     yielding exact candidate counts AND the exact total N in the
  *     same pass. The final filter `cnt·k > N` kills MG's false
  *     positives; the superset guarantee means nothing true was lost.
  *
  * The decrement loop amortizes: each decrement event retires k+1 count
  * units, so total work is O(n) per partition.
  */
object HeavyHitters {

  private val Dup = "__graft_"

  /** Misra–Gries survivor set per partition, unioned (exposed for the
    * spec's superset/bound asserts). ≤ numPartitions·k rows. */
  private[graft] def mgCandidates(items: Dataset[String], k: Int): DataFrame = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      val counters = new java.util.HashMap[String, java.lang.Long](k * 2)
      it.foreach { t =>
        val cur = counters.get(t)
        if (cur ne null) counters.put(t, cur + 1L)
        else if (counters.size < k) counters.put(t, 1L)
        else {
          val iter = counters.entrySet().iterator()
          while (iter.hasNext) {
            val e = iter.next()
            if (e.getValue == 1L) iter.remove() else e.setValue(e.getValue - 1L)
          }
        }
      }
      import scala.jdk.CollectionConverters._
      counters.keySet().iterator().asScala
    }.toDF("item").distinct()
  }

  /** Items of `df(itemCol)` with count·k > N (N = non-null items), with
    * exact counts. Output: (item, cnt), both exact. Null items ignored. */
  def frequentItems(df: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 2 && k <= (1 << 20), s"k=$k out of [2, 2^20]")
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
    val candidates = mgCandidates(items.as[String], k)
    // one confirm pass: candidate keys count exactly, everything else
    // folds into the null bucket — exact N without a second total scan
    val counted = items
      .join(broadcast(candidates.withColumn(s"${Dup}c", lit(1))),
        Seq("item"), "left")
      .groupBy(when(col(s"${Dup}c").isNotNull, col("item")).as("item"))
      .agg(count(lit(1)).as("cnt"))
    val total = counted.agg(sum(col("cnt")).as(s"${Dup}n"))
    counted.filter(col("item").isNotNull)
      .crossJoin(broadcast(total)) // 1-row metrics frame
      .filter(col("cnt") * lit(k.toLong) > col(s"${Dup}n"))
      .select(col("item"), col("cnt"))
  }
}
