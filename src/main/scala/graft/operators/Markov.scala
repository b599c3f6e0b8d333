package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** First-order Markov transition table over per-key event sequences —
  * the next-action model product analytics reads (what follows a
  * signup?) and the sequence-sanity monitor a training pipeline wants
  * over interaction logs (a transition distribution that shifts between
  * crawls is q156-style drift at the BEHAVIOR level).
  *
  * Scale shape: consecutive pairs come from ONE `lead` window per key
  * ordered by (ts, id) — cells per partition = events per key, the
  * app-bounded q52 sessionization discipline, keys hash-partitioned;
  * the (prev, next) census is then ≤ |types|² rows (a domain taxonomy
  * squared, never row-count-scaled), and every statistic derives from
  * it. The (ts, id) compound order makes the sequence — and therefore
  * every count — deterministic under equal timestamps.
  *
  * Exactness: counts exact; row-conditional probability floor-divided
  * to micro units (`prob_micro = (n·1e6) div row_total` — integer, so
  * any engine replays it); next-state ranking per prev by (n desc,
  * next asc), exact ties broken by name. Output: (prev_type,
  * next_type, n, prob_micro, rank). */
object Markov {

  private val Dup = "__graft_"

  def transitions(events: DataFrame, keyCol: String, typeCol: String,
                  tsCol: String, idCol: String): DataFrame = {
    val rows = events.filter(col(keyCol).isNotNull && col(typeCol).isNotNull
        && col(tsCol).isNotNull)
      .select(col(keyCol).as(s"${Dup}k"),
        col(typeCol).cast("string").as(s"${Dup}e"),
        col(tsCol).as(s"${Dup}ts"), col(idCol).as(s"${Dup}id"))
    val w = W.partitionBy(col(s"${Dup}k"))
      .orderBy(col(s"${Dup}ts"), col(s"${Dup}id"))
    val census = rows
      .withColumn(s"${Dup}nx", lead(col(s"${Dup}e"), 1).over(w))
      .filter(col(s"${Dup}nx").isNotNull)
      .groupBy(col(s"${Dup}e").as("prev_type"),
        col(s"${Dup}nx").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val byPrev = census.groupBy(col("prev_type"))
      .agg(sum(col("n")).as(s"${Dup}tot"))
    val rw = W.partitionBy(col("prev_type"))
      .orderBy(col("n").desc, col("next_type"))
    census.join(broadcast(byPrev), Seq("prev_type"))
      .select(col("prev_type"), col("next_type"), col("n"),
        graft.functions.Expressions.int_div(col("n") * lit(1000000L),
          col(s"${Dup}tot")).as("prob_micro"))
      .withColumn("rank", row_number().over(rw).cast("long"))
  }
}
