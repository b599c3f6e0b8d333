package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Strictly-ordered N-stage conversion funnel — the product-analytics
  * primitive behind q141, generalized to any stage sequence: per stage,
  * how many users reached it AFTER completing every earlier stage in
  * order (stage k counts users with an event of type `stages(k)` strictly
  * later than their first completion of stage k−1; each stage's
  * completion time is the MIN such event time, the canonical
  * first-touch rule).
  *
  * Scale shape: the plan is a CHAIN of per-user 1-row tables — one
  * filtered aggregate per stage joined to the previous stage's
  * completion time — so the cost is `|stages|` filtered aggregations
  * and equi-joins on the user key, map-side combinable, and NEVER a
  * per-user event-sequence sort or window (the naive sessionize-then-
  * scan approach sorts every user's full history; at 100 TB that sort
  * is the whole job). A stage type may repeat (e.g. view → click →
  * view): each occurrence is an independent step anchored to the
  * previous step's timestamp.
  */
object Funnel {

  /** Per-user completion times: one DataFrame per stage, (userCol,
    * `__graft_t`) — exposed for callers that want the users, not the
    * counts. */
  private def stageTimes(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): Seq[DataFrame] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.size <= 9,
      s"${stages.size} stages: labels are single-digit-ordered (1_..9_)")
    val t = "__graft_t"
    val tp = "__graft_tp"
    stages.tail.scanLeft(
      events.filter(col(typeCol) === stages.head)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(t))) {
      (prev, stage) =>
        events.filter(col(typeCol) === stage)
          .join(prev.select(col(userCol), col(t).as(tp)), Seq(userCol))
          .filter(col(tsCol) > col(tp))
          .groupBy(col(userCol)).agg(min(col(tsCol)).as(t))
    }
  }

  /** The funnel report: (stage, n_users) with stage labels
    * `"<k>_<name>"` so the natural string order is the funnel order. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    val steps = stageTimes(events, userCol, tsCol, typeCol, stages)
    steps.zip(stages).zipWithIndex.map { case ((df, name), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(s"${i + 1}_$name").as("stage"), col("n_users"))
    }.reduce(_.unionByName(_)).orderBy("stage")
  }

  /** Per-user funnel depth: (userCol, stages_completed) for cohorting —
    * users absent from stage 1 are absent from the output. */
  def userDepth(events: DataFrame, userCol: String, tsCol: String,
                typeCol: String, stages: Seq[String]): DataFrame = {
    val steps = stageTimes(events, userCol, tsCol, typeCol, stages)
    steps.zipWithIndex.map { case (df, i) =>
      df.select(col(userCol), lit(i + 1).as("__graft_d"))
    }.reduce(_.unionByName(_))
      .groupBy(col(userCol))
      .agg(max(col("__graft_d")).cast("long").as("stages_completed"))
  }
}
