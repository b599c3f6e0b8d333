package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming strictly-ordered N-stage funnel via
  * `flatMapGroupsWithState` — the stateful sibling of
  * [[graft.operators.Funnel]]: conversion depths that update as events
  * ARRIVE instead of re-scanning history per report (the reference has
  * no event-time processing; SURVEY §2.12 notes these come free from
  * Spark).
  *
  * State per user: the ascending list of stage completion times reached
  * so far (≤ 9 longs — bounded, tiny). Folding events in event-time
  * order through "complete stage k at the first stages(k) event
  * strictly after completion(k−1)" reproduces the batch first-touch
  * chain EXACTLY: the batch definition (per stage, the MIN qualifying
  * time) is what a single ascending pass computes. Events within a
  * micro-batch are sorted by (ts, type) before folding — Spark hands
  * the group iterator unordered; across micro-batches the fold is
  * correct whenever per-user event time is non-decreasing batch-over-
  * batch (the [[StatefulSessionizer]] delivery discipline — true for
  * chronologically-split file feeds and for any log shipped in arrival
  * order). Depth only ever grows, so update-mode emissions are
  * reconciled downstream with max().
  *
  * At production scale the state is O(users)·≤9 longs; a
  * `GroupStateTimeout` eviction (close a user's funnel after
  * inactivity) is the same knob StatefulSessionizerSpec proves for the
  * watermarked dedup — deliberately not set here so the arm measures
  * pure funnel semantics. */
object StatefulFunnel {

  final case class Ev(user_id: Long, ts_us: Long, event_type: String)
  final case class FunnelState(times: List[Long])
  final case class UserDepth(user_id: Long, stages_completed: Int)

  def userDepths(events: Dataset[Ev],
                 stages: Seq[String]): Dataset[UserDepth] = {
    require(stages.nonEmpty && stages.size <= 9,
      s"${stages.size} stages out of [1, 9]")
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, UserDepth](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (user, evs, state: GroupState[FunnelState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts_us, e.event_type))
          var times = state.getOption.map(_.times).getOrElse(Nil)
          sorted.foreach { e =>
            val k = times.size
            if (k < stages.size && e.event_type == stages(k) &&
                (k == 0 || e.ts_us > times.last))
              times = times :+ e.ts_us
          }
          state.update(FunnelState(times))
          if (times.isEmpty) Iterator.empty
          else Iterator.single(UserDepth(user, times.size))
      }
  }
}
