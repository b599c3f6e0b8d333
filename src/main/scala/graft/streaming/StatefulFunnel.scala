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
  * so far (≤ 9 longs — bounded, tiny). The batch first-touch chain is
  * declarative in the event MULTISET — per stage, the MIN qualifying
  * time strictly after the previous completion — so a micro-batch is
  * folded WITHOUT materializing or sorting the group (Spark hands the
  * iterator unordered; a hot user's million-event batch must not become
  * an executor-heap sort buffer). One pass feeds per-remaining-stage
  * successor sets, pruned as it goes:
  *
  *   - events of already-completed stage types, and any event at or
  *     before the last durable completion time, drop on sight (chain
  *     times strictly increase) — the realistic hot-user spam shapes;
  *   - the greedy chain g over the current sets only ever DECREASES as
  *     events accumulate, so for each stage whose predecessor chain
  *     currently completes, every candidate above the current successor
  *     of g(prev) can never be an answer for any FINAL (smaller)
  *     threshold and is discarded — such stages hold ONE candidate at
  *     in-order delivery;
  *   - only stages still awaiting an earlier completion buffer
  *     candidates (distinct times in a TreeSet), and those are exactly
  *     the events a correct answer provably needs: with arbitrary
  *     reordering, "min time > θ" for a θ revealed later is a successor
  *     query, which no comparison-based o(n)-space structure answers —
  *     bounded-memory exactness under adversarial order is impossible,
  *     so the operator is O(1) per user under its documented delivery
  *     discipline (per-user event time non-decreasing batch-over-batch,
  *     the [[StatefulSessionizer]] rule) and degrades only when a later
  *     stage's events precede the earlier stage's within one batch.
  *
  * At batch end the chain extends by successor lookups (≤ 9), exactly
  * reproducing the sorted fold / batch min-chain (StatefulFunnelSpec
  * proves parity on shuffled and pathological single-user batches).
  * Depth only ever grows, so update-mode emissions are reconciled
  * downstream with max().
  *
  * At production scale the state is O(users)·≤9 longs; `idleTimeoutMs`
  * opts into `GroupStateTimeout.ProcessingTimeTimeout` eviction — a
  * user silent for that long has their funnel state dropped (the same
  * knob StatefulSessionizerSpec proves for the watermarked dedup).
  * Default stays NoTimeout so the declared arm measures pure funnel
  * semantics. */
object StatefulFunnel {

  final case class Ev(user_id: Long, ts_us: Long, event_type: String)
  final case class FunnelState(times: List[Long])
  final case class UserDepth(user_id: Long, stages_completed: Int)

  def userDepths(events: Dataset[Ev],
                 stages: Seq[String],
                 idleTimeoutMs: Option[Long] = None): Dataset[UserDepth] = {
    require(stages.nonEmpty && stages.size <= 9,
      s"${stages.size} stages out of [1, 9]")
    require(idleTimeoutMs.forall(_ > 0), "idleTimeoutMs must be positive")
    import events.sparkSession.implicits._
    val timeoutConf = idleTimeoutMs match {
      case Some(_) => GroupStateTimeout.ProcessingTimeTimeout()
      case None => GroupStateTimeout.NoTimeout()
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, UserDepth](
        OutputMode.Update(), timeoutConf) {
        case (user, evs, state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val times = state.getOption.map(_.times).getOrElse(Nil)
            val newTimes = fold(times, evs, stages)
            state.update(FunnelState(newTimes))
            idleTimeoutMs.foreach(state.setTimeoutDuration)
            if (newTimes.isEmpty) Iterator.empty
            else Iterator.single(UserDepth(user, newTimes.size))
          }
      }
  }

  /** One unordered pass + ≤9 successor lookups = the batch min-chain.
    * Package-visible so the spec drives pathological groups directly. */
  private[graft] def fold(times: List[Long], evs: Iterator[Ev],
                          stages: Seq[String]): List[Long] =
    foldWithPeak(times, evs, stages)._1

  /** [[fold]] plus the PEAK total buffered candidates observed across
    * the pass — the spec's teeth for the documented memory envelope:
    * stages along the completed greedy chain stay within one prune
    * interval (the descending-order hot user keeps beating the current
    * successor, and each prune clears the backlog), while stages beyond
    * the first incomplete one retain exactly the distinct candidate
    * times a correct answer provably needs (the documented
    * bounded-memory impossibility under adversarial order). */
  private[graft] def foldWithPeak(times: List[Long], evs: Iterator[Ev],
                                  stages: Seq[String]): (List[Long], Int) = {
    val completed = times.size
    val remaining = stages.size - completed
    if (remaining <= 0) return (times, 0)
    val lastDone = times.lastOption.getOrElse(Long.MinValue)
    val bufs =
      Array.fill(remaining)(new java.util.TreeSet[java.lang.Long]())

    // prune every buffer along the CURRENT greedy chain: anything above
    // the stage's current successor can never answer a final (only ever
    // smaller) threshold; stop at the first incomplete stage — beyond
    // it thresholds are still unknown and candidates must be kept
    def prune(): Unit = {
      var prev: java.lang.Long = lastDone
      var j = 0
      while (j < remaining && prev != null) {
        val succ = bufs(j).higher(prev)
        if (succ != null) bufs(j).tailSet(succ, false).clear()
        prev = succ
        j += 1
      }
    }

    var sincePrune = 0
    var peak = 0
    while (evs.hasNext) {
      val e = evs.next()
      val k = stages.indexOf(e.event_type)
      // completed-stage spam and anything ≤ the durable chain head drop
      // on sight — no buffering
      if (k >= completed && e.ts_us > lastDone) {
        bufs(k - completed).add(e.ts_us)
        sincePrune += 1
        if (sincePrune >= 64) { prune(); sincePrune = 0 }
        // track the buffered-candidate peak (≤ 9 O(1) size reads)
        var s = 0
        var j = 0
        while (j < remaining) { s += bufs(j).size; j += 1 }
        if (s > peak) peak = s
      }
    }
    prune()

    var out = times
    var prev: java.lang.Long = lastDone
    var j = 0
    while (j < remaining && prev != null) {
      val succ = bufs(j).higher(prev)
      if (succ != null) out = out :+ succ.longValue
      prev = succ
      j += 1
    }
    (out, peak)
  }
}
