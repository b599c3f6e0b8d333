package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming sessionization via `flatMapGroupsWithState` —
  * the Structured Streaming stateful-operator surface
  * (beyond the reference, which has no event-time processing; SURVEY §2.12
  * notes these come free from Spark).
  *
  * State per user: (last event time, open-session count). A new session
  * opens when the gap to the previous event exceeds `gapSeconds`. Events
  * within a micro-batch are sorted by time before folding — Spark hands the
  * group iterator unordered. Emits one row per user per batch with the
  * cumulative session/event counts (update semantics).
  */
object StatefulSessionizer {

  final case class Ev(user_id: Long, ts_sec: Long)
  final case class SessState(lastTs: Long, sessions: Long, events: Long)
  final case class UserSessions(user_id: Long, n_events: Long, n_sessions: Long)

  def sessionCounts(events: Dataset[Ev], gapSeconds: Long): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, UserSessions](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (user, evs, state: GroupState[SessState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts_sec))
          var s = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            val newSession = s.lastTs == Long.MinValue ||
              e.ts_sec - s.lastTs > gapSeconds
            s = SessState(e.ts_sec,
              s.sessions + (if (newSession) 1 else 0), s.events + 1)
          }
          state.update(s)
          Iterator.single(UserSessions(user, s.events, s.sessions))
      }
  }
}
