package graft.streaming

import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization with CUSTOM STATE — the
  * `flatMapGroupsWithState` path, for when built-in `session_window`
  * can't express the semantics (here: carrying an open session with its
  * running event count across micro-batches and emitting ONLY closed
  * sessions). Works identically over a batch Dataset (one call per key,
  * state discarded) and a stream (state persists across micro-batches).
  *
  * Contract: events within one group call are sorted by (ts, event_id)
  * before folding; cross-batch arrival is assumed per-user-ordered.
  * Closed sessions are emitted when a later event exceeds the gap; the
  * still-open session stays in state. [[sessions]] keeps `NoTimeout`
  * (right for drain-and-stop ingest, where the stream ends);
  * [[sessionsExpiring]] is the unbounded-stream form — watermark +
  * `EventTimeTimeout` close idle sessions and bound state by the
  * active-user set.
  *
  * Scale shape: state is O(1) per active user (open-session bounds +
  * counter), grouped processing shuffles once on the key.
  */
object Sessionizer {

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp,
                                event_id: Long)
  final case class OpenSession(startMs: Long, endMs: Long, n: Long, seq: Long)
  final case class Session(user_id: Long, session_id: Long, start_s: String,
                           end_s: String, n_events: Long)

  private val Fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    .withZone(ZoneOffset.UTC)
  private def fmt(ms: Long): String =
    Fmt.format(java.time.Instant.ofEpochMilli(ms))

  /** `idOf` names the emitted session: the per-user ordinal (`_.seq`,
    * the batch-equivalent default) or a state-free stable key for the
    * expiring form (see [[sessionsExpiring]]). The in-gap branch takes
    * max/min of the bounds rather than trusting arrival order: within
    * one call events are sorted (max/min are no-ops there), but across
    * micro-batches a watermark admits bounded disorder, and a late
    * in-gap event must extend neither end of the session backwards.
    */
  def sessionize(user: Long, events: Iterator[SessionEvent],
                 state: GroupState[OpenSession], gapSec: Long,
                 idOf: OpenSession => Long = _.seq): Iterator[Session] = {
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    var open = state.getOption
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      val t = e.ts.getTime
      open match {
        case Some(s) if t < s.startMs - gapSec * 1000 =>
          // a straggler from BEFORE the open session's own gap window:
          // its session was already closed and emitted, and merging it
          // would regress startMs below an id already delivered
          // (duplicate (user, session_id) downstream) while spanning an
          // internal silence larger than the gap. Dropped — the same
          // too-late-to-amend contract as any emitted-append stream.
          // Unreachable in the batch path (events sorted ascending).
          ()
        case Some(s) if t - s.endMs <= gapSec * 1000 =>
          open = Some(s.copy(startMs = math.min(s.startMs, t),
            endMs = math.max(s.endMs, t), n = s.n + 1))
        case Some(s) => // gap exceeded: close and start a new session
          closed += Session(user, idOf(s), fmt(s.startMs), fmt(s.endMs), s.n)
          open = Some(OpenSession(t, t, 1, s.seq + 1))
        case None =>
          open = Some(OpenSession(t, t, 1, 1))
      }
    }
    open.foreach(state.update)
    closed.result().iterator
  }

  /** Bind over a typed Dataset (batch or streaming). */
  def sessions(ds: Dataset[SessionEvent], gapSec: Long = 1800): Dataset[Session] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          sessionize(user, events, state, gapSec)
      }
  }

  /** The UNBOUNDED-stream form: a watermark (`lateness`) bounds disorder
    * and each user's open session arms an `EventTimeTimeout` at its
    * session-gap boundary. When the watermark passes (end + gap) with no
    * new events, the open session is CLOSED AND EMITTED and the user's
    * state dropped — idle users cost nothing, and sessions that [[
    * sessions]] would hold open forever (its documented gap, closed
    * here) are delivered as soon as the event-time clock proves the gap
    * elapsed. Total state is bounded by users active within the gap
    * horizon, not by every user ever seen.
    *
    * `session_id` here is the session's START epoch-millis, not the
    * per-user ordinal the NoTimeout form emits: a monotonic counter
    * needs per-user state that survives eviction (exactly what this
    * form exists to drop — after eviction a reset counter would reuse
    * ids and collide downstream on (user_id, session_id)), while the
    * start time is unique per user without any retained state because a
    * user's sessions cannot overlap.
    */
  def sessionsExpiring(ds: Dataset[SessionEvent], gapSec: Long = 1800,
                       lateness: String = "10 minutes"): Dataset[Session] = {
    import ds.sparkSession.implicits._
    ds.withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, events: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // the event-time clock passed end + gap: the session IS closed
            val s = state.get
            state.remove()
            Iterator.single(
              Session(user, s.startMs, fmt(s.startMs), fmt(s.endMs), s.n))
          } else {
            val out = sessionize(user, events, state, gapSec, idOf = _.startMs)
            // re-arm at the (possibly extended) open session's gap
            // boundary; must sit strictly above the current watermark
            state.getOption.foreach { s =>
              state.setTimeoutTimestamp(math.max(
                s.endMs + gapSec * 1000, state.getCurrentWatermarkMs + 1))
            }
            out
          }
      }
  }
}
