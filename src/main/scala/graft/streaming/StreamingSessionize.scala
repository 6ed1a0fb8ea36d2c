package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization with custom keyed state — the
  * Structured-Streaming twin of the batch `operators.Sessionize`
  * (lag + cumulative sum needs the full history; a stream instead keeps
  * one open session per key in `GroupState` and emits a session when the
  * event-time watermark passes its gap timeout).
  *
  * Semantics: events within `gapSeconds` of the session's last event
  * extend it; a bigger in-batch gap closes the current session
  * immediately; otherwise the session closes via EventTimeTimeout once the
  * watermark passes last_ts + gap. State per key is O(1) (start, end,
  * count) — at scale the state store holds one small record per active
  * entity, and expired entities are evicted by the timeout, so state does
  * not grow with history.
  */
object StreamingSessionize {

  final case class Event(user_id: String, ts: Timestamp)
  final case class OpenSession(startMs: Long, endMs: Long, n: Long)
  final case class Session(
      user_id: String, session_start: Timestamp, session_end: Timestamp, n_events: Long)

  /** Apply to a watermarked stream of events. Emits completed sessions
    * (append mode).
    */
  def sessions(events: Dataset[Event], gapSeconds: Long): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val keyEnc = Encoders.STRING
    val gapMs = gapSeconds * 1000L

    def update(
        key: String,
        batch: Iterator[Event],
        state: GroupState[OpenSession]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(Session(key, new Timestamp(s.startMs), new Timestamp(s.endMs), s.n))
      } else {
        val sorted = batch.map(_.ts.getTime).toSeq.sorted
        var open = state.getOption
        val closed = Seq.newBuilder[Session]
        sorted.foreach { t =>
          open = open match {
            case Some(s) if t - s.endMs <= gapMs =>
              Some(OpenSession(s.startMs, math.max(s.endMs, t), s.n + 1))
            case Some(s) =>
              closed += Session(key, new Timestamp(s.startMs), new Timestamp(s.endMs), s.n)
              Some(OpenSession(t, t, 1))
            case None =>
              Some(OpenSession(t, t, 1))
          }
        }
        open.foreach { s =>
          state.update(s)
          // setTimeoutTimestamp throws (killing the query) if the instant
          // is not strictly later than the current watermark — reachable
          // when the watermark delay exceeds the gap and a late event
          // reopens a session whose end+gap is already behind. Clamp to
          // watermark+1 so such sessions close on the next trigger instead.
          state.setTimeoutTimestamp(
            math.max(s.endMs + gapMs, state.getCurrentWatermarkMs() + 1))
        }
        closed.result().iterator
      }
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
