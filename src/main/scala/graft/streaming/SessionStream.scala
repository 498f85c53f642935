package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization via flatMapGroupsWithState — the
  * stateful-custom-logic escape hatch for semantics windowed aggs can't
  * express. State per user is O(1) (just the open session), evicted by
  * event-time timeout, so state size is bounded by active users, not
  * history.
  */
object SessionStream {

  case class Ev(user_id: Long, ts: Timestamp, event_id: Long)
  case class OpenSession(start: Long, end: Long, n: Long)
  case class SessionOut(user_id: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long)

  def gapMs(gapMinutes: Int): Long = gapMinutes * 60000L

  /** Core transition: fold sorted events of one user into closed
    * sessions + the still-open one. Pure — unit-testable without a
    * stream. */
  def advance(open: Option[OpenSession], sorted: Seq[Ev], gap: Long)
      : (Seq[OpenSession], Option[OpenSession]) = {
    var closed = List.empty[OpenSession]
    var cur = open
    sorted.foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.end <= gap =>
          cur = Some(s.copy(end = math.max(s.end, t), n = s.n + 1))
        case Some(s) =>
          closed ::= s
          cur = Some(OpenSession(t, t, 1))
        case None =>
          cur = Some(OpenSession(t, t, 1))
      }
    }
    (closed.reverse, cur)
  }

  def sessions(events: Dataset[Ev], gapMinutes: Int = 30,
               watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    val gap = gapMs(gapMinutes)
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.product[OpenSession]
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Ev], state: GroupState[OpenSession]) =>
          def emit(s: OpenSession): SessionOut =
            SessionOut(userId, new Timestamp(s.start), new Timestamp(s.end), s.n)
          if (state.hasTimedOut) {
            val out = state.getOption.map(emit).iterator
            state.remove()
            out
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val (closed, open) = advance(state.getOption, sorted, gap)
            open match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp(s.end + gap)
              case None => state.remove()
            }
            closed.map(emit).iterator
          }
      }
  }
}
