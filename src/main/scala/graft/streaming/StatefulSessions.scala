package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization over `flatMapGroupsWithState` — the
  * arbitrary-state streaming path (vs the declarative `session_window` in
  * [[StreamingEvents]]). Emits a closed session either when a new event
  * arrives after the gap, or when the event-time watermark passes the
  * session's timeout — so sessions close even for users who go silent.
  *
  * State per user is one fixed-size record; the watermark bounds state
  * lifetime, so state size = O(active users), independent of history length.
  */
object StatefulSessions {

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  /** Timestamps carried as epoch MICROSECONDS — `Timestamp.getTime` is
    * millis and would silently floor microsecond event times (real ingest
    * data has them; the fixture caught exactly that).
    */
  final case class SessionState(sessionStart: Long, lastTs: Long,
                                nEvents: Long, sumValue: Double)
  final case class SessionOut(user_id: Long, session_start: Timestamp,
                              session_end: Timestamp, n_events: Long,
                              sum_value: Double)

  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  private def close(user: Long, s: SessionState): SessionOut =
    SessionOut(user, fromMicros(s.sessionStart), fromMicros(s.lastTs),
      s.nEvents, s.sumValue)

  def updateSessions(gapMs: Long)(user: Long, events: Iterator[Event],
                                  state: GroupState[SessionState]): Iterator[SessionOut] = {
    val gapUs = gapMs * 1000L
    if (state.hasTimedOut) {
      val out = state.getOption.map(close(user, _)).iterator
      state.remove()
      return out
    }
    val sorted = events.toArray.sortBy(e => micros(e.ts))
    var closed = List.empty[SessionOut]
    var cur = state.getOption
    sorted.foreach { e =>
      val t = micros(e.ts)
      cur = cur match {
        case Some(s) if t - s.lastTs <= gapUs =>
          Some(s.copy(lastTs = math.max(s.lastTs, t),
            nEvents = s.nEvents + 1, sumValue = s.sumValue + e.value))
        case Some(s) =>
          closed ::= close(user, s)
          Some(SessionState(t, t, 1, e.value))
        case None =>
          Some(SessionState(t, t, 1, e.value))
      }
    }
    cur.foreach { s =>
      state.update(s)
      // the timeout API is millisecond-precision, so lastTs (micros) is
      // FLOORED to millis: the timeout can fire up to 999µs EARLIER than
      // the true lastTs + gap. That sub-millisecond early close is part of
      // this operator's contract — the oracle mirrors the same floor
      // (epoch_us // 1000) with a strict <, so both sides agree.
      state.setTimeoutTimestamp(s.lastTs / 1000L + gapMs)
    }
    closed.reverse.iterator
  }

  /** Streaming sessionize: watermarked input → per-user session records. */
  def sessionizeStream(events: Dataset[Event], gapMinutes: Int = 30,
                       watermark: String = "1 hour"): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stateEnc = Encoders.product[SessionState]
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateSessions(gapMinutes * 60000L))
  }
}
