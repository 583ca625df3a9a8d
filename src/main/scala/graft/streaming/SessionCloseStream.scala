package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Gap-session CLOSE events via event-time TIMERS — the third
  * `transformWithState` member, covering the API corner the other two
  * don't: `registerTimer` / `handleExpiredTimer` in event-time mode.
  *
  * [[EventStream.sessionize]] (flatMapGroupsWithState) emits a session
  * when a LATER event from the same user proves the gap — a user who
  * simply leaves holds their session open until their next visit. A
  * registered event-time timer closes the session as soon as the
  * WATERMARK passes last_event + gap, with no further input from that
  * user: on every arrival the processor updates the running session
  * (start, end, count — exact integers), deletes the stale timer, and
  * re-registers at end + gap; when the timer fires, the closed session
  * is emitted and state cleared. This is the shape push-based session
  * analytics needs (cart-abandonment triggers, "session ended" webhooks)
  * — bounded-latency closure instead of closure-on-next-visit.
  *
  * Determinism: timers key off the event-time watermark, not a wall
  * clock, so a MemoryStream test advances time by sending later events —
  * StreamingSpec pins the exact closed-session rows. State is one
  * fixed-size row + one timer per ACTIVE user; both are freed at
  * closure, so state tracks concurrent sessions, not user history. */
object SessionCloseStream {

  case class Event(user_id: Long, ts: Timestamp)
  case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Event, Session] {
    @transient private var session: ValueState[Session] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[Session]("session",
        Encoders.product[Session], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[Session] = {
      var s = if (session.exists()) session.get() else Session(key, Long.MaxValue, Long.MinValue, 0L)
      rows.foreach { e =>
        val t = e.ts.getTime
        s = Session(key, math.min(s.start_ms, t), math.max(s.end_ms, t), s.n_events + 1L)
      }
      // one live timer per user: drop the stale one, arm at the new gap end
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      session.update(s)
      getHandle.registerTimer(s.end_ms + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Session] = {
      val out = if (session.exists()) Iterator.single(session.get()) else Iterator.empty
      session.clear()
      out
    }
  }

  /** The standing query: closed sessions, emitted when the watermark
    * passes last_event + gap. Requires the RocksDB state store. */
  def closedSessions(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
