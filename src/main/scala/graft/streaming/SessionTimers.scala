package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Timer-driven streaming sessionization — the piece of the Spark 4
  * `transformWithState` API the latest-wins CDC processors don't
  * exercise: **event-time timers**. A session CLOSES only when the
  * watermark passes `last_event + gap`, at which point the registered
  * timer fires `handleExpiredTimer` and the aggregate is emitted and
  * cleared — push-based session expiry, not poll-based. This is what
  * `session_window` aggregation (Windows.sessionCounts) cannot give:
  * arbitrary per-session state (here sum+count+bounds, in production
  * any running aggregate) plus an emission the moment the session is
  * provably complete.
  *
  * Timer hygiene: each input batch deletes the key's stale timers
  * before registering `last + gap`, so state carries exactly one live
  * timer per open session; `handleExpiredTimer` keeps a defensive
  * guard (fires only if the session really is `gap`-quiet) so a
  * missed delete can't close a live session early.
  *
  * Scale: state is one row + one timer per OPEN session; closed
  * sessions leave nothing behind. RocksDB-backed (Graft default), so
  * open-session count is bounded by disk, not executor heap.
  */
object SessionTimers {

  case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

  case class SessionClosed(user_id: Long, n_events: Long, total_value: Double,
                           session_start: Timestamp, session_end: Timestamp)

  /** (n, sum, startMs, lastMs) running aggregate of the open session.
    * Public: the state encoder's generated code must see the
    * constructor (a private case class fails janino compilation). */
  case class SessState(n: Long, sum: Double, start: Long, last: Long)

  class SessionTimeoutProcessor(gapMs: Long)
      extends StatefulProcessor[Long, SessionEvent, SessionClosed] {
    @transient private var sess: ValueState[SessState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[SessState](
        "sess", Encoders.product[SessState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[SessionEvent],
                                 timerValues: TimerValues): Iterator[SessionClosed] = {
      var cur = Option(sess.get())
      rows.foreach { e =>
        val t = e.ts.getTime
        cur = cur match {
          case None => Some(SessState(1L, e.value, t, t))
          case Some(s) => Some(SessState(s.n + 1, s.sum + e.value,
            math.min(s.start, t), math.max(s.last, t)))
        }
      }
      cur.foreach { s =>
        sess.update(s)
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
        getHandle.registerTimer(s.last + gapMs)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionClosed] = {
      Option(sess.get()) match {
        case Some(s) if expiredTimerInfo.getExpiryTimeInMs() >= s.last + gapMs =>
          sess.clear()
          Iterator.single(SessionClosed(key, s.n, s.sum,
            new Timestamp(s.start), new Timestamp(s.last)))
        case _ => Iterator.empty // stale timer: session extended since
      }
    }
  }

  /** Wire the processor over a watermarked event stream. */
  def closedSessions(events: Dataset[SessionEvent], gapMs: Long,
                     watermark: String): Dataset[SessionClosed] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimeoutProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
