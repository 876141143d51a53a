package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.SessionTimers
import graft.streaming.SessionTimers.{SessionClosed, SessionEvent}

class SessionTimersSpec extends SparkSpec {

  private def ev(u: Long, minute: Int, v: Double) =
    SessionEvent(u, new Timestamp(3600_000L + minute * 60_000L), v)

  test("event-time timers close sessions when the watermark passes the gap") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ms = MemoryStream[SessionEvent]
    // 10-minute gap, zero-delay watermark: session closes once an
    // event proves event-time moved past last+gap
    val closed = SessionTimers.closedSessions(ms.toDS(), 10 * 60_000L, "0 seconds")
    val q = closed.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()

    // user 1: events at minute 0 and 5 (one session);
    // user 2: event at minute 1
    ms.addData(ev(1, 0, 1.0), ev(1, 5, 2.0), ev(2, 1, 5.0))
    q.processAllAvailable()
    assert(spark.table("sess").count() == 0, "nothing may close before the watermark moves")

    // minute 8 extends user 1's session (timer must be re-armed, not fire at 5+10)
    ms.addData(ev(1, 8, 4.0))
    q.processAllAvailable()

    // watermark jumps to minute 30: both sessions are now 10-min quiet.
    // The watermark a batch evaluates timers against comes from the
    // PREVIOUS batch (and Graft disables no-data microbatches), so one
    // more batch is needed for the timers to observe minute 30.
    ms.addData(ev(3, 30, 0.0))
    q.processAllAvailable()
    ms.addData(ev(4, 31, 0.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sess").as[SessionClosed].collect()
      .map(s => s.user_id -> s).toMap
    assert(out.keySet == Set(1L, 2L), s"got ${out.keySet}")
    val s1 = out(1L)
    assert(s1.n_events == 3 && s1.total_value == 7.0, s1)
    assert(s1.session_start.getTime == 3600_000L &&
           s1.session_end.getTime == 3600_000L + 8 * 60_000L, s1)
    val s2 = out(2L)
    assert(s2.n_events == 1 && s2.total_value == 5.0, s2)
  }

  test("a session stays open while events keep arriving within the gap") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ms = MemoryStream[SessionEvent]
    val closed = SessionTimers.closedSessions(ms.toDS(), 10 * 60_000L, "0 seconds")
    val q = closed.writeStream.format("memory").queryName("sess2")
      .outputMode("append").start()

    // chain of events 6 minutes apart: every arrival re-arms the timer,
    // watermark rides along but never clears last+gap
    ms.addData(ev(1, 0, 1.0)); q.processAllAvailable()
    ms.addData(ev(1, 6, 1.0)); q.processAllAvailable()
    ms.addData(ev(1, 12, 1.0)); q.processAllAvailable()
    assert(spark.table("sess2").count() == 0, "chained session must not close")

    ms.addData(ev(9, 40, 0.0)); q.processAllAvailable()
    ms.addData(ev(8, 41, 0.0)); q.processAllAvailable() // timers see wm=40
    q.stop()
    val s = spark.table("sess2").as[SessionClosed].collect()
      .find(_.user_id == 1L).get
    assert(s.n_events == 3, s)
  }

  test("MapState + bounded ListState maintain per-user profiles") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.ProfileState
    import graft.streaming.ProfileState.{Ev, Profile}

    val ms = MemoryStream[Ev]
    val q = ProfileState.profiles(ms.toDS(), keepLast = 3)
      .writeStream.format("memory").queryName("prof")
      .outputMode("update").start()

    ms.addData(Ev(1, "view", 1.0), Ev(1, "click", 2.0))
    q.processAllAvailable()
    ms.addData(Ev(1, "view", 3.0), Ev(1, "view", 4.0), Ev(2, "buy", 9.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("prof").as[Profile].collect()
    val u1 = out.filter(_.user_id == 1L).maxBy(_.total)
    // 4 events over 2 types; list bounded to the LAST 3 samples
    assert(u1.n_types == 2 && u1.total == 4, u1)
    assert(u1.recent == Seq(2.0, 3.0, 4.0), u1)
    val u2 = out.find(_.user_id == 2L).get
    assert(u2.n_types == 1 && u2.total == 1 && u2.recent == Seq(9.0), u2)
  }
}
