package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Composite keyed state — the remaining two `transformWithState`
  * state shapes the CDC/session processors don't use:
  *
  *  - `MapState[event_type → count]`: point updates touch ONE map
  *    entry per event; on RocksDB each entry is its own key, so a
  *    user with 10^4 distinct event types never rewrites a 10^4-entry
  *    blob per event (the ValueState[Map] anti-pattern).
  *  - `ListState[Double]` bounded to the last K values: the rolling
  *    raw-sample window behind per-user anomaly scores.
  *
  * Emits the updated profile per touched key per batch (Update mode):
  * the streaming twin of a per-user feature table that a batch job
  * would recompute with groupBy + collect_list.
  */
object ProfileState {

  case class Ev(user_id: Long, event_type: String, value: Double)

  case class Profile(user_id: Long, n_types: Int, total: Long,
                     recent: Seq[Double])

  class ProfileProcessor(keepLast: Int)
      extends StatefulProcessor[Long, Ev, Profile] {
    @transient private var counts: MapState[String, Long] = _
    @transient private var recent: ListState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      recent = getHandle.getListState[Double](
        "recent", Encoders.scalaDouble, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Ev],
                                 timerValues: TimerValues): Iterator[Profile] = {
      rows.foreach { e =>
        val prev = if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L
        counts.updateValue(e.event_type, prev + 1L)
        recent.appendValue(e.value)
      }
      // bound the list to the last K samples
      val all = recent.get().toArray
      if (all.length > keepLast) recent.put(all.takeRight(keepLast))
      val total = counts.iterator().map(_._2).sum
      Iterator.single(Profile(key, counts.keys().size, total,
        recent.get().toSeq))
    }
  }

  def profiles(events: Dataset[Ev], keepLast: Int = 3): Dataset[Profile] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new ProfileProcessor(keepLast),
        TimeMode.None(), OutputMode.Update())
  }
}
