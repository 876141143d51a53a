package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming window/dedup transforms (SURVEY.md §2.B Streaming).
  * All are `DataFrame => DataFrame` so they compose on both batch and
  * streaming frames; on a stream the watermark bounds state — the
  * deliberate improvement over the reference's unbounded client map
  * (`static/index.html:88`).
  */
object Windows {

  /** Tumbling event-time counts with watermark-bounded state. */
  def tumblingCounts(events: DataFrame, tsCol: String, window_ : String,
                     watermark: String, groupCols: Column*): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_) +: groupCols: _*)
      .agg(count(lit(1)).as("n"))

  /** Sliding-window aggregate. */
  def slidingCounts(events: DataFrame, tsCol: String, window_ : String,
                    slide: String, watermark: String, groupCols: Column*): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_, slide) +: groupCols: _*)
      .agg(count(lit(1)).as("n"))

  /** Session windows: gap-based grouping per key. */
  def sessionCounts(events: DataFrame, tsCol: String, gap: String,
                    watermark: String, keyCols: Column*): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap) +: keyCols: _*)
      .agg(count(lit(1)).as("n"))

  /** Stateful exactly-once-per-id dedup within the watermark horizon.
    * Keyed on the ids ALONE — a redelivery of the same id with a
    * different event timestamp is still a duplicate and is dropped
    * (`dropDuplicatesWithinWatermark`, which also evicts per-id state
    * once the watermark passes, unlike plain `dropDuplicates` whose
    * state grows unboundedly on a stream). */
  def dedupByIds(events: DataFrame, tsCol: String, watermark: String,
                 idCols: String*): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCols)
}
