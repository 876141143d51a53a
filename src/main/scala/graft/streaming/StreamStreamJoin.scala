package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Native watermarked stream-stream joins — Spark's symmetric
  * stateful hash join, the one Structured Streaming operator the
  * engine's foreachBatch IVM views ([[JoinView]]) deliberately do NOT
  * use. The two are complements, not alternatives:
  *
  *   - [[JoinView]] maintains a JOINED TABLE (latest-wins per key,
  *     deletes retract) — CDC semantics, state lives in the sink;
  *   - this joins two EVENT streams (append-only facts, e.g. impression
  *     ⋈ click within 30 min) — state lives in the state store, rows
  *     pair at most once per match, and the WATERMARK bounds both
  *     buffers: each side holds only rows younger than
  *     watermark − interval, evicted automatically.
  *
  * That eviction bound is the 100 TB story: join state is
  * O(arrival rate × (watermark + interval)), independent of stream
  * lifetime. Without the time bound Spark rejects the plan outright
  * (state would grow forever) — the API makes the unsafe spelling
  * unwritable, which is itself the design.
  *
  * Late rows (older than watermark) drop on ingest; an outer join
  * emits its null-padded unmatched rows only once the watermark
  * passes the row's join window (before that, a future match is still
  * possible) — both semantics spec-asserted in `StreamStreamJoinSpec`.
  */
object StreamStreamJoin {

  /** Interval-join two event streams on an equi-key plus a time
    * range: right.ts ∈ [left.ts + lowerSec, left.ts + upperSec].
    * Column names must be disjoint apart from nothing — both frames
    * keep their own names; `leftKey`/`rightKey` name the equi pair and
    * `leftTs`/`rightTs` the event-time columns (each must be the
    * column its side's watermark is declared on).
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTs: String, rightTs: String,
                   lowerSec: Long, upperSec: Long,
                   watermark: String,
                   joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) + expr(s"INTERVAL $lowerSec SECONDS") &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $upperSec SECONDS"),
      joinType)
  }
}
