package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based batch sessionization (used by query q40 and the 10×
  * ScaleSmoke probe; one definition so the measured shape is the
  * graded shape).
  *
  * lag flags a session break when the gap to the previous event
  * exceeds `gapMs`; a running sum turns the flags into per-key session
  * ids; the final aggregate collapses each session. All three steps
  * require the same (key) clustering + (tms, tie) order, so Catalyst
  * plans ONE hash exchange for the whole pipeline — the property
  * PlanAssertionsSpec pins.
  */
object Sessionize {

  /** @param events (keyCol, tmsCol: epoch-millis long, tieCol) rows
    * @return (keyCol, session_no: long, n_events: long, dur_s: long)
    */
  def stats(events: DataFrame, keyCol: String, tmsCol: String,
            tieCol: String, gapMs: Long): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tmsCol), col(tieCol))
    events
      .withColumn("new_s",
        when(lag(col(tmsCol), 1).over(byKey).isNull ||
             col(tmsCol) - lag(col(tmsCol), 1).over(byKey) > gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_no",
        sum(col("new_s")).over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("session_no"))
      .agg(count(lit(1)).as("n_events"),
           ((max(col(tmsCol)) - min(col(tmsCol))) / 1000).cast("long").as("dur_s"))
  }
}
