package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed latest-wins merge — the batch form of the reference's
  * materialized view (browser `Map<id,row>` at
  * reference `static/index.html:87-89, 206-212` and the test listener's
  * `ConcurrentHashMap` at `MessageEventTestListener.kt:15-29`).
  *
  * The reference relies on Kafka per-key arrival order; Spark shuffles
  * break arrival order, so the engine imposes an explicit deterministic
  * ordering (caller passes e.g. `lsn DESC, ts_ms DESC`) — same result,
  * explicit contract (SURVEY.md §2.A R4 notes).
  *
  * Scale: one shuffle (window partition by key). `row_number` is
  * whole-stage-codegen'd; at cluster scale the same plan runs
  * per-partition after a hash exchange on the key, and AQE handles
  * skewed keys. No collect, no driver state.
  */
object CdcMerge {

  /** Keep only the first row per key under `ordering` (pass DESC
    * columns to keep the *latest*). */
  def latestWins(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Materialize the current state of a changelog: latest row per key,
    * minus keys whose latest row is a tombstone (delete detection is a
    * caller-supplied predicate — the reference detects deletes by
    * `after IS NULL`, `MessageConsumer.kt:32`, not by op code). */
  def materialize(changelog: DataFrame, keys: Seq[String], ordering: Seq[Column],
                  isTombstone: Column): DataFrame =
    latestWins(changelog, keys, ordering).filter(!isTombstone)
}
