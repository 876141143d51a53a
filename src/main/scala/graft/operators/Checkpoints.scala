package graft.operators

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame

/** Registry for checkpointed frames that a RETURNED plan still
  * references — the one checkpoint lifecycle [[Iterate]]'s
  * release-after-next-round discipline cannot cover. PrefixScan's
  * pid-stamped frame and CosinePairs.clustered's corpus/centroid
  * frames are materialized inside the operator but consumed by the
  * caller at some later action, so the operator has no point at which
  * unpersisting is safe; without a release lever each invocation
  * pins one input-scale copy in block-manager memory for the session
  * lifetime.
  *
  * Contract: operators [[track]] such frames at creation; a DRIVER at
  * a quiesce point — after fully consuming the returned DataFrames,
  * with no tracked plan still in flight — calls [[releaseAll]].
  * The engine's own loops do this (ScaleSmoke between probes; Bench's
  * reclaim() force-unpersists every RDD, which subsumes it; Verify
  * runs its queries CONCURRENTLY, so its only quiesce point is after
  * the pool drains — its pins accumulate for the round, bounded by
  * the sf0.01 gate inputs). Releasing while a tracked plan is
  * mid-execution is
  * unsafe the same way unpersisting any localCheckpoint is: the
  * lineage is truncated, so the blocks are the only copy.
  */
object Checkpoints {

  private val live = new ConcurrentLinkedQueue[DataFrame]

  private[graft] def track(df: DataFrame): DataFrame = { live.add(df); df }

  /** Unpersist every tracked frame's checkpoint blocks. Safe to call
    * repeatedly; unpersisting an already-dropped RDD is a no-op.
    */
  def releaseAll(): Unit = {
    var df = live.poll()
    while (df != null) { Iterate.unpersistCheckpoint(df); df = live.poll() }
  }
}
