package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared plumbing for iterative fixed-point operators (PageRank,
  * ConnectedComponents, ShortestPaths): per-round `localCheckpoint`
  * truncates lineage so plans stay flat, and the PREVIOUS round's
  * checkpointed blocks must be released once the new round is
  * materialized — otherwise maxRounds frames pile up in block-manager
  * memory over a long fixed point.
  */
private[graft] object Iterate {

  /** Drop the cached blocks behind a `localCheckpoint`ed frame. The
    * persisted RDD is the one inside the plan's LogicalRDD leaf —
    * `df.rdd` would be a fresh derived RDD whose unpersist is a no-op.
    */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))
}
