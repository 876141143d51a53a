package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CdcMerge

/** Incrementally-maintained equi-JOIN view over two CDC streams —
  * the join-side counterpart of [[AggView]]'s aggregate maintenance.
  *
  * The reference materializes exactly one single-table view (the
  * browser's `Map<id,row>`, `static/index.html:87-89`); an analytics
  * engine additionally wants joined views ("orders with their
  * customer row") kept fresh without re-joining the world every
  * batch. Classic delta-key IVM:
  *
  *   1. each SIDE is a keyed latest-wins table (tombstones retained),
  *      maintained exactly like the single-table CDC state;
  *   2. a micro-batch's AFFECTED join keys are the join-key values of
  *      touched ids in the OLD side states (covers deletes and
  *      join-key changes away) plus in the NEW side states (covers
  *      inserts and join-key changes toward);
  *   3. the view is rewritten as
  *         carryover (old view, join key ∉ Δ)
  *       ∪ recompute (live_left[jk ∈ Δ] ⋈ live_right[jk ∈ Δ])
  *      — the join work is O(slice of the affected keys), never
  *      O(|left| × |right|). Δ is a distinct-key frame derived from
  *      the (small) batch, so the anti/semi joins against it
  *      broadcast.
  *
  * File-sink caveat (same as [[CdcStream.mergeBatch]]): the carryover
  * rewrite is O(view) in this plain-parquet harness; a production
  * deployment replaces the swap with MERGE INTO / the bucketed
  * [[ManifestState]] layout so only Δ-touched buckets rewrite. The
  * JOIN maintenance itself — steps 1-3 — is unchanged by the sink.
  *
  * Side schema contract (what [[CdcStream.classify]] emits, renamed):
  * an id column, a join-key column, payload columns, `lsn`/`ts_ms`
  * ordering columns, and an `event_type` column where DELETE marks a
  * tombstone. Tombstones keep their id but null payload/join key —
  * their removal from the view is driven by the OLD state's join key.
  */
object JoinView {

  final case class Side(idCol: String, joinKeyCol: String)

  private def ordering: Seq[Column] =
    Seq(col("lsn").desc_nulls_last, col("ts_ms").desc_nulls_last)

  private def stateOf(spark: SparkSession, dir: String, schema: DataFrame): DataFrame =
    if (CdcStream.statePresent(Paths.get(dir))) spark.read.parquet(dir)
    else schema.limit(0)

  private def live(state: DataFrame): DataFrame =
    state.filter(col("event_type") =!= CdcStream.Delete)

  /** Join-key values owned by `ids` in `state` (null-safe: tombstones
    * and never-seen ids contribute nothing). */
  private def keysOf(state: DataFrame, side: Side, ids: DataFrame): DataFrame =
    state.join(ids, Seq(side.idCol), "left_semi")
      .select(col(side.joinKeyCol).as("jk")).filter(col("jk").isNotNull)

  /** Apply one micro-batch of deltas (either side may be empty) to the
    * state at `stateDir` and incrementally refresh the joined view.
    * View columns: `jk`, then left payload, then right payload —
    * callers pick non-colliding column names per side. */
  def applyBatch(spark: SparkSession,
                 leftDelta: DataFrame, rightDelta: DataFrame,
                 stateDir: String, left: Side, right: Side): Unit = synchronized {
    val lDir = s"$stateDir/left"; val rDir = s"$stateDir/right"
    val vDir = s"$stateDir/view"

    val lOld = stateOf(spark, lDir, leftDelta)
    val rOld = stateOf(spark, rDir, rightDelta)
    val lNew = CdcMerge.latestWins(lOld.unionByName(leftDelta), Seq(left.idCol), ordering)
    val rNew = CdcMerge.latestWins(rOld.unionByName(rightDelta), Seq(right.idCol), ordering)

    val lIds = leftDelta.select(col(left.idCol)).distinct()
    val rIds = rightDelta.select(col(right.idCol)).distinct()
    // affected join keys: old ∪ new key values of every touched id
    val delta = keysOf(lOld, left, lIds)
      .unionByName(keysOf(lNew, left, lIds))
      .unionByName(keysOf(rOld, right, rIds))
      .unionByName(keysOf(rNew, right, rIds))
      .distinct()

    val lLive = live(lNew).withColumnRenamed(left.joinKeyCol, "jk").filter(col("jk").isNotNull)
    val rLive = live(rNew).withColumnRenamed(right.joinKeyCol, "jk").filter(col("jk").isNotNull)
    val recompute = lLive.join(broadcast(delta), Seq("jk"), "left_semi")
      .join(rLive.join(broadcast(delta), Seq("jk"), "left_semi"), Seq("jk"))
      .drop("event_type", "lsn", "ts_ms")
    val oldView = stateOf(spark, vDir, recompute)
    val newView = oldView.join(broadcast(delta), Seq("jk"), "left_anti")
      .unionByName(recompute)

    // materialize the view FIRST (it reads the old side states), then
    // swap all three — order matters because the states are inputs
    val vTmp = s"$vDir.tmp"; val lTmp = s"$lDir.tmp"; val rTmp = s"$rDir.tmp"
    newView.write.mode("overwrite").parquet(vTmp)
    lNew.write.mode("overwrite").parquet(lTmp)
    rNew.write.mode("overwrite").parquet(rTmp)
    CdcStream.swapDirs(Paths.get(vTmp), Paths.get(vDir))
    CdcStream.swapDirs(Paths.get(lTmp), Paths.get(lDir))
    CdcStream.swapDirs(Paths.get(rTmp), Paths.get(rDir))
  }

  def readView(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/view")

  /** The executable spec: the full re-join of the CURRENT live side
    * states — what the incremental view must always equal. */
  def naiveView(spark: SparkSession, stateDir: String,
                left: Side, right: Side): DataFrame = {
    val l = live(spark.read.parquet(s"$stateDir/left"))
      .withColumnRenamed(left.joinKeyCol, "jk").filter(col("jk").isNotNull)
    val r = live(spark.read.parquet(s"$stateDir/right"))
      .withColumnRenamed(right.joinKeyCol, "jk").filter(col("jk").isNotNull)
    l.join(r, Seq("jk")).drop("event_type", "lsn", "ts_ms")
  }
}
