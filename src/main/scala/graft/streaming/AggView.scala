package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incrementally-maintained aggregate view over a CDC stream, driven
  * by the envelope's before/after images.
  *
  * The reference enables full before-images (`REPLICA IDENTITY FULL`,
  * `V1__init.sql:9`) but its consumer ignores `before`
  * (`MessageConsumer.kt:54-56` decodes only `after`). This operator is
  * why an analytics engine wants them: with both images, an aggregate
  * (count, sum per group) is maintainable from per-event deltas —
  * O(changes) per batch instead of O(table) recomputation:
  *
  *   insert (before=null, after=x):  group(x)  += (+1, +val(x))
  *   delete (before=x, after=null):  group(x)  += (-1, -val(x))
  *   update (before=x, after=y):     group(x) += (-1, -val(x));
  *                                   group(y) += (+1, +val(y))
  *
  * Groups whose running count nets to exactly 0 are dropped from
  * state; groups with a NEGATIVE count (a delete that arrived before
  * its insert, e.g. replay across an out-of-order source) are kept as
  * compensations so the late insert still nets correctly — the view
  * ([[readView]]) exposes only n > 0. The delta aggregation is a plain
  * keyed sum — map-side combined, one shuffle per batch, no per-key
  * state operator needed.
  *
  * REQUIRES before-images on updates/deletes (REPLICA IDENTITY FULL):
  * an update arriving with `before=null` is indistinguishable from an
  * insert and double-counts its group (verified failure mode — n=2
  * for a single twice-updated row). Sources without full replica
  * identity must use the latest-wins snapshot + full recompute
  * instead ([[CdcStream.mergeBatch]]).
  */
object AggView {

  /** Decode an envelope batch into (group, d_count, d_value) deltas.
    * Group = username, value = length of message — a stand-in metric;
    * any (groupCol, valueExpr) pair works the same way. */
  def deltas(raw: DataFrame): DataFrame = {
    val before = col("value.before")
    val after = col("value.after")
    val minus = when(before.isNotNull, struct(
      before.getField("username").as("g"),
      lit(-1L).as("dc"),
      (-length(before.getField("message"))).cast("long").as("dv")))
    val plus = when(after.isNotNull, struct(
      after.getField("username").as("g"),
      lit(1L).as("dc"),
      length(after.getField("message")).cast("long").as("dv")))
    raw.select(explode(array(minus, plus)).as("d"))
      .filter(col("d").isNotNull)
      .select(col("d.g").as("username"), col("d.dc"), col("d.dv"))
  }

  /** Merge one micro-batch of deltas into the aggregate state at
    * `stateDir` (parquet snapshot; same swap discipline as
    * [[CdcStream.mergeBatch]]). */
  def mergeDeltas(batchDeltas: DataFrame, stateDir: String): Unit = synchronized {
    val spark = batchDeltas.sparkSession
    val statePath = Paths.get(stateDir)
    val agg = batchDeltas.groupBy(col("username"))
      .agg(sum(col("dc")).as("n"), sum(col("dv")).as("total_chars"))
    val merged =
      if (CdcStream.statePresent(statePath))
        spark.read.parquet(stateDir).unionByName(agg)
          .groupBy(col("username"))
          .agg(sum(col("n")).as("n"), sum(col("total_chars")).as("total_chars"))
      else agg
    // Keep every group with a non-zero running count. A negative count
    // is a delete replayed/delivered before its insert: dropping it
    // here would lose the compensating -1 and double-count the later
    // insert. Negative groups stay in state until the insert nets them
    // to zero (dropped) or positive (real); readView hides them.
    val newState = merged.filter(col("n") =!= 0)
    val tmp = stateDir + ".tmp"
    newState.write.mode("overwrite").parquet(tmp)
    CdcStream.swapDirs(Paths.get(tmp), statePath)
  }

  /** Run the maintained view over an envelope file stream. */
  def run(spark: SparkSession, inputDir: String, checkpointDir: String,
          stateDir: String, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .schema(CdcStream.fileRecordSchema)
      .json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeDeltas(deltas(batch), stateDir)
      }
      .start()

  /** The queryable view: groups with a positive count. In-flight
    * compensation groups (n < 0, delete seen before its insert) are
    * state, not results. */
  def readView(spark: SparkSession, stateDir: String): DataFrame =
    if (CdcStream.statePresent(Paths.get(stateDir)))
      spark.read.parquet(stateDir).filter(col("n") > 0)
    else spark.emptyDataFrame
}
