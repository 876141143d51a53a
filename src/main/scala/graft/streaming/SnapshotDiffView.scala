package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incrementally-maintained snapshot diff — the streaming twin of
  * `q150_snapshot_diff`: where q150 answers "what changed between two
  * cutoffs" with one batch aggregate, this maintains the latest-wins
  * view continuously and emits, per micro-batch, the per-key diff THAT
  * BATCH produced (added / changed / same with the value delta) — the
  * audit log of what each batch window did to the table.
  *
  * Per micro-batch over events (user_id, ts, event_id, value):
  *   1. reduce the batch to its per-key winner (one groupBy on the
  *      batch only — cost follows batch size);
  *   2. left-join the prior state on the touched keys, decide the
  *      per-key winner by the same (ts, event_id) total order q150
  *      uses (late/out-of-order events that lose emit `same`, they
  *      never regress the view);
  *   3. append the diff rows to `diffDir`, swap the updated state —
  *      carryover of untouched keys is an anti-join, exactly the
  *      [[Scd2View.mergeBatch]] touched-slice discipline, so at 100 TB
  *      the state is bucketed and a batch rewrites only its buckets.
  *
  * Parity contract (spec-asserted): after any prefix of ts-ordered
  * batches, (a) the state equals the batch latest-wins recompute over
  * all events so far, and (b) the non-`same` diff rows of batch k
  * equal q150's classification between the k-1 and k cutoffs (q150
  * additionally lists every untouched key as `same`; the stream emits
  * diffs only for touched keys).
  */
object SnapshotDiffView {

  /** Merge one events-shaped micro-batch into the view at `stateDir`,
    * writing the batch's diff rows under `diffDir/batch_seq=<id>` —
    * overwrite per batch id, so an at-least-once replay of a batch
    * rewrites its own diff slice instead of double-appending. */
  def mergeBatch(batch: DataFrame, stateDir: String, diffDir: String,
                 batchId: Long): Unit = synchronized {
    // batchId is deliberately non-defaultable: with a default of 0,
    // two bare calls would silently no-op the second one at the
    // replay fence (0 <= 0). Ids must strictly increase per state dir.
    val spark = batch.sparkSession
    val statePath = Paths.get(stateDir)

    // Replay fence. A diff computed against POST-batch state would
    // degrade every `changed` row to `same`, so a redelivered batch
    // must be skipped outright, not re-merged. The applied batch id
    // travels INSIDE the state dir (underscore files are invisible to
    // the parquet reader) so the swap below commits state + fence
    // together; the diff slice is written BEFORE the swap, making
    // every crash window replay-clean: before the swap, state is
    // unchanged and the recompute overwrites an identical slice;
    // after it, the fence skips the whole merge. Spark replays at
    // most the LAST uncommitted batch, so the only legitimate ids are
    // `applied` (exact replay → skip) and anything above; an id BELOW
    // `applied` means the streaming checkpoint was wiped while the
    // state dir survived — silently skipping would drop every batch
    // until ids catch up, so that desync is an error, not a no-op.
    val applied =
      if (CdcStream.statePresent(statePath)) appliedBatch(statePath) else -1L
    if (applied == batchId) return
    if (applied > batchId)
      throw new IllegalStateException(
        s"state at $stateDir has applied batch $applied but received batch " +
        s"$batchId: the streaming checkpoint and the state dir are out of " +
        "sync (checkpoint dir wiped while state was kept?); refusing to " +
        "silently drop batches")

    // Per-key batch winner by the (ts, event_id) total order; value
    // rides in the struct but never decides (the pair is unique).
    val delta = batch
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("d"))

    val old =
      if (Files.exists(statePath)) spark.read.parquet(stateDir) // healed by the fence check above
      else emptyState(spark)

    val touchedOld = old.join(delta.select(col("user_id")), Seq("user_id"), "left_semi")
      .select(col("user_id"), struct(col("ts"), col("event_id"), col("value")).as("o"))

    val merged = delta.join(touchedOld, Seq("user_id"), "left")
      .select(col("user_id"), col("o"),
        when(col("o").isNull || col("d") > col("o"), col("d")).otherwise(col("o")).as("n"))
      .localCheckpoint() // read twice: diff emission + state rewrite

    val diff = merged.select(
      col("user_id"),
      round(col("o.value"), 4).as("v1_r"),
      round(col("n.value"), 4).as("v2_r"),
      when(col("o").isNull, lit("added"))
        .when(col("o.value") === col("n.value"), lit("same"))
        .otherwise(lit("changed")).as("status"),
      round(col("n.value") - col("o.value"), 4).as("delta_r"))
    diff.write.mode("overwrite").parquet(s"$diffDir/batch_seq=$batchId")

    val carryover = old.join(delta.select(col("user_id")), Seq("user_id"), "left_anti")
    val nextState = carryover.unionByName(
      merged.select(col("user_id"), col("n.ts").as("ts"),
        col("n.event_id").as("event_id"), col("n.value").as("value")))
    val tmp = stateDir + ".tmp"
    nextState.write.mode("overwrite").parquet(tmp)
    Files.write(Paths.get(tmp, AppliedMarker), batchId.toString.getBytes)
    CdcStream.swapDirs(Paths.get(tmp), statePath)
    graft.operators.Iterate.unpersistCheckpoint(merged)
  }

  /** Bucketed merge — the 100 TB layout the plain [[mergeBatch]]'s
    * O(state) carryover rewrite approximates: state lives as
    * `stateDir/b=<n>` partitions keyed by hash(user_id) % nBuckets,
    * and a micro-batch reads and rewrites ONLY its touched buckets
    * (the [[CdcStream.mergeBatchBucketed]] discipline, with per-bucket
    * crash-safe swaps).
    *
    * Replay protocol differs from the plain merge BY CONSTRUCTION
    * rather than by fence: the bucket merge is idempotent (a re-merged
    * delta loses to the state it already produced under the
    * (ts, event_id) order — and an id-regressed delta simply loses to
    * newer state), so only the DIFF needs protection: a slice that
    * already committed (its `_SUCCESS` marker exists) is never
    * rewritten, because a replay after a partial bucket swap would
    * recompute it against half-updated state and degrade `changed`
    * rows to `same`. Diff first, bucket swaps after — every crash
    * window replays clean.
    */
  def mergeBatchBucketed(batch: DataFrame, stateDir: String, diffDir: String,
                         batchId: Long, nBuckets: Int): Unit = synchronized {
    require(nBuckets > 0)
    val spark = batch.sparkSession
    val delta = batch
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("d"))
      .withColumn("b", pmod(xxhash64(col("user_id")), lit(nBuckets)).cast("int"))
      .localCheckpoint() // affected-bucket list + two joins below
    try {
      val affected = delta.select("b").distinct().collect().map(_.getInt(0)).sorted
      if (affected.isEmpty) {
        if (!diffCommitted(diffDir, batchId))
          emptyDiff(spark).write.mode("overwrite")
            .parquet(s"$diffDir/batch_seq=$batchId")
        return
      }
      val existing = affected.map(b => s"$stateDir/b=$b")
        .filter(p => CdcStream.statePresent(Paths.get(p)))
      val old =
        if (existing.nonEmpty)
          spark.read.option("basePath", stateDir).parquet(existing: _*)
        else emptyState(spark).withColumn("b", lit(0).cast("int"))

      val touchedOld = old.join(delta.select(col("user_id")), Seq("user_id"), "left_semi")
        .select(col("user_id"), struct(col("ts"), col("event_id"), col("value")).as("o"))
      val merged = delta.join(touchedOld, Seq("user_id"), "left")
        .select(col("user_id"), col("b"), col("o"),
          when(col("o").isNull || col("d") > col("o"), col("d")).otherwise(col("o")).as("n"))
        .localCheckpoint() // diff emission + bucket rewrite

      try {
        if (!diffCommitted(diffDir, batchId))
          merged.select(
            col("user_id"),
            round(col("o.value"), 4).as("v1_r"),
            round(col("n.value"), 4).as("v2_r"),
            when(col("o").isNull, lit("added"))
              .when(col("o.value") === col("n.value"), lit("same"))
              .otherwise(lit("changed")).as("status"),
            round(col("n.value") - col("o.value"), 4).as("delta_r"))
            .write.mode("overwrite").parquet(s"$diffDir/batch_seq=$batchId")

        // Touched buckets rewrite: their untouched keys carry over,
        // merged winners replace the touched keys. One writer and one
        // file per bucket (repartition before partitionBy).
        val rewritten = old
          .join(delta.select(col("user_id")), Seq("user_id"), "left_anti")
          .unionByName(merged.select(col("user_id"), col("n.ts").as("ts"),
            col("n.event_id").as("event_id"), col("n.value").as("value"), col("b")))
        val tmp = stateDir + ".tmpb"
        rewritten.repartition(col("b"))
          .write.mode("overwrite").partitionBy("b").parquet(tmp)
        Files.createDirectories(Paths.get(stateDir))
        affected.foreach { b =>
          val src = Paths.get(s"$tmp/b=$b")
          if (Files.exists(src)) CdcStream.swapDirs(src, Paths.get(s"$stateDir/b=$b"))
        }
        CdcStream.deleteRecursively(Paths.get(tmp))
      } finally graft.operators.Iterate.unpersistCheckpoint(merged)
    } finally graft.operators.Iterate.unpersistCheckpoint(delta)
  }

  private def diffCommitted(diffDir: String, batchId: Long): Boolean =
    Files.exists(Paths.get(s"$diffDir/batch_seq=$batchId", "_SUCCESS"))

  private def emptyDiff(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("user_id", LongType), StructField("v1_r", DoubleType),
        StructField("v2_r", DoubleType), StructField("status", StringType),
        StructField("delta_r", DoubleType))))
  }

  /** The bucketed view (partition column dropped). Goes through the
    * state-read gate so a bucket stranded mid-swap is healed first. */
  def readViewBucketed(spark: SparkSession, stateDir: String): DataFrame =
    if (CdcStream.statePresent(Paths.get(stateDir)))
      spark.read.parquet(stateDir).drop("b")
    else emptyState(spark)

  private val AppliedMarker = "_applied_batch"

  private def appliedBatch(statePath: java.nio.file.Path): Long = {
    val m = statePath.resolve(AppliedMarker)
    if (Files.exists(m)) new String(Files.readAllBytes(m)).trim.toLong else -1L
  }

  private def emptyState(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("user_id", LongType), StructField("ts", TimestampType),
        StructField("event_id", LongType), StructField("value", DoubleType))))
  }

  /** The maintained latest-wins view. */
  def readView(spark: SparkSession, stateDir: String): DataFrame =
    if (CdcStream.statePresent(Paths.get(stateDir))) spark.read.parquet(stateDir)
    else emptyState(spark)

  /** One batch's diff slice (empty if the batch touched nothing). */
  def readDiff(spark: SparkSession, diffDir: String, batchId: Long): DataFrame =
    spark.read.parquet(s"$diffDir/batch_seq=$batchId")

  /** Wire the merge into a streaming events source. */
  def run(events: DataFrame, checkpointDir: String, stateDir: String,
          diffDir: String, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        mergeBatch(batch, stateDir, diffDir, id)
      }
      .start()
}
