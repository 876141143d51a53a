package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.{VectorFunctions => VF}
import graft.operators.IvfAnn

/** IVF postings maintenance ON INGEST — the streaming freshness path
  * for the similarity-search index (round-15 verdict "what's missing
  * #3"): embeddings arriving on a stream are assigned to the FITTED
  * coarse-quantizer cells and patched into a cell-bucketed postings
  * state, so index freshness no longer means a full re-partition of
  * the corpus. [[IvfAnn.fitCells]] stays the periodic REFIT (the
  * quantizer-rot story docs/SCALE.md measures); this twin keeps the
  * postings current BETWEEN refits.
  *
  * Two [[ManifestState]] states:
  *
  *   - `quantDir` (single logical table, bucketed by c_label): the
  *     fitted centroids (c_label, cv) — written by [[seed]]/[[refit]]
  *     through the same atomic manifest-swap protocol as everything
  *     else (a crash mid-refit can never leave a torn quantizer: the
  *     old manifest stays live until the new one commits).
  *   - `postingsDir` (bucket by label): (vec_id, label, v) — the IVF
  *     postings themselves, PHYSICALLY partitioned by cell. This is
  *     the layout the search path exists for: [[topKCells]] ranks the
  *     stored centroids per query and READS ONLY the probed cells'
  *     buckets — at 100 TB the nprobe/nlist scan-fraction story
  *     becomes file-level pruning, not a filter over a full scan.
  *
  * Assignment parity ([[IvfAnn.assignTo]], spec-pinned): a streamed
  * corpus produces the EXACT postings rows the batch
  * `fitCellsWithCentroids` fit produces for the same quantizer — same
  * validity filter (null/zero-norm embeddings have no cell and are
  * not stored), same deterministic tie-breaks. So `IvfAnn.topK` over
  * the streamed state equals q44 over the batch-labeled corpus,
  * row-for-row.
  *
  * Replay idempotence: the postings patch is a set union distinct'd
  * per bucket — a replayed batch re-derives identical assignments
  * (the quantizer is immutable between refits) and commits identical
  * bucket content. `vec_id` is append-only by contract (embeddings
  * are content-addressed upstream); re-ingesting a vec_id with a
  * DIFFERENT vector is refused by the dedup nature of the union only
  * if bit-identical — the stream should be fronted by
  * [[IngestDedup]]-style dedup when ids can repeat with new payloads.
  *
  * Freshness: new vectors enter cells fit on yesterday's density, so
  * recall rots exactly as the batch story measures
  * (docs/probes/ann_refit_r12.txt); [[refit]] re-fits the quantizer
  * over the CURRENT postings and atomically relabels them in place —
  * the scheduled re-quantization, now expressible without rebuilding
  * the state from the raw corpus.
  */
object IvfIngest {

  val DefaultPostingsBuckets = 64
  private val QuantBuckets = 8 // centroids are nlist rows — tiny state

  private def postingsTemplate(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Array[Double])].toDF("vec_id", "label", "v")
  }
  private def quantTemplate(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Array[Double])].toDF("c_label", "cv")
  }

  /** The stored quantizer (c_label, cv); empty if never seeded. */
  def centroids(spark: SparkSession, quantDir: String): DataFrame =
    ManifestState.read(spark, quantDir) match {
      case df if df.columns.isEmpty => quantTemplate(spark)
      case df => df
    }

  /** The full postings state (vec_id, label, v). */
  def postings(spark: SparkSession, postingsDir: String): DataFrame = {
    val m = ManifestState.readManifest(postingsDir)
    if (m.buckets.isEmpty) postingsTemplate(spark)
    else ManifestState.readSnapshot(spark, postingsDir, m)
  }

  private def commitQuantizer(cents: DataFrame, quantDir: String): Unit = {
    // full replacement: touched keys = stored ∪ new labels, closure
    // ignores current content (the quantizer is a unit, not a delta)
    val spark = cents.sparkSession
    val touched = cents.select(col("c_label"))
      .unionByName(centroids(spark, quantDir).select(col("c_label")))
      .distinct()
    ManifestState.patchBuckets(quantDir, QuantBuckets, "c_label",
      touched, quantTemplate(spark)) { _ =>
      cents.select(col("c_label"), col("cv"))
    }
    ()
  }

  /** Fit the quantizer on a seed corpus (vec_id, v) and commit BOTH
    * states: centroids + the seed corpus's postings. The fit is
    * [[IvfAnn.fitCellsWithCentroids]] — deterministic, so a re-seed
    * over the same corpus commits identical content. */
  def seed(corpus: DataFrame, postingsDir: String, quantDir: String,
           nlist: Int, iters: Int = 5,
           nBuckets: Int = DefaultPostingsBuckets): Unit = synchronized {
    val spark = corpus.sparkSession
    require(ManifestState.readManifest(quantDir).buckets.isEmpty,
      s"seed requires an empty quantizer at $quantDir — use refit to re-quantize")
    val (labeled0, cents0) = IvfAnn.fitCellsWithCentroids(corpus, nlist, iters)
    val labeled = labeled0.localCheckpoint()
    val cents = cents0.localCheckpoint()
    commitQuantizer(cents, quantDir)
    ManifestState.patchBuckets(postingsDir, nBuckets, "label",
      labeled.select(col("label")), postingsTemplate(spark))(
      _.unionByName(labeled).distinct())
    graft.operators.Checkpoints.releaseAll()
    Seq(labeled, cents).foreach(graft.operators.Iterate.unpersistCheckpoint)
  }

  /** One micro-batch of arriving embeddings (vec_id, v): assign to the
    * stored cells, patch the touched postings buckets. Unusable
    * vectors (null / zero-norm) are excluded — the fitCells
    * contract. */
  def mergeBatch(batch: DataFrame, postingsDir: String, quantDir: String,
                 nBuckets: Int = DefaultPostingsBuckets): Unit = synchronized {
    val spark = batch.sparkSession
    val cents = centroids(spark, quantDir)
    require(!ManifestState.readManifest(quantDir).buckets.isEmpty,
      s"no quantizer at $quantDir — seed one first")
    ManifestState.requireBucketCount(postingsDir, nBuckets)
    val assigned = IvfAnn.assignTo(
      batch.select(col("vec_id"), col("v")), cents).localCheckpoint()
    ManifestState.patchBuckets(postingsDir, nBuckets, "label",
      assigned.select(col("label")), postingsTemplate(spark))(
      _.unionByName(assigned).distinct())
    graft.operators.Iterate.unpersistCheckpoint(assigned)
  }

  /** Scheduled re-quantization: re-fit the quantizer over the CURRENT
    * postings and relabel them in place — quantizer first (atomic
    * swap), then one full-replacement postings patch. A crash between
    * the two commits leaves a fresh quantizer over old labels; the
    * rerun (refit is deterministic for identical postings content)
    * completes the relabel. */
  def refit(spark: SparkSession, postingsDir: String, quantDir: String,
            nlist: Int, iters: Int = 5,
            nBuckets: Int = DefaultPostingsBuckets): Unit = synchronized {
    val cur = postings(spark, postingsDir).select(col("vec_id"), col("v"))
    val (relabeled0, cents0) = IvfAnn.fitCellsWithCentroids(cur, nlist, iters)
    val relabeled = relabeled0.localCheckpoint()
    val cents = cents0.localCheckpoint()
    commitQuantizer(cents, quantDir)
    // touched keys = old ∪ new labels so every stored row's bucket is
    // rewritten (patchBuckets contract: replacement keys ⊆ touched)
    val touched = relabeled.select(col("label"))
      .unionByName(postings(spark, postingsDir).select(col("label")))
      .distinct()
    ManifestState.patchBuckets(postingsDir, nBuckets, "label",
      touched, postingsTemplate(spark))(_ => relabeled)
    graft.operators.Checkpoints.releaseAll()
    Seq(relabeled, cents).foreach(graft.operators.Iterate.unpersistCheckpoint)
  }

  /** ANN over the streamed state with PHYSICAL cell pruning: rank the
    * STORED centroids per query, read ONLY the probed cells' buckets,
    * exact cosine within them. Contract (spec-pinned): equals the
    * brute-force top-k restricted to the probed cells. The probe set
    * uses the stored quantizer (the thing the state maintains), where
    * `IvfAnn.topK` re-derives centroids as label means — run topK
    * over [[postings]] when bit-parity with q44 is the goal, this
    * when scan pruning is. */
  def topKCells(spark: SparkSession, postingsDir: String, quantDir: String,
                queries: DataFrame, nprobe: Int, k: Int,
                nBuckets: Int = DefaultPostingsBuckets): DataFrame = {
    val cents = centroids(spark, quantDir)
      .withColumn("cnrm", sqrt(VF.dot(col("cv"), col("cv"))))
    val q = queries.select(col("vec_id").as("qid"), col("v").as("qv"))
      .filter(col("qv").isNotNull && VF.dot(col("qv"), col("qv")) > 0)
      .withColumn("qnrm", sqrt(VF.dot(col("qv"), col("qv"))))
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("csim").desc, col("c_label"))
    val probes = q.join(broadcast(cents))
      .select(col("qid"), col("qv"), col("qnrm"), col("c_label"),
              when(col("cnrm") > 0,
                   VF.dot(col("qv"), col("cv")) / (col("qnrm") * col("cnrm")))
                .otherwise(lit(-2.0)).as("csim"))
      .withColumn("crn", row_number().over(wq))
      .filter(col("crn") <= nprobe)
      .select(col("qid"), col("qv"), col("qnrm"), col("c_label").as("label"))
    // file-level pruning: only the probed cells' buckets are read
    val cells = probes.select(col("label")).distinct()
    val cand = ManifestState.readBucketsOf(spark, postingsDir,
        ManifestState.bucketsOf(cells, "label", nBuckets),
        postingsTemplate(spark))
      .join(cells, Seq("label"), "left_semi")
      .withColumn("nrm", sqrt(VF.dot(col("v"), col("v"))))
    val sims = cand
      .join(broadcast(probes), Seq("label"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
              (VF.dot(col("v"), col("qv")) / (col("nrm") * col("qnrm"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Wire the merge into an embedding stream (vec_id, v), with the
    * standard retention option. */
  def run(vectors: DataFrame, checkpointDir: String,
          postingsDir: String, quantDir: String,
          trigger: Trigger = Trigger.AvailableNow(),
          nBuckets: Int = DefaultPostingsBuckets,
          retention: Option[ManifestState.Retention] = None): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, postingsDir, quantDir, nBuckets)
        retention.foreach(_.maybePrune(batchId + 1,
          Seq(postingsDir, quantDir)))
      }
      .start()
}
