package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Winnow

/** Span-level dup detection ON INGEST: the streaming twin of
  * `q149_winnow_spans`, layered the same way [[IngestDedup]] twins
  * q12. Where IngestDedup drops EXACT duplicates by whole-document
  * fingerprint, this flags documents arriving with COPIED SPANS —
  * shared winnowed fingerprints ([[Winnow]]) against anything already
  * ingested or earlier in the same batch.
  *
  * Per micro-batch:
  *   1. winnow the incoming docs (per-doc window pass, map-side);
  *   2. pair-join the batch's selected fingerprints against
  *      (index ∪ batch) — candidates are batch-vs-history and
  *      batch-vs-batch; history never self-joins (the same asymmetric
  *      probe discipline as [[graft.operators.IncrementalDedup]]), so
  *      per-batch cost follows batch size, not corpus size;
  *   3. PATCH flagged pairs into the bucketed state at `pairsDir`
  *      (bucket by doc_a, max-merged content — see [[pairs]]) and
  *      append the batch's fingerprints to `indexDir` so the NEXT
  *      batch sees them.
  *
  * Replay idempotence mirrors IngestDedup: a crash between appends can
  * double-append fingerprints, so the index is a SET contract
  * (readers distinct on (doc_id, h)) and re-emitted pairs dedup on
  * (doc_a, doc_b).
  *
  * The hot-gram guard is evaluated at EMISSION time against the
  * current (index ∪ batch) document frequency: once a fingerprint's
  * df exceeds `maxDf` (site boilerplate), it stops generating new
  * candidate pairs from that batch on. Pairs already emitted stand —
  * the guard bounds future quadratic blowup, it does not rewrite
  * history. With no hot grams in the corpus the cumulative pair set
  * is EXACTLY the batch recompute (spec-asserted).
  */
object WinnowIngest {

  /** Current fingerprint index as a set (replay double-appends
    * removed). Empty if nothing ingested yet. */
  def index(spark: SparkSession, indexDir: String): DataFrame = {
    import spark.implicits._
    if (FsUtil.exists(spark, indexDir))
      spark.read.parquet(indexDir).select($"doc_id", $"h").distinct()
    else Seq.empty[(Long, Long)].toDF("doc_id", "h")
  }

  private def pairsTemplate(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Long, Double)]
      .toDF("doc_a", "doc_b", "n_shared", "overlap_r")
  }

  /** Flagged pairs so far: (doc_a, doc_b, n_shared, overlap_r),
    * deduped on the pair key (replay contract). The same pair can be
    * re-emitted by later batches with different stats (n_shared and
    * overlap_r are computed against the emission-time index), so the
    * survivor must be deterministic: the strongest evidence wins —
    * max n_shared, with overlap_r taken from that same emission
    * (max_by). A bare dropDuplicates would keep an arbitrary row and
    * make repeated reads disagree.
    *
    * The max-merge is folded into the PATCH closure and the state
    * lives in [[ManifestState]]'s bucketed layout (bucket by doc_a,
    * pre-merged one-row-per-pair content), so this read is a plain
    * snapshot scan: file count bounded by nBuckets ×
    * (1 + keepGenerations) instead of one fragment per batch, and no
    * full-log groupBy per readout. */
  def pairs(spark: SparkSession, pairsDir: String): DataFrame = {
    val m = ManifestState.readManifest(pairsDir)
    if (m.buckets.isEmpty) {
      // loud upgrade guard: a pre-round-15 append-mode pair log must
      // not silently read as empty
      FsUtil.requireNotAppendLayout(spark, pairsDir,
        "re-seed the bucketed pair state from the fragments first")
      pairsTemplate(spark)
    } else ManifestState.readSnapshot(spark, pairsDir, m)
  }

  /** Patch pair emissions into the bucketed state's touched buckets
    * with pre-merged strongest-evidence content (max over the
    * (n_shared, overlap_r) struct — associative, so the folded merge
    * equals a read-time merge over the full emission history).
    * Package-visible so the determinism contract is spec-testable
    * against synthetic double-emissions. */
  private[graft] def patchPairs(newPairs: DataFrame, pairsDir: String,
                                nBuckets: Int): Unit = {
    ManifestState.patchBuckets(pairsDir, nBuckets, "doc_a",
      newPairs.select(col("doc_a")), pairsTemplate(newPairs.sparkSession)) { current =>
      current.unionByName(newPairs)
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(max(struct(col("n_shared"), col("overlap_r"))).as("s"))
        .select(col("doc_a"), col("doc_b"),
                col("s.n_shared").as("n_shared"),
                col("s.overlap_r").as("overlap_r"))
    }
    ()
  }

  /** Merge one static micro-batch of documents (idCol, textCol). */
  def mergeBatch(batch: DataFrame, textCol: String, idCol: String,
                 indexDir: String, pairsDir: String,
                 k: Int = 5, w: Int = 4, minShared: Long = 3L,
                 maxDf: Long = 20L,
                 nBuckets: Int = DupSpanIngest.DefaultIndexBuckets): Unit = synchronized {
    val spark = batch.sparkSession
    ManifestState.requireBucketCount(pairsDir, nBuckets)
    if (ManifestState.readManifest(pairsDir).buckets.isEmpty)
      FsUtil.requireNotAppendLayout(spark, pairsDir,
        "re-seed the bucketed pair state from the fragments first")
    val batchSel = Winnow.selectFingerprints(batch, textCol, idCol, k, w)
      .withColumnRenamed(idCol, "doc_id")
      .localCheckpoint() // joined twice below + appended; compute once
    val hist = index(spark, indexDir)

    // Asymmetric probe: every candidate pair has >=1 side in the batch.
    // Seen = history ∪ batch; guard df computed over Seen (emission-
    // time df). The join keeps (batch x seen) then a < b orientation
    // dedups batch-vs-batch pairs counted twice.
    val seen = hist.unionByName(batchSel).distinct()
    val guardOk = seen.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select(col("h"))
    val gBatch = batchSel.join(guardOk, "h")
    val gSeen = seen.join(guardOk, "h")
    val selN = gSeen.groupBy(col("doc_id")).agg(count(lit(1)).as("sel_n"))

    val newPairs = gBatch.select(col("doc_id").as("p"), col("h"))
      .join(gSeen.select(col("doc_id").as("q"), col("h")), "h")
      .filter(col("p") =!= col("q"))
      .select(least(col("p"), col("q")).as("doc_a"),
              greatest(col("p"), col("q")).as("doc_b"), col("h"))
      .distinct() // batch-vs-batch pairs appear once per orientation
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .join(selN.select(col("doc_id").as("doc_a"), col("sel_n").as("na")), "doc_a")
      .join(selN.select(col("doc_id").as("doc_b"), col("sel_n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        round(col("n_shared").cast("double") /
          least(col("na"), col("nb")).cast("double"), 4).as("overlap_r"))

    val np = newPairs.localCheckpoint() // bucket list + patch closure
    patchPairs(np, pairsDir, nBuckets)
    batchSel.write.mode("append").parquet(indexDir)
    graft.operators.Iterate.unpersistCheckpoint(np)
    graft.operators.Iterate.unpersistCheckpoint(batchSel)
  }

  /** Wire the merge into a document stream (any streaming DataFrame
    * with idCol + textCol); the winnowing/guard knobs forward to
    * every batch so stream and batch-test configurations agree. */
  def run(docs: DataFrame, textCol: String, idCol: String,
          checkpointDir: String, indexDir: String, pairsDir: String,
          trigger: Trigger = Trigger.AvailableNow(),
          k: Int = 5, w: Int = 4, minShared: Long = 3L,
          maxDf: Long = 20L,
          nBuckets: Int = DupSpanIngest.DefaultIndexBuckets): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch, textCol, idCol, indexDir, pairsDir,
          k, w, minShared, maxDf, nBuckets)
      }
      .start()
}
