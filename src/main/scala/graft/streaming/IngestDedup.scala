package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.{TextFunctions => TF}

/** Dedup-on-ingest: exact content deduplication applied to a document
  * STREAM as it lands, instead of as a periodic batch sweep — the
  * shape a training-data pipeline actually runs (crawl → ingest →
  * dedup → corpus), streaming twin of the batch q12 contract and the
  * per-batch spelling of [[graft.operators.IncrementalDedup]]'s exact
  * tier.
  *
  * Three duplicate horizons, three mechanisms:
  *
  *   1. IN-BATCH + IN-HORIZON: the stream is keyed by content
  *      fingerprint ([[TF.fingerprint]]: md5 of the
  *      whitespace/case-canonical text — a fixed 32-byte key, never
  *      the full text) and deduped with
  *      `dropDuplicatesWithinWatermark`, whose per-key state is
  *      EVICTED once the watermark passes — bounded state, unlike
  *      plain `dropDuplicates` whose map grows with distinct keys
  *      forever.
  *   2. CROSS-HORIZON / HISTORICAL: each micro-batch anti-joins the
  *      persistent fingerprint index of everything already ingested —
  *      a stream-static equi-join on the 32-byte key. At 100 TB the
  *      index is a bucketed table on fp (or a bloom prefilter in
  *      front of it, [[graft.operators.BloomPrefilter]]); the text of
  *      the historical corpus is never read.
  *   3. INDEX MAINTENANCE: survivors append (doc_id, fp) back to the
  *      index inside the same `foreachBatch`, so the NEXT batch sees
  *      them — the index is re-read per batch, not captured once at
  *      query start. A crash between the append and the checkpoint
  *      commit can replay a batch and double-append fingerprints;
  *      the index is therefore a SET contract (readers distinct it,
  *      [[historyIndex]]) and the anti-join stays idempotent.
  *
  * Reference tie-in: the reference pipeline has no dedup at all (its
  * keyed map is latest-WINS, id-keyed — `static/index.html:87-89`);
  * this is north-star training-pipeline surface per SURVEY.md §2.B.
  */
object IngestDedup {

  /** Canonical-content fingerprint column, shared with q12/q103/q143
    * so batch and streaming dedup agree on what "exact duplicate"
    * means. */
  def withFingerprint(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("fp", TF.fingerprint(col(textCol)))

  /** Declarative in-stream slice: first-seen-per-fingerprint within
    * the watermark horizon survives. State is per-fp and evicted at
    * the horizon. */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
                  watermark: String): DataFrame =
    withFingerprint(docs, textCol)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** The fingerprint index as a readable set (dedups replay
    * double-appends; see the idempotence note above). Empty frame if
    * nothing has been ingested yet. */
  def historyIndex(spark: SparkSession, indexDir: String): DataFrame = {
    import spark.implicits._
    if (FsUtil.exists(spark, indexDir))
      spark.read.parquet(indexDir).select($"fp").distinct()
    else Seq.empty[String].toDF("fp")
  }

  /** Full ingest pipeline: watermarked in-stream dedup → per-batch
    * anti-join against the historical index → append survivors to
    * `outDir` and their fingerprints to `indexDir`. Default trigger is
    * the continuous micro-batch one (a live ingest keeps consuming);
    * pass `Trigger.AvailableNow()` for drain-and-stop backfills. */
  def runIngest(spark: SparkSession, docs: DataFrame, textCol: String,
                tsCol: String, watermark: String, checkpointDir: String,
                outDir: String, indexDir: String,
                trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    dedupStream(docs, textCol, tsCol, watermark)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // The in-stream dedup guarantees fp-uniqueness only across
        // the stateful horizon; a batch can still carry one row per
        // fp that collides with history — and the index must be the
        // CURRENT one (previous batches' appends included), so it is
        // read here, not captured at stream build.
        val fresh = batch
          .join(historyIndex(spark, indexDir), Seq("fp"), "left_anti")
          .localCheckpoint() // two writes below; don't recompute the join
        fresh.write.mode("append").parquet(outDir)
        fresh.select("fp").write.mode("append").parquet(indexDir)
      }
      .start()
}
