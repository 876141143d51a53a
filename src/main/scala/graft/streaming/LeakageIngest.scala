package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.DupSpans

/** Cross-source span leakage ON INGEST: the streaming twin of
  * `q176_source_leakage`, completing the dup-span family's symmetry
  * the way [[DupSpanIngest]] twins q177. Each arriving batch of
  * documents is scored for which OTHER sources (anything already
  * ingested, or elsewhere in the same batch) carry its 5-grams, and
  * the (h, source) gram index advances so the NEXT batch sees it.
  *
  * Per micro-batch:
  *   1. one positional-gram pass over the batch with the source
  *      carried through the Generate (never re-joined);
  *   2. counterpart sources = the batch's DISTINCT (h, source) ∪ the
  *      index rows in the batch's buckets — fanout per position stays
  *      bounded by |sources|, and history text is never re-read;
  *   3. append per-(doc, counterpart) leakage rows
  *      (doc_id, src, src_other, leaked_tokens) to `leakDir` and PATCH
  *      the batch's (h, source) rows into the bucketed index at
  *      `indexDir` ([[ManifestState]] layout, same discipline as
  *      [[DupSpanIngest.DefaultIndexBuckets]]).
  *
  * Replay idempotence (at-least-once redelivery of the LATEST batch):
  * the index at (h, source) grain is a SET contract — the patch
  * re-distincts, so a replayed patch commits identical bucket
  * content — and the leakage predicate is "a DIFFERENT source carries
  * the gram", so a batch re-scored against an index already holding
  * its own (h, source) rows can never see ITSELF as a counterpart:
  * same-source matches are filtered, and any cross-source row the
  * replay finds was already found by the first delivery (spec-
  * asserted value-identity; readers dedup on (doc_id, src_other)).
  * Re-merging an OLDER batch after later ingests re-scores it against
  * a grown source set — same monotone-replay precondition as
  * [[DupSpanIngest.mergeBatch]]; [[leakage]]'s min-merge keeps the
  * original rows deterministic for keys both emissions share.
  *
  * As-of-arrival semantics (the q177 contract transplanted): a batch
  * doc's leakage counts sources seen UP TO its arrival; earlier docs
  * are not retroactively re-scored when a new source later copies
  * them. The cumulative per-doc rows therefore equal
  * [[DupSpans.crossSourceLeakagePerDoc]] over history ∪ batch
  * restricted to the batch's doc ids, batch by batch (spec-asserted).
  */
object LeakageIngest {

  private def indexTemplate(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, String)].toDF("h", "source")
  }

  /** Current (h, source) gram index — stored distinct, bucketed by h.
    * Empty if nothing ingested yet. */
  def index(spark: SparkSession, indexDir: String): DataFrame = {
    val m = ManifestState.readManifest(indexDir)
    if (m.buckets.isEmpty) indexTemplate(spark)
    else ManifestState.readSnapshot(spark, indexDir, m)
  }

  /** Per-doc leakage rows so far: (doc_id, src, src_other,
    * leaked_tokens), exact replays collapsed; for out-of-order
    * re-merges the MIN per (doc_id, src_other) — the as-of-first-
    * arrival score — wins deterministically (src is functionally
    * dependent on doc_id, so it rides through the min struct). */
  def leakage(spark: SparkSession, leakDir: String): DataFrame = {
    import spark.implicits._
    if (FsUtil.exists(spark, leakDir))
      spark.read.parquet(leakDir)
        .groupBy($"doc_id", $"src_other")
        .agg(min(struct($"leaked_tokens", $"src")).as("m"))
        .select($"doc_id", $"m.src".as("src"), $"src_other",
          $"m.leaked_tokens".as("leaked_tokens"))
    else Seq.empty[(Long, String, String, Long)]
      .toDF("doc_id", "src", "src_other", "leaked_tokens")
  }

  /** The cumulative leakage matrix: (src, src_other, leaked_tokens)
    * summed over ingested docs — pairs with observed leakage only
    * (join a source domain for zero rows, as q176 does). */
  def matrix(spark: SparkSession, leakDir: String): DataFrame =
    leakage(spark, leakDir)
      .groupBy(col("src"), col("src_other"))
      .agg(sum(col("leaked_tokens")).as("leaked_tokens"))

  /** Merge one static micro-batch of documents (idCol, textCol,
    * sourceCol). Same monotone-replay precondition as
    * [[DupSpanIngest.mergeBatch]] (see object doc). */
  def mergeBatch(batch: DataFrame, textCol: String, idCol: String,
                 sourceCol: String, indexDir: String, leakDir: String,
                 k: Int = 5,
                 nBuckets: Int = DupSpanIngest.DefaultIndexBuckets): Unit =
    synchronized {
      val spark = batch.sparkSession
      val g = DupSpans.grams(batch, textCol, idCol, k, carry = Seq(sourceCol))
        .localCheckpoint() // counterpart build + leakage join
      val bySrc = g.select(col("h"), col(sourceCol).as("source")).distinct()
        .localCheckpoint() // bucket list + counterpart union + patch retries
      val buckets = ManifestState.bucketsOf(bySrc, "h", nBuckets)
      val hist = ManifestState.readBucketsOf(
        spark, indexDir, buckets, indexTemplate(spark))
      val counterpart = hist.unionByName(bySrc).distinct()
        .withColumnRenamed("source", "src_other")
      val leaked = g.join(counterpart, "h")
        .filter(col(sourceCol) =!= col("src_other"))
        .select(col(idCol), col("pos"), col(sourceCol).as("src"), col("src_other"))
      val rows = DupSpans.intervalUnion(leaked, Seq(idCol, "src", "src_other"), k)
        .withColumnRenamed("tokens", "leaked_tokens")
        .withColumnRenamed(idCol, "doc_id")

      rows.write.mode("append").parquet(leakDir)
      ManifestState.patchBuckets(indexDir, nBuckets, "h",
        bySrc.select(col("h")), indexTemplate(spark)) { current =>
        current.unionByName(bySrc).distinct()
      }
      graft.operators.Iterate.unpersistCheckpoint(bySrc)
      graft.operators.Iterate.unpersistCheckpoint(g)
    }

  /** Wire the merge into a document stream (any streaming DataFrame
    * with idCol + textCol + sourceCol). */
  def run(docs: DataFrame, textCol: String, idCol: String,
          sourceCol: String, checkpointDir: String, indexDir: String,
          leakDir: String, trigger: Trigger = Trigger.AvailableNow(),
          k: Int = 5,
          nBuckets: Int = DupSpanIngest.DefaultIndexBuckets): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch, textCol, idCol, sourceCol, indexDir, leakDir, k, nBuckets)
      }
      .start()
}
