package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.DupSpans

/** Fused span-level ingest: [[DupSpanIngest]] (per-doc duplicated-span
  * coverage) and [[LeakageIngest]] (cross-source leakage) over ONE
  * stream, one checkpoint, and one shared gram pass per micro-batch.
  *
  * A pipeline that wants both accountings — the common case: q174's
  * coverage decides retention, q176's leakage audits train/eval
  * contamination — would otherwise run two streaming queries that
  * each re-read the source and tokenize/positional-gram the batch
  * independently (the two gram passes differ only in the carried
  * source column). Here the batch is grammed ONCE with the source
  * carried, materialized, and fed to both twins' merge bodies; the
  * coverage path ignores the extra column. Measured honestly
  * (SpanIngestBench, 200- and 4000-doc batches): the shared pass
  * saves 2-4% of per-batch compute — each twin's own state
  * maintenance (candidate joins, interval unions, two bucket patches)
  * dominates — so the operational win is the composition itself: one
  * source read, one checkpoint/offset log, and a single at-least-once
  * redelivery unit instead of two streams crashing at independent
  * offsets.
  *
  * State equivalence is exact, not approximate: each twin's merge
  * body is a deterministic function of (its stored state ∪ the gram
  * frame), and the gram frame is content-identical to what the solo
  * twins build — so all four state directories (gram index + coverage
  * state; (h, source) index + leakage state) commit byte-equal
  * content to a solo run over the same batch sequence
  * (spec-asserted, [[graft.SpanIngestSpec]]). Replay/crash semantics
  * are each twin's own: the coverage patch is min-merge idempotent,
  * the leakage patch epoch-disciplined. The two merges commit
  * independently (no cross-twin transaction) — a crash between them
  * replays the batch into both, where each twin's idempotence already
  * absorbs its own redelivery, exactly as if the two solo streams had
  * crashed at different offsets.
  */
object SpanIngest {

  /** Merge one static micro-batch into BOTH span twins' states with a
    * single shared gram pass. Parameters are the union of the twins';
    * see their docs for per-state semantics. */
  def mergeBatch(batch: DataFrame, textCol: String, idCol: String,
                 sourceCol: String,
                 covIndexDir: String, covDir: String,
                 leakIndexDir: String, leakDir: String,
                 k: Int = 5,
                 nBuckets: Int = DupSpanIngest.DefaultIndexBuckets): Unit = {
    val g = DupSpans.grams(batch, textCol, idCol, k, carry = Seq(sourceCol))
      .localCheckpoint() // one pass, two twins, many consumers
    DupSpanIngest.mergeFromGrams(batch, g, textCol, idCol,
      covIndexDir, covDir, k, nBuckets)
    LeakageIngest.mergeFromGrams(batch, g, textCol, idCol, sourceCol,
      leakIndexDir, leakDir, k, nBuckets)
    graft.operators.Iterate.unpersistCheckpoint(g)
  }

  /** Wire the fused merge into a document stream (idCol + textCol +
    * sourceCol). One stream, one checkpoint, four state dirs. */
  def run(docs: DataFrame, textCol: String, idCol: String,
          sourceCol: String, checkpointDir: String,
          covIndexDir: String, covDir: String,
          leakIndexDir: String, leakDir: String,
          trigger: Trigger = Trigger.AvailableNow(),
          k: Int = 5,
          nBuckets: Int = DupSpanIngest.DefaultIndexBuckets,
          retention: Option[ManifestState.Retention] = None): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, textCol, idCol, sourceCol,
          covIndexDir, covDir, leakIndexDir, leakDir, k, nBuckets)
        retention.foreach(_.maybePrune(batchId + 1,
          Seq(covIndexDir, covDir, leakIndexDir, leakDir)))
      }
      .start()
}
