package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.operators.DupSpans
import graft.streaming.DupSpanIngest

/** Streaming-ingest twin of q177 (DupSpanIngest): each batch's
  * coverage must equal the batch-mode operator against the history at
  * arrival, and at-least-once redelivery must not change anything —
  * including the self-in-index hazard the min/max-id predicate exists
  * for.
  */
class DupSpanIngestSpec extends SparkSpec {

  // A 7-token span copied across batches; fillers unique per doc.
  private val span = "alpha bravo charlie delta echo foxtrot golf"
  private val batch1 = Seq(
    (1L, s"one two three $span four five"),
    (2L, "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10"))
  private val batch2 = Seq(
    (10L, s"red green $span blue cyan"),        // leaks from batch1
    (11L, "m1 m2 m3 m4 m5 n1 n2"),              // in-batch dup with 12
    (12L, "z9 m1 m2 m3 m4 m5 z8"),
    (13L, "c1 c2 c3 c4 c5 c6"))                 // clean

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def covMap(df: DataFrame): Map[Long, (Long, Long)] = {
    import spark.implicits._
    df.select($"doc_id", $"n_tokens", $"dup_tokens")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("each ingested batch scores exactly as the batch-mode operator at arrival") {
    val root = Files.createTempDirectory("dupspaningest").toString
    val (idx, cov) = (s"$root/index", s"$root/cov")

    DupSpanIngest.mergeBatch(docs(batch1), "text", "doc_id", idx, cov)
    DupSpanIngest.mergeBatch(docs(batch2), "text", "doc_id", idx, cov)

    val got = covMap(DupSpanIngest.coverages(spark, cov))
    // batch1 arrived on an empty history: plain coverage of batch1
    val want1 = covMap(DupSpans.coverage(docs(batch1), "text", "doc_id", k = 5))
    // batch2 arrived with batch1 as history: the q177 operator
    val want2 = covMap(DupSpans.coverageAgainst(docs(batch2),
      DupSpans.gramIndex(docs(batch1), "text", "doc_id", k = 5),
      "text", "doc_id", k = 5))
    assert(got == want1 ++ want2)
    // The fixture exercises all three duplication shapes.
    assert(got(10L)._2 == 7L, "cross-batch leak covers the 7-token span")
    assert(got(11L)._2 == 5L && got(12L)._2 == 5L, "in-batch dup")
    assert(got(13L)._2 == 0L && got(2L)._2 == 0L, "clean docs report zero")
    // ...and batch1's span tokens were NOT retroactively flagged
    // (coverage is as-of arrival; doc 1 predates the copy in doc 10).
    assert(got(1L)._2 == 0L)
  }

  test("at-least-once redelivery leaves coverage rows unchanged (self-in-index)") {
    val root = Files.createTempDirectory("dupspanreplay").toString
    val (idx, cov) = (s"$root/index", s"$root/cov")

    DupSpanIngest.mergeBatch(docs(batch1), "text", "doc_id", idx, cov)
    DupSpanIngest.mergeBatch(docs(batch2), "text", "doc_id", idx, cov)
    val before = covMap(DupSpanIngest.coverages(spark, cov))
    // redelivery: batch2's grams are already in the index, including
    // its UNIQUE grams — a bare hash-set index would now flip every
    // replayed position to duplicated; the min/max-id predicate must
    // recognize self and reproduce identical rows.
    DupSpanIngest.mergeBatch(docs(batch2), "text", "doc_id", idx, cov)
    val after = covMap(DupSpanIngest.coverages(spark, cov))
    assert(after == before)
    assert(after(13L)._2 == 0L, "replayed unique content must stay unduplicated")
  }

  test("re-merging an OLDER batch after later ingests leaves coverage rows unchanged") {
    val root = Files.createTempDirectory("dupspanolder").toString
    val (idx, cov) = (s"$root/index", s"$root/cov")
    DupSpanIngest.mergeBatch(docs(batch1), "text", "doc_id", idx, cov)
    DupSpanIngest.mergeBatch(docs(batch2), "text", "doc_id", idx, cov)
    val before = covMap(DupSpanIngest.coverages(spark, cov))
    // Out-of-order replay, beyond the streaming at-least-once contract
    // (which only redelivers the LATEST batch): batch1's span gram now
    // has max_id = 10 in the index (doc 10 copied it), so this
    // re-merge EMITS a retroactive dup_tokens = 7 row for doc 1 — the
    // min-merge in coverages() must keep the as-of-arrival 0 instead
    // of letting an arbitrary survivor make reads nondeterministic.
    DupSpanIngest.mergeBatch(docs(batch1), "text", "doc_id", idx, cov)
    val after = covMap(DupSpanIngest.coverages(spark, cov))
    assert(after == before)
    assert(after(1L)._2 == 0L, "doc 1 keeps its as-of-arrival coverage")
  }

  test("a pre-round-15 append-mode coverage log is refused loudly, never silently reset") {
    import spark.implicits._
    val root = Files.createTempDirectory("dupspanlegacy").toString
    // the round-14 layout: bare coverage fragments at the top level
    Seq((1L, 10L, 0L)).toDF("doc_id", "n_tokens", "dup_tokens")
      .write.parquet(s"$root/cov")
    intercept[IllegalArgumentException] {
      DupSpanIngest.coverages(spark, s"$root/cov")
    }
    intercept[IllegalArgumentException] {
      DupSpanIngest.mergeBatch(docs(batch1), "text", "doc_id",
        s"$root/index", s"$root/cov")
    }
  }

  test("a third batch sees grams from every earlier batch through the merged index") {
    val root = Files.createTempDirectory("dupspanthree").toString
    val (idx, cov) = (s"$root/index", s"$root/cov")
    val batch3 = Seq((20L, s"w1 w2 $span w3 w4"),          // span from batch1
                     (21L, "q1 m1 m2 m3 m4 m5 q2"))        // m-run from batch2
    DupSpanIngest.mergeBatch(docs(batch1), "text", "doc_id", idx, cov)
    DupSpanIngest.mergeBatch(docs(batch2), "text", "doc_id", idx, cov)
    DupSpanIngest.mergeBatch(docs(batch3), "text", "doc_id", idx, cov)
    val got = covMap(DupSpanIngest.coverages(spark, cov))
    assert(got(20L)._2 == 7L)
    assert(got(21L)._2 == 5L)
  }
}
