package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.operators.DupSpans
import graft.streaming.LeakageIngest

/** Streaming-ingest twin of q176 (LeakageIngest): each batch's
  * per-doc leakage rows must equal the batch-mode operator over
  * (history ∪ batch) restricted to the batch's docs, at-least-once
  * redelivery must change nothing (self-as-counterpart hazard
  * included), and the cumulative matrix must aggregate consistently.
  */
class LeakageIngestSpec extends SparkSpec {

  // A 7-token span shared across sources/batches; fillers unique.
  private val span = "alpha bravo charlie delta echo foxtrot golf"
  private val batch1 = Seq(
    (1L, s"one two three $span four", "A"),
    (2L, "k1 k2 k3 k4 k5 k6 k7 k8", "B"))
  private val batch2 = Seq(
    (10L, s"red green $span blue", "B"),          // leaks from batch1's A
    (11L, s"m1 m2 $span m3", "A"),                // same-source copy: NOT leakage into A
    (12L, "c1 c2 c3 c4 c5 c6", "C"))              // clean source

  private def docs(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  private def rowMap(df: DataFrame): Map[(Long, String, String), Long] = {
    import spark.implicits._
    df.select($"doc_id", $"src", $"src_other", $"leaked_tokens")
      .as[(Long, String, String, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
  }

  private def perDocRef(all: Seq[(Long, String, String)],
                        batchIds: Set[Long]): Map[(Long, String, String), Long] =
    rowMap(DupSpans.crossSourceLeakagePerDoc(
        docs(all), "text", "doc_id", "source", k = 5))
      .filter { case ((id, _, _), _) => batchIds(id) }

  test("each batch's rows equal the batch-mode per-doc operator at arrival") {
    val root = Files.createTempDirectory("leakingest").toString
    val (idx, leak) = (s"$root/index", s"$root/leak")

    LeakageIngest.mergeBatch(docs(batch1), "text", "doc_id", "source", idx, leak)
    LeakageIngest.mergeBatch(docs(batch2), "text", "doc_id", "source", idx, leak)

    val got = rowMap(LeakageIngest.leakage(spark, leak))
    val want1 = perDocRef(batch1, batch1.map(_._1).toSet)
    val want2 = perDocRef(batch1 ++ batch2, batch2.map(_._1).toSet)
    assert(got == want1 ++ want2)
    // Planted shapes: the cross-batch cross-source leak scores the
    // 7-token span; the same-source copy (doc 11 vs doc 1, both A)
    // creates NO (A → A) row, but doc 11 DOES leak vs B (doc 10 has
    // the span in B, same batch) — and doc 1 is NOT retroactively
    // re-scored against batch2's sources (as-of-arrival).
    assert(got((10L, "B", "A")) == 7L)
    assert(got.keys.forall { case (_, s, o) => s != o })
    assert(!got.contains((1L, "A", "B")), "doc 1 predates B's copy — no retro re-score")
    assert(got((11L, "A", "B")) == 7L, "in-batch cross-source dup counts")
    assert(!got.exists(_._1._1 == 12L), "clean source has no rows")
  }

  test("at-least-once redelivery leaves rows unchanged (self-as-counterpart hazard)") {
    val root = Files.createTempDirectory("leakreplay").toString
    val (idx, leak) = (s"$root/index", s"$root/leak")
    LeakageIngest.mergeBatch(docs(batch1), "text", "doc_id", "source", idx, leak)
    LeakageIngest.mergeBatch(docs(batch2), "text", "doc_id", "source", idx, leak)
    val before = rowMap(LeakageIngest.leakage(spark, leak))
    // Replay: batch2's (h, source) rows are already in the index —
    // including doc 12's unique grams under source C; the same-source
    // filter must keep the replay from seeing itself as a counterpart.
    LeakageIngest.mergeBatch(docs(batch2), "text", "doc_id", "source", idx, leak)
    val after = rowMap(LeakageIngest.leakage(spark, leak))
    assert(after == before)
    assert(!after.exists(_._1._1 == 12L), "replayed unique content stays clean")
  }

  test("re-merging an OLDER batch after later ingests leaves rows unchanged") {
    val root = Files.createTempDirectory("leakolder").toString
    val (idx, leak) = (s"$root/index", s"$root/leak")
    LeakageIngest.mergeBatch(docs(batch1), "text", "doc_id", "source", idx, leak)
    LeakageIngest.mergeBatch(docs(batch2), "text", "doc_id", "source", idx, leak)
    val before = rowMap(LeakageIngest.leakage(spark, leak))
    // Out-of-order replay: the index now holds (span, B) from doc 10,
    // so re-scoring batch1 EMITS a retroactive (1, A, B, 7) row — a
    // NEW key no per-key min-merge could discard. The epoch discipline
    // must drop the whole later emission: doc 1's first arrival (its
    // sentinel row) anchors the min-epoch filter.
    LeakageIngest.mergeBatch(docs(batch1), "text", "doc_id", "source", idx, leak)
    val after = rowMap(LeakageIngest.leakage(spark, leak))
    assert(after == before)
    assert(!after.contains((1L, "A", "B")), "no retroactive re-score of doc 1")
  }

  test("a pre-round-15 append-mode leakage log is refused loudly, never silently reset") {
    import spark.implicits._
    val root = Files.createTempDirectory("leaklegacy").toString
    // the round-14 layout: bare leakage fragments at the top level
    Seq((1L, "A", "B", 7L, 3L))
      .toDF("doc_id", "src", "src_other", "leaked_tokens", "epoch")
      .write.parquet(s"$root/leak")
    intercept[IllegalArgumentException] {
      LeakageIngest.leakage(spark, s"$root/leak")
    }
    intercept[IllegalArgumentException] {
      LeakageIngest.mergeBatch(docs(batch1), "text", "doc_id", "source",
        s"$root/index", s"$root/leak")
    }
  }

  test("a third batch sees sources from every earlier batch; the matrix aggregates") {
    import spark.implicits._
    val root = Files.createTempDirectory("leakthree").toString
    val (idx, leak) = (s"$root/index", s"$root/leak")
    val batch3 = Seq((20L, s"w1 w2 $span w3", "C"))  // leaks from A (b1) and B (b2)
    LeakageIngest.mergeBatch(docs(batch1), "text", "doc_id", "source", idx, leak)
    LeakageIngest.mergeBatch(docs(batch2), "text", "doc_id", "source", idx, leak)
    LeakageIngest.mergeBatch(docs(batch3), "text", "doc_id", "source", idx, leak)
    val got = rowMap(LeakageIngest.leakage(spark, leak))
    assert(got((20L, "C", "A")) == 7L && got((20L, "C", "B")) == 7L)
    val m = LeakageIngest.matrix(spark, leak)
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // (A → B): doc 11's 7 tokens; (B → A): doc 10's 7; (C → A/B): doc 20's 7.
    assert(m(("C", "A")) == 7L && m(("C", "B")) == 7L)
    assert(m(("A", "B")) == 7L && m(("B", "A")) == 7L)
  }
}
