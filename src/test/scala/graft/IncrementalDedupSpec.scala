package graft

import graft.operators.IncrementalDedup

/** Cross-snapshot dedup: planted exact / near / unique batch docs get
  * the right verdicts, exact wins over near-dup, history is never
  * deduped against itself, and every batch doc appears exactly once.
  */
class IncrementalDedupSpec extends SparkSpec {

  private val base =
    "the quick brown fox jumps over the lazy dog near the river bank today"
  private val nearVariant =
    "the quick brown fox jumps over the lazy dog near the river bank tonight"

  test("verdict tiers: exact, neardup, kept") {
    import spark.implicits._
    val history = Seq(
      (100L, base),
      (101L, "completely different text about spark query planning and shuffles in it"),
      // two near-identical HISTORY docs: must NOT appear in output
      (102L, "history internal duplicate alpha beta gamma delta epsilon zeta eta theta"),
      (103L, "history internal duplicate alpha beta gamma delta epsilon zeta eta iota"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (200L, base),                     // exact (normalizes to history 100)
      (201L, "  THE   quick brown fox jumps over the lazy dog near the river bank today "),
      // ^ exact after normalization (case + whitespace)
      (202L, nearVariant),              // near-dup of 100 (1 token differs)
      (203L, "entirely novel content with no overlap whatsoever in any shingle window here"))
      .toDF("doc_id", "text")

    val out = IncrementalDedup.against(batch, history, thr = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap

    assert(out.size == 4, "one row per batch doc")
    assert(out(200L) == (("exact", 100L)))
    assert(out(201L) == (("exact", 100L)))
    assert(out(202L)._1 == "neardup")
    assert(out(202L)._2 == 100L)
    assert(out(203L) == (("kept", -1L)))
  }

  test("asymmetry: per-batch cost shape — history self-pairs never verified") {
    import spark.implicits._
    // An empty batch must produce zero rows and, by construction,
    // zero candidate pairs — even with heavy duplication inside
    // history (the history self-join simply does not exist in the
    // plan).
    val history = Seq(
      (1L, "same text repeated in history one two three four five six"),
      (2L, "same text repeated in history one two three four five six"),
      (3L, "same text repeated in history one two three four five seven"))
      .toDF("doc_id", "text")
    val batch = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(IncrementalDedup.against(batch, history, 0.5).count() == 0)
  }

  test("best match picks the highest Jaccard, ties to the lowest id") {
    import spark.implicits._
    val history = Seq(
      (10L, "shared prefix tokens one two three four five six seven eight nine ten"),
      (11L, "shared prefix tokens one two three four five six seven eight nine ELEVEN"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (20L, "shared prefix tokens one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    // 20 is EXACT vs 10; force the near path with a distinct variant
    val batch2 = Seq(
      (21L, "shared prefix tokens one two three four five six seven eight nine twelve"))
      .toDF("doc_id", "text")
    val r = IncrementalDedup.against(batch2, history, 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).head
    // equally similar to 10 and 11 (same one-token difference): tie
    // breaks to the lower history id
    assert(r == ((21L, "neardup", 10L)))
    val e = IncrementalDedup.against(batch, history, 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).head
    assert(e == ((20L, "exact", 10L)))
  }
}
