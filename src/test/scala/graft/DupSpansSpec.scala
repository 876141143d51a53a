package graft

import org.apache.spark.sql.functions._

import graft.operators.DupSpans

/** Exact duplicated-span accounting (q174/q175): hand-built corpora
  * with knowable interval unions, pinning the contracts the DuckDB
  * oracles re-derive — interval MERGE (no double-count on overlapping
  * grams of one run), the distinct-doc vs all-occurrence duplicate
  * predicates, first-occurrence-wins, and the short-doc guard.
  */
class DupSpansSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def covMap(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] = {
    import spark.implicits._
    df.select($"doc_id", $"n_tokens", col(df.columns(2)))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("coverage: a shared 7-token run covers exactly 7 tokens in both docs") {
    // k=5: a 7-token shared run has 3 interior 5-grams at positions
    // p, p+1, p+2 — intervals [p,p+4],[p+1,p+5],[p+2,p+6] union to 7
    // tokens, not 15.
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val a = s"one two three $shared x1 y1"
    val b = s"$shared p q r s t"
    val m = covMap(DupSpans.coverage(docs(1L -> a, 2L -> b), "text", "doc_id", k = 5))
    assert(m(1L) == (12L, 7L))
    assert(m(2L) == (12L, 7L))
  }

  test("coverage: within-doc repetition alone is NOT corpus duplication (minDocs=2)") {
    val rep = "r1 r2 r3 r4 r5"
    val m = covMap(DupSpans.coverage(
      docs(1L -> s"$rep $rep", 2L -> "u1 u2 u3 u4 u5 u6"), "text", "doc_id", k = 5))
    assert(m(1L)._2 == 0L, "repeated only within one doc")
    assert(m(2L)._2 == 0L)
  }

  test("coverage: docs shorter than k report zero and never fabricate a whole-text gram") {
    // WordShingles collapses <k-token docs to ONE whole-text shingle;
    // DupSpans must exclude them (two identical 3-token docs would
    // otherwise count as duplicated with no 5-gram in common).
    val m = covMap(DupSpans.coverage(
      docs(1L -> "tiny doc here", 2L -> "tiny doc here"), "text", "doc_id", k = 5))
    assert(m(1L) == (3L, 0L))
    assert(m(2L) == (3L, 0L))
  }

  test("coverage: disjoint duplicated runs sum; overlapping ones merge") {
    val runA = "a1 a2 a3 a4 a5"          // 5 tokens, 1 gram
    val runB = "b1 b2 b3 b4 b5 b6"       // 6 tokens, 2 grams, union 6
    val d1 = s"$runA mid1 mid2 $runB"    // 13 tokens
    val d2 = s"$runB z1 z2 z3 $runA"     // 14 tokens
    val m = covMap(DupSpans.coverage(docs(1L -> d1, 2L -> d2), "text", "doc_id", k = 5))
    assert(m(1L) == (13L, 11L), "5 + 6 with a gap — no merge across the gap")
    assert(m(2L) == (14L, 11L))
  }

  test("removalPlan: first occurrence (min doc_id, pos) keeps its tokens") {
    val shared = "s1 s2 s3 s4 s5 s6"     // 6 tokens → 2 grams
    val a = s"$shared tail1 tail2"       // doc 1: winner (earliest doc)
    val b = s"head1 head2 $shared"       // doc 2: loser
    val got = DupSpans.removalPlan(docs(1L -> a, 2L -> b), "text", "doc_id", k = 5)
    val m = covMap(got)
    assert(m(1L) == (8L, 0L), "the globally-first occurrence is never removed")
    assert(m(2L) == (8L, 6L), "the losing occurrence loses its whole 6-token union")
  }

  test("removalPlan: within-doc repeats lose to the first occurrence (unlike coverage)") {
    val rep = "w1 w2 w3 w4 w5"
    val m = covMap(DupSpans.removalPlan(docs(1L -> s"$rep $rep"), "text", "doc_id", k = 5))
    assert(m(1L) == (10L, 5L), "the second copy inside the same doc is removed")
  }

  test("applyRemoval: winner keeps its text verbatim; the loser's span is excised") {
    import spark.implicits._
    val shared = "s1 s2 s3 s4 s5 s6"
    val a = s"$shared tail1 tail2"
    val b = s"head1 head2 $shared"
    val got = DupSpans.applyRemoval(docs(1L -> a, 2L -> b), "text", "doc_id", k = 5)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(1L) == (8L, 8L, a), "globally-first occurrence is untouched")
    assert(got(2L) == (8L, 2L, "head1 head2"), "losing span excised, rest re-joined")
  }

  test("applyRemoval: within-doc repeat loses its second copy; full-loss doc goes empty") {
    import spark.implicits._
    val rep = "w1 w2 w3 w4 w5"
    val got = DupSpans.applyRemoval(
        docs(1L -> s"$rep $rep", 2L -> s"z0 $rep z1"), "text", "doc_id", k = 5)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(1L) == (10L, 5L, rep), "second within-doc copy removed")
    // doc 2's run loses to doc 1's first copy; its neighbors survive
    assert(got(2L) == (7L, 2L, "z0 z1"))
  }

  test("applyRemoval merges overlapping losing intervals (no double-excision, no gaps)") {
    import spark.implicits._
    // A 7-token copied run = 3 overlapping losing 5-grams in the loser;
    // the merged island must excise exactly tokens 3..9, once.
    val run = "r1 r2 r3 r4 r5 r6 r7"
    val got = DupSpans.applyRemoval(
        docs(1L -> s"$run x y", 2L -> s"a b $run c"), "text", "doc_id", k = 5)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(2L) == (10L, 3L, "a b c"))
    // ...and removalIntervals reports the single merged island
    val ivs = DupSpans.removalIntervals(
        docs(1L -> s"$run x y", 2L -> s"a b $run c"), "text", "doc_id", k = 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(ivs == Set((2L, 3L, 9L)))
  }

  test("applyRemoval at sf0.001: retained_tokens == n_tokens - removalPlan.removed_tokens") {
    import spark.implicits._
    val d = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
    val applied = DupSpans.applyRemoval(d, "text", "doc_id", k = 5)
      .select($"doc_id", $"n_tokens", $"retained_tokens", $"retained_text")
    val plan = DupSpans.removalPlan(d, "text", "doc_id", k = 5)
      .select($"doc_id", $"removed_tokens")
    val joined = applied.join(plan, "doc_id")
    assert(joined.count() > 0)
    assert(joined.filter($"retained_tokens" =!= $"n_tokens" - $"removed_tokens").count() == 0L,
      "the transform must excise exactly the tokens the plan accounts for")
    // The retained text really has retained_tokens whitespace tokens
    // (empty string = 0, not the 1 a bare split would report).
    import org.apache.spark.sql.functions.{length => slen}
    val tokCheck = joined.filter(
      when(slen($"retained_text") === 0, $"retained_tokens" =!= 0L)
        .otherwise(graft.functions.TextFunctions.tokenCount($"retained_text") =!= $"retained_tokens"))
    assert(tokCheck.count() == 0L)
    // Re-scored duplication over the retained corpus DROPS: the
    // surviving corpus keeps one copy per duplicated run, so
    // distinct-doc 5-gram coverage must shrink (Lee et al.'s point).
    val before = DupSpans.coverage(d, "text", "doc_id", k = 5)
      .agg(sum($"dup_tokens")).as[Long].head()
    val after = DupSpans.coverage(
        applied.select($"doc_id", $"retained_text".as("text")),
        "text", "doc_id", k = 5)
      .agg(sum($"dup_tokens")).as[Long].head()
    assert(before > 0L)
    assert(after < before / 2,
      s"retained-corpus duplication $after should collapse vs $before")
  }

  test("coverage and removalPlan keep NULL-text docs out and zero-fill clean docs") {
    import spark.implicits._
    val withNull = docs(1L -> "c1 c2 c3 c4 c5 c6").unionByName(
      Seq((2L, Option.empty[String])).toDF("doc_id", "text"))
    val cov = DupSpans.coverage(withNull, "text", "doc_id", k = 5)
    assert(cov.count() == 1L)
    assert(covMap(cov)(1L) == (6L, 0L))
    val rem = DupSpans.removalPlan(withNull, "text", "doc_id", k = 5)
    assert(rem.count() == 1L)
    assert(covMap(rem)(1L) == (6L, 0L))
  }

  test("crossSourceLeakage: shared run counts once per counterpart source, both directions") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta" // 7 tokens
    val d = Seq(
      (1L, s"one two three $shared", "A"),        // 10 tokens, run at 4..10
      (2L, s"$shared p q r s t", "B"),            // 12 tokens, run at 1..7
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8", "B"))       // 8 tokens, no overlap
      .toDF("doc_id", "text", "source")
    val got = DupSpans.crossSourceLeakage(d, "text", "doc_id", "source", k = 5)
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(("A", "B") -> 7L, ("B", "A") -> 7L))
  }

  test("crossSourceLeakage: within-source duplication never counts as leakage") {
    import spark.implicits._
    val rep = "r1 r2 r3 r4 r5 r6"
    val d = Seq(
      (1L, s"$rep pad1 pad2", "A"),
      (2L, s"pad3 pad4 $rep", "A"),     // same run, SAME source
      (3L, "u1 u2 u3 u4 u5 u6 u7", "B"))
      .toDF("doc_id", "text", "source")
    val got = DupSpans.crossSourceLeakage(d, "text", "doc_id", "source", k = 5)
    assert(got.count() == 0L, "A↔A duplication is q174's axis, not leakage")
  }

  test("catalog q176 at sf0.001: full ordered matrix, fractions in range") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val rows = graft.queries.Catalog.queries("q176_source_leakage")(spark, dir).collect()
    // Expected pair count from the INPUT's source domain, not from the
    // result's own distinct sources — a source dropped entirely by a
    // broken pair-domain join would shrink both sides of a
    // result-derived assertion and pass undetected.
    val srcs = graft.sources.Tables(spark, dir, "documents")
      .filter($"text".isNotNull).select($"source").distinct().count().toInt
    assert(rows.length == srcs * (srcs - 1), "every ordered pair present, zeros kept")
    assert(rows.map(_.getAs[String]("src")).distinct.length == srcs)
    rows.foreach { r =>
      val f = r.getAs[Double]("leak_frac_r")
      assert(f >= 0.0 && f <= 1.0)
      assert(r.getAs[Long]("leaked_tokens") <= r.getAs[Long]("src_tokens"))
    }
  }

  test("coverageAgainst == full-corpus coverage restricted to batch ids") {
    import spark.implicits._
    // Planted shapes: batch doc leaking from history, batch-batch
    // duplication, clean batch doc, plus history-history duplication
    // that must NOT affect batch scores.
    val shared = "h1 h2 h3 h4 h5 h6"
    val bshared = "b1 b2 b3 b4 b5"
    val history = docs(
      1L -> s"$shared x y z",
      2L -> s"p q $shared",      // history-history dup of `shared`
      3L -> "hh1 hh2 hh3 hh4 hh5 hh6 hh7")
    val batch = docs(
      10L -> s"lead1 lead2 $shared tail1",   // leaks from history
      11L -> s"$bshared m n o",              // batch-batch dup
      12L -> s"k l $bshared",
      13L -> "c1 c2 c3 c4 c5 c6 c7")         // clean
    val inc = covMap(DupSpans.coverageAgainst(
      batch, DupSpans.gramIndex(history, "text", "doc_id", k = 5),
      "text", "doc_id", k = 5))
    val full = covMap(DupSpans.coverage(
      history.unionByName(batch), "text", "doc_id", k = 5))
      .view.filterKeys(_ >= 10L).toMap
    assert(inc == full)
    assert(inc(10L) == (9L, 6L) && inc(11L) == (8L, 5L) && inc(13L) == (7L, 0L))
  }

  test("coverageAgainst with an empty index == coverage of the batch alone") {
    import spark.implicits._
    val batch = docs(
      1L -> "d1 d2 d3 d4 d5 pad",
      2L -> "z0 d1 d2 d3 d4 d5")
    val empty = DupSpans.gramIndex(docs(), "text", "doc_id", k = 5)
    val inc = covMap(DupSpans.coverageAgainst(batch, empty, "text", "doc_id", k = 5))
    val full = covMap(DupSpans.coverage(batch, "text", "doc_id", k = 5))
    assert(inc == full)
    assert(inc(1L)._2 == 5L)
  }

  test("two-batch ingestion via updateIndex == one-shot recompute at each step") {
    import spark.implicits._
    val history = docs(1L -> "s1 s2 s3 s4 s5 s6 w1 w2")
    val batch1 = docs(10L -> s"a0 s1 s2 s3 s4 s5 s6", 11L -> "n1 n2 n3 n4 n5 n6")
    val batch2 = docs(20L -> "q0 q1 n1 n2 n3 n4 n5", 21L -> "f1 f2 f3 f4 f5 f6")
    var idx = DupSpans.gramIndex(history, "text", "doc_id", k = 5)
    val got1 = covMap(DupSpans.coverageAgainst(batch1, idx, "text", "doc_id", k = 5))
    idx = DupSpans.updateIndex(idx, batch1, "text", "doc_id", k = 5)
    val got2 = covMap(DupSpans.coverageAgainst(batch2, idx, "text", "doc_id", k = 5))
    val full2 = covMap(DupSpans.coverage(
      history.unionByName(batch1).unionByName(batch2), "text", "doc_id", k = 5))
    assert(got1(10L)._2 == 6L, "batch1 doc leaks the 6-token history run")
    assert(got1(11L)._2 == 0L, "n-run is new at batch1 time")
    // batch2's doc 20 shares the 5-token n-run tail with batch1's doc 11
    // ONLY through the advanced index.
    assert(got2(20L) == full2(20L) && got2(21L) == full2(21L))
    assert(got2(20L)._2 == 5L)
  }

  test("catalog q174/q175 run at sf0.001 with consistent fractions") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val cov = graft.queries.Catalog.queries("q174_dupspan_coverage")(spark, dir)
    val covRows = cov.collect()
    assert(covRows.nonEmpty)
    covRows.foreach { r =>
      val n = r.getAs[Long]("n_tokens"); val d = r.getAs[Long]("dup_tokens")
      assert(d >= 0L && d <= n)
      assert(r.getAs[Boolean]("keep") == (d.toDouble / n <= 0.5))
    }
    val rem = graft.queries.Catalog.queries("q175_dupspan_dedup")(spark, dir)
    val remRows = rem.collect()
    assert(remRows.length == covRows.length, "same non-NULL-text doc set")
    remRows.foreach { r =>
      val n = r.getAs[Long]("n_tokens"); val x = r.getAs[Long]("removed_tokens")
      assert(x >= 0L && x <= n)
    }
    // Removal (all-occurrence predicate, losers only) and coverage
    // (distinct-doc predicate, all duplicated positions) agree on the
    // corpus-level invariant: winners keep at least k tokens per
    // duplicated run, so total removed < total duplicated + within-doc
    // extras is not a fixed inequality — but removed tokens can never
    // exceed ALL-occurrence duplication, which coverage lower-bounds
    // per doc only. Assert the cheap corpus sanity instead: at least
    // one doc has duplication at this sf (synthetic corpus has heavy
    // 5-gram reuse) and not every token is removed.
    val totalDup = covRows.map(_.getAs[Long]("dup_tokens")).sum
    val totalRemoved = remRows.map(_.getAs[Long]("removed_tokens")).sum
    val totalTokens = remRows.map(_.getAs[Long]("n_tokens")).sum
    assert(totalDup > 0L)
    assert(totalRemoved < totalTokens)
  }
}
