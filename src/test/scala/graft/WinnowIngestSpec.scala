package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{count, lit}

import graft.operators.Winnow
import graft.streaming.WinnowIngest

class WinnowIngestSpec extends SparkSpec {

  // A 10-token span (≥ k + w - 1 = 8 tokens at k=5, w=4 guarantees at
  // least one shared SELECTED fingerprint) copied into docs 1, 3, 4;
  // doc 2 is unrelated. Fillers are unique per doc so no accidental
  // cross-doc grams exist.
  private val span = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
  private val batch1 = Seq(
    (1L, s"one two three four five $span six seven eight nine ten"),
    (2L, "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10 k11 k12 k13 k14 k15"))
  private val batch2 = Seq(
    (3L, s"red green blue cyan teal $span yellow purple orange maroon"),
    (4L, s"$span pink brown gray silver gold bronze copper zinc"))

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("cumulative ingest pairs equal the batch recompute over the full corpus") {
    val root = Files.createTempDirectory("winnowingest").toString
    val (idx, prs) = (s"$root/index", s"$root/pairs")

    // maxDf high = guard inactive on this fixture, matching maxDf=None
    // in the batch recompute below.
    WinnowIngest.mergeBatch(docs(batch1), "text", "doc_id", idx, prs,
      minShared = 1L, maxDf = 1000L)
    WinnowIngest.mergeBatch(docs(batch2), "text", "doc_id", idx, prs,
      minShared = 1L, maxDf = 1000L)

    val got = WinnowIngest.pairs(spark, prs)
      .select("doc_a", "doc_b", "n_shared", "overlap_r")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

    val sel = Winnow.selectFingerprints(docs(batch1 ++ batch2), "text", "doc_id")
    val want = Winnow.overlapPairs(sel, "doc_id", minShared = 1L, maxDf = None)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

    assert(got == want, s"got $got, want $want")
    // The fixture must actually exercise BOTH pair horizons: 1-3 and
    // 1-4 are cross-batch (history side), 3-4 is in-batch.
    val keys = got.map(p => (p._1, p._2))
    assert(Set((1L, 3L), (1L, 4L), (3L, 4L)).subsetOf(keys), keys)
    assert(!keys.exists(p => p._1 == 2L || p._2 == 2L), "unrelated doc paired")
  }

  test("replaying a batch leaves the pair set unchanged") {
    val root = Files.createTempDirectory("winnowreplay").toString
    val (idx, prs) = (s"$root/index", s"$root/pairs")

    WinnowIngest.mergeBatch(docs(batch1), "text", "doc_id", idx, prs,
      minShared = 1L, maxDf = 1000L)
    WinnowIngest.mergeBatch(docs(batch2), "text", "doc_id", idx, prs,
      minShared = 1L, maxDf = 1000L)
    val before = WinnowIngest.pairs(spark, prs).collect().toSet
    // at-least-once redelivery of batch2
    WinnowIngest.mergeBatch(docs(batch2), "text", "doc_id", idx, prs,
      minShared = 1L, maxDf = 1000L)
    assert(WinnowIngest.pairs(spark, prs).collect().toSet == before)
  }

  test("pairs() resolves re-emitted pairs deterministically: strongest evidence wins") {
    import spark.implicits._
    val root = Files.createTempDirectory("winnowdet").toString
    val prs = s"$root/pairs"
    // Two emissions of the same pair with different stats — possible
    // when a later redelivery recomputes against an index where the
    // hot-gram guard has since swallowed one of the shared spans. The
    // state must keep the strongest evidence, not an arbitrary
    // survivor that varies between invocations. (Emissions go through
    // the same patch path mergeBatch uses.)
    graft.streaming.WinnowIngest.patchPairs(
      Seq((1L, 2L, 5L, 0.5)).toDF("doc_a", "doc_b", "n_shared", "overlap_r"),
      prs, nBuckets = 8)
    graft.streaming.WinnowIngest.patchPairs(
      Seq((1L, 2L, 2L, 0.2), (3L, 4L, 1L, 1.0))
        .toDF("doc_a", "doc_b", "n_shared", "overlap_r"),
      prs, nBuckets = 8)
    def read(): Set[(Long, Long, Long, Double)] =
      WinnowIngest.pairs(spark, prs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val got = read()
    assert(got == Set((1L, 2L, 5L, 0.5), (3L, 4L, 1L, 1.0)), got)
    assert(read() == got, "repeated reads disagreed")
  }

  test("a pre-round-15 append-mode pair log is refused loudly, never silently reset") {
    import spark.implicits._
    val root = Files.createTempDirectory("winnowlegacy").toString
    // the round-14 layout: bare pair fragments at the top level
    Seq((1L, 2L, 5L, 0.5)).toDF("doc_a", "doc_b", "n_shared", "overlap_r")
      .write.parquet(s"$root/pairs")
    intercept[IllegalArgumentException] {
      WinnowIngest.pairs(spark, s"$root/pairs")
    }
    intercept[IllegalArgumentException] {
      WinnowIngest.mergeBatch(docs(batch1), "text", "doc_id",
        s"$root/index", s"$root/pairs")
    }
  }

  test("a pre-round-15 append-mode fingerprint INDEX is refused loudly; seedIndex migrates it") {
    import spark.implicits._
    val root = Files.createTempDirectory("winnowlegacyidx").toString
    // the round-14 layout: bare (doc_id, h) fragments at the top level
    Winnow.selectFingerprints(docs(batch1), "text", "doc_id")
      .write.parquet(s"$root/index")
    intercept[IllegalArgumentException] {
      WinnowIngest.index(spark, s"$root/index")
    }
    intercept[IllegalArgumentException] {
      WinnowIngest.mergeBatch(docs(batch2), "text", "doc_id",
        s"$root/index", s"$root/pairs")
    }
    // the declared migration: read the fragments, seed the bucketed
    // index (sub-states live BESIDE the fragments; the manifest check
    // then short-circuits the top-level guard), caller deletes them.
    // Without the explicit migrate flag the seed is refused — it would
    // strand whatever fragment content it missed beside a fresh
    // manifest, invisible to every later guard (ADVICE r15).
    val legacy = spark.read.parquet(s"$root/index").select($"doc_id", $"h")
    val refused = intercept[IllegalArgumentException] {
      WinnowIngest.seedIndex(legacy, s"$root/index", maxDf = 1000L)
    }
    assert(refused.getMessage.contains("strand"), refused.getMessage)
    WinnowIngest.seedIndex(legacy, s"$root/index", maxDf = 1000L,
      migrateInPlace = true)
    val want = legacy.distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = WinnowIngest.index(spark, s"$root/index")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty)
    // and a later batch merges cleanly against the migrated state
    WinnowIngest.mergeBatch(docs(batch2), "text", "doc_id",
      s"$root/index", s"$root/pairs", minShared = 1L, maxDf = 1000L)
    assert(WinnowIngest.pairs(spark, s"$root/pairs")
      .filter($"doc_a" === 1L).count() >= 2, "cross-batch pairs vs migrated history")
  }

  test("a history doc's overlap denominator reflects the CURRENT guard (hot crossing shrinks sel_n)") {
    import spark.implicits._
    val root = Files.createTempDirectory("winnowseln").toString
    val (idx, prs) = (s"$root/index", s"$root/pairs")
    // Batch A: docs 1 and 2 share span S1; doc 1 also carries span S2.
    // Batch B: 20 docs copy S2, pushing its grams' df past maxDf = 10.
    // Batch C: doc 50 shares S1 — the (1, 50) pair's denominator must
    // count doc 1's fingerprints with S2's now-hot grams EXCLUDED,
    // exactly as the append-mode global recompute with the same
    // cumulative dfs would.
    val s1 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val s2 = "zulu yankee xray whiskey victor uniform tango sierra romeo quebec"
    val a = Seq((1L, s"$s1 pad1a pad1b $s2"), (2L, s"two2a $s1 two2b two2c"))
    val b = (10L until 30L).map(i => (i, s"f${i}a f${i}b $s2 f${i}c f${i}d"))
    val c = Seq((50L, s"c50a c50b $s1 c50c c50d"))
    val maxDf = 10L
    WinnowIngest.mergeBatch(docs(a), "text", "doc_id", idx, prs,
      minShared = 1L, maxDf = maxDf)
    WinnowIngest.mergeBatch(docs(b), "text", "doc_id", idx, prs,
      minShared = 1L, maxDf = maxDf)
    WinnowIngest.mergeBatch(docs(c), "text", "doc_id", idx, prs,
      minShared = 1L, maxDf = maxDf)
    // expected (1, 50) row via the append-mode formula at batch-C time:
    // guard df over ALL selected fingerprints so far, sel_n per doc
    // over guard survivors
    val sel = Winnow.selectFingerprints(docs(a ++ b ++ c), "text", "doc_id")
      .select($"doc_id", $"h").distinct()
    val guardOk = sel.groupBy($"h").agg(count(lit(1)).as("df"))
      .filter($"df" <= maxDf).select($"h")
    val g = sel.join(guardOk, "h")
    val selN = g.groupBy($"doc_id").agg(count(lit(1)).as("sel_n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nShared = g.filter($"doc_id" === 1L).select($"h")
      .intersect(g.filter($"doc_id" === 50L).select($"h")).count()
    assert(nShared >= 1, "fixture must share a live fingerprint across A and C")
    val wantR = BigDecimal(nShared.toDouble / math.min(selN(1L), selN(50L)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = WinnowIngest.pairs(spark, prs)
      .filter($"doc_a" === 1L && $"doc_b" === 50L)
      .select($"n_shared", $"overlap_r").collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == nShared, s"n_shared ${got(0).getLong(0)} != $nShared")
    assert(got(0).getDouble(1) == wantR, s"overlap_r ${got(0).getDouble(1)} != $wantR")
    // and the crossing genuinely shrank doc 1's denominator — the
    // guarded count is strictly below its total fingerprint count
    val total1 = sel.filter($"doc_id" === 1L).count()
    assert(selN(1L) < total1,
      s"S2's grams should be hot: sel_n ${selN(1L)} vs total $total1")
  }

  test("crash at every patch prefix replays to the no-crash state (hot crossing in the crashed batch)") {
    import spark.implicits._
    // The ADVICE-r15 scenario: a fingerprint crosses maxDf DURING the
    // crashed batch while history docs still carry it. The commit
    // order (bydoc BEFORE byh) exists so the replay can still derive
    // the carriers' touched-doc set from the pre-patch byh snapshot;
    // the old order stranded their stale bydoc rows forever, silently
    // inflating sel_n. Crash after each of the 3 patches, replay, then
    // pair a later batch against a carrier and require the EXACT
    // no-crash pair stats.
    val s1 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val s2 = "zulu yankee xray whiskey victor uniform tango sierra romeo quebec"
    val a = Seq((1L, s"$s1 pad1a pad1b $s2"), (2L, s"two2a $s1 two2b two2c"))
    val b = (10L until 30L).map(i => (i, s"f${i}a f${i}b $s2 f${i}c f${i}d"))
    val c = Seq((50L, s"c50a c50b $s1 c50c c50d"))
    val maxDf = 10L

    def runSeq(root: String, crashAfter: Int): Set[(Long, Long, Long, Double)] = {
      val (idx, prs) = (s"$root/index", s"$root/pairs")
      WinnowIngest.mergeBatch(docs(a), "text", "doc_id", idx, prs,
        minShared = 1L, maxDf = maxDf)
      if (crashAfter > 0) {
        var patches = 0
        WinnowIngest.onPatchCommitted = () => {
          patches += 1
          if (patches == crashAfter)
            throw new RuntimeException(s"injected crash after patch $crashAfter")
        }
        try intercept[RuntimeException] {
          WinnowIngest.mergeBatch(docs(b), "text", "doc_id", idx, prs,
            minShared = 1L, maxDf = maxDf)
        } finally WinnowIngest.onPatchCommitted = () => ()
      }
      // at-least-once: the crashed batch replays in full
      WinnowIngest.mergeBatch(docs(b), "text", "doc_id", idx, prs,
        minShared = 1L, maxDf = maxDf)
      WinnowIngest.mergeBatch(docs(c), "text", "doc_id", idx, prs,
        minShared = 1L, maxDf = maxDf)
      WinnowIngest.pairs(spark, prs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
    }

    val want = runSeq(Files.createTempDirectory("winnowcrash-ref").toString, 0)
    assert(want.exists(p => p._1 == 1L && p._2 == 50L),
      s"fixture must produce the carrier pair: $want")
    for (crashAfter <- 1 to 3) {
      val got = runSeq(
        Files.createTempDirectory(s"winnowcrash-$crashAfter").toString, crashAfter)
      assert(got == want, s"crashAfter=$crashAfter: got $got, want $want")
    }
  }

  test("hot-gram guard stops pair emission once df exceeds maxDf") {
    val root = Files.createTempDirectory("winnowguard").toString
    val (idx, prs) = (s"$root/index", s"$root/pairs")

    // maxDf=1: the moment the span's fingerprints are seen in a second
    // document their df is 2 > 1, so NO pair may ever be emitted.
    WinnowIngest.mergeBatch(docs(batch1), "text", "doc_id", idx, prs,
      minShared = 1L, maxDf = 1L)
    WinnowIngest.mergeBatch(docs(batch2), "text", "doc_id", idx, prs,
      minShared = 1L, maxDf = 1L)
    assert(WinnowIngest.pairs(spark, prs).count() == 0)
  }
}
