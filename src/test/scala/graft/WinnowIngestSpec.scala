package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

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
