package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.streaming.{DupSpanIngest, LeakageIngest, SpanIngest, WinnowIngest}

/** The fused span ingest must be INDISTINGUISHABLE from running the
  * two solo twins on the same batch sequence: same coverage rows,
  * same leakage rows, same index contents — the shared gram pass is
  * an execution optimization, never a semantic one.
  */
class SpanIngestSpec extends SparkSpec {

  private val span = "alpha bravo charlie delta echo foxtrot golf"
  private val batch1 = Seq(
    (1L, s"one two three $span four", "A"),
    (2L, "k1 k2 k3 k4 k5 k6 k7 k8", "B"))
  private val batch2 = Seq(
    (10L, s"red green $span blue", "B"),
    (11L, s"m1 m2 $span m3", "A"),
    (12L, "c1 c2 c3 c4 c5 c6", "C"))

  private def docs(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("fused ingest commits states identical to the two solo twins") {
    val fused = Files.createTempDirectory("spanfused").toString
    val solo = Files.createTempDirectory("spansolo").toString

    for (b <- Seq(batch1, batch2)) {
      SpanIngest.mergeBatch(docs(b), "text", "doc_id", "source",
        s"$fused/covidx", s"$fused/cov", s"$fused/leakidx", s"$fused/leak")
      DupSpanIngest.mergeBatch(docs(b), "text", "doc_id",
        s"$solo/covidx", s"$solo/cov")
      LeakageIngest.mergeBatch(docs(b), "text", "doc_id", "source",
        s"$solo/leakidx", s"$solo/leak")
    }

    assert(rows(DupSpanIngest.coverages(spark, s"$fused/cov")) ==
           rows(DupSpanIngest.coverages(spark, s"$solo/cov")))
    assert(rows(LeakageIngest.leakage(spark, s"$fused/leak")) ==
           rows(LeakageIngest.leakage(spark, s"$solo/leak")))
    assert(rows(DupSpanIngest.index(spark, s"$fused/covidx")) ==
           rows(DupSpanIngest.index(spark, s"$solo/covidx")))
    assert(rows(LeakageIngest.index(spark, s"$fused/leakidx")) ==
           rows(LeakageIngest.index(spark, s"$solo/leakidx")))
    // and the fixture is non-trivial on every surface
    assert(DupSpanIngest.coverages(spark, s"$fused/cov").count() == 5)
    assert(LeakageIngest.leakage(spark, s"$fused/leak").count() >= 2)
  }

  test("3-way fused ingest (coverage + leakage + winnow) equals the three solo twins") {
    val fused = Files.createTempDirectory("span3fused").toString
    val solo = Files.createTempDirectory("span3solo").toString
    // < k-token docs exercise the seam the fold must keep: the span
    // twins' gram table excludes them, the winnow selection keeps
    // their single whole-text shingle — 3 and 13 share one. The s10
    // docs are EXACT copies (identical windows → identical selected
    // sets), so each selected fingerprint's df is exactly the copy
    // count and the maxDf = 3 crossing in batch 3 is deterministic.
    val s10 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val b1 = Seq((1L, s10, "A"), (2L, "k1 k2 k3 k4 k5 k6 k7 k8", "B"),
      (3L, "tiny doc", "A"))
    val b2 = Seq((10L, s10, "B"), (11L, s10, "A"),
      (12L, "c1 c2 c3 c4 c5 c6", "C"), (13L, "tiny doc", "B"))
    // batch 3 pushes the copies' selected df to 4 > maxDf = 3 — the
    // hot-crossing path (bydoc cleanup + byh markers) runs fused too.
    val b3 = Seq((20L, s10, "C"))

    for (b <- Seq(b1, b2, b3)) {
      SpanIngest.mergeBatchAll(docs(b), "text", "doc_id", "source",
        s"$fused/covidx", s"$fused/cov", s"$fused/leakidx", s"$fused/leak",
        s"$fused/winidx", s"$fused/winpairs", minShared = 1L, maxDf = 3L)
      DupSpanIngest.mergeBatch(docs(b), "text", "doc_id",
        s"$solo/covidx", s"$solo/cov")
      LeakageIngest.mergeBatch(docs(b), "text", "doc_id", "source",
        s"$solo/leakidx", s"$solo/leak")
      WinnowIngest.mergeBatch(docs(b), "text", "doc_id",
        s"$solo/winidx", s"$solo/winpairs", minShared = 1L, maxDf = 3L)
    }

    assert(rows(DupSpanIngest.coverages(spark, s"$fused/cov")) ==
           rows(DupSpanIngest.coverages(spark, s"$solo/cov")))
    assert(rows(LeakageIngest.leakage(spark, s"$fused/leak")) ==
           rows(LeakageIngest.leakage(spark, s"$solo/leak")))
    assert(rows(DupSpanIngest.index(spark, s"$fused/covidx")) ==
           rows(DupSpanIngest.index(spark, s"$solo/covidx")))
    assert(rows(LeakageIngest.index(spark, s"$fused/leakidx")) ==
           rows(LeakageIngest.index(spark, s"$solo/leakidx")))
    assert(rows(WinnowIngest.index(spark, s"$fused/winidx")) ==
           rows(WinnowIngest.index(spark, s"$solo/winidx")))
    assert(rows(WinnowIngest.pairs(spark, s"$fused/winpairs")) ==
           rows(WinnowIngest.pairs(spark, s"$solo/winpairs")))
    // the fixture is non-trivial on every claimed seam:
    val pairKeys = WinnowIngest.pairs(spark, s"$fused/winpairs")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairKeys.contains((3L, 13L)),
      "the whole-text-shingle pair of the two < k-token docs must survive the fold")
    assert(Set((1L, 10L), (1L, 11L), (10L, 11L)).subsetOf(pairKeys),
      "the copy pairs emitted before the hot crossing must be present")
    assert(!pairKeys.exists(p => p._1 == 20L || p._2 == 20L),
      "doc 20 arrives after the span crossed maxDf — the guard must block its pairs")
  }

  test("replaying the latest batch through the fused path changes nothing") {
    val root = Files.createTempDirectory("spanreplay").toString
    def merge(b: Seq[(Long, String, String)]): Unit =
      SpanIngest.mergeBatch(docs(b), "text", "doc_id", "source",
        s"$root/covidx", s"$root/cov", s"$root/leakidx", s"$root/leak")
    merge(batch1); merge(batch2)
    val covBefore = rows(DupSpanIngest.coverages(spark, s"$root/cov"))
    val leakBefore = rows(LeakageIngest.leakage(spark, s"$root/leak"))
    merge(batch2) // at-least-once redelivery hits BOTH twins at once
    assert(rows(DupSpanIngest.coverages(spark, s"$root/cov")) == covBefore)
    assert(rows(LeakageIngest.leakage(spark, s"$root/leak")) == leakBefore)
  }
}
