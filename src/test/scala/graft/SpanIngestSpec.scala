package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.streaming.{DupSpanIngest, LeakageIngest, SpanIngest}

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
