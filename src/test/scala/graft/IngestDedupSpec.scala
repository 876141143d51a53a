package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.IngestDedup

/** Dedup-on-ingest: content-keyed (not id-keyed), watermark-bounded
  * in-stream state, historical-index anti-join, and index maintenance
  * that survives watermark eviction — the out directory never holds
  * two documents with the same fingerprint.
  */
class IngestDedupSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("content duplicates collapse across ids, batches, and normalization") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("ingest1").toString

    val ms = MemoryStream[(Timestamp, Long, String)]
    val q = IngestDedup.runIngest(spark, ms.toDF().toDF("ts", "doc_id", "text"),
      "text", "ts", "10 minutes", s"$root/cp", s"$root/out", s"$root/idx")

    // doc 2 duplicates doc 1 up to case/whitespace (same fingerprint);
    // doc 3 is fresh content.
    ms.addData((ts(1), 1L, "Hello  World"), (ts(1), 2L, "hello world"),
               (ts(2), 3L, "something else"))
    q.processAllAvailable()
    // next batch, still in-horizon: another copy -> in-stream state drops it
    ms.addData((ts(3), 4L, "HELLO WORLD"))
    q.processAllAvailable()
    q.stop()

    val out = spark.read.parquet(s"$root/out")
    assert(out.count() == 2)
    assert(out.select("fp").distinct().count() == 2)
    assert(out.filter($"doc_id" === 3L).count() == 1)
    // the index now covers both surviving fingerprints
    assert(IngestDedup.historyIndex(spark, s"$root/idx").count() == 2)
  }

  test("historical index drops known content and catches post-eviction redelivery") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("ingest2").toString

    // Pre-seed the index with the fingerprint of "known doc" — the
    // bootstrap-from-existing-corpus path (bucketed patch, not a bare
    // parquet write, since the index lives in the manifest layout).
    IngestDedup.addToIndex(
      Seq(("known doc", 0L)).toDF("text", "doc_id")
        .select(graft.functions.TextFunctions.fingerprint($"text").as("fp")),
      s"$root/idx")

    val ms = MemoryStream[(Timestamp, Long, String)]
    val q = IngestDedup.runIngest(spark, ms.toDF().toDF("ts", "doc_id", "text"),
      "text", "ts", "10 minutes", s"$root/cp", s"$root/out", s"$root/idx")

    ms.addData((ts(1), 10L, "known doc"), (ts(2), 11L, "fresh doc"))
    q.processAllAvailable()
    // march the watermark far past the horizon: per-fp stream state for
    // "fresh doc" is evicted...
    ms.addData((Timestamp.valueOf("2024-01-01 12:00:00"), 12L, "mover a"))
    q.processAllAvailable()
    ms.addData((Timestamp.valueOf("2024-01-01 12:30:00"), 13L, "mover b"))
    q.processAllAvailable()
    // ...so ONLY the index can catch this redelivery — and it does,
    // because batch survivors were appended to it.
    ms.addData((Timestamp.valueOf("2024-01-01 12:31:00"), 14L, "fresh doc"))
    q.processAllAvailable()
    q.stop()

    val out = spark.read.parquet(s"$root/out")
    assert(out.filter($"doc_id" === 10L).count() == 0) // known at ingest start
    assert(out.filter($"doc_id" === 11L).count() == 1)
    assert(out.filter($"doc_id" === 14L).count() == 0) // caught by index, not state
    // global invariant: no fingerprint ever ingested twice
    assert(out.count() == out.select("fp").distinct().count())
  }

  test("a batch carrying in-batch fp duplicates appends ONE deterministic survivor") {
    import spark.implicits._
    def runOnce(): Seq[(Long, String)] = {
      val root = Files.createTempDirectory("ingest-inbatch").toString
      // docs 5 and 3 share a fingerprint (case/whitespace-equal text);
      // the public batch API has no watermark state in front of it
      val batch = IngestDedup.withFingerprint(
        Seq((5L, "Copy  Me"), (3L, "copy me"), (7L, "unique")).toDF("doc_id", "text"),
        "text")
      IngestDedup.mergeBatch(batch, s"$root/out", s"$root/idx")
      spark.read.parquet(s"$root/out")
        .select($"doc_id", $"text").as[(Long, String)].collect().toSeq.sortBy(_._1)
    }
    val first = runOnce()
    assert(first.map(_._1) == Seq(3L, 7L),
      s"one survivor per fp, min-struct representative: $first")
    // determinism: a replayed batch must pick the SAME survivor (an
    // arbitrary pick could append two different rows of one fp across
    // a crash window)
    assert(runOnce() == first)
  }

  test("in-batch collapse survives dotted column names and refuses non-orderable ones") {
    import spark.implicits._
    // dotted name: col("_r." + c) would have parsed this as a nested
    // field path; getField + backtick-quoted sources resolve it
    val root = Files.createTempDirectory("ingest-dotted").toString
    val batch = IngestDedup.withFingerprint(
      Seq((5L, "Copy  Me"), (3L, "copy me")).toDF("doc.id", "text"), "text")
    IngestDedup.mergeBatch(batch, s"$root/out", s"$root/idx")
    val out = spark.read.parquet(s"$root/out")
      .select(col("`doc.id`"), $"text").as[(Long, String)].collect().toSeq
    assert(out.map(_._1) == Seq(3L), s"min-struct survivor through dotted name: $out")

    // non-orderable column (map): min(struct(...)) has no ordering —
    // the contract is a loud, named refusal, not an analyzer stack trace
    val root2 = Files.createTempDirectory("ingest-maps").toString
    val mapBatch = IngestDedup.withFingerprint(
      Seq((1L, "x", Map("k" -> 1))).toDF("doc_id", "text", "props"), "text")
    val err = intercept[IllegalArgumentException] {
      IngestDedup.mergeBatch(mapBatch, s"$root2/out", s"$root2/idx")
    }
    assert(err.getMessage.contains("orderable"), err.getMessage)
  }

  test("addToIndex refuses to seed beside legacy append-mode fragments unless migrating") {
    import spark.implicits._
    val root = Files.createTempDirectory("ingest-seed").toString
    Seq("legacy1", "legacy2").toDF("fp").write.parquet(s"$root/idx")
    val fps = Seq("legacy1").toDF("fp")
    // a blind seed would commit a manifest BESIDE the fragments, after
    // which every later read silently ignores un-seeded fragment content
    intercept[IllegalArgumentException] {
      IngestDedup.addToIndex(fps, s"$root/idx")
    }
    // the declared in-place migration path: seed the fragments'
    // content explicitly, then the caller deletes them
    IngestDedup.addToIndex(
      spark.read.parquet(s"$root/idx").select($"fp"),
      s"$root/idx", migrateInPlace = true)
    assert(IngestDedup.historyIndex(spark, s"$root/idx")
      .as[String].collect().toSet == Set("legacy1", "legacy2"))
  }

  test("a pre-bucketing append-mode index dir is refused loudly, never silently reset") {
    import spark.implicits._
    val root = Files.createTempDirectory("ingest-legacy").toString
    // the round-13 layout: bare fp fragments at the top level
    Seq("fp1", "fp2").toDF("fp").write.parquet(s"$root/idx")
    intercept[IllegalArgumentException] {
      IngestDedup.historyIndex(spark, s"$root/idx")
    }
    intercept[IllegalArgumentException] {
      IngestDedup.mergeBatch(
        IngestDedup.withFingerprint(Seq((1L, "doc")).toDF("doc_id", "text"), "text"),
        s"$root/out", s"$root/idx")
    }
  }

  test("streamed result matches the batch dedup oracle") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("ingest3").toString

    val rows = Seq(
      (ts(1), 1L, "alpha"), (ts(1), 2L, "beta"), (ts(2), 3L, "alpha"),
      (ts(3), 4L, "Gamma"), (ts(4), 5L, "gamma"), (ts(5), 6L, "delta"))

    val ms = MemoryStream[(Timestamp, Long, String)]
    val q = IngestDedup.runIngest(spark, ms.toDF().toDF("ts", "doc_id", "text"),
      "text", "ts", "10 minutes", s"$root/cp", s"$root/out", s"$root/idx")
    rows.grouped(2).foreach { g => ms.addData(g); q.processAllAvailable() }
    q.stop()

    val streamedFps = spark.read.parquet(s"$root/out")
      .select("fp").as[String].collect().toSet
    val batchFps = IngestDedup.withFingerprint(
        rows.toDF("ts", "doc_id", "text"), "text")
      .select("fp").distinct().as[String].collect().toSet
    assert(streamedFps == batchFps) // {alpha, beta, gamma, delta}
    assert(streamedFps.size == 4)
  }
}
