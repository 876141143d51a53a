package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.IncrementalDedup
import graft.streaming.{ManifestState, NearDedupIngest}

class NearDedupIngestSpec extends SparkSpec {

  private val thr = 0.5

  // Token namespaces are disjoint across unrelated docs so no
  // accidental shingle overlap exists. "near" variants append one
  // token (8 shared of 9 shingles, J ≈ 0.89 ≥ 0.5); "exact" variants
  // change case/whitespace only (same canonical fingerprint).
  private val base1 = "aa bb cc dd ee ff gg hh ii jj"
  private val unrelA = "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10"
  private val unrelB = "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10"
  private val unrelC = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10"
  private val unrelD = "r1 r2 r3 r4 r5 r6 r7 r8 r9 r10"

  private val b1 = Seq((1L, base1), (2L, unrelA), (3L, unrelB))
  private val b2 = Seq(
    (10L, s"AA  bb cc dd ee ff gg hh ii jj"), // exact of 1
    (11L, s"$base1 xtra"),                    // near of 1
    (12L, unrelC))                            // kept
  private val b3 = Seq(
    (20L, s"$unrelC ytra"),                   // near of 12
    (21L, s"P1 p2 p3 p4 p5 p6 p7 p8 p9 p10"), // exact of 12
    (22L, unrelD))                            // kept

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def emptyCorpus: DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  }

  private def corpus(outDir: String): DataFrame = {
    import spark.implicits._
    if (new java.io.File(outDir).exists())
      spark.read.parquet(outDir).select($"doc_id", $"text").distinct()
    else emptyCorpus
  }

  private def collectVerdicts(df: DataFrame): Set[(Long, String, Option[Long], Option[Double])] =
    df.collect().map { r =>
      (r.getLong(0), r.getString(1),
       if (r.isNullAt(2)) None else Some(r.getLong(2)),
       if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    }.toSet

  test("per-batch verdicts equal the batch IncrementalDedup tier at every horizon") {
    val root = Files.createTempDirectory("neardedup-eq").toString
    val (out, idx) = (s"$root/out", s"$root/idx")
    var hist = emptyCorpus
    for ((rows, epoch) <- Seq(b1, b2, b3).zipWithIndex) {
      val batch = docs(rows)
      val want = collectVerdicts(
        IncrementalDedup.against(batch, hist, thr))
      val got = collectVerdicts(
        NearDedupIngest.mergeBatch(batch, "text", "doc_id", out, idx,
          epoch = epoch.toLong, thr = thr))
      assert(got == want, s"epoch $epoch: got $got, want $want")
      hist = corpus(out)
    }
    // the fixture must exercise all three verdicts at both horizons
    assert(corpus(out).count() == 5) // 1, 2, 3, 12, 22
  }

  test("accumulated corpus has no cross-batch near pair and no duplicate fingerprint") {
    import spark.implicits._
    val root = Files.createTempDirectory("neardedup-corpus").toString
    val (out, idx) = (s"$root/out", s"$root/idx")
    val batchOf = (Seq(b1, b2, b3).zipWithIndex.flatMap { case (rows, e) =>
      rows.map { case (id, _) => id -> e } }).toMap
    for ((rows, epoch) <- Seq(b1, b2, b3).zipWithIndex)
      NearDedupIngest.mergeBatch(docs(rows), "text", "doc_id", out, idx,
        epoch = epoch.toLong, thr = thr)
    val kept = spark.read.parquet(out)
    assert(kept.select($"fp").distinct().count() == kept.count(), "fp-unique")
    // brute-force all-pairs oracle over the kept corpus: no CROSS-BATCH
    // pair may reach the threshold (in-batch pairs are q143's declared
    // keep-both semantics)
    val sh = kept.select($"doc_id",
      array_sort(transform(array_distinct(
        graft.functions.TextFunctions.shingles($"text", 3)), x => xxhash64(x))).as("hh"))
    val pairs = sh.as("a").crossJoin(sh.as("b"))
      .filter($"a.doc_id" < $"b.doc_id")
      .withColumn("j", graft.functions.JaccardSortedLongs($"a.hh", $"b.hh"))
      .filter($"j" >= thr)
      .select($"a.doc_id", $"b.doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val crossBatch = pairs.filter { case (a, b) => batchOf(a) != batchOf(b) }
    assert(crossBatch.isEmpty, s"cross-batch near pairs survived: ${crossBatch.toSeq}")
  }

  private def stateSets(idx: String): Map[String, Set[String]] =
    Seq("fp", "pre", "doc", "df").map { s =>
      s -> ManifestState.read(spark, s"$idx/$s")
        .collect().map(_.toString).toSet
    }.toMap

  test("replay after full commit appends nothing and leaves states unchanged") {
    val root = Files.createTempDirectory("neardedup-replay").toString
    val (out, idx) = (s"$root/out", s"$root/idx")
    NearDedupIngest.mergeBatch(docs(b1), "text", "doc_id", out, idx, epoch = 0L, thr = thr)
    NearDedupIngest.mergeBatch(docs(b2), "text", "doc_id", out, idx, epoch = 1L, thr = thr)
    val rows = spark.read.parquet(out).count()
    val states = stateSets(idx)
    // the at-least-once replay of batch 2, same epoch
    val v = NearDedupIngest.mergeBatch(docs(b2), "text", "doc_id", out, idx,
      epoch = 1L, thr = thr)
    // a fully-committed replay exact-drops everything against its own
    // fingerprints (doc 11 still verdicts neardup: its fp was never kept)
    assert(collectVerdicts(v).forall(r => r._2 != "kept"), collectVerdicts(v))
    assert(spark.read.parquet(out).count() == rows, "full-commit replay appended")
    assert(stateSets(idx) == states, "full-commit replay changed state")
  }

  test("crash at every patch prefix replays to the no-crash corpus, states, and later verdicts") {
    def run(root: String, crashAfter: Int): (Set[String], Map[String, Set[String]],
                                             Set[(Long, String, Option[Long], Option[Double])]) = {
      val (out, idx) = (s"$root/out", s"$root/idx")
      NearDedupIngest.mergeBatch(docs(b1), "text", "doc_id", out, idx, epoch = 0L, thr = thr)
      if (crashAfter > 0) {
        var commits = 0
        NearDedupIngest.onPatchCommitted = () => {
          commits += 1
          if (commits == crashAfter)
            throw new RuntimeException(s"injected crash after commit $crashAfter")
        }
        try intercept[RuntimeException] {
          NearDedupIngest.mergeBatch(docs(b2), "text", "doc_id", out, idx,
            epoch = 1L, thr = thr)
        } finally NearDedupIngest.onPatchCommitted = () => ()
      }
      // at-least-once: the crashed batch replays in full, SAME epoch
      NearDedupIngest.mergeBatch(docs(b2), "text", "doc_id", out, idx, epoch = 1L, thr = thr)
      val v3 = collectVerdicts(
        NearDedupIngest.mergeBatch(docs(b3), "text", "doc_id", out, idx,
          epoch = 2L, thr = thr))
      (corpus(out).collect().map(_.toString).toSet, stateSets(idx), v3)
    }
    val (refCorpus, refStates, refV3) =
      run(Files.createTempDirectory("neardedup-ref").toString, 0)
    assert(refV3.exists(_._2 == "neardup"), s"fixture must pair across the crash: $refV3")
    for (crashAfter <- 1 to 5) {
      val (gotCorpus, gotStates, gotV3) =
        run(Files.createTempDirectory(s"neardedup-crash$crashAfter").toString, crashAfter)
      assert(gotCorpus == refCorpus, s"crashAfter=$crashAfter corpus diverged")
      assert(gotStates == refStates, s"crashAfter=$crashAfter state diverged")
      assert(gotV3 == refV3, s"crashAfter=$crashAfter later verdicts diverged")
    }
  }

  test("the documented replay anomaly is bounded: only duplicate corpus rows, only in the append window") {
    // crash after the append but before the fp commit, replay: the
    // kept docs re-append ONCE; distinct rows equal the no-crash
    // corpus (asserted above), and the dup multiplicity is exactly 2
    val root = Files.createTempDirectory("neardedup-dup").toString
    val (out, idx) = (s"$root/out", s"$root/idx")
    NearDedupIngest.mergeBatch(docs(b1), "text", "doc_id", out, idx, epoch = 0L, thr = thr)
    var commits = 0
    NearDedupIngest.onPatchCommitted = () => {
      commits += 1
      if (commits == 1) throw new RuntimeException("crash after append")
    }
    try intercept[RuntimeException] {
      NearDedupIngest.mergeBatch(docs(b2), "text", "doc_id", out, idx, epoch = 1L, thr = thr)
    } finally NearDedupIngest.onPatchCommitted = () => ()
    NearDedupIngest.mergeBatch(docs(b2), "text", "doc_id", out, idx, epoch = 1L, thr = thr)
    import spark.implicits._
    val counts = spark.read.parquet(out).groupBy($"doc_id")
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 12L -> 2L),
      s"only batch-2's kept doc duplicates, exactly once: $counts")
  }

  test("seeded history behaves as a merged-first-batch corpus") {
    val root = Files.createTempDirectory("neardedup-seed").toString
    val (out, idx) = (s"$root/out", s"$root/idx")
    NearDedupIngest.seedCorpus(docs(b1), "text", "doc_id", out, idx, thr = thr)
    val want = collectVerdicts(IncrementalDedup.against(docs(b2), docs(b1), thr))
    val got = collectVerdicts(
      NearDedupIngest.mergeBatch(docs(b2), "text", "doc_id", out, idx,
        epoch = 0L, thr = thr))
    assert(got == want, s"got $got, want $want")
    // a second seed into a populated state is refused
    val err = intercept[IllegalArgumentException] {
      NearDedupIngest.seedCorpus(docs(b3), "text", "doc_id", out, idx, thr = thr)
    }
    assert(err.getMessage.contains("empty state"), err.getMessage)
  }

  test("thr/ngram drift against a populated index is refused loudly") {
    val root = Files.createTempDirectory("neardedup-meta").toString
    val (out, idx) = (s"$root/out", s"$root/idx")
    NearDedupIngest.mergeBatch(docs(b1), "text", "doc_id", out, idx, epoch = 0L, thr = thr)
    val err = intercept[IllegalArgumentException] {
      NearDedupIngest.mergeBatch(docs(b2), "text", "doc_id", out, idx,
        epoch = 1L, thr = 0.8)
    }
    assert(err.getMessage.contains("thr"), err.getMessage)
    val err2 = intercept[IllegalArgumentException] {
      NearDedupIngest.mergeBatch(docs(b2), "text", "doc_id", out, idx,
        epoch = 1L, thr = thr, ngram = 5)
    }
    assert(err2.getMessage.contains("ngram"), err2.getMessage)
  }

  test("in-batch exact duplicates collapse to the min-id survivor") {
    import spark.implicits._
    val root = Files.createTempDirectory("neardedup-inbatch").toString
    val (out, idx) = (s"$root/out", s"$root/idx")
    val batch = docs(Seq((7L, "Copy  Me now ok"), (4L, "copy me now ok"), (9L, unrelA)))
    val v = collectVerdicts(
      NearDedupIngest.mergeBatch(batch, "text", "doc_id", out, idx, epoch = 0L, thr = thr))
    assert(v == Set(
      (4L, "kept", None, None),
      (7L, "exact", Some(4L), None),
      (9L, "kept", None, None)), v)
    assert(spark.read.parquet(out).select($"doc_id").as[Long].collect().toSet
      == Set(4L, 9L))
  }

  test("streamed ingest matches the sequential batch merges (micro-batches)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("neardedup-stream").toString
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = NearDedupIngest.runIngest(spark,
      ms.toDF().toDF("ts", "doc_id", "text"), "text", "doc_id",
      "ts", "10 minutes", s"$root/ckpt", s"$root/out", s"$root/idx",
      thr = thr, verdictDir = Some(s"$root/verdicts"),
      retention = Some(ManifestState.Retention(everyBatches = 1, keepLast = 1)))
    for ((rows, i) <- Seq(b1, b2, b3).zipWithIndex) {
      ms.addData(rows.map { case (id, t) =>
        (java.sql.Timestamp.valueOf(s"2024-01-0${i + 1} 00:00:00"), id, t) })
      q.processAllAvailable()
    }
    q.stop()
    // reference: the sequential direct merges
    val refRoot = Files.createTempDirectory("neardedup-stream-ref").toString
    for ((rows, epoch) <- Seq(b1, b2, b3).zipWithIndex)
      NearDedupIngest.mergeBatch(docs(rows), "text", "doc_id",
        s"$refRoot/out", s"$refRoot/idx", epoch = epoch.toLong, thr = thr)
    val got = spark.read.parquet(s"$root/out")
      .select($"doc_id", $"text").collect().map(_.toString).toSet
    val want = spark.read.parquet(s"$refRoot/out")
      .select($"doc_id", $"text").collect().map(_.toString).toSet
    assert(got == want, s"streamed corpus diverged:\n got=$got\n want=$want")
    // the verdict log covers every doc that REACHES the merge: docs 10
    // and 21 are exact dups whose fingerprints the in-stream
    // watermarked dedup (horizon 1) drops before the batch tier — the
    // IngestDedup discipline; the corpus equality above already proves
    // the drop is the same verdict the merge would have issued
    val logged = spark.read.parquet(s"$root/verdicts")
      .select($"doc_id").distinct().as[Long].collect().toSet
    assert(logged == (b1 ++ b2 ++ b3).map(_._1).toSet -- Set(10L, 21L), logged)
    // in-stream retention: each state root kept only the newest archive
    for (s <- Seq("fp", "pre", "doc", "df")) {
      val archives = java.nio.file.Files.list(
          java.nio.file.Paths.get(s"$root/idx/$s", "manifests")).toArray.length
      assert(archives == 1, s"state $s: $archives archives survived retention")
    }
  }

  private def preRows(idx: String): Set[(String, Long, Int, Int)] =
    NearDedupIngest.preIndex(spark, idx).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet

  test("recutPrefixes: lengths invariant, idempotent, later verdicts unchanged") {
    val a = Files.createTempDirectory("neardedup-recut-a").toString
    val b = Files.createTempDirectory("neardedup-recut-b").toString
    for (root <- Seq(a, b); (rows, e) <- Seq(b1, b2).zipWithIndex)
      NearDedupIngest.mergeBatch(docs(rows), "text", "doc_id",
        s"$root/out", s"$root/idx", epoch = e.toLong, thr = thr)
        .unpersist()
    val before = preRows(s"$a/idx")
    NearDedupIngest.recutPrefixes(spark, s"$a/out", s"$a/idx")
    val after = preRows(s"$a/idx")
    // per-doc prefix LENGTH depends only on (n, thr) — invariant
    def lens(s: Set[(String, Long, Int, Int)]): Map[Long, Int] =
      s.groupBy(_._2).view.mapValues(_.size).toMap
    assert(lens(after) == lens(before))
    // a second re-cut is a content no-op
    NearDedupIngest.recutPrefixes(spark, s"$a/out", s"$a/idx")
    assert(preRows(s"$a/idx") == after)
    // recall: the next batch verdicts identically against the re-cut
    // index and the untouched control
    val va = NearDedupIngest.mergeBatch(docs(b3), "text", "doc_id",
      s"$a/out", s"$a/idx", epoch = 2L, thr = thr)
    val vb = NearDedupIngest.mergeBatch(docs(b3), "text", "doc_id",
      s"$b/out", s"$b/idx", epoch = 2L, thr = thr)
    assert(collectVerdicts(va) == collectVerdicts(vb))
    Seq(va, vb).foreach(_.unpersist())
  }

  test("a df inversion rots prefix pruning; recutPrefixes restores it with recall intact") {
    val root = Files.createTempDirectory("neardedup-inv").toString
    val (out, idx) = (s"$root/out", s"$root/idx")
    def merge(rows: Seq[(Long, String)], e: Long): DataFrame =
      NearDedupIngest.mergeBatch(docs(rows), "text", "doc_id",
        out, idx, epoch = e, thr = thr)
    // B2 is hot from the start (8 carriers); B1 is rare at the
    // variants' storage time, so rare-first cuts B1 — not B2 — into
    // the variants' 4th prefix slot (3 unique boundary shingles + 1).
    val B1 = "w1 w2 w3 w4"; val B2 = "z1 z2 z3 z4"
    val hotmakers = (0 until 8).map(i =>
      (100L + i, s"f${i}a f${i}b f${i}c f${i}d $B2"))
    val variants = (0 until 3).map(i => (200L + i, s"q${i}x $B1 $B2"))
    merge(hotmakers, 1L).unpersist()
    merge(variants, 2L).unpersist()
    val b1Interior = Set("w1 w2 w3", "w2 w3 w4")
    def variantPrefixShingles: Set[String] =
      preRows(idx).filter(r => r._2 >= 200L && r._2 < 300L).map(_._1)
    assert((variantPrefixShingles & b1Interior).nonEmpty,
      "fixture: B1 must sit in the variants' stored prefixes")
    // drift: every probe doc carries B1 (4 unique tokens keep B1 out
    // of the PROBES' own prefixes, so the rot stays variant-bound and
    // the candidate counts deterministic: 5 probes x 3 variants)
    val cands = scala.collection.mutable.ArrayBuffer.empty[Long]
    NearDedupIngest.onCandidates = Some(cands += _)
    try {
      var e = 3L
      for (k <- 0 until 4) {
        merge((0 until 5).map(j =>
          (1000L + 100 * k + j,
           s"u${k}_${j}a u${k}_${j}b u${k}_${j}c u${k}_${j}d $B1")), e)
          .unpersist()
        e += 1
      }
      assert(cands.toSeq == Seq(15L, 15L, 15L, 15L),
        s"each drift batch must candidate 5x3 against the stale prefixes: $cands")
      NearDedupIngest.recutPrefixes(spark, out, idx)
      // B1's df (3 + 20) now exceeds B2's (11): the 4th slot flips
      assert((variantPrefixShingles & b1Interior).isEmpty,
        "re-cut must evict the now-hot B1 from the variants' prefixes")
      assert(variantPrefixShingles.contains("z1 z2 z3"),
        "the rarer B2 interior takes the freed slot")
      cands.clear()
      merge((0 until 5).map(j =>
        (2000L + j, s"v${j}a v${j}b v${j}c v${j}d $B1")), 10L).unpersist()
      assert(cands.toSeq == Seq(0L),
        s"post-recut drift probes share no prefix shingle: $cands")
      // recall intact: a TRUE near-dup of variant 200 must still flag
      val v = merge(Seq((3000L, s"q0x $B1 $B2 extra")), 11L)
      val got = collectVerdicts(v); v.unpersist()
      assert(got == Set((3000L, "neardup", Some(200L), Some(0.875))), got)
    } finally NearDedupIngest.onCandidates = None
  }
}
