package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.pipelines.PretrainPipeline

/** End-to-end invariants of the curation funnel that the manifest's
  * count-level oracle (q166) cannot see: the SURVIVOR SET itself must
  * satisfy every stage's postcondition, and the manifest must be the
  * exact algebra of the per-stage frames.
  */
class PretrainPipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = graft.sources.Tables.documents(spark, dir)
  private lazy val result = PretrainPipeline.run(docs)
  private lazy val manifest = result.manifest.orderBy("stage_no").collect()
  private lazy val curated = result.curated.cache()

  test("manifest is a monotone funnel chained stage to stage") {
    assert(manifest.length == 8)
    assert(manifest.map(_.getString(1)).toSeq == Seq("eval_holdout", "langid",
      "quality", "exact_dedup", "near_dup", "decontaminate", "split", "pack"))
    manifest.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), s"stage ${r.getString(1)} grew")
    }
    // n_in of stage k == n_out of stage k-1 through the doc-count stages
    (1 to 6).foreach { k =>
      assert(manifest(k).getLong(2) == manifest(k - 1).getLong(3),
        s"funnel broken between stages ${k - 1} and $k")
    }
    assert(manifest(0).getLong(2) == docs.count())
    assert(manifest(7).getLong(2) == manifest(6).getLong(3))
  }

  test("survivors satisfy every stage's postcondition") {
    import spark.implicits._
    val ids = curated.select($"doc_id")
    val sv = docs.join(ids, "doc_id").cache()
    try {
      // holdout: no eval docs
      assert(sv.filter(pmod($"doc_id", lit(97L)) === 0).count() == 0)
      // exact dedup: fingerprints unique among survivors
      val n = sv.count()
      assert(sv.select(TF.fingerprint($"text")).distinct().count() == n)
      // near-dup: no surviving pair at or above the threshold
      val pairs = graft.operators.PPJoin.similarPairs(
        sv.select($"doc_id", array_distinct(TF.shingles($"text", 5)).as("sh")),
        "doc_id", "sh", 0.5)
      assert(pairs.count() == 0, "near-dup pair survived the funnel")
      // decontamination: fewer than 3 shared 5-grams with the eval set
      val evalGrams = docs.filter(pmod($"doc_id", lit(97L)) === 0)
        .select(explode(array_distinct(TF.shingles($"text", 5))).as("g")).distinct()
      val contaminated = sv
        .select($"doc_id", explode(array_distinct(TF.shingles($"text", 5))).as("g"))
        .join(evalGrams, Seq("g"))
        .groupBy($"doc_id").agg(count(lit(1)).as("ns"))
        .filter($"ns" >= 3)
      assert(contaminated.count() == 0, "contaminated doc survived")
      assert(n == manifest(5).getLong(3))
    } finally sv.unpersist()
  }

  test("packing is gapless and block counts match the manifest") {
    import spark.implicits._
    // blocks are contiguous per split from 0, and a doc's span starts
    // where the previous doc's cumulative count left off
    val perSplit = curated.groupBy($"split")
      .agg(sum($"ntok").as("tok"), max($"end_block").as("mx")).collect()
    perSplit.foreach { r =>
      val expectedBlocks = (r.getLong(1) + 2047) / 2048
      assert(r.getLong(2) + 1 == expectedBlocks,
        s"split ${r.getString(0)}: max end_block ${r.getLong(2)} vs ceil(${r.getLong(1)}/2048)")
    }
    assert(perSplit.map(r => r.getLong(2) + 1).sum == manifest(7).getLong(3))
    // start_block arithmetic: recompute from the cumulative sum
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"split").orderBy($"doc_id")
    val recomputed = curated
      .withColumn("cum", sum($"ntok").over(w))
      .filter((($"cum" - $"ntok") / 2048).cast("long") =!= $"start_block" ||
              (($"cum" - 1) / 2048).cast("long") =!= $"end_block")
    assert(recomputed.count() == 0)
  }

  test("split is deterministic and uses the q43 content-hash bucket") {
    import spark.implicits._
    val bad = curated
      .join(docs.select($"doc_id", $"text"), "doc_id")
      .filter(
        when(TF.stableBucket($"text", 10) === 0, lit("val")).otherwise(lit("train"))
          =!= $"split")
    assert(bad.count() == 0)
    // determinism across partitionings: same split under repartition
    val again = PretrainPipeline.run(docs.repartition(7)).curated
      .select($"doc_id", $"split")
    val diff = curated.select($"doc_id", $"split").exceptAll(again)
    assert(diff.count() == 0)
  }

  test("curated output carries no text column (metadata-only handoff)") {
    assert(!result.curated.columns.contains("text"))
    assert(result.curated.columns.toSet ==
      Set("doc_id", "lang", "source", "split", "ntok", "start_block", "end_block"))
  }

  test("stages frame is the manifest's algebra, doc by doc") {
    import spark.implicits._
    val byStage = result.stages.groupBy($"stage_no").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each funnel stage's drop count equals n_in - n_out
    manifest.take(6).foreach { r =>
      assert(byStage.getOrElse(r.getLong(0), 0L) == r.getLong(2) - r.getLong(3),
        s"stage ${r.getString(1)}")
    }
    // survivors tagged kept, and exactly the curated docs
    assert(byStage.getOrElse(99L, 0L) == manifest(5).getLong(3))
    val keptIds = result.stages.filter($"stage_no" === 99).select($"doc_id")
    assert(keptIds.exceptAll(curated.select($"doc_id")).count() == 0)
    assert(curated.select($"doc_id").exceptAll(keptIds).count() == 0)
    // every corpus doc appears exactly once
    assert(result.stages.count() == docs.count())
    assert(result.stages.select($"doc_id").distinct().count() == docs.count())
  }

  test("attrition is a shared-frame aggregate of the SAME Result (no second funnel)") {
    import spark.implicits._
    // Result.attrition on an already-built Result must be the plain
    // (source, stage) aggregate of its own stages frame — a production
    // caller holding q166's Result pays one hash-agg + share window,
    // not a funnel recomputation (the q169 catalog entry recomputes
    // only because it is an independent query)
    val att = result.attrition.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
    val recomputed = result.stages
      .groupBy($"source", $"stage_no", $"stage").agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getString(2), r.getLong(3)))).toMap
    assert(att.nonEmpty)
    att.foreach { case (src, no, name, n, frac) =>
      val (gName, gN) = recomputed((src, no))
      assert(name == gName && n == gN, s"($src, $no)")
      assert(frac >= 0.0 && frac <= 1.0)
    }
    // per-source shares account for every doc of that source (sum to 1
    // up to the 4-decimal rounding of each term)
    att.groupBy(_._1).foreach { case (src, rows) =>
      assert(math.abs(rows.map(_._5).sum - 1.0) <= rows.length * 5e-5, src)
    }
    // and the attrition totals reconcile with the manifest funnel
    val byStage = att.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    manifest.take(6).foreach { r =>
      assert(byStage.getOrElse(r.getLong(0), 0L) == r.getLong(2) - r.getLong(3),
        s"stage ${r.getString(1)}")
    }
  }

  test("incremental with empty history reproduces the batch funnel") {
    import spark.implicits._
    val evalDocs = docs.filter(pmod($"doc_id", lit(97L)) === 0)
    val batch = docs.filter(pmod($"doc_id", lit(97L)) =!= 0)
    val inc = PretrainPipeline.incremental(
      batch, history = docs.filter(lit(false)), evalDocs = evalDocs)
    val incManifest = inc.manifest.orderBy("stage_no").collect()
    // stages 1..6 of the full run (which differs only by holding out
    // the SAME eval docs itself at stage 0)
    assert(incManifest.map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSeq ==
      manifest.slice(1, 7).map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSeq)
    val full = curated.select($"doc_id", $"split")
    val got = inc.curated.select($"doc_id", $"split")
    assert(full.exceptAll(got).count() == 0)
    assert(got.exceptAll(full).count() == 0)
  }

  test("ingesting in two phases keeps the corpus invariant clean") {
    import spark.implicits._
    val evalDocs = docs.filter(pmod($"doc_id", lit(97L)) === 0)
    val rest = docs.filter(pmod($"doc_id", lit(97L)) =!= 0)
    val mid = rest.agg(expr("percentile_approx(doc_id, 0.5)")).head.getLong(0)
    val a = rest.filter($"doc_id" <= mid)
    val b = rest.filter($"doc_id" > mid)
    val ra = PretrainPipeline.incremental(a, docs.filter(lit(false)), evalDocs)
    val histA = docs.join(ra.curated.select($"doc_id"), "doc_id")
      .select($"doc_id", $"text")
    val rb = PretrainPipeline.incremental(b, histA, evalDocs)
    val unionIds = ra.curated.select($"doc_id")
      .unionByName(rb.curated.select($"doc_id"))
    val sv = docs.join(unionIds, "doc_id").cache()
    try {
      // the invariant a curated corpus must keep under ingestion:
      val n = sv.count()
      assert(n > 0)
      assert(sv.select(TF.fingerprint($"text")).distinct().count() == n,
        "exact duplicate crossed a batch boundary")
      val pairs = graft.operators.PPJoin.similarPairs(
        sv.select($"doc_id", array_distinct(TF.shingles($"text", 5)).as("sh")),
        "doc_id", "sh", 0.5)
      assert(pairs.count() == 0, "near-dup pair crossed a batch boundary")
      // batch-2 manifest chains like the batch-1 one
      val mb = rb.manifest.orderBy("stage_no").collect()
      (1 until mb.length).foreach { k =>
        if (mb(k).getLong(0) <= 5)
          assert(mb(k).getLong(2) == mb(k - 1).getLong(3))
      }
    } finally sv.unpersist()
  }
}
