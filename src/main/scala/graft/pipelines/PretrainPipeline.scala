package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** End-to-end pretraining-data curation funnel — the composition a
  * training-data team actually runs, built entirely from the engine's
  * per-stage operators (each independently oracle-verified on its own
  * catalog query):
  *
  *   0 eval_holdout   hold out the benchmark/eval docs (q74's split)
  *   1 langid         marker-regex language id, keep target lang (q18)
  *   2 quality        length / word-shape / repetition / stopword
  *                    gates (q142's rules)
  *   3 exact_dedup    content-fingerprint survivor, min-id wins (q12)
  *   4 near_dup       5-gram Jaccard ≥ thr via the exact-recall PPJoin
  *                    ([[graft.operators.PPJoin]], q98's machinery;
  *                    the MinHash-LSH spelling (q15/q33) is the
  *                    approximate alternative at extreme scale),
  *                    smaller doc_id survives a flagged pair
  *   5 decontaminate  drop docs sharing ≥ minShared distinct 5-grams
  *                    with the held-out eval set (q74)
  *   6 split          deterministic content-hash train/val split (q43)
  *   7 pack           greedy sequence packing into fixed token blocks
  *                    per split (q77)
  *
  * Scale shape — the funnel is computed as FLAGS, not as materialized
  * intermediates: row-local stages (1, 2, 6) are columns; set stages
  * (3, 4, 5) run on the already-filtered survivor frame (each
  * successive join input only shrinks) and come back as drop-id
  * frames; the manifest is ONE hash-aggregate over the flagged corpus
  * (groupBy first-drop-stage) plus a ≤8-row bounded-grain cumulative
  * window — no per-stage recount passes over the corpus. The eval
  * shingle set (1/evalMod of the corpus) broadcasts. At 100 TB each
  * stage boundary is where production would checkpoint; the funnel
  * semantics are unchanged because later stages only consume survivor
  * frames.
  */
object PretrainPipeline {

  /** Curated corpus + per-stage manifest.
    *
    * @param curated  surviving docs: (doc_id, lang, source, split,
    *                 ntok, start_block, end_block)
    * @param manifest (stage_no, stage, n_in, n_out) — 8 rows; for the
    *                 pack stage n_out is the number of emitted blocks
    * @param stages   per-doc fate: (doc_id, source, stage_no, stage) —
    *                 the FIRST stage that dropped the doc, or
    *                 (99, "kept") for survivors; both the manifest and
    *                 the by-source attrition report are aggregates of
    *                 this one frame
    */
  final case class Result(curated: DataFrame, manifest: DataFrame,
                          stages: DataFrame) {
    /** By-source attrition report (q169): which sources lose documents
      * at which funnel stage — aggregated from the ALREADY-COMPUTED
      * [[stages]] frame, so a caller holding a Result pays one
      * source-keyed hash-agg plus a (source × stage)-grain share
      * window, zero extra funnel passes. (The q169 CATALOG entry still
      * times funnel+agg, because as an independent query it must build
      * its own Result — noted in BASELINE.md.)
      */
    def attrition: DataFrame = {
      val spark = stages.sparkSession
      import spark.implicits._
      val wSrc = Window.partitionBy($"source")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      stages
        .groupBy($"source", $"stage_no", $"stage")
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("frac_r",
          round($"n_docs".cast("double") / sum($"n_docs").over(wSrc), 4))
        .orderBy($"source", $"stage_no")
    }
  }

  /** @param materialize checkpoint the two hub frames every later
    *                     stage re-reads (the flagged corpus and the
    *                     exact-dedup survivors — the PPJoin alone
    *                     consumes its input five times). Measured 4x
    *                     on the sf0.1 funnel; OFF recomputes lineage,
    *                     which is what a plan-shape inspection wants.
    */
  def run(docs: DataFrame,
          targetLang: String = "en",
          jaccardThr: Double = 0.5,
          contamMinShared: Long = 3L,
          seqLen: Long = 2048L,
          evalMod: Long = 97L,
          materialize: Boolean = true): Result = {
    val spark = docs.sparkSession
    import spark.implicits._
    // tracked: the returned Result frames read these checkpoints, so
    // release belongs to the caller's quiesce point
    // (graft.operators.Checkpoints.releaseAll())
    def pin(df: DataFrame): DataFrame =
      if (materialize)
        graft.operators.Checkpoints.track(df.localCheckpoint(eager = false))
      else df

    val flagged = pin(rowFlags(docs, targetLang)
      .withColumn("is_eval", pmod($"doc_id", lit(evalMod)) === 0))

    // --- set stages on progressively smaller survivor frames --------
    val s2 = flagged.filter(!$"is_eval" && $"lang_ok" && $"q_ok")
      .select($"doc_id", $"text")
    val exRanked = s2.withColumn("rn", row_number().over(
      Window.partitionBy(TF.fingerprint($"text")).orderBy($"doc_id")))
    val s3 = exRanked.filter($"rn" === 1).select($"doc_id", $"text")

    // The pin sits on the SHINGLED survivor frame, not the text frame
    // (round-16 optimization): PPJoin consumes its input three times
    // (explode for df/prefix, the hashed-verify sides) and the
    // decontamination stage explodes the same 5-gram sets again — with
    // the text pinned, every consumer re-ran tokenize + 5-gram concat
    // + array_distinct over the full survivor corpus; with the shingle
    // arrays pinned, that pass runs ONCE and all consumers read the
    // materialized arrays. s3's text itself now has a single consumer
    // (this shingle pass), so it no longer needs its own checkpoint.
    val s3sh = pin(s3.select($"doc_id",
      array_distinct(TF.shingles($"text", 5)).as("sh")))

    // Exact-dedup losers = s2 minus the survivors: an id anti-join
    // against the pinned survivor frame instead of a second
    // fingerprint-window pass — the checkpoint boundary hides the
    // window's exchange from runtime reuse, so the manifest branch
    // re-ran md5 + row_number over the whole gated corpus un-pinned.
    // Equivalent by construction: rn > 1 ⇔ not (rn == 1) within s2.
    val exactDrop = s2.select($"doc_id")
      .join(s3sh.select($"doc_id"), Seq("doc_id"), "left_anti")

    // pinned: a tiny id frame whose lineage is the whole PPJoin — it
    // is consumed twice (survivor anti-join + manifest flag join)
    // collapse = false: s3 is the EXACT-dedup survivor set, so
    // identical shingle-sets are already gone and PPJoin's duplicate
    // collapse would be pure overhead (measured ~30% at 30×)
    val nearDrop = pin(graft.operators.PPJoin.similarPairs(
        s3sh, "doc_id", "sh", jaccardThr, collapse = false)
      .select($"doc_b".as("doc_id")).distinct())
    // near-dup survivors WITH their already-materialized shingle sets
    // — the decontamination probe below reads `sh` instead of
    // re-shingling the text
    val s4sh = s3sh.join(nearDrop, Seq("doc_id"), "left_anti")

    // Eval reference: the distinct 5-gram set of the held-out docs
    // (1/evalMod of the corpus — broadcast-sized by construction).
    val evalGrams = flagged.filter($"is_eval")
      .select(explode(array_distinct(TF.shingles($"text", 5))).as("g"))
      .distinct()
    val contamDrop = pin(s4sh
      .select($"doc_id", explode($"sh").as("g"))
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy($"doc_id").agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= contamMinShared)
      .select($"doc_id"))
    val s5 = s4sh.select($"doc_id").join(contamDrop, Seq("doc_id"), "left_anti")

    // --- split + pack (q43 + q77 semantics) --------------------------
    // The packing cumsum runs through PrefixScan's two-level
    // decomposition: a bare Window.partitionBy(split) has TWO
    // partitions, funneling the whole curated corpus through two
    // window tasks — the q160-class single-task regression this
    // engine's own plan discipline polices. PrefixScan keys the local
    // windows by (split, quantile-pid of doc_id) and merges ≤ P
    // per-partition totals per split.
    val curatedBase = pin(s5.select($"doc_id")
      .join(flagged.select($"doc_id", $"lang", $"source", $"ws", $"text"), "doc_id")
      .withColumn("split",
        when(TF.stableBucket($"text", 10) === 0, "val").otherwise("train"))
      .select($"doc_id", $"lang", $"source", $"split", $"ws".as("ntok")))
    val curated = graft.operators.PrefixScan.scan(
        curatedBase, keys = Seq("split"), orderCol = "doc_id",
        valueCol = "ntok", out = "cum", op = "sum", partitions = 32,
        // curatedBase is pin()'d above — share that materialization
        // instead of PrefixScan stamping a second copy
        inputPinned = materialize)
      .select($"doc_id", $"lang", $"source", $"split", $"ntok",
        (($"cum" - $"ntok") / seqLen).cast("long").as("start_block"),
        (($"cum" - 1) / seqLen).cast("long").as("end_block"))

    // --- manifest: one agg over first-drop-stage + bounded window ---
    val stageNo = when($"is_eval", 0L)
      .when(!$"lang_ok", 1L)
      .when(!$"q_ok", 2L)
      .when($"x_d", 3L)
      .when($"n_d", 4L)
      .when($"c_d", 5L)
      .otherwise(Survived)
    val names = Seq(0L -> "eval_holdout", 1L -> "langid", 2L -> "quality",
      3L -> "exact_dedup", 4L -> "near_dup", 5L -> "decontaminate")
    val perDoc = stageFrame(flagged, exactDrop, nearDrop, contamDrop,
      stageNo, names)
    val funnel = funnelFrame(perDoc, names)

    // Blocks actually emitted: contiguous per split, so the count is
    // ceil(Σ ntok / seqLen) per split — no window needed for the tally.
    val nBlocks = curated.groupBy($"split").agg(sum($"ntok").as("s"))
      .agg(coalesce(sum(floor(($"s" + seqLen - 1) / seqLen).cast("long")),
        lit(0L)).as("nb"))

    val survivors = funnel.filter($"stage_no" === 5L)
      .select($"n_out".as("n_surv"))
    // stage 6 projects only survivor columns — no nBlocks dependency
    val tail = survivors.select(
      lit(6L).as("stage_no"), lit("split").as("stage"),
      $"n_surv".as("n_in"), $"n_surv".as("n_out"))
      .unionByName(survivors.crossJoin(nBlocks).select(
        lit(7L).as("stage_no"), lit("pack").as("stage"),
        $"n_surv".as("n_in"), $"nb".as("n_out")))

    Result(curated, funnel.unionByName(tail), perDoc)
  }

  /** Per-doc first-drop-stage frame: flag joins + the caller's stage
    * CASE (the flag columns x_d/n_d/c_d are coalesced to false before
    * the CASE evaluates). Shared by [[run]] and [[incremental]].
    */
  private def stageFrame(flagged: DataFrame, exactDrop: DataFrame,
                         nearDrop: DataFrame, contamDrop: DataFrame,
                         stageNo: Column, names: Seq[(Long, String)]): DataFrame = {
    import flagged.sparkSession.implicits._
    val stageName = map((names :+ (Survived -> "kept"))
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    flagged
      .join(exactDrop.withColumn("x_d", lit(true)), Seq("doc_id"), "left")
      .join(nearDrop.withColumn("n_d", lit(true)), Seq("doc_id"), "left")
      .join(contamDrop.withColumn("c_d", lit(true)), Seq("doc_id"), "left")
      .withColumn("x_d", coalesce($"x_d", lit(false)))
      .withColumn("n_d", coalesce($"n_d", lit(false)))
      .withColumn("c_d", coalesce($"c_d", lit(false)))
      .select($"doc_id", $"source", stageNo.as("stage_no"))
      .withColumn("stage", element_at(stageName, $"stage_no"))
  }

  /** Funnel rows (stage_no, stage, n_in, n_out) from the per-doc
    * first-drop-stage frame: one hash-agg + a ≤|stages|+1-row bounded
    * window. Shared by [[run]] and [[incremental]].
    */
  private def funnelFrame(perDoc: DataFrame,
                          names: Seq[(Long, String)]): DataFrame = {
    val spark = perDoc.sparkSession
    import spark.implicits._
    val dropCounts = perDoc
      .groupBy($"stage_no").agg(count(lit(1)).as("n_dropped"))
    val spine = names.toDF("stage_no", "stage")
    // gpin: the stage spine is <= 8 rows by construction; the constant
    // partition key keeps the window spec defined (no WindowExec
    // warning, distinguishable from a corpus-grain funnel in audits)
    val wAll = Window.partitionBy(graft.functions.WindowPins.gpin($"stage_no"))
      .orderBy($"stage_no")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wBefore = Window.partitionBy(graft.functions.WindowPins.gpin($"stage_no"))
      .orderBy($"stage_no")
      .rowsBetween(Window.unboundedPreceding, -1)
    spine
      .join(dropCounts, Seq("stage_no"), "left")
      .withColumn("n_dropped", coalesce($"n_dropped", lit(0L)))
      // total corpus size = drops across all stages + survivors; the
      // survivor row (stage_no = Survived) is carried into the window
      // frame by the union below, then filtered back out
      .unionByName(dropCounts.filter($"stage_no" === Survived)
        .withColumn("stage", lit("__survived")))
      .withColumn("total", sum($"n_dropped").over(wAll))
      .withColumn("n_in", $"total" - coalesce(sum(
        when($"stage_no" =!= Survived, $"n_dropped")).over(wBefore), lit(0L)))
      .filter($"stage_no" =!= Survived)
      .select($"stage_no", $"stage", $"n_in",
        ($"n_in" - $"n_dropped").as("n_out"))
  }

  /** Sentinel stage_no for docs that survive every drop stage. */
  private val Survived = 99L

  /** Row-local gate flags shared by [[run]] and [[incremental]]: q18's
    * marker-regex language id and q142's quality rules, computed in
    * one scan as columns (lang_ok, q_ok, ws — plus the raw scores).
    */
  private def rowFlags(docs: DataFrame, targetLang: String): DataFrame = {
    import docs.sparkSession.implicits._
    def score(markers: Seq[String]) =
      size(regexp_extract_all(lower($"text"),
        lit("\\b(" + markers.mkString("|") + ")\\b"), lit(0))).cast("long")
    val en = Seq("the", "a", "of", "and", "to")
    val de = Seq("der", "die", "das", "und", "ist")
    val fr = Seq("le", "la", "et", "les", "est")
    val stop = array(Seq("the", "of", "and", "to", "in").map(lit): _*)
    docs
      .select($"doc_id", $"lang", $"source", $"text")
      .withColumn("en_s", score(en)).withColumn("de_s", score(de))
      .withColumn("fr_s", score(fr))
      // coalesce(false): a null text makes every gate expression NULL,
      // which under three-valued logic fails the survivor FILTER but
      // would also dodge every when(!flag) branch of the manifest's
      // first-drop-stage CASE — the doc would count as "kept" while
      // missing from the curated output. Null gates ARE failed gates.
      .withColumn("lang_ok", coalesce(targetLang match {
        case "en" => $"en_s" >= $"de_s" && $"en_s" >= $"fr_s" && $"en_s" > 0
        case "de" => $"de_s" > $"en_s" && $"de_s" >= $"fr_s" && $"de_s" > 0
        case other => throw new IllegalArgumentException(
          s"unsupported targetLang $other (marker lists cover en/de)")
      }, lit(false)))
      .withColumn("ws", TF.tokenCount($"text"))
      .withColumn("q_ok", coalesce(
        $"ws" >= 20 && $"ws" <= 1000 &&
        TF.avgTokenLen($"text").between(4.0, 6.5) &&
        TF.distinctTokenRatio($"text") >= 0.45 &&
        arrays_overlap(TF.tokens($"text"), stop), lit(false)))
  }

  /** The DAILY-INGEST spelling of the funnel: curate a NEW batch
    * against the already-curated history WITHOUT ever self-joining
    * history (q143's batch-vs-history discipline, composed with the
    * full gate set). Stages mirror [[run]] minus eval holdout (the
    * eval set is a fixed external reference here) and minus packing
    * (block assignment is a corpus-global layout decision — the
    * periodic repack owns it; the delta emits ntok + split, ready to
    * append).
    *
    *   1 langid + 2 quality  row-local gates on the batch only
    *   3 exact_dedup         within-batch survivor, then a fingerprint
    *                         PROBE of history (history text unread)
    *   4 near_dup            within-batch PPJoin + cross-corpus
    *                         PPJoin vs history (exact recall; history
    *                         never pairs with itself)
    *   5 decontaminate       vs the eval docs' 5-gram set
    *   6 split               content-hash, identical rule to [[run]]
    *
    * Postcondition (spec-asserted): history-survivors ∪ additions
    * contains no exact-duplicate fingerprints and no Jaccard-≥thr
    * pair — the invariant a curated corpus must keep under ingestion.
    */
  def incremental(batch: DataFrame, history: DataFrame, evalDocs: DataFrame,
                  targetLang: String = "en",
                  jaccardThr: Double = 0.5,
                  contamMinShared: Long = 3L,
                  materialize: Boolean = true): Result = {
    val spark = batch.sparkSession
    import spark.implicits._
    // tracked: the returned Result frames read these checkpoints, so
    // release belongs to the caller's quiesce point
    // (graft.operators.Checkpoints.releaseAll())
    def pin(df: DataFrame): DataFrame =
      if (materialize)
        graft.operators.Checkpoints.track(df.localCheckpoint(eager = false))
      else df

    val flagged = pin(rowFlags(batch, targetLang))
    val s2 = flagged.filter($"lang_ok" && $"q_ok").select($"doc_id", $"text")

    // Cross-corpus verdicts come from IncrementalDedup (q143's
    // machinery): exact tier probes history's fingerprints, near tier
    // is the cross-corpus PPJoin — history NEVER pairs with itself
    // (its own curation already guaranteed no internal pair; the
    // asymmetry is what keeps per-batch cost batch-sized).
    val crossRaw = graft.operators.IncrementalDedup.against(
      s2, history.select($"doc_id", $"text"), jaccardThr, ngram = 5)
    val cross = pin(crossRaw)

    // exact: within-batch fingerprint survivor + cross-exact matches
    val exRanked = s2.withColumn("rn", row_number().over(
      Window.partitionBy(TF.fingerprint($"text")).orderBy($"doc_id")))
    val exactDrop = pin(exRanked.filter($"rn" > 1).select($"doc_id")
      .unionByName(cross.filter($"verdict" === "exact").select($"doc_id"))
      .distinct())
    val s3 = pin(s2.join(exactDrop, Seq("doc_id"), "left_anti"))

    // near: within-batch PPJoin over the exact survivors + cross
    // near-dups vs history
    // collapse = false: same exact-dedup-survivor argument as the
    // batch funnel's near stage
    val withinNear = graft.operators.PPJoin.similarPairs(
        s3.select($"doc_id", array_distinct(TF.shingles($"text", 5)).as("sh")),
        "doc_id", "sh", jaccardThr, collapse = false)
      .select($"doc_b".as("doc_id"))
    val nearDrop = pin(withinNear
      .unionByName(cross.filter($"verdict" === "neardup").select($"doc_id"))
      .distinct()
      // cross verdicts were computed on s2; only drops that survived
      // the exact stage count as near-dup drops here
      .join(s3.select($"doc_id"), Seq("doc_id"), "left_semi"))
    val s4 = s3.join(nearDrop, Seq("doc_id"), "left_anti")

    val evalGrams = evalDocs
      .select(explode(array_distinct(TF.shingles($"text", 5))).as("g"))
      .distinct()
    val contamDrop = pin(s4
      .select($"doc_id", explode(array_distinct(TF.shingles($"text", 5))).as("g"))
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy($"doc_id").agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= contamMinShared)
      .select($"doc_id"))
    val s5 = s4.join(contamDrop, Seq("doc_id"), "left_anti")

    val curated = s5.select($"doc_id")
      .join(flagged.select($"doc_id", $"lang", $"source", $"ws", $"text"), "doc_id")
      .withColumn("split",
        when(TF.stableBucket($"text", 10) === 0, "val").otherwise("train"))
      .select($"doc_id", $"lang", $"source", $"split", $"ws".as("ntok"))

    val stageNo = when(!$"lang_ok", 1L)
      .when(!$"q_ok", 2L)
      .when($"x_d", 3L)
      .when($"n_d", 4L)
      .when($"c_d", 5L)
      .otherwise(Survived)
    val names = Seq(1L -> "langid", 2L -> "quality", 3L -> "exact_dedup",
      4L -> "near_dup", 5L -> "decontaminate")
    val perDoc = stageFrame(flagged, exactDrop, nearDrop, contamDrop,
      stageNo, names)
    val funnel = funnelFrame(perDoc, names)
    val survivors = funnel.filter($"stage_no" === 5L)
      .select($"n_out".as("n_surv"))
    val tail = survivors.select(
      lit(6L).as("stage_no"), lit("split").as("stage"),
      $"n_surv".as("n_in"), $"n_surv".as("n_out"))

    Result(curated, funnel.unionByName(tail), perDoc)
  }
}
