package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF}

/** IVF-probed approximate nearest neighbors — the scale path for
  * similarity search (used by query q44 and the 10× ScaleSmoke probe;
  * one definition so a parameter tune cannot silently diverge the
  * benchmark from the graded query).
  *
  * Cells are the `label` column (the coarse quantizer — per-label
  * centroids as in q31). Per query: rank centroids by cosine, probe
  * the top-`nprobe` cells, brute-force ONLY inside probed cells. With
  * nlist cells the candidate scan reads ~nprobe/nlist of the corpus;
  * centroids and the query set ride broadcast joins, so the corpus
  * side is filtered before any wide shuffle. Centroid components are
  * rounded to 6 dp so cross-engine/AQE partial-sum order cannot leak
  * into the ranking (same rationale as q31).
  *
  * Quantizer FRESHNESS is the caller's contract: cells fit on
  * yesterday's corpus rot as the corpus grows (measured —
  * docs/probes/ann_refit_r12.txt: stale cells hold 0.26–0.30
  * recall@5 at 20% scan across 1×/10×/30× growth, a same-fraction
  * refit reaches 0.46/0.68/0.80 AND retrieves faster). [[fitCells]]
  * is the refit: Lloyd-in-DataFrames at the corpus's own scale,
  * deterministic (hash-stable seeds, no RNG), so a scheduled
  * re-quantization produces reproducible cell assignments.
  */
object IvfAnn {

  /** Fit `nlist` coarse-quantizer cells by cosine Lloyd iterations
    * and return the corpus RE-LABELED with them: (vec_id, label, v)
    * — exactly [[topK]]'s input shape, so
    * `topK(fitCells(e, nlist), ...)` is the fresh-quantizer path.
    *
    * Deterministic by construction: seeds are the `nlist` corpus
    * vectors minimizing xxhash64(vec_id) (ties by vec_id), each
    * assignment breaks centroid-similarity ties by cell id, and
    * centroid components round to 6 dp per iteration (the q31/q44
    * rationale — partial-sum order cannot leak into the ranking).
    * Null/zero-norm vectors are excluded from BOTH seeding and
    * assignment (cosine is undefined there), mirroring the
    * CosinePairs exclusion contract.
    *
    * Scale shape: per iteration, one broadcast of nlist·dim centroid
    * doubles against a corpus scan (assignment is map-side; the only
    * shuffle is the (cell, pos) mean), then a localCheckpoint
    * truncates the per-iteration lineage so `iters` chains don't
    * stack into one giant plan. The corpus frame itself is
    * checkpoint-pinned on entry with its norms precomputed, so the
    * CALLER's upstream lineage executes exactly once no matter how
    * many passes re-read it (spec: AnnFrontierSpec's
    * single-upstream-execution test). Cost is O(iters · n · nlist · dim)
    * dot products — the standard IVF training bill; at 100 TB fit on
    * a sample (the cells only need the density shape), re-label the
    * full corpus with one final broadcast assignment pass.
    */
  def fitCells(e: DataFrame, nlist: Int, iters: Int = 5): DataFrame =
    fitCellsWithCentroids(e, nlist, iters)._1

  /** [[fitCells]] with the fitted coarse quantizer itself exposed:
    * (relabeled corpus, centroids (c_label, cv)). The centroid frame
    * is what [[graft.streaming.IvfIngest]] persists so ARRIVING
    * embeddings can be assigned to the same cells the batch fit
    * produced — [[assignTo]] with these centroids returns exactly
    * this function's first component (same valid-filter, same
    * deterministic tie-breaks), which is the streamed-postings ==
    * batch-postings equivalence the ingest spec pins. The centroid
    * plan is lazy; callers that only consume the corpus (fitCells)
    * never pay for it. */
  def fitCellsWithCentroids(e: DataFrame, nlist: Int,
                            iters: Int = 5): (DataFrame, DataFrame) = {
    require(nlist > 0 && iters >= 0, s"nlist=$nlist iters=$iters")
    // Pinned, with the norm hoisted: the seed selection, EVERY Lloyd
    // iteration's assignment pass, and the final relabeling all
    // re-read this frame — without the checkpoint each re-read
    // re-executes the CALLER's upstream lineage (invisible on q44's
    // bare parquet scan, multiplying the dominant cost for any
    // derived-frame caller), the exact trap CosinePairs.clustered's
    // pinned frame documents. Tracked, not released here: the
    // RETURNED relabeled corpus reads it too, so release belongs to
    // the caller's quiesce point (Checkpoints.releaseAll). `nrm` is
    // computed once here instead of once per assignment pass.
    val valid = Checkpoints.track(
      e.filter(col("v").isNotNull && VF.dot(col("v"), col("v")) > 0)
        .withColumn("nrm", sqrt(VF.dot(col("v"), col("v"))))
        .localCheckpoint(eager = false))
    var centroids = valid
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy(col("h"), col("vec_id")).limit(nlist)
      .select(row_number().over(Window.orderBy(col("h"), col("vec_id")))
                .cast("long").as("c_label"),
              col("v").as("cv"))
    def assign(corpus: DataFrame, cents: DataFrame): DataFrame = {
      val cb = broadcast(cents.withColumn("cnrm", sqrt(VF.dot(col("cv"), col("cv")))))
      val wv = Window.partitionBy(col("vec_id"))
        .orderBy(col("csim").desc, col("c_label"))
      // cnrm guard: corpus vectors are norm-filtered above, but a
      // Lloyd CELL MEAN can round (6 dp) to an all-zero centroid on
      // adversarial clouds (the --mutate corpora's sign-scrambled
      // replicas) — unguarded, that puts the ANSI DIVIDE_BY_ZERO the
      // usableVec entry guard eliminates right back into the refit.
      // A degenerate centroid scores below every real cosine (-2), so
      // it attracts rows only if every centroid degenerated — the fit
      // stays total instead of aborting or silently dropping rows.
      corpus
        .join(cb)
        .select(col("vec_id"), col("v"), col("c_label"),
                when(col("cnrm") > 0,
                     VF.dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")))
                  .otherwise(lit(-2.0)).as("csim"))
        .withColumn("rn", row_number().over(wv)).filter(col("rn") === 1)
    }
    for (_ <- 1 to iters) {
      centroids = assign(valid, centroids)
        .select(col("c_label"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("c_label"), col("pos"))
        .agg(round(avg(col("x")), 6).as("cx"))
        .groupBy(col("c_label"))
        .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("pairs"))
        .select(col("c_label"), expr("transform(pairs, p -> p.cx)").as("cv"))
        .localCheckpoint()
    }
    (assign(valid, centroids)
       .select(col("vec_id"), col("c_label").as("label"), col("v")),
     centroids.select(col("c_label"), col("cv")))
  }

  /** Assign (vec_id, v) rows to the given coarse-quantizer cells —
    * the per-batch spelling of [[fitCells]]'s final pass, bit-equal
    * to it for the same centroids: the same validity filter
    * (null/zero-norm rows are EXCLUDED, the usableVec contract — an
    * unusable vector has no cell and is not stored), the same
    * degenerate-centroid guard, and the same deterministic tie-break
    * (max cosine, ties to the smaller cell id). One broadcast of
    * nlist·dim centroid doubles against the batch — map-side but for
    * the per-vec_id rank. */
  def assignTo(e: DataFrame, centroids: DataFrame): DataFrame = {
    val valid = e
      .filter(col("v").isNotNull && VF.dot(col("v"), col("v")) > 0)
      .withColumn("nrm", sqrt(VF.dot(col("v"), col("v"))))
    val cb = broadcast(
      centroids.withColumn("cnrm", sqrt(VF.dot(col("cv"), col("cv")))))
    val wv = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("c_label"))
    valid
      .join(cb)
      .select(col("vec_id"), col("v"), col("c_label"),
              when(col("cnrm") > 0,
                   VF.dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")))
                .otherwise(lit(-2.0)).as("csim"))
      .withColumn("rn", row_number().over(wv)).filter(col("rn") === 1)
      .select(col("vec_id"), col("c_label").as("label"), col("v"))
  }

  /** @param e     (vec_id, label, v: array<double>) corpus
    * @param isQuery predicate over `e` rows selecting the query set
    * @return (qid, nid, rank: long, sim) — exact cosine ranking within
    *         the probed cells, `rank <= k`
    */
  def topK(e: DataFrame, isQuery: Column, nprobe: Int, k: Int): DataFrame = {
    val centroids = e
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(round(avg(col("x")), 6).as("cx"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("pairs"))
      .select(col("label").as("c_label"),
              expr("transform(pairs, p -> p.cx)").as("cv"))
      .withColumn("cnrm", sqrt(VF.dot(col("cv"), col("cv"))))
    val q = e.filter(isQuery)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
      .withColumn("qnrm", sqrt(VF.dot(col("qv"), col("qv"))))
    val wq = Window.partitionBy(col("qid")).orderBy(col("csim").desc, col("c_label"))
    val probes = q.join(broadcast(centroids))
      .select(col("qid"), col("qv"), col("qnrm"), col("c_label"),
              (VF.dot(col("qv"), col("cv")) / (col("qnrm") * col("cnrm"))).as("csim"))
      .withColumn("crn", row_number().over(wq))
      .filter(col("crn") <= nprobe)
      .select(col("qid"), col("qv"), col("qnrm"), col("c_label"))
    val sims = e
      .withColumn("nrm", sqrt(VF.dot(col("v"), col("v"))))
      .join(broadcast(probes),
            col("label") === col("c_label") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
              (VF.dot(col("v"), col("qv")) / (col("nrm") * col("qnrm"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
