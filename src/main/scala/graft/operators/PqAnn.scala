package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF}

/** Product-quantization ANN — the memory-scale path for similarity
  * search. IVF (q44) reduces how much of the corpus a query SCANS;
  * PQ reduces how many bytes per vector the scan READS: each vector
  * is split into `m` subvectors, each subvector replaced by the id
  * of its nearest per-subspace codeword, so the scan-resident
  * representation shrinks from m·d·4 bytes of floats to m code ids
  * (64-dim float32 → 8 bytes at m=8: 32×). At 100 TB of embeddings
  * that is the difference between a scan that fits page cache and
  * one that does not; candidates shortlisted by the quantized score
  * are rescored against the full vectors fetched for the shortlist
  * only.
  *
  * Everything is deterministic and distributed:
  *   - codebooks train per subspace with Lloyd iterations expressed
  *     as join+groupBy (same machinery as q71's k-means step);
  *     initial codewords are the subvectors of the `k` corpus rows
  *     with the lowest xxhash64(vec_id) — a seedless stable sample;
  *   - codeword components round to 6 dp so partial-sum order cannot
  *     leak into assignments (q31's contract);
  *   - the asymmetric-distance (ADC) scan is a relational join of
  *     corpus codes against the per-query lookup table on
  *     (subspace, code) + one sum — at cluster scale the LUT (m·k
  *     doubles per query) broadcasts and the sum runs map-side over
  *     packed code arrays; the join spelling keeps the plan
  *     shuffle-explicit and AQE-plannable here.
  *
  * Recall is spec-asserted against the exact ranking (PqAnnSpec);
  * shortlist → exact rescore recovers most of the quantization loss
  * exactly as q102's int8 path does.
  */
object PqAnn {

  /** Per-subspace codebooks: (sub, code, cv: array<double>).
    *
    * @param e (vec_id, v: array<double>) corpus, dim = m * subDim
    */
  def trainCodebooks(e: DataFrame, m: Int, subDim: Int, k: Int,
                     iters: Int): DataFrame =
    trainCodebooksFromSubs(explodeSubvectors(e, m, subDim), k, iters)

  /** Lloyd training over an already-exploded (vec_id, sub, sv) frame —
    * lets [[topK]] compute (and pin) the subvector explode ONCE for
    * init + every iteration + the encode pass, instead of re-running
    * the scan + cast + slice chain per consumer. */
  private def trainCodebooksFromSubs(subs: DataFrame, k: Int,
                                     iters: Int): DataFrame = {
    // Stable seedless init: k lowest-hash rows per subspace.
    val wInit = Window.partitionBy(col("sub")).orderBy(xxhash64(col("vec_id")), col("vec_id"))
    var codebook = subs
      .withColumn("rn", row_number().over(wInit))
      .filter(col("rn") <= k)
      .select(col("sub"), (col("rn") - 1).cast("int").as("code"),
              expr("transform(sv, x -> round(x, 6))").as("cv"))
    var it = 0
    while (it < iters) {
      val assigned = assignCodes(subs, codebook)
      val prev = codebook
      codebook = assigned
        .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg(round(avg(col("x")), 6).as("cx"))
        .groupBy(col("sub"), col("code"))
        .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("pairs"))
        .select(col("sub"), col("code"), expr("transform(pairs, p -> p.cx)").as("cv"))
        // localCheckpoint: the codebook is m*k tiny rows but anchors
        // the whole Lloyd chain — without truncation every downstream
        // reference (encode + the query LUT) re-executes all
        // iterations from the scan.
        .localCheckpoint()
      if (it > 0) Iterate.unpersistCheckpoint(prev)
      it += 1
    }
    codebook
  }

  /** Quantized corpus: (vec_id, sub, code) — the scan-resident form. */
  def encode(e: DataFrame, codebook: DataFrame, m: Int, subDim: Int): DataFrame =
    assignCodes(explodeSubvectors(e, m, subDim), codebook)
      .select(col("vec_id"), col("sub"), col("code"))

  /** ADC top-k: shortlist by quantized inner product, rescore the
    * shortlist with exact cosine against the full vectors.
    *
    * @param e (vec_id, v: array<double>) corpus (full vectors — read
    *          only for queries and the shortlist rescore)
    * @return (qid, nid, rank, sim) exact cosine over the shortlist
    */
  def topK(e: DataFrame, isQuery: Column, m: Int, subDim: Int, k: Int,
           codebookK: Int = 16, iters: Int = 2, shortlist: Int = 50): DataFrame = {
    // NOT pinned: the subvector explode is map-only lineage over a
    // column-pruned scan — re-evaluating it per consumer is cheap map
    // work, while a localCheckpoint would materialize the exploded
    // CORPUS (fact-scale state at 100 TB) to save it; measured 1.03×
    // (neutral) locally with the pin. Checkpoints pay when the shared
    // lineage contains shuffles/windows, not map-only slices.
    val codebook = trainCodebooks(e, m, subDim, codebookK, iters)
    val codes = encode(e, codebook, m, subDim)
    val q = e.filter(isQuery).select(col("vec_id").as("qid"), col("v").as("qv"))
    // Per-query LUT: inner product of each query subvector with each codeword.
    val lut = explodeSubvectors(q.select(col("qid").as("vec_id"), col("qv").as("v")),
                                m, subDim)
      .select(col("vec_id").as("qid"), col("sub").as("q_sub"), col("sv").as("qsv"))
      .join(broadcast(codebook), col("q_sub") === col("sub"))
      .select(col("qid"), col("sub"), col("code"), VF.dot(col("qsv"), col("cv")).as("part"))
    // ADC scan: one (sub, code) equi-join + per-(qid, nid) sum.
    val approx = codes
      .join(broadcast(lut), Seq("sub", "code"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id").as("nid"))
      .agg(sum(col("part")).as("adc"))
    val wq = Window.partitionBy(col("qid")).orderBy(col("adc").desc, col("nid"))
    val short = approx.withColumn("srn", row_number().over(wq))
      .filter(col("srn") <= shortlist)
      .select(col("qid"), col("nid"))
    // Exact rescore over the shortlist only.
    val rescored = short
      .join(e.select(col("vec_id"), col("v")), col("nid") === col("vec_id"))
      .join(broadcast(q.withColumn("qnrm", sqrt(VF.dot(col("qv"), col("qv"))))), Seq("qid"))
      .select(col("qid"), col("nid"),
              (VF.dot(col("v"), col("qv")) /
                (sqrt(VF.dot(col("v"), col("v"))) * col("qnrm"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    rescored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** (vec_id, sub, sv: array<double>) — subvector `sub` is
    * v[sub*subDim, (sub+1)*subDim). */
  private def explodeSubvectors(e: DataFrame, m: Int, subDim: Int): DataFrame =
    e.select(col("vec_id"),
             posexplode(expr(
               s"transform(sequence(0, ${m - 1}), s -> slice(v, s * $subDim + 1, $subDim))"))
               .as(Seq("sub", "sv")))

  /** Argmin over codes as a hash aggregation (`min_by` with a
    * (distance, code) tie-break struct) — partial aggregation folds
    * the k candidate rows map-side, where a row_number window would
    * shuffle-and-sort all n·m·k rows per Lloyd pass. */
  private def assignCodes(subs: DataFrame, codebook: DataFrame): DataFrame =
    subs.join(broadcast(codebook), Seq("sub"))
      .select(col("vec_id"), col("sub"), col("sv"), col("code"),
              VF.l2sq(col("sv"), col("cv")).as("d2"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min_by(struct(col("code"), col("sv")),
                  struct(col("d2"), col("code"))).as("best"))
      .select(col("vec_id"), col("sub"),
              col("best.code").as("code"), col("best.sv").as("sv"))
}
