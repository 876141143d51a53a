package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Sparse TF-IDF cosine pairs over an inverted-index term join — the
  * q107 kernel, extracted so its document-frequency pruning is a
  * declared, measurable knob instead of a constant baked into the
  * query.
  *
  * Pair volume is Σ_term df² over terms surviving the prune. Two cap
  * regimes with different scale behavior (measured,
  * docs/probes/scalebench_r14_10x_mutate.txt):
  *
  *  - RELATIVE only (`maxDfAbs = Long.MaxValue`, q107's exact
  *    spelling): df ≤ `maxDfFrac`·N. Bounds the blowup only while the
  *    df DISTRIBUTION is fixed — on a growing distinct corpus the cap
  *    rises with N while per-term dfs persist, admitting ever-heavier
  *    postings (766× at ×10 distinct content).
  *  - ABSOLUTE cap (`maxDfAbs = K`): Σdf² ≤ K·Σdf — LINEAR in total
  *    posting volume regardless of corpus growth (the PPJoin/winnow
  *    hot-key discipline). Choose K at least `maxDfFrac`·N of the
  *    largest corpus whose exact answer is needed: below that size the
  *    cap never binds and the output is EXACTLY the relative-prune
  *    kernel (spec-asserted at two scale factors); beyond it, terms
  *    with df > K stop generating pairs — for similarity-thresholded
  *    consumers these are the lowest-idf, lowest-signal terms. The
  *    exact-recall alternative for `cos ≥ t` at any scale is the
  *    prefix-filtered join family (q98 / [[PPJoin]]).
  */
object SparseCosine {

  /** (doc_a, doc_b, cos) for pairs with cosine ≥ `minCos`, doc_a <
    * doc_b; weights are tf·ln(N/df) over terms with `minDf` < df ≤
    * min(`maxDfFrac`·N, `maxDfAbs`). */
  def pairs(docs: DataFrame, textCol: String, idCol: String,
            minCos: Double, minDf: Long = 1L, maxDfFrac: Double = 0.1,
            maxDfAbs: Long = Long.MaxValue): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(TF.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nd = tf.agg(countDistinct(col(idCol)).as("n"))
    // The absolute cap enters the plan only when set: Catalyst does
    // not fold `df <= Long.MaxValue` away, and the uncapped call must
    // stay plan-identical to q107's original spelling.
    val prune = {
      val rel = col("df") <= lit(maxDfFrac) * col("n") && col("df") > lit(minDf)
      if (maxDfAbs == Long.MaxValue) rel else rel && col("df") <= lit(maxDfAbs)
    }
    // Four consumers read the weight frame (both sides of the pair
    // join + both norm lookups), and upstream of it sits the full
    // tokenize→explode→double-aggregate chain — the static plan
    // repeats that chain per consumer (24 scans of the corpus in
    // q107's formatted plan). AQE's runtime exchange reuse recovers
    // some of it, but materializing the pruned weight triples once is
    // strictly smaller work (measured; the frame is the POST-prune
    // posting list, far smaller than the corpus).
    val w = graft.operators.Checkpoints.track(
      tf.join(dfreq, "term").crossJoin(broadcast(nd))
        .filter(prune)
        .select(col(idCol), col("term"),
          (col("tf") * log(col("n").cast("double") / col("df"))).as("w"))
        .localCheckpoint(eager = false))
    val nrm = w.groupBy(col(idCol)).agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val dots = w.as("a").join(w.as("b"),
        col("a.term") === col("b.term") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .agg(sum(col("a.w") * col("b.w")).as("dot"))
    dots
      .join(nrm.select(col(idCol).as("doc_a"), col("nrm").as("na")), "doc_a")
      .join(nrm.select(col(idCol).as("doc_b"), col("nrm").as("nb")), "doc_b")
      .withColumn("cos", col("dot") / (col("na") * col("nb")))
      .filter(col("cos") >= minCos)
      .select(col("doc_a"), col("doc_b"), col("cos"))
  }
}
