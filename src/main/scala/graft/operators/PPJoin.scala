package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-recall set-similarity self-join (PPJoin): all pairs of
  * documents whose shingle-set Jaccard reaches a threshold, WITHOUT
  * the O(n²) all-pairs join — candidates come from an equi-join on
  * rare "prefix" shingles, pruned by the PPJoin size and positional
  * filters (both sound for J ≥ t, proofs in the PPJoin paper), then
  * verified with an allocation-free sorted-merge Jaccard
  * ([[graft.functions.JaccardSortedLongs]]) over xxhash64'd elements.
  *
  * This is the candidate generator behind `q98_prefix_filter_neardup`
  * (hash-verified against the all-pairs DuckDB oracle — the filters
  * lose nothing) and the near-dup stage of
  * [[graft.pipelines.PretrainPipeline]]. Cross-corpus variants (batch
  * vs history) live in [[IncrementalDedup]].
  *
  * DUPLICATE COLLAPSE (round 10): candidate generation and verify run
  * over DISTINCT shingle-sets only — docs are grouped by a content
  * fingerprint (xxhash64 of the sorted shingle array), one
  * representative per group enters the pair machinery, and the pair
  * set re-expands afterwards: cross-content pairs as a members×members
  * join (every member pair shares its representatives' exact jaccard,
  * because the SETS are identical), within-content pairs as the
  * group's self-join at jaccard 1.0 (identical non-empty sets). On a
  * duplicate-free corpus this costs one extra doc-grain hash-agg; on a
  * duplicate-heavy corpus it removes the quadratic candidate blowup
  * the factor-10/30 ScaleBench runs measured (every replica of a doc
  * shares its rarest prefix shingles, so candidate volume grew with
  * the SQUARE of the duplicate rate — now the dup rate only affects
  * the output expansion, which is the answer itself). Fingerprint
  * collisions merge distinct contents with probability ~n²/2⁶⁴ — the
  * same accepted class as the xxhash64'd verify elements.
  *
  * Scale shape: one doc-grain fingerprint agg; one df-ordered prefix
  * selection per DISTINCT content (doc-keyed window); one
  * shingle-keyed candidate equi-join whose volume is O(colliding
  * prefixes of distinct contents); a verify join proportional to
  * surviving candidates; two membership equi-joins for re-expansion.
  * No stage touches the n² pair space.
  */
object PPJoin {

  /** @param docs  one row per document
    * @param idCol numeric/string id column
    * @param shCol `array<string>` of DISTINCT shingles (caller
    *              guarantees distinctness, e.g. `array_distinct`)
    * @param thr   Jaccard threshold in (0, 1]
    * @param collapse group identical shingle-sets before candidate
    *              generation (default). Pass false when the input is
    *              ALREADY content-deduplicated (e.g. downstream of an
    *              exact-dedup stage, as in PretrainPipeline) — there
    *              the fingerprint agg + expansion joins are pure
    *              overhead (measured ~30% on the funnel at 30×), while
    *              on a duplicate-bearing corpus they are a measured
    *              14× (q98 at 30×: 108.8 s → 7.6 s).
    * @return (doc_a, doc_b, jaccard) with doc_a < doc_b, exact recall
    */
  def similarPairs(docs: DataFrame, idCol: String, shCol: String,
                   thr: Double, collapse: Boolean = true): DataFrame = {
    require(thr > 0 && thr <= 1, s"threshold must be in (0, 1], got $thr")
    if (!collapse)
      return similarPairsDistinct(
        docs.select(col(idCol).as("doc_id"), col(shCol).as("sh")), thr)
    // ---- duplicate collapse: group docs by shingle-SET content ----
    // (array_sort canonicalizes element order; a null/empty set never
    // pairs — same contract as the all-pairs oracle, where an empty
    // union makes jaccard undefined). ONE window over the fingerprint
    // gives every row its group's representative (min doc_id) and
    // size — a single fp-keyed shuffle instead of an agg plus
    // rep→fp→member join chains. Checkpointed: the reps branch, the
    // member expansion, and the within self-join all re-read this
    // frame; tracked because the RETURNED plan reads it too.
    val wFp = Window.partitionBy(col("__fp"))
    val withRep = Checkpoints.track(
      docs.select(col(idCol).as("doc_id"), col(shCol).as("sh"))
        .withColumn("__fp", xxhash64(array_sort(col("sh"))))
        .withColumn("__rep", min(col("doc_id")).over(wFp))
        .withColumn("__m", count(lit(1)).over(wFp))
        .localCheckpoint(eager = false))
    val d = withRep.filter(col("doc_id") === col("__rep"))
      .select(col("doc_id"), col("sh"))
    val repPairs = similarPairsDistinct(d, thr)

    // ---- re-expansion: representatives → all members ----
    val members = withRep.select(col("__rep"), col("doc_id"))
    val cross = repPairs
      .join(members.select(col("__rep").as("doc_a"), col("doc_id").as("a")), "doc_a")
      .join(members.select(col("__rep").as("doc_b"), col("doc_id").as("b")), "doc_b")
      .select(least(col("a"), col("b")).as("doc_a"),
              greatest(col("a"), col("b")).as("doc_b"), col("jaccard"))
    // identical non-empty sets: jaccard exactly 1.0 ≥ any valid thr
    val dupMembers = withRep
      .filter(col("__m") >= 2 && size(col("sh")) > 0)
      .select(col("__rep"), col("doc_id"))
    val within = dupMembers.as("x").join(dupMembers.as("y"),
        col("x.__rep") === col("y.__rep") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
              lit(1.0).as("jaccard"))
    cross.unionByName(within)
  }

  /** The pair machinery proper, over a frame of (doc_id, sh) whose
    * shingle-sets are assumed DISTINCT across rows (duplicates are
    * handled — and far cheaper — by [[similarPairs]]'s collapse). */
  private def similarPairsDistinct(d: DataFrame, thr: Double): DataFrame = {
    val ex = d.select(col("doc_id"), size(col("sh")).as("n"),
      explode(col("sh")).as("shingle"))
    val dfreq = ex.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    // Prefix: the (n - ceil(n*t) + 1) globally-rarest shingles of each
    // doc. Two docs with J >= t MUST share a prefix shingle.
    val prefix = ex.join(dfreq, "shingle")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))))
      .filter(col("rn") <= col("n") - ceil(col("n") * thr) + 1)
      .select(col("doc_id"), col("n"), col("rn"), col("shingle"))
    // Size filter (t·|B| ≤ |A| ≤ |B|/t) + positional filter: the first
    // shared token at ranks (i, j) caps the overlap at
    // 1 + min(|A|−i, |B|−j), which must reach ⌈t/(1+t)·(|A|+|B|)⌉.
    // Spelled as the rational comparison (1+min)·(1+t) ≥ t·(|A|+|B|)
    // (equivalent for integer LHS, no ceil): the ceil-of-double form
    // could round t/(1+t)·(|A|+|B|) a ulp ABOVE an exact integer and
    // wrongly prune a true pair. The 1e-9 slack makes any residual
    // double rounding err toward KEEPING a candidate — the exact
    // verify below prunes it, so recall is preserved at the cost of at
    // most a few extra verified pairs.
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id") &&
        col("a.n") >= col("b.n") * thr && col("b.n") >= col("a.n") * thr &&
        (least(col("a.n") - col("a.rn"), col("b.n") - col("b.rn")) + 1) * (1 + thr) >=
          (col("a.n") + col("b.n")) * thr - 1e-9)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    // Verify over sorted xxhash64'd shingles: 8-byte elements through
    // the join and a single merge pass per pair (collision probability
    // |shingles|²/2⁶⁵ — far below the 1e-4 rounding callers report).
    val docsH = d.select(col("doc_id"),
      array_sort(transform(col("sh"), x => xxhash64(x))).as("hh"))
    val sa = docsH.select(col("doc_id").as("doc_a"), col("hh").as("sha"))
    val sb = docsH.select(col("doc_id").as("doc_b"), col("hh").as("shb"))
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("jaccard",
        graft.functions.JaccardSortedLongs(col("sha"), col("shb")))
      .filter(col("jaccard") >= thr)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }
}
