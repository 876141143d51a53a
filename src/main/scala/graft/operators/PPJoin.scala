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
  * DUPLICATE COLLAPSE (round 10; factored into [[DupCollapse]] in
  * round 11, shared with q17's SimHash blocks and q33's MinHash
  * bands): candidate generation and verify run over DISTINCT
  * shingle-sets only — one representative per content group enters
  * the pair machinery, cross-content pairs re-expand by membership
  * joins (exact: the SETS are identical), within-content pairs are
  * the group self-join at jaccard 1.0. Rationale, exactness argument,
  * and measured quadratic blowup this removes: DupCollapse.scala.
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
    // HASH-ELEMENT FORM (round 17, guide §2.3 — shuffle keys, not
    // payloads): every stage downstream of this projection consumes
    // shingles only as (a) equi-join/groupBy keys, (b) a per-doc size,
    // and (c) the sorted arrays the verify merges — none needs the
    // STRINGS. Hashing once here makes every exchange key an 8-byte
    // long instead of a ~25-byte string, the verify arrays 8 B/elem,
    // and removes the two hash+sort passes the verify sides used to
    // re-run (the hh arrays below are byte-identical to the old
    // docsH). Candidates can differ (the prefix order becomes
    // (df, hash), another consistent total order — PPJoin is exact
    // under any), but the verified output is unchanged: xxhash64
    // collisions were already the accepted ~n²/2⁶⁴ class of the old
    // verify and fingerprint.
    val base = docs.select(col(idCol).as("doc_id"),
      array_sort(transform(col(shCol), x => xxhash64(x))).as("hh"))
    if (!collapse)
      // no DupCollapse pin on this path — share one materialization of
      // the hash+sort across the explode and both verify sides
      // (size-guarded: fact-scale inputs recompute, docs/SCALE.md)
      return similarPairsDistinct(Checkpoints.pinIfSmall(base), thr)
    // Content fingerprint: xxhash64 of the sorted hash array —
    // identical grouping to the old sorted-string fingerprint modulo
    // the accepted collision class. An empty set never pairs — same
    // contract as the all-pairs oracle, where an empty union makes
    // jaccard undefined.
    val annotated = DupCollapse.withRep(base, "doc_id", xxhash64(col("hh")))
    val repPairs = similarPairsDistinct(
      DupCollapse.reps(annotated, "doc_id"), thr)
    DupCollapse.expandCross(repPairs, annotated, "doc_id")
      .unionByName(DupCollapse.withinPairs(annotated, "doc_id",
        size(col("hh")) > 0, Seq("jaccard" -> lit(1.0))))
  }

  /** The pair machinery proper, over a frame of (doc_id, hh) where
    * hh is the SORTED xxhash64 array of a doc's distinct shingles,
    * and the hh-sets are assumed distinct across rows (duplicates are
    * handled — and far cheaper — by [[similarPairs]]'s collapse). */
  private def similarPairsDistinct(d: DataFrame, thr: Double): DataFrame = {
    val ex = d.select(col("doc_id"), size(col("hh")).as("n"),
      explode(col("hh")).as("shingle"))
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
    // Verify over the sorted hash arrays the input already carries:
    // 8-byte elements through the join and a single merge pass per
    // pair (collision probability |shingles|²/2⁶⁵ — far below the
    // 1e-4 rounding callers report).
    val sa = d.select(col("doc_id").as("doc_a"), col("hh").as("sha"))
    val sb = d.select(col("doc_id").as("doc_b"), col("hh").as("shb"))
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("jaccard",
        graft.functions.JaccardSortedLongs(col("sha"), col("shb")))
      .filter(col("jaccard") >= thr)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }
}
