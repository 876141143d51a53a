package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Identical-content collapse for pair-generating near-dup operators —
  * the round-10 PPJoin discipline, factored out so SimHash block
  * bucketing (q17) and MinHash LSH banding (q33) use the SAME
  * spelling instead of re-growing quadratically on duplicate-heavy
  * corpora.
  *
  * Why: real web corpora are duplicate-heavy, and exact duplicates
  * share their signatures BIT-FOR-BIT (same shingle set ⇒ same
  * minhash bands; same text ⇒ same simhash blocks; same rare prefix
  * shingles). So every replica of a doc collides with every replica
  * of its neighbors, and candidate volume grows with the SQUARE of
  * the duplicate rate — measured 29.7×/23.4× at 10× replicas for
  * q17/q33 before this collapse. Grouping identical contents first
  * makes the pair machinery see each content ONCE; the duplicate
  * rate then affects only the output expansion, which is the answer
  * itself.
  *
  * Exactness: members of a group have IDENTICAL content, so
  *  - a cross-group member pair has exactly its representatives'
  *    similarity (same sets ⇒ same jaccard; same signatures ⇒ same
  *    hamming), and
  *  - a within-group pair has the identity similarity (jaccard 1.0 /
  *    hamming 0), subject to a caller validity predicate (an empty
  *    shingle set has undefined jaccard and must not pair — same
  *    contract as the all-pairs oracle).
  * Fingerprint collisions merge distinct contents with probability
  * ~n²/2⁶⁴ — the accepted xxhash64 class.
  *
  * Scale shape: one fp-keyed window (a single shuffle at doc grain),
  * then the caller's pair machinery over DISTINCT contents only, then
  * two membership equi-joins (cross) plus one group self-join
  * (within, proportional to the OUTPUT pair count). On a
  * duplicate-free corpus the overhead is the one doc-grain window.
  */
object DupCollapse {

  /** Annotate `docs` with `__fp` (the content fingerprint), `__rep`
    * (group representative = min id) and `__m` (group size) via ONE
    * fp-keyed window, then localCheckpoint: the reps branch, the
    * cross expansion, and the within self-join all re-read this
    * frame, and the RETURNED plan reads it too — tracked in
    * [[Checkpoints]] for the caller's quiesce-point release. */
  def withRep(docs: DataFrame, idCol: String, fp: Column): DataFrame = {
    val wFp = Window.partitionBy(col("__fp"))
    Checkpoints.track(docs
      .withColumn("__fp", fp)
      .withColumn("__rep", min(col(idCol)).over(wFp))
      .withColumn("__m", count(lit(1)).over(wFp))
      .localCheckpoint(eager = false))
  }

  /** One representative row per distinct content — what enters the
    * caller's candidate/verify machinery. */
  def reps(annotated: DataFrame, idCol: String): DataFrame =
    annotated.filter(col(idCol) === col("__rep")).drop("__fp", "__rep", "__m")

  /** Expand representative pairs `(doc_a, doc_b, carry...)` to all
    * member pairs, re-normalized to doc_a < doc_b; carry columns ride
    * along unchanged (exact for every member pair — the contents are
    * identical). */
  def expandCross(repPairs: DataFrame, annotated: DataFrame, idCol: String): DataFrame = {
    val members = annotated.select(col("__rep"), col(idCol).as("__id"))
    val carry = repPairs.columns.filterNot(Set("doc_a", "doc_b")).map(col)
    repPairs
      .join(members.select(col("__rep").as("doc_a"), col("__id").as("__a")), "doc_a")
      .join(members.select(col("__rep").as("doc_b"), col("__id").as("__b")), "doc_b")
      .select(least(col("__a"), col("__b")).as("doc_a") +:
              greatest(col("__a"), col("__b")).as("doc_b") +: carry: _*)
  }

  /** Within-group pairs (identical content ⇒ identity similarity),
    * with caller-supplied carry columns (`jaccard` → 1.0, `hamming` →
    * 0) and a validity predicate for contents whose identity pair is
    * undefined (empty sets). */
  def withinPairs(annotated: DataFrame, idCol: String, valid: Column,
                  carry: Seq[(String, Column)]): DataFrame = {
    val dup = annotated.filter(col("__m") >= 2 && valid)
      .select(col("__rep"), col(idCol).as("__id"))
    dup.as("x").join(dup.as("y"),
        col("x.__rep") === col("y.__rep") && col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("doc_a") +: col("y.__id").as("doc_b") +:
              carry.map { case (n, c) => c.as(n) }: _*)
  }
}
