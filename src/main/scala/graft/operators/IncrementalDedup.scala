package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{JaccardSortedLongs, TextFunctions => TF}

/** Cross-snapshot deduplication — the daily-ingest shape of a
  * training-data pipeline: dedupe a NEW batch against the HISTORICAL
  * corpus without ever joining history against itself. Every batch
  * doc gets a verdict:
  *
  *   - `exact`:   its normalized fingerprint already exists in
  *                history (equi-join on the fingerprint — at 100 TB
  *                this is a probe of the fingerprint index, the
  *                history text is never read);
  *   - `neardup`: shingle Jaccard ≥ `thr` against some history doc,
  *                found via the cross-corpus PPJoin prefix filter —
  *                candidates require a shared rare shingle within
  *                the prefix, so the |batch|×|history| product never
  *                materializes and recall is EXACT (same soundness
  *                argument as q98's self-join: size filter
  *                t·|B| ≤ |A| ≤ |B|/t and positional filter both
  *                hold for any consistent global token order — here
  *                document frequency over history ∪ batch);
  *   - `kept`:    everything else — the rows that enter the corpus.
  *
  * Asymmetry is the scale property: history-side work is one df
  * count + prefix build over its shingles (incrementally
  * maintainable as the index), and per-batch cost follows batch
  * size, not corpus size.
  */
object IncrementalDedup {

  /** @param batch   (doc_id, text) — the new snapshot
    * @param history (doc_id, text) — the existing corpus
    * @return one row per batch doc:
    *         (doc_id, verdict, match_id, j_r) where match_id is the
    *         matched history doc (min id for exact; best Jaccard,
    *         ties to min id, for neardup) and j_r the rounded
    *         Jaccard (null unless neardup)
    */
  /** @param ngram shingle width for the near tier (3 = q143's
    *              contract; the pretrain funnel uses 5) */
  def against(batch: DataFrame, history: DataFrame, thr: Double,
              ngram: Int = 3): DataFrame = {
    // ---- exact tier: fingerprint probe --------------------------------
    val fpH = history.select(TF.fingerprint(col("text")).as("fp"), col("doc_id"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("hid"))
    val fpB = batch.select(col("doc_id"), TF.fingerprint(col("text")).as("fp"))
    // pinned (size-guarded): consumed by the residue anti-join AND the
    // final verdict join, and its lineage holds the history
    // fingerprint groupBy shuffle — the class where a checkpoint pays
    val exact = Checkpoints.pinIfSmall(fpB.join(fpH, "fp")
      .select(col("doc_id"), col("hid").as("exact_id")))

    // ---- near-dup tier on the non-exact residue -----------------------
    // HASH-ELEMENT FORM (round 17, PPJoin's discipline, guide §2.3):
    // each side's tokenize + shingle + hash + sort runs ONCE into a
    // size-guarded pin — the explode side and the verify side used to
    // re-run the whole chain per consumer (the final plan scanned
    // documents 11×) — and every downstream exchange keys on an
    // 8-byte long instead of a ~25-byte shingle string. The prefix
    // order becomes (df, hash) — another consistent global order, so
    // recall is exactly preserved — and the verify arrays are
    // byte-identical to the old hashed() output.
    val residue = batch.join(exact, Seq("doc_id"), "left_anti")
    def hashedShingles(df: DataFrame) = Checkpoints.pinIfSmall(
      df.select(col("doc_id"), array_sort(transform(
        array_distinct(TF.shingles(col("text"), ngram)), x => xxhash64(x))).as("hh")))
    val hhB = hashedShingles(residue)
    val hhH = hashedShingles(history)

    def exploded(h: DataFrame) = h.select(
      col("doc_id"), size(col("hh")).as("n"), explode(col("hh")).as("shingle"))
    val exB = exploded(hhB)
    val exH = exploded(hhH)
    // One consistent rarity order for both sides: df over the union.
    // Deliberately NOT checkpointed: measured at sf0.1, letting AQE
    // reuse/recompute the two identical dfreq subtrees (3.1 s) beats
    // eagerly materializing either dfreq (4.4 s) or the whole prefix
    // frame via a tagged union (4.1 s) — localCheckpoint pays a full
    // eager pass per invocation that lazy stage reuse avoids.
    val dfreq = exB.unionByName(exH).groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
    def prefixed(ex: DataFrame) = ex.join(dfreq, "shingle")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))))
      .filter(col("rn") <= col("n") - ceil(col("n") * thr) + 1)
      .select(col("doc_id"), col("n"), col("rn"), col("shingle"))
    val pB = prefixed(exB)
    val pH = prefixed(exH)

    val cand = pB.as("a").join(pH.as("b"),
        col("a.shingle") === col("b.shingle") &&
        col("a.n") >= col("b.n") * thr && col("b.n") >= col("a.n") * thr &&
        least(col("a.n") - col("a.rn"), col("b.n") - col("b.rn")) + 1 >=
          ceil((col("a.n") + col("b.n")) * (thr / (1 + thr))))
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("hid"))
      .dropDuplicates("doc_id", "hid")

    val verified = cand
      .join(hhB.select(col("doc_id"), col("hh").as("ha")), "doc_id")
      .join(hhH.select(col("doc_id").as("hid"), col("hh").as("hb")), "hid")
      .withColumn("j", JaccardSortedLongs(col("ha"), col("hb")))
      .filter(col("j") >= thr)
    val wBest = Window.partitionBy(col("doc_id")).orderBy(col("j").desc, col("hid"))
    val best = verified.withColumn("brn", row_number().over(wBest))
      .filter(col("brn") === 1)
      .select(col("doc_id"), col("hid").as("near_id"), col("j"))

    // ---- verdict assembly --------------------------------------------
    batch.select(col("doc_id"))
      .join(exact, Seq("doc_id"), "left")
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("exact_id").isNotNull, lit("exact"))
          .when(col("near_id").isNotNull, lit("neardup"))
          .otherwise(lit("kept")).as("verdict"),
        coalesce(col("exact_id"), col("near_id")).as("match_id"),
        when(col("near_id").isNotNull, round(col("j"), 4)).as("j_r"))
  }
}
