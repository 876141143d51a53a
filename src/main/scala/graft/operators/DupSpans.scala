package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Exact duplicated-SPAN accounting over a document corpus — the
  * substring-level dedup statistic of Lee et al., "Deduplicating
  * Training Data Makes Language Models Better" (ACL 2022): a token
  * position is duplicated iff the k-gram starting there also occurs
  * elsewhere, and a document's duplication is the size of the UNION
  * of those k-token intervals (not the gram count — overlapping grams
  * of one copied run must not double-count).
  *
  * The paper builds a single-node suffix array; the distributed
  * spelling is positional k-gram hashing: every shared run of
  * ≥ k tokens shares all its interior k-grams, so interval-union over
  * duplicated gram positions recovers exactly the tokens inside
  * duplicated runs (runs shorter than k are below the resolution by
  * construction, same contract as the paper's minimum match length).
  *
  * Two consumers with deliberately different duplicate predicates:
  *  - [[coverage]] (q174): a gram is duplicated iff it occurs in
  *    ≥ `minDocs` DISTINCT documents — the corpus-overlap measurement
  *    a filtering decision reads (within-doc repetition is q53's
  *    separate axis).
  *  - [[removalPlan]] (q175): every occurrence (within-doc repeats
  *    included) of a gram occurring ≥ 2 times loses to the globally
  *    first occurrence (min (doc_id, pos)) — the first-wins transform
  *    the paper actually applies; the per-doc removed-token count is
  *    the interval union of its LOSING occurrences.
  *
  * Scale shape (100 TB): the gram table is one `posexplode` scan of
  * ~|corpus tokens| rows keyed by an 8-byte hash — the honest price of
  * EXACT substring dedup (the distributed equivalent of the paper's
  * suffix-array pass). Both duplicate predicates are partial-agg
  * friendly (count-distinct / min-struct on the hash key — no per-hash
  * window, so a boilerplate gram occurring in millions of documents is
  * a skewed AGGREGATION key, which map-side combine absorbs, never a
  * single-task window partition). The only windows are per-document
  * (bounded by document length). The sampled alternative at the same
  * granularity is winnowing ([[Winnow]], q149/q158: ~2/(w+1) of
  * positions, exact recall only on runs ≥ k+w−1); coarse granularity
  * is chunk fingerprinting (q81/q109).
  *
  * Hashing is the oracle-reproducible md5-prefix long
  * ([[Winnow.gramHash]]); documents shorter than k tokens contribute
  * no grams (guarded explicitly — [[graft.functions.WordShingles]]
  * would otherwise emit one whole-text shingle, which the
  * `generate_series(1, n-k+1)` oracle spelling never sees).
  */
object DupSpans {

  /** Positional k-gram hashes: (idCol, carry..., pos, h), pos 1-based,
    * only documents with ≥ k tokens and non-NULL text contribute.
    * `carry` columns ride through the Generate node for free — callers
    * that need a document attribute per gram (q176's source) must NOT
    * re-join it onto the gram table (a fact-scale shuffle on the id). */
  def grams(docs: DataFrame, textCol: String, idCol: String, k: Int,
            carry: Seq[String] = Nil): DataFrame = {
    val keep = (idCol +: carry).map(col)
    docs
      .filter(col(textCol).isNotNull)
      .filter(TF.tokenCount(col(textCol)) >= k)
      .select(keep :+ posexplode(TF.shingles(col(textCol), k)): _*)
      .toDF((idCol +: carry) ++ Seq("pos0", "gram"): _*)
      .select(keep ++ Seq((col("pos0") + 1).cast("long").as("pos"),
        Winnow.gramHash(col("gram")).as("h")): _*)
  }

  /** Interval-union size of [pos, pos+k-1] intervals per partition
    * key set: (partitionCols..., tokens) — the running-max-end island
    * spelling, one window partitioned by `partitionCols` (document
    * grain for coverage/removal, (document, counterpart source) for
    * the leakage matrix — ONE shared spelling so the union math can
    * never diverge between consumers). */
  def intervalUnion(positions: DataFrame, partitionCols: Seq[String],
                    k: Int): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    positions
      .withColumn("prev_end", max(col("pos") + lit(k - 1).cast("long")).over(w))
      .withColumn("newly",
        greatest(lit(0L),
          (col("pos") + lit(k - 1).cast("long")) -
            greatest(coalesce(col("prev_end"), lit(0L)), col("pos") - 1L)))
      .groupBy(partitionCols.map(col): _*)
      .agg(sum(col("newly")).as("tokens"))
  }

  /** Per-document duplicated-span coverage: (idCol, n_tokens,
    * dup_tokens) for every non-NULL-text document — dup_tokens is the
    * interval union over positions whose gram occurs in ≥ `minDocs`
    * distinct documents; documents with < k tokens or no duplicated
    * gram report 0. */
  def coverage(docs: DataFrame, textCol: String, idCol: String,
               k: Int = 5, minDocs: Long = 2L): DataFrame = {
    // The gram frame feeds BOTH the duplicate-hash aggregate and the
    // position join; un-checkpointed, Spark re-runs the tokenize +
    // posexplode + md5 pass for each consumer (measured ~1.3× the
    // query at sf0.1). One lazy localCheckpoint materializes it once —
    // CosinePairs.clustered:197's discipline; released at the caller's
    // quiesce point via Checkpoints.
    val g = Checkpoints.track(
      grams(docs, textCol, idCol, k).localCheckpoint(eager = false))
    val dupH = g.groupBy(col("h"))
      .agg(countDistinct(col(idCol)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("h"))
    val cov = intervalUnion(g.join(dupH, "h"), Seq(idCol), k)
      .withColumnRenamed("tokens", "dup_tokens")
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), TF.tokenCount(col(textCol)).as("n_tokens"))
      .join(cov, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
  }

  /** Distinct gram-hash set of a corpus: (h) — the maintainable
    * history state for [[coverageAgainst]]. Grows with DISTINCT gram
    * count, not corpus size; advance it per ingested batch with
    * [[updateIndex]] (a union-distinct — no history re-scan). */
  def gramIndex(docs: DataFrame, textCol: String, idCol: String,
                k: Int = 5): DataFrame =
    grams(docs, textCol, idCol, k).select(col("h")).distinct()

  /** `index` ∪ the batch's distinct gram hashes — the per-ingest index
    * advance (history text is never re-read). */
  def updateIndex(index: DataFrame, batch: DataFrame, textCol: String,
                  idCol: String, k: Int = 5): DataFrame =
    index.unionByName(gramIndex(batch, textCol, idCol, k)).distinct()

  /** Incremental dup-span coverage — the daily-ingest shape of
    * [[coverage]]: score a NEW batch against the HISTORY's gram index
    * without re-reading history. A batch position is duplicated iff
    * its gram is in the index (any history occurrence makes the batch
    * doc the second distinct document) OR occurs in ≥ 2 distinct
    * batch docs; with `index = gramIndex(history)` and disjoint ids
    * this equals [[coverage]] over history ∪ batch restricted to
    * batch docs EXACTLY (spec-asserted), while per-batch cost follows
    * batch size — history-side work is one index probe. Same output
    * shape as [[coverage]]. */
  def coverageAgainst(batch: DataFrame, index: DataFrame, textCol: String,
                      idCol: String, k: Int = 5): DataFrame = {
    val g = Checkpoints.track(
      grams(batch, textCol, idCol, k).localCheckpoint(eager = false))
    // One aggregation pass decides both duplicate conditions: perHash
    // is already distinct on h, so a left probe of the (distinct by
    // contract) index plus an OR filter replaces the two-branch
    // union+distinct that would run the gram aggregation twice.
    val perHash = g.groupBy(col("h")).agg(countDistinct(col(idCol)).as("nd"))
    val dupH = perHash
      .join(index.select(col("h")).withColumn("__in_hist", lit(true)),
        Seq("h"), "left")
      .filter(col("nd") >= 2 || col("__in_hist").isNotNull)
      .select(col("h"))
    val cov = intervalUnion(g.join(dupH, "h"), Seq(idCol), k)
      .withColumnRenamed("tokens", "dup_tokens")
    batch.filter(col(textCol).isNotNull)
      .select(col(idCol), TF.tokenCount(col(textCol)).as("n_tokens"))
      .join(cov, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
  }

  /** Cross-source span leakage: for every ordered source pair
    * (src, src_other), how many of src's tokens sit inside a k-gram
    * that also occurs in src_other — the lexical leakage audit between
    * corpus subsets (train vs eval benches, crawl snapshots, vendors),
    * the span-level counterpart of an embedding-level source-similarity
    * readout. Interval union runs per (doc, counterpart source) so one
    * doc leaking into two sources counts once per counterpart, never
    * double inside one; `leaked_tokens` then sums over src's docs.
    *
    * Scale: gram table as [[grams]]; the counterpart table collapses
    * to DISTINCT (h, source) before the join — fanout per position is
    * bounded by |sources|, never by occurrence count, so a boilerplate
    * gram present everywhere contributes |sources|-1 rows per position,
    * not |occurrences|. Output is |sources|² rows.
    *
    * Returns (src, src_other, leaked_tokens) for pairs with leakage
    * only — join against the source domain for the zero rows.
    */
  def crossSourceLeakage(docs: DataFrame, textCol: String, idCol: String,
                         sourceCol: String, k: Int = 5): DataFrame =
    crossSourceLeakagePerDoc(docs, textCol, idCol, sourceCol, k)
      .groupBy(col("src"), col("src_other"))
      .agg(sum(col("leaked_tokens")).as("leaked_tokens"))

  /** [[crossSourceLeakage]] at per-document grain: (idCol, src,
    * src_other, leaked_tokens) — one row per (doc, counterpart) with
    * leakage. The matrix is this summed over src's docs; the ingest
    * twin ([[graft.streaming.LeakageIngest]]) emits exactly this grain
    * per batch, and its spec pins per-batch equality against this
    * operator restricted to the batch's doc ids. */
  def crossSourceLeakagePerDoc(docs: DataFrame, textCol: String,
                               idCol: String, sourceCol: String,
                               k: Int = 5): DataFrame = {
    val g = Checkpoints.track(
      grams(docs, textCol, idCol, k, carry = Seq(sourceCol))
        .localCheckpoint(eager = false))
    val bySource = g.select(col("h"), col(sourceCol).as("src_other")).distinct()
    val leaked = g.join(bySource, "h")
      .filter(col(sourceCol) =!= col("src_other"))
      .select(col(idCol), col("pos"), col(sourceCol).as("src"), col("src_other"))
    intervalUnion(leaked, Seq(idCol, "src", "src_other"), k)
      .withColumnRenamed("tokens", "leaked_tokens")
  }

  /** Losing occurrences over a gram frame: every occurrence of a gram
    * occurring ≥ 2 times anywhere (within-doc repeats included) except
    * the globally first (min (doc_id, pos)). The winner per hash is a
    * min-struct AGGREGATION — skew-safe on boilerplate grams, never a
    * per-hash window. One shared spelling for [[removalPlan]] (the
    * accounting) and [[applyRemoval]] (the transform), so plan and
    * application can never disagree on who loses. */
  private def losingPositions(g: DataFrame, idCol: String): DataFrame = {
    val winners = g.groupBy(col("h"))
      .agg(min(struct(col(idCol), col("pos"))).as("w"),
           count(lit(1)).as("occ"))
      .filter(col("occ") >= 2L)
      .select(col("h"), col("w").getField(idCol).as("w_id"),
        col("w").getField("pos").as("w_pos"))
    g.join(winners, "h")
      .filter(!(col(idCol) === col("w_id") && col("pos") === col("w_pos")))
      .select(col(idCol), col("pos"))
  }

  /** First-occurrence-wins removal plan: (idCol, n_tokens,
    * removed_tokens) — the per-document removed-token count is the
    * interval union of its losing occurrences ([[losingPositions]]).
    * [[applyRemoval]] materializes the same plan into retained text. */
  def removalPlan(docs: DataFrame, textCol: String, idCol: String,
                  k: Int = 5): DataFrame = {
    // Same two-consumer checkpoint as [[coverage]] (winner aggregate +
    // loser join both read the gram frame).
    val g = Checkpoints.track(
      grams(docs, textCol, idCol, k).localCheckpoint(eager = false))
    val rem = intervalUnion(losingPositions(g, idCol), Seq(idCol), k)
      .withColumnRenamed("tokens", "removed_tokens")
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), TF.tokenCount(col(textCol)).as("n_tokens"))
      .join(rem, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("removed_tokens"), lit(0L)).as("removed_tokens"))
  }

  /** Coalesce [pos, pos+k-1] intervals into merged islands per
    * partition key set: (partitionCols..., s, e) with 1-based
    * inclusive token bounds; overlapping AND adjacent intervals merge
    * (removal-equivalent — the covered position set is identical).
    * Gaps-and-islands over the same doc-partitioned window family as
    * [[intervalUnion]]; island count per doc is bounded by doc
    * length / k. */
  def mergeIntervals(positions: DataFrame, partitionCols: Seq[String],
                     k: Int): DataFrame = {
    val pc = partitionCols.map(col)
    val wPrev = Window.partitionBy(pc: _*).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(pc: _*).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    positions
      .withColumn("prev_end", max(col("pos") + lit(k - 1).cast("long")).over(wPrev))
      .withColumn("brk",
        when(col("prev_end").isNull || col("pos") > col("prev_end") + 1L, 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("brk")).over(wRun))
      .groupBy(pc :+ col("island"): _*)
      .agg(min(col("pos")).as("s"),
           max(col("pos") + lit(k - 1).cast("long")).as("e"))
      .select(pc :+ col("s") :+ col("e"): _*)
  }

  /** Merged removal intervals per document: (idCol, s, e) — the
    * materializable form of [[removalPlan]]'s accounting (sum of
    * e−s+1 per doc == removed_tokens, spec-asserted). */
  def removalIntervals(docs: DataFrame, textCol: String, idCol: String,
                       k: Int = 5): DataFrame = {
    val g = Checkpoints.track(
      grams(docs, textCol, idCol, k).localCheckpoint(eager = false))
    mergeIntervals(losingPositions(g, idCol), Seq(idCol), k)
  }

  /** APPLY the first-occurrence-wins removal — the corpus transform of
    * Lee et al. 2022 that [[removalPlan]] only accounts for: rebuild
    * each document's text with its losing spans excised, keeping the
    * globally-first occurrence of every duplicated run. Returns
    * (idCol, n_tokens, retained_tokens, retained_text) for every
    * non-NULL-text document; retained_text is the whitespace-
    * normalized re-join of surviving tokens ('' if everything lost).
    *
    * Scale shape: removal intervals ride back to the documents as ONE
    * doc-keyed equi-join of a per-doc interval ARRAY (bounded by
    * doc length / k entries — collect_list here is per-doc data, not
    * a driver collect); the excision itself is a codegen'd array HOF
    * pass (filter + exists) over each doc's tokens — map-side, no
    * extra shuffle beyond the interval build. */
  def applyRemoval(docs: DataFrame, textCol: String, idCol: String,
                   k: Int = 5): DataFrame = {
    val ivs = removalIntervals(docs, textCol, idCol, k)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("s"), col("e"))).as("__ivs"))
    val noIvs = array().cast("array<struct<s:bigint,e:bigint>>")
    docs.filter(col(textCol).isNotNull)
      .join(ivs, Seq(idCol), "left")
      .withColumn("__tk", TF.tokens(col(textCol)))
      .withColumn("__keep",
        filter(col("__tk"), (_, i) =>
          !exists(coalesce(col("__ivs"), noIvs),
            iv => (i + 1).cast("long").between(iv.getField("s"), iv.getField("e")))))
      .select(col(idCol),
        size(col("__tk")).cast("long").as("n_tokens"),
        size(col("__keep")).cast("long").as("retained_tokens"),
        array_join(col("__keep"), " ").as("retained_text"))
  }
}
