package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003): slide a window of `w` consecutive k-gram hashes over
  * each document and keep each window's minimum — any shared substring
  * of length ≥ k + w - 1 is then guaranteed to share at least one
  * SELECTED fingerprint, while only ~2/(w+1) of all gram positions
  * survive. The selected set is the span-level dedup key: document
  * pairs sharing ≥ `minShared` selected fingerprints contain real
  * copied spans, not coincidental single grams.
  *
  * Shared by the batch spelling (`q149_winnow_spans`) and the
  * streaming ingest twin ([[graft.streaming.WinnowIngest]]) so both
  * agree on what "span overlap" means. The per-doc window runs inside
  * one (doc_id)-partitioned pass; everything downstream joins on the
  * fixed-width hash, never the text.
  */
object Winnow {

  /** Per-position gram hash: first 8 hex chars of md5 as a long —
    * stable across engines (the DuckDB oracle reproduces it). */
  def gramHash(gram: Column): Column =
    conv(substring(md5(gram), 1, 8), 16, 10).cast("long")

  /** Selected fingerprints WITH their token positions: (idCol, pos, h)
    * — every position whose gram hash is its trailing-w-window minimum.
    * The position column is what turns a flagged pair into actionable
    * span offsets (which tokens to cut), see `q158_winnow_offsets`.
    *
    * @param k shingle size (grams of k tokens)
    * @param w winnow window (w consecutive gram hashes per window)
    */
  def selectedPositions(docs: DataFrame, textCol: String, idCol: String,
                        k: Int = 5, w: Int = 4): DataFrame = {
    val grams = docs
      .select(col(idCol), posexplode(TF.shingles(col(textCol), k)))
      .toDF(idCol, "pos", "gram")
      .withColumn("h", gramHash(col("gram")))
    val wm = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(-(w - 1), Window.currentRow)
    grams
      .withColumn("wmin", min(col("h")).over(wm))
      .filter(col("h") === col("wmin"))
      .select(col(idCol), col("pos"), col("h"))
  }

  /** Distinct selected fingerprints per document: (idCol, h). */
  def selectFingerprints(docs: DataFrame, textCol: String, idCol: String,
                         k: Int = 5, w: Int = 4): DataFrame =
    selectedPositions(docs, textCol, idCol, k, w)
      .select(col(idCol), col("h"))
      .distinct()

  /** Span-overlap pairs among `sel` (a selected-fingerprint table with
    * columns (idCol, h)): pairs sharing ≥ `minShared` fingerprints,
    * with the overlap ratio against the smaller selected set.
    * `maxDf`, when set, drops fingerprints appearing in more than
    * that many documents BEFORE the pair join — the hot-gram guard
    * that keeps a boilerplate n-gram from exploding the candidate
    * space quadratically. */
  def overlapPairs(sel: DataFrame, idCol: String, minShared: Long,
                   maxDf: Option[Long] = Some(20L)): DataFrame = {
    val guarded = maxDf match {
      case Some(d) => sel.join(
        sel.groupBy(col("h")).agg(count(lit(1)).as("df")).filter(col("df") <= d)
          .select(col("h")), "h")
      case None => sel
    }
    val selN = guarded.groupBy(col(idCol)).agg(count(lit(1)).as("sel_n"))
    guarded.select(col(idCol).as("doc_a"), col("h"))
      .join(guarded.select(col(idCol).as("doc_b"), col("h")), "h")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .join(selN.select(col(idCol).as("doc_a"), col("sel_n").as("na")), "doc_a")
      .join(selN.select(col(idCol).as("doc_b"), col("sel_n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        round(col("n_shared").cast("double") /
          least(col("na"), col("nb")).cast("double"), 4).as("overlap_r"))
  }
}
