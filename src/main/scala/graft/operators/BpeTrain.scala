package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Iterated BPE tokenizer training — the fixed-point loop whose single
  * inner step `q110_bpe_merge` oracle-checks: repeatedly find the most
  * frequent adjacent symbol pair across the (weighted) vocabulary and
  * fuse it into a new symbol, yielding the merge-rule list a
  * subword tokenizer is.
  *
  * Scale shape (the fastBPE discipline): the CORPUS is touched exactly
  * once — one `groupBy(token)` count collapses it to vocabulary grain
  * — and every training round then runs over the |vocab|-sized symbol
  * table: pair expansion explodes |syms|−1 positions per DISTINCT
  * word, weighted by its count, so round cost is O(|vocab| × avg_len)
  * however large the corpus. The per-round argmax is a one-row driver
  * action over an already-aggregated frame (the same bounded-driver
  * pattern as PageRank's convergence delta); the merge application is
  * a typed map over the vocab table, never the corpus. Per-round
  * `localCheckpoint` + [[Iterate.unpersistCheckpoint]] keep lineage
  * flat and block-manager residency at two vocab frames.
  *
  * Tie-break: max by (count, then lexicographically SMALLEST (a, b))
  * — deterministic across partitionings and engines.
  */
object BpeTrain {

  /** One vocabulary row: the word, its corpus count, and its current
    * symbol segmentation (characters initially, growing merged
    * symbols as training proceeds). */
  case class Vocab(word: String, cnt: Long, syms: Seq[String])

  /** Greedy left-to-right, non-overlapping application of one merge. */
  def mergeOnce(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = new ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Segment a word with an ordered merge-rule list (application
    * order = learned order, exactly like BPE inference). */
  def applyMerges(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(word.map(_.toString): Seq[String]) {
      case (syms, (a, b)) => mergeOnce(syms, a, b)
    }

  /** Learn up to `k` merges over the corpus' lowercased whitespace
    * tokens. Returns the ordered merge rules and the final segmented
    * vocabulary. Stops early when no adjacent pair occurs twice. */
  def train(corpus: DataFrame, textCol: String, k: Int): (Seq[(String, String)], Dataset[Vocab]) = {
    val spark = corpus.sparkSession
    import spark.implicits._

    // The ONLY corpus-scale pass: token counts.
    var vocab: Dataset[Vocab] = corpus
      .select(explode(TF.tokens(lower(col(textCol)))).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)]
      .map { case (w, c) => Vocab(w, c, w.map(_.toString)) }
      .localCheckpoint()

    val merges = ArrayBuffer.empty[(String, String)]
    var round = 0
    var done = false
    while (round < k && !done) {
      // Weighted adjacent-pair counts at vocab grain; deterministic
      // argmax via (n desc, a, b) total order.
      val best = vocab
        .flatMap(v => v.syms.iterator.zip(v.syms.iterator.drop(1))
          .map { case (a, b) => (a, b, v.cnt) })
        .toDF("a", "b", "w")
        .groupBy($"a", $"b").agg(sum($"w").as("n"))
        .filter($"n" >= 2)
        .orderBy($"n".desc, $"a", $"b")
        .as[(String, String, Long)]
        .head(1)
      best.headOption match {
        case None => done = true
        case Some((a, b, _)) =>
          merges += ((a, b))
          val next = vocab
            .map(v => v.copy(syms = mergeOnce(v.syms, a, b)))
            .localCheckpoint()
          Iterate.unpersistCheckpoint(vocab.toDF())
          vocab = next
          round += 1
      }
    }
    (merges.toSeq, vocab)
  }
}
