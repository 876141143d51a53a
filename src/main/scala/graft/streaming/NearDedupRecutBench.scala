package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures what [[NearDedupIngest.recutPrefixes]] is for: the probe
  * cost a df INVERSION leaves in stale PPJoin prefixes, and the cut
  * restoring it. The spec's fixture at bench scale:
  *
  *   1. hotmaker docs make block B2 corpus-hot;
  *   2. variant docs (unique filler + B1 + B2) store B1 — rare at
  *      their storage time — in their prefixes;
  *   3. drift batches all carry B1 (never B2): B1 turns hot, and
  *      every drift doc candidates against EVERY variant through the
  *      stale B1 prefix rows (candidates/batch = batch x variants,
  *      all rejected by verify at J < thr — pure wasted fanout; the
  *      drift docs' own prefixes stay B1-free by construction, so the
  *      fanout is variant-bound and deterministic);
  *   4. recutPrefixes flips the variants' shared slot to the now-rarer
  *      B2 → the same drift batches candidate ZERO.
  *
  * Correctness never moves (one-sided theorem binds for any per-doc
  * order — NearDedupIngestSpec pins lengths/idempotence/recall); this
  * probe records the WORK the refit knob reclaims and its own cost.
  *
  * Usage: runMain graft.streaming.NearDedupRecutBench [variants] [driftBatches] [docsPerBatch]
  */
object NearDedupRecutBench {

  private def docs(spark: SparkSession, rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  def main(args: Array[String]): Unit = {
    val nVariants = args.headOption.map(_.toInt).getOrElse(300)
    val driftBatches = if (args.length > 1) args(1).toInt else 6
    val perBatch = if (args.length > 2) args(2).toInt else 200
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Graft.session(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")

    val root = Files.createTempDirectory("neardedup-recut-bench").toString
    val (out, idx) = (s"$root/out", s"$root/idx")
    val B1 = "w1 w2 w3 w4"; val B2 = "z1 z2 z3 z4"

    def merge(rows: Seq[(Long, String)], e: Long): Double = {
      val t0 = System.nanoTime()
      NearDedupIngest.mergeBatch(docs(spark, rows), "text", "doc_id",
        out, idx, epoch = e).unpersist()
      (System.nanoTime() - t0) / 1e6
    }

    // B2 hot (3x the variant count), then the variants storing B1
    merge((0 until 3 * nVariants).map(i =>
      (100000L + i, s"f${i}a f${i}b f${i}c f${i}d $B2")), 1L)
    merge((0 until nVariants).map(i => (200000L + i, s"q${i}x $B1 $B2")), 2L)

    val cands = scala.collection.mutable.ArrayBuffer.empty[Long]
    NearDedupIngest.onCandidates = Some(cands += _)
    try {
      def drift(tag: String, baseId: Long, e0: Long): (Double, Double) = {
        cands.clear()
        val ms = (0 until driftBatches).map { k =>
          merge((0 until perBatch).map(j =>
            (baseId + k.toLong * perBatch + j,
             s"${tag}${k}_${j}a ${tag}${k}_${j}b ${tag}${k}_${j}c ${tag}${k}_${j}d $B1")),
            e0 + k)
        }
        (ms.sum / ms.size, cands.map(_.toDouble).sum / cands.size)
      }
      val (preMs, preCand) = drift("u", 1000000L, 3L)
      println(f"NEARDEDUPRECUT pre-recut drift: batches=$driftBatches docs/batch=$perBatch cand(avg)=$preCand%.0f (= batch x ${nVariants} variants) merge(avg)=$preMs%.1f ms")
      val t0 = System.nanoTime()
      NearDedupIngest.recutPrefixes(spark, out, idx)
      val recutMs = (System.nanoTime() - t0) / 1e6
      val (postMs, postCand) = drift("v", 2000000L, 100L)
      println(f"NEARDEDUPRECUT recut_ms=$recutMs%.0f corpus=${spark.read.parquet(out).count()} docs")
      println(f"NEARDEDUPRECUT post-recut drift: cand(avg)=$postCand%.0f merge(avg)=$postMs%.1f ms merge_ratio=${postMs / preMs}%.2f")
      assert(postCand == 0.0, s"post-recut candidates must be zero, got $postCand")
      assert(preCand == perBatch.toDouble * nVariants,
        s"pre-recut candidates must be batch x variants, got $preCand")
    } finally NearDedupIngest.onCandidates = None
    spark.stop()
  }
}
