package graft

import scala.collection.mutable

import graft.operators.BpeTrain

/** BpeTrain vs a direct single-machine BPE reference: the merge-rule
  * SEQUENCE (order matters — later merges build on earlier fusions)
  * and the final segmentations must agree exactly.
  */
class BpeTrainSpec extends SparkSpec {

  /** Straight-line reference BPE on a word-count map. */
  private def referenceBpe(counts: Map[String, Long], k: Int): (Seq[(String, String)], Map[String, Seq[String]]) = {
    var segs: Map[String, Seq[String]] = counts.keys.map(w => w -> w.map(_.toString)).toMap
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (merges.size < k && continue) {
      val pc = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((w, syms) <- segs; i <- 0 until syms.length - 1)
        pc((syms(i), syms(i + 1))) += counts(w)
      val cands = pc.filter(_._2 >= 2)
      if (cands.isEmpty) continue = false
      else {
        // same total order as the operator: n desc, then (a, b) asc
        val ((a, b), _) = cands.minBy { case ((x, y), n) => (-n, x, y) }
        merges += ((a, b))
        segs = segs.map { case (w, s) => w -> BpeTrain.mergeOnce(s, a, b) }
      }
    }
    (merges.toSeq, segs)
  }

  private val corpus = Seq(
    "the cat sat on the mat", "the cats eat the fish",
    "that hat is flat", "the rat sat on that mat",
    "fish swim and cats nap", "the the the hat hat")

  test("merge sequence and segmentations equal the reference BPE") {
    import spark.implicits._
    val df = corpus.toDF("text")
    val (merges, vocab) = BpeTrain.train(df, "text", k = 8)

    val counts = corpus.flatMap(_.split("\\s+")).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val (wantMerges, wantSegs) = referenceBpe(counts, 8)

    assert(merges == wantMerges, s"got $merges, want $wantMerges")
    val gotSegs = vocab.collect().map(v => v.word -> v.syms).toMap
    assert(gotSegs == wantSegs)
    assert(merges.nonEmpty && merges.size == 8, s"expected 8 merges: $merges")
  }

  test("applyMerges replays training segmentation for known words") {
    import spark.implicits._
    val (merges, vocab) = BpeTrain.train(corpus.toDF("text"), "text", k = 6)
    vocab.collect().foreach { v =>
      assert(BpeTrain.applyMerges(v.word, merges) == v.syms,
        s"inference drifted from training for '${v.word}'")
    }
  }

  test("training stops early when no pair repeats") {
    import spark.implicits._
    // every word 1 char: no adjacent pairs at all
    val (merges, _) = BpeTrain.train(Seq("a b c", "d e f").toDF("text"), "text", k = 5)
    assert(merges.isEmpty)
  }
}
