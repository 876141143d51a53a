package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF}

/** Quantizer-freshness probe for IVF ANN (q44 / operators.IvfAnn).
  *
  * The failure this measures: IVF's coarse quantizer is the `label`
  * column — cells FIT ON (or worse, assigned independently of)
  * YESTERDAY'S CORPUS. When the corpus grows with genuinely new
  * content (ScaleBench --mutate: each replica a sign-flipped isometry
  * of the original cloud — within-replica geometry exact, replicas
  * mutually scrambled), each stale cell is a mixture of unrelated
  * sub-clouds and its centroid describes nothing.
  *
  * Measured (docs/probes/ann_refit_r12.txt; near-uniform synthetic
  * corpus, so all readings are the frontier table's documented
  * floor-ish regime):
  *   - stale 10-cell quantizer at 20% scan: recall@5 0.28 (sf0.1),
  *     0.26 (10×), 0.30 (30×) — flat BECAUSE recall on near-uniform
  *     data is scan-fraction-driven, and the fraction never changed;
  *   - Lloyd refit at the corpus's own scale (nlist' = nlist·F), SAME
  *     20% fraction: 0.46 (sf0.1) / 0.68 (10×) / 0.80 (30×) — up to
  *     2.6× the stale recall at equal scan cost, and the retrieval
  *     stage is FASTER (30×: 1.24 s vs 2.17 s) because balanced small
  *     cells prune better than two giant stale ones;
  *   - constant per-query cost instead (nprobe stays 2, fraction
  *     1/F): 0.12 (10×) / 0.06 (30×) — ~6-9× better than the
  *     random-scan floor at that fraction, but on weak-structure data
  *     recall follows the fraction. Growth at constant cost is a
  *     recall trade the operator must surface, not hide.
  *
  * The operational lesson for 100 TB: refit (or incrementally split,
  * IVF's standard maintenance) the quantizer as the corpus grows, and
  * MONITOR recall against a brute-forced query sample exactly as this
  * probe does — the stale quantizer does not get slower, it silently
  * gets worse-per-scan-byte than a fresh fit of the same budget.
  * Refit spelling: Lloyd-in-DataFrames from a hash-stable seed sample
  * (same class as PqAnn's codebook training: assign by broadcast
  * cosine, means by posexplode grouping, 6-dp rounds so partial-sum
  * order cannot leak into the ranking).
  *
  * Usage: runMain graft.AnnRefitProbe <sfDir> [nlistNew] [iters]
  * Prints one JSON line per variant: recall@5 vs the in-probe
  * brute-force truth over the q44 query set (vec_id < 10), plus
  * wall seconds for the retrieval stage alone.
  */
object AnnRefitProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-scale10-mut")
    val nlistNew = args.lift(1).map(_.toInt).getOrElse(100)
    val iters = args.lift(2).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Graft.session(s"local[$cpus]", cpus.toInt)
    import spark.implicits._

    // same input contract as the graded ANN queries (q44): NULL/empty/
    // zero-norm vectors are excluded up front, so a degenerate corpus
    // (e.g. a make_degenerate_corpus output) cannot poison the
    // brute-force truth or the fitCells seeding with 0/0 cosines
    val e = graft.sources.Tables.embeddings(spark, dir)
      .filter(VF.usableVec($"embedding"))
      .select($"vec_id", $"label", VF.asDouble($"embedding").as("v"))
      .cache()
    val n = e.count()
    val nlistOld = e.select($"label").distinct().count()

    // ---- ground truth: brute-force top-5 per query --------------------
    val isQuery: Column = $"vec_id" < 10
    val q = e.filter(isQuery)
      .select($"vec_id".as("qid"), $"v".as("qv"))
      .withColumn("qnrm", sqrt(VF.dot($"qv", $"qv")))
    val wq = Window.partitionBy($"qid").orderBy($"sim".desc, $"nid")
    val truth = e.withColumn("nrm", sqrt(VF.dot($"v", $"v")))
      .join(broadcast(q), $"vec_id" =!= $"qid")
      .select($"qid", $"vec_id".as("nid"),
              (VF.dot($"v", $"qv") / ($"nrm" * $"qnrm")).as("sim"))
      .withColumn("rank", row_number().over(wq))
      .filter($"rank" <= 5)
      .select($"qid", $"nid")
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    def recallOf(res: DataFrame): Double = {
      val got = res.select($"qid", $"nid").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val rs = truth.map { case (qid, want) =>
        want.intersect(got.getOrElse(qid, Set.empty)).size.toDouble / want.size }
      rs.sum / rs.size
    }

    def timed(label: String, nprobe: Int, corpus: DataFrame): Unit = {
      val t0 = System.nanoTime()
      val res = graft.operators.IvfAnn.topK(corpus, isQuery, nprobe = nprobe, k = 5)
        .select($"qid", $"nid").cache()
      res.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"ann_refit","corpus":"$dir","n":$n,"variant":"$label","nprobe":$nprobe,"recall5":${recallOf(res)}%.3f,"sec":$sec%.2f}""")
      res.unpersist()
    }

    // ---- 1. stale quantizer, q44's exact configuration ----------------
    timed(s"stale nlist=$nlistOld", nprobe = 2, e)

    // ---- 2. Lloyd refit at the corpus's own scale ---------------------
    // (operators.IvfAnn.fitCells — the reusable deterministic refit)
    val refit = graft.operators.IvfAnn.fitCells(e, nlistNew, iters).cache()
    val cells = refit.select($"label").distinct().count()
    println(s"""{"probe":"ann_refit","refit_cells":$cells,"iters":$iters}""")

    // same per-query candidate budget as the pre-growth corpus
    timed(s"refit nlist=$cells constant-cost", nprobe = 2, refit)
    // same scan FRACTION as q44's 2/10 on the pre-growth corpus
    val fracProbe = math.max(2, math.round(cells * 2.0 / nlistOld).toInt)
    timed(s"refit nlist=$cells constant-fraction", nprobe = fracProbe, refit)

    spark.stop()
  }
}
