package graft

import org.apache.spark.sql.functions._

/** Measured evidence for [[graft.operators.SparseCosine]]'s df-cap
  * contract: on the factor-F DISTINCT-content corpus (where the
  * relative-prune kernel measured 766× per ×10 — see
  * docs/probes/scalebench_r14_10x_mutate.txt), the absolute cap must
  * bring the pair join back to ~linear. Runs the CAPPED kernel only
  * (the uncapped reading comes from the sweep) over the materialized
  * mutate tables and the sf0.1 base, and prints both times.
  *
  * Usage: runMain graft.SparseCosineScaleProbe [mutDir] [cap]
  */
object SparseCosineScaleProbe {
  def main(args: Array[String]): Unit = {
    val mutDir = args.headOption.getOrElse("/tmp/graft-scale10-mut")
    val cap = args.lift(1).map(_.toLong).getOrElse(500L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Graft.session(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")

    def run(dir: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = graft.operators.SparseCosine.pairs(
          graft.sources.Tables(spark, dir, "documents"),
          "text", "doc_id", minCos = 0.3, maxDfAbs = cap)
        .count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val (baseSec, baseN) = run("/root/testdata/sf0.1")
    val (mutSec, mutN) = run(mutDir)
    println(f"SPARSECOS cap=$cap base_sf01=$baseSec%.2f s ($baseN pairs) mut10x=$mutSec%.2f s ($mutN pairs) ratio=${mutSec / baseSec}%.1fx per 10x distinct")
    // Standing assertion (round 15; the in-suite twin lives in
    // SparseCosineSpec on a synthetic corpus): under the cap, PAIR
    // VOLUME on the ×F distinct-content corpus must stay ≤ ~linear in
    // F — the round-14 reading was exactly 10× (311,250 = 10 × 31,125).
    // Wall-time is host-luck; the pair count is the plan's invariant.
    val factor = mutN.toDouble / baseN
    assert(factor <= 15.0,
      f"capped pair volume grew ${factor}%.1fx on the x10 distinct corpus — super-linear; the cap is not binding where it must")
    println(f"SPARSECOS PASS pair-volume factor=$factor%.2f (<= 15 for x10 distinct)")
    spark.stop()
  }
}
