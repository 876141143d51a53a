package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank over a directed edge list — the graph-analytics
  * companion to [[ConnectedComponents]]: where components resolve
  * dedup groups, PageRank scores node importance (domain authority
  * for crawl prioritization, citation weight for source mixing).
  *
  * Algorithm: power iteration. Each round every node's rank is
  * `(1-d)/N + d·(Σ_in pr(u)·w(u,v)/out(u) + dangling/N)` where
  * `dangling` is the rank mass of nodes with no out-edges (spread
  * uniformly, keeping Σpr = 1 every round — spec-asserted).
  *
  * Scale posture: the per-round plan is one edges⋈ranks equi-join on
  * the source node + one groupBy destination — the edge list is the
  * only large operand and it is never rebuilt or re-shuffled beyond
  * that join (pre-partition/bucket edges by `src` on a cluster and
  * every round reuses the layout). Ranks are |V|-sized. The dangling
  * term is a scalar crossJoin, not a per-row lookup. Per-round
  * `localCheckpoint` truncates lineage exactly like
  * [[ConnectedComponents.minLabel]]; convergence is measured as an
  * L1 delta on the (small) rank table.
  *
  * Reference tie-in: no graph operator exists in the reference
  * (SURVEY.md §2.B north-star extension). The single-step oracle-
  * checked spelling is `q100_pagerank_step`; this operator is the
  * fixed-point iteration of the same per-round plan.
  *
  * @param edges (src, dst, w) weighted directed edges, names
  *              positional; parallel edges are summed.
  * @return (node, pr) — ranks summing to 1 over all nodes appearing
  *         as a source or destination.
  */
object PageRank {

  def run(edges: DataFrame, damping: Double = 0.85, maxRounds: Int = 30,
          tol: Double = 1e-6): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val Array(srcName, dstName, wName) = edges.columns.take(3)
    val e = edges
      .select(col(srcName).as("src"), col(dstName).as("dst"),
        col(wName).cast("double").as("w"))
      .groupBy($"src", $"dst").agg(sum($"w").as("w"))
      .localCheckpoint()

    val nodes = e.select($"src".as("node"))
      .union(e.select($"dst".as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count().toDouble

    val outd = e.groupBy($"src").agg(sum($"w").as("wout")).localCheckpoint()

    var ranks = nodes.withColumn("pr", lit(1.0 / n)).localCheckpoint()
    var round = 0
    var delta = Double.MaxValue
    while (delta > tol && round < maxRounds) {
      // Rank mass sitting on dangling nodes (no out-edges) this round —
      // a broadcast one-row aggregate folded into the plan, not a
      // separate driver-side action (the only per-round action left is
      // the convergence delta, which the fixed point inherently needs).
      val dangling = ranks.join(outd, ranks("node") === outd("src"), "left_anti")
        .agg(coalesce(sum($"pr"), lit(0.0)).as("dang"))
      val contrib = e
        .join(outd, "src")
        .join(ranks, e("src") === ranks("node"))
        .groupBy($"dst")
        .agg(sum($"pr" * $"w" / $"wout").as("cin"))
      val next = nodes
        .join(contrib, nodes("node") === contrib("dst"), "left")
        .crossJoin(broadcast(dangling))
        .select($"node",
          (lit((1 - damping) / n) +
            lit(damping) * (coalesce($"cin", lit(0.0)) + $"dang" / n)).as("pr"))
        .localCheckpoint()
      delta = next.as("a").join(ranks.as("b"), "node")
        .agg(sum(abs($"a.pr" - $"b.pr"))).as[Double].head()
      // The delta join was the last reader of the previous round's
      // checkpointed RDD — release it ([[Iterate.unpersistCheckpoint]]),
      // or maxRounds |V|-sized RDDs pile up in block-manager memory
      // over a long fixed point.
      Iterate.unpersistCheckpoint(ranks)
      ranks = next
      round += 1
    }
    ranks
  }
}
