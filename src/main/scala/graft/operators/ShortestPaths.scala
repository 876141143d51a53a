package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single/multi-source BFS hop distances over a directed edge list —
  * the reachability operator beside [[ConnectedComponents]] (groups)
  * and [[PageRank]] (importance): supply-chain hops, crawl-frontier
  * depth, dependency closures.
  *
  * Algorithm: frontier expansion. Round k joins the (k−1)-frontier to
  * the edge list and keeps destinations not yet seen; because BFS
  * discovers every node at its minimum hop count, no relaxation or
  * min-merge is needed. Each round is one equi-join on `src` + one
  * anti-join against the settled set; the frontier is the only
  * growing-then-shrinking operand, the edge list never re-shuffles
  * beyond its join (pre-partition/bucket edges by `src` on a cluster
  * and every round reuses the layout — [[PageRank]]'s discipline).
  * Rounds = reachable diameter, bounded by `maxHops`. Per-round
  * `localCheckpoint` + [[Iterate.unpersistCheckpoint]] keep lineage
  * flat and block-manager memory at two frames.
  *
  * Reference tie-in: no graph operator exists in the reference
  * (SURVEY.md §2.B north-star extension). The oracle-checked query
  * spelling is `q132_trade_hops` (DuckDB recursive-CTE BFS).
  *
  * @param edges   two-column (src, dst) directed edges, names
  *                positional; duplicates tolerated.
  * @param sources one-column source node set.
  * @return (node, dist) — minimum hop count from any source;
  *         unreachable nodes are absent.
  */
object ShortestPaths {

  def hops(edges: DataFrame, sources: DataFrame, maxHops: Int = 30): DataFrame = {
    require(maxHops > 0)
    val spark = edges.sparkSession
    import spark.implicits._

    val Array(srcName, dstName) = edges.columns.take(2)
    val e = edges.select(col(srcName).as("src"), col(dstName).as("dst"))
      .distinct()
      .localCheckpoint()

    var dist = sources.select(col(sources.columns.head).as("node")).distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint()
    var frontier = dist.select($"node")
    var frontierCkpt: DataFrame = null // checkpoint backing `frontier`, if any
    var hop = 0L
    var exhausted = false
    while (!exhausted && hop < maxHops) {
      hop += 1
      val next = frontier.join(e, frontier("node") === e("src"))
        .select($"dst".as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .withColumn("dist", lit(hop))
        .localCheckpoint()
      if (next.isEmpty) {
        Iterate.unpersistCheckpoint(next)
        exhausted = true
      } else {
        val grown = dist.unionByName(next).localCheckpoint()
        // grown is materialized — the previous dist and the previous
        // round's frontier checkpoint have no remaining readers.
        Iterate.unpersistCheckpoint(dist)
        if (frontierCkpt != null) Iterate.unpersistCheckpoint(frontierCkpt)
        dist = grown
        frontier = next.select($"node")
        frontierCkpt = next
      }
    }
    if (frontierCkpt != null) Iterate.unpersistCheckpoint(frontierCkpt)
    Iterate.unpersistCheckpoint(e)
    dist
  }
}
