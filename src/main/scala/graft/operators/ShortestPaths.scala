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

  /** @param collectThreshold > 0 asserts (from problem knowledge, e.g.
    *   a nation-grain graph bounded by construction) that the DISTINCT
    *   edge set is grain-level: the operator then probes it with one
    *   `limit(threshold + 1).collect()` and, when it fits, runs the
    *   BFS on the driver over the collected rows — the carry-literal
    *   discipline (PrefixScan, PqAnn codebooks): 2-3 Spark jobs PER
    *   HOP (frontier checkpoint, emptiness probe, union checkpoint)
    *   collapse to one collect, and per-round job-launch overhead —
    *   which dominates when the graph is tiny — disappears. Distances
    *   are identical: BFS is deterministic. Oversized probes (or null
    *   endpoints / a source column typed differently from the edge
    *   endpoints, where driver equality could diverge from SQL
    *   equality) fall back to the distributed loop unchanged. 0 (the
    *   default) never collects. */
  def hops(edges: DataFrame, sources: DataFrame, maxHops: Int = 30,
           collectThreshold: Int = 0): DataFrame = {
    require(maxHops > 0)
    val spark = edges.sparkSession
    import spark.implicits._

    val Array(srcName, dstName) = edges.columns.take(2)
    val eDistinct = edges.select(col(srcName).as("src"), col(dstName).as("dst"))
      .distinct()
    val srcT = eDistinct.schema("src").dataType
    val typesAlign = srcT == eDistinct.schema("dst").dataType &&
      srcT == sources.schema.head.dataType
    if (collectThreshold > 0 && typesAlign) {
      val probe = eDistinct.limit(collectThreshold + 1).collect()
      if (probe.length <= collectThreshold &&
          probe.forall(r => !r.isNullAt(0) && !r.isNullAt(1))) {
        val srcRows = sources
          .select(col(sources.columns.head).as("node")).distinct().collect()
        if (srcRows.forall(!_.isNullAt(0)))
          return hopsLocal(spark, probe, srcRows, maxHops, srcT)
      }
    }
    val e = eDistinct.localCheckpoint()

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

  /** Driver-side frontier BFS over collected grain-level edges — the
    * same algorithm the distributed loop runs (frontier expansion
    * against the settled set; BFS discovers every node at its minimum
    * hop), so distances are identical by construction. Null endpoints
    * and nulls in `sources` are excluded by the caller's guards. */
  private def hopsLocal(spark: org.apache.spark.sql.SparkSession,
                        edgeRows: Array[org.apache.spark.sql.Row],
                        srcRows: Array[org.apache.spark.sql.Row],
                        maxHops: Int,
                        nodeType: org.apache.spark.sql.types.DataType): DataFrame = {
    val adj = edgeRows.groupBy(_.get(0)).map { case (k, rs) => k -> rs.map(_.get(1)) }
    val dist = scala.collection.mutable.HashMap[Any, Long]()
    var frontier = srcRows.map(_.get(0)).toSet
    frontier.foreach(n => dist(n) = 0L)
    var hop = 0L
    while (frontier.nonEmpty && hop < maxHops) {
      hop += 1
      val next = frontier.iterator
        .flatMap(n => adj.getOrElse(n, Array.empty[Any]))
        .filterNot(dist.contains).toSet
      next.foreach(n => dist(n) = hop)
      frontier = next
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", nodeType, nullable = true),
      org.apache.spark.sql.types.StructField("dist",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val rows = dist.toSeq.map { case (n, d) =>
      org.apache.spark.sql.Row(n, d) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }
}
