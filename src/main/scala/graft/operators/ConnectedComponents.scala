package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the
  * dedup-group resolution step of a near-duplicate pipeline: pair
  * detection (MinHash/SimHash/exact Jaccard) emits edges, components
  * turn edges into groups, and each group keeps one canonical
  * document (here: the minimum id).
  *
  * Algorithm: iterative minimum-label propagation. Each node starts
  * with `label = id`; every round each node takes the min of its own
  * label and its neighbors' labels; converged when no label changes.
  * Rounds needed = graph diameter, and near-dup graphs are
  * overwhelmingly tiny cliques/short chains (diameter ≤ 3), so the
  * loop runs 2–4 rounds in practice. Every round is one shuffle
  * (join on edge endpoint + groupBy node); the convergence check
  * piggybacks on the same aggregate — no extra action over the data.
  *
  * Scale posture: labels and edges are both keyed by node id, so each
  * round is an equi-join Catalyst plans as sort-merge or broadcast by
  * size; AQE handles skewed hub nodes. For adversarial long-chain
  * graphs (diameter ~ n), switch to the large-star/small-star
  * alternation (Kiveris et al., "Connected Components in MapReduce
  * and Beyond") which converges in O(log^2 n) rounds over the same
  * join/groupBy primitives — not needed for dedup-group shapes. The
  * per-round `localCheckpoint` truncates lineage so the plan does not
  * grow with iteration count (a driver-side OOM vector in any
  * iterative Spark job).
  *
  * Reference tie-in: the reference has no graph operator (its only
  * "grouping" is the keyed latest-wins map, static/index.html:87-89);
  * this is a north-star extension (SURVEY.md §2.B).
  *
  * @param edges two-column DataFrame of undirected edges; column
  *              names are taken positionally (src, dst). Self-loops
  *              and duplicate/reversed edges are tolerated.
  * @return (node, component) — component = min node id reachable.
  */
object ConnectedComponents {

  def minLabel(edges: DataFrame, maxRounds: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val Array(srcName, dstName) = edges.columns.take(2)
    // Symmetrize once: propagation then only needs one join direction.
    // undirected(): dedup on the canonical orientation before the 2×
    // explode (round-17 respelling, row-set identical).
    val sym = Symmetrize.undirected(edges
        .select(col(srcName).as("src"), col(dstName).as("dst")))
      .localCheckpoint()

    var labels = sym.select($"src".as("node")).distinct()
      .withColumn("lbl", $"node")
      .localCheckpoint()

    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // Candidate labels flowing along edges: neighbor's label -> node.
      val fromNeighbors = sym
        .join(labels, sym("src") === labels("node"))
        .select($"dst".as("node"), $"lbl")
      val next = labels.select($"node", $"lbl")
        .union(fromNeighbors)
        .groupBy($"node")
        .agg(min($"lbl").as("lbl"))
        .localCheckpoint()
      // Convergence check: any node whose label still shrank this
      // round? One aggregate over the joined old/new label tables.
      val changed = next.as("n")
        .join(labels.as("o"), $"n.node" === $"o.node")
        .filter($"n.lbl" < $"o.lbl")
        .limit(1).count()
      // The convergence join was the previous round's last reader —
      // release its checkpointed blocks (Iterate.unpersistCheckpoint)
      // so long fixed points hold two label frames, not maxRounds.
      Iterate.unpersistCheckpoint(labels)
      labels = next
      converged = changed == 0
      round += 1
    }
    require(converged, s"ConnectedComponents did not converge in $maxRounds rounds")
    labels.select($"node", $"lbl".as("component"))
  }
}
