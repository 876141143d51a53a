package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semi-supervised label propagation over an undirected edge list —
  * spreading a small set of trusted labels (seed domains, human-rated
  * quality tiers, known-language sites) across a similarity or link
  * graph, the standard trick for labeling a corpus far larger than
  * its annotation budget.
  *
  * Semantics: seeds are FIXED. Each round, every still-unlabeled node
  * adjacent to at least one labeled node adopts the mode of its
  * labeled neighbors' labels (most votes; smallest label breaks
  * ties), recording the vote count and the round it was labeled.
  * Converged when a round labels nothing new; unreachable nodes stay
  * unlabeled (absent from the result).
  *
  * Each round is one equi-join (edges ⋈ labels on the source
  * endpoint), one anti-join (drop already-labeled candidates), one
  * (node, label) count aggregate, and one per-node window over ≤
  * |distinct neighbor labels| rows — all shuffles keyed by node id,
  * so Catalyst picks sort-merge or broadcast per side size and AQE
  * splits skewed hub nodes. Rounds needed = eccentricity of the seed
  * set, typically 2–4 on similarity graphs. Per-round
  * `localCheckpoint` + [[Iterate.unpersistCheckpoint]] keeps two
  * label frames live regardless of round count (same posture as
  * [[ConnectedComponents]]/[[PageRank]]).
  *
  * Reference tie-in: no graph operator exists in the reference (its
  * grouping is the keyed latest-wins map, static/index.html:87-89);
  * north-star extension per SURVEY.md §2.B.
  *
  * @param edges two-column DataFrame, columns taken positionally as
  *              (src, dst); undirected — self-loops and reversed
  *              duplicates are tolerated.
  * @param seeds two-column DataFrame, columns taken positionally as
  *              (node, label). A node seeded twice keeps one
  *              arbitrary row — dedup upstream if it matters.
  * @return (node, lbl, votes, round): seeds at round 0 with 0 votes;
  *         propagated nodes carry their winning vote count and the
  *         1-based round that labeled them.
  */
object LabelPropagation {

  def propagate(edges: DataFrame, seeds: DataFrame, maxRounds: Int = 10): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val Array(srcName, dstName) = edges.columns.take(2)
    val Array(nodeName, labelName) = seeds.columns.take(2)

    // Symmetrize once so each round joins in a single direction. The
    // checkpoints pay for themselves only when a LATER round re-reads
    // the frame — a single-round call (the q147 catalog slice) skips
    // them and stays one straight-line plan (measured 3.1 s → ~1 s at
    // sf0.1).
    val multiRound = maxRounds > 1
    def cp(df: DataFrame): DataFrame = if (multiRound) df.localCheckpoint() else df
    // undirected(): the dedup exchange runs on the canonical
    // orientation BEFORE the 2× explode (half the distinct's shuffle
    // rows; round-17 respelling, row-set identical)
    val sym = cp(Symmetrize.undirected(edges
      .select(col(srcName).as("src"), col(dstName).as("dst"))))

    var labeled = cp(seeds
      .select(col(nodeName).as("node"), col(labelName).as("lbl"))
      .dropDuplicates("node")
      .withColumn("votes", lit(0L))
      .withColumn("round", lit(0)))

    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      round += 1
      // Votes are counted over ALL labeled neighbors (not just the
      // last frontier): a node first reached this round should still
      // weigh every labeled neighbor it has.
      val votes = sym
        .join(labeled.select($"node".as("vsrc"), $"lbl"), $"src" === $"vsrc")
        .select($"dst".as("cand"), $"lbl")
        .join(labeled.select($"node"), $"cand" === $"node", "left_anti")
        .groupBy($"cand", $"lbl")
        .agg(count(lit(1)).as("votes"))
      val w = Window.partitionBy($"cand").orderBy($"votes".desc, $"lbl")
      val newly = votes
        .withColumn("rk", row_number().over(w))
        .filter($"rk" === 1)
        .select($"cand".as("node"), $"lbl", $"votes", lit(round).as("round"))
      if (round == maxRounds) {
        // Final allowed round: the result is consumed exactly once
        // downstream, so no emptiness probe and no checkpoint — the
        // round stays a single straight-line plan.
        labeled = labeled.union(newly)
      } else {
        val fresh = newly.localCheckpoint()
        if (fresh.isEmpty) {
          Iterate.unpersistCheckpoint(fresh)
          done = true
        } else {
          val prev = labeled
          labeled = labeled.union(fresh).localCheckpoint()
          Iterate.unpersistCheckpoint(prev)
          Iterate.unpersistCheckpoint(fresh)
        }
      }
    }
    labeled
  }
}
