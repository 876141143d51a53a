package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted quantiles per group in two spellings, following
  * [[EquiDepth]]'s exact/approx dual pattern.
  *
  * `exact` is the oracle-able contract (q160): the smallest value whose
  * cumulative weight reaches q·total within its group. The naive plan
  * runs the cumulative window straight over the fact table — with few
  * groups (q160's `l_returnflag` has 3) that funnels a third of the
  * table through ONE window task. This spelling collapses to
  * (group, value) grain FIRST — a plain hash aggregate with map-side
  * partials over well-distributed (group, value) shuffle keys — and
  * only then runs the cumulative window, whose partition is now
  * |distinct values per group| rows, not |rows per group|. The
  * equivalence is exact, not approximate: within a value v the per-row
  * cumulative crosses q·total iff the grain cumulative at v does
  * (weights are summed over the same prefix of the value order), and
  * both forms return the minimum qualifying value.
  *
  * `approx` is the production spelling for when even the grain is too
  * wide to window (near-continuous values at 100 TB): a weight-CDF
  * over sketched cut points. One `percentile_approx` aggregation
  * (mergeable sketch, map-side partials) picks ~`cuts` candidate cut
  * points per group; each row is assigned a bucket by comparing
  * against its group's broadcast cut array (codegen'd, no sort); the
  * per-(group, bucket) weights aggregate with map-side combine; and
  * the crossing bucket's smallest present value is returned. No stage
  * ever sorts or windows more than |groups|·`cuts` rows. The returned
  * value's true weighted-CDF position differs from q by at most the
  * crossing bucket's weight share — with `cuts` buckets of roughly
  * balanced row count and weights that are not pathologically
  * concentrated, that is O(1/cuts) plus the sketch's 1/accuracy rank
  * error (spec-asserted bound in WeightedQuantileSpec).
  */
object WeightedQuantile {

  /** Exact weighted quantile: min v with cumWeight(≤v) ≥ q·totalWeight,
    * per group. Output: groupCols :+ `wq`. The cumulative runs through
    * [[PrefixScan]]'s two-level decomposition: with few groups (q160
    * has 3 flags) even the grain-collapsed window holds |distinct
    * values per group| rows in ONE task per group — near-continuous
    * values at scale make that the same single-task funnel the grain
    * collapse removed from the fact table. Group totals come from a
    * hash-agg + broadcast join, not a whole-partition window. `value`
    * must be numeric (PrefixScan's quantile boundaries). */
  def exact(df: DataFrame, groupCols: Seq[String], value: Column,
            weight: Column, q: Double = 0.5,
            partitions: Int = 32): DataFrame = {
    require(q > 0 && q <= 1, s"q must be in (0, 1], got $q")
    val g = groupCols.map(col)
    // percentile semantics: rows with a null value or weight carry no
    // quantile information and are EXCLUDED (as Spark/DuckDB
    // percentile functions do) — left in, a null-value group would
    // order first and silently inflate every cumulative
    val clean = df.filter(value.isNotNull && weight.isNotNull)
    // Pinned ONCE and shared by the totals branch and PrefixScan
    // (inputPinned): `totals` broadcasts, and a BroadcastExchange
    // never reuses the other side's shuffle subplan (the q141 class),
    // so the un-pinned spelling re-ran the full fact scan + grain
    // aggregate just to build the ≤|groups|-row total table —
    // measured as a second FileScan+Exchange chain in q160's final
    // adaptive plan.
    val grain = Checkpoints.track(
      clean.groupBy((g :+ value.as("v")): _*).agg(sum(weight).as("w"))
        .localCheckpoint(eager = false))
    // null-SAFE totals match (`<=>`, mirroring Ntile.closed): groupBy
    // keeps a null-keyed group and PrefixScan scans it, so a plain
    // using-join here would silently drop those groups from the output
    val totals = grain.groupBy(g: _*).agg(sum(col("w")).as("totw"))
      .select(groupCols.map(k => col(k).as(s"__wq_k_$k")) :+ col("totw"): _*)
    val scanned = PrefixScan.scan(grain, groupCols, "v", "w", "cumw", "sum",
      partitions, inputPinned = true)
    val joined =
      if (groupCols.isEmpty) scanned.crossJoin(broadcast(totals))
      else scanned.join(broadcast(totals),
        groupCols.map(k => col(k) <=> col(s"__wq_k_$k")).reduce(_ && _))
    joined
      .filter(col("cumw") >= col("totw") * lit(q))
      .groupBy(g: _*)
      .agg(min(col("v")).as("wq"))
  }

  /** Approximate weighted quantile via a sketched weight-CDF. Output:
    * groupCols :+ `wq`. The result is always a real data value; its
    * weighted-CDF position is within the crossing bucket's weight
    * share of q. `cuts` bounds the CDF resolution, `accuracy` is
    * `percentile_approx`'s rank-error knob (error ≤ 1/accuracy). */
  def approx(df: DataFrame, groupCols: Seq[String], value: Column,
             weight: Column, q: Double = 0.5, cuts: Int = 1024,
             accuracy: Int = 10000): DataFrame = {
    require(q > 0 && q <= 1, s"q must be in (0, 1], got $q")
    require(cuts >= 2, s"need >= 2 cuts, got $cuts")
    val g = groupCols.map(col)
    val probs = (1 until cuts).map(i => lit(i.toDouble / cuts))
    // One sketch pass: ~cuts candidate cut points per group. |groups|
    // rows — broadcast back to the fact side.
    // same null exclusion as [[exact]] — percentile_approx already
    // ignores null values in the sketch, so leaving null rows in the
    // bucket assignment (where they land in bucket 0) would count
    // weight the cut points never saw
    val clean = df.filter(value.isNotNull && weight.isNotNull)
    val cutPoints = clean.groupBy(g: _*)
      .agg(percentile_approx(value, array(probs: _*), lit(accuracy)).as("cuts"))
    // bucket = |{cut : v > cut}|; strict > puts a value tied with a
    // cut in the lower bucket, mirroring EquiDepth.approxHistogram.
    val bucketed = clean
      .join(broadcast(cutPoints), groupCols)
      .select((g :+ value.as("v") :+ weight.as("wt") :+
        size(filter(col("cuts"), c => value > c)).as("bucket")): _*)
    val grain = bucketed.groupBy((g :+ col("bucket")): _*)
      .agg(sum(col("wt")).as("w"), min(col("v")).as("v_lo"))
    // The cumulative window now runs over ≤ |groups|·cuts rows. Bucket
    // value ranges are disjoint and ordered, so min(v_lo) over the
    // qualifying suffix is the crossing bucket's smallest value.
    val win = Window.partitionBy(g: _*).orderBy(col("bucket"))
    grain
      .withColumn("cumw", sum(col("w"))
        .over(win.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("totw", sum(col("w")).over(Window.partitionBy(g: _*)))
      .filter(col("cumw") >= col("totw") * lit(q))
      .groupBy(g: _*)
      .agg(min(col("v_lo")).as("wq"))
  }
}
