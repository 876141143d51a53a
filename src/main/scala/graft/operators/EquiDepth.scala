package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Equi-depth histogram in two spellings.
  *
  * `exactHistogram` is the oracle-able contract (q84): exact global
  * ntile buckets over a total order. Round 8 re-derives it through
  * [[Ntile.closed]] — a [[PrefixScan]] rank (parallel local windows +
  * bounded carry) and the bucket rule in closed form — so the EXACT
  * form no longer plans the single-partition WindowExec a bare
  * `ntile().over(orderBy(...))` does; output is identical (DuckDB's
  * ntile included), only the plan changed.
  *
  * `approxHistogram` remains the cheapest production spelling when
  * sketch-edge exactness suffices: cut points from ONE mergeable
  * `approx_percentile` sketch aggregation (map-side partials, no rank
  * pass at all), broadcast back as literals, bucket assignment as a
  * pure map-side codegen'd expression, then one ordinary agg shuffle.
  * Bucket EDGES agree with the exact form within the sketch's rank
  * error (1/accuracy); bucket membership of rows tied at an edge may
  * differ, which is the documented exactness trade.
  */
object EquiDepth {

  /** Exact equi-depth buckets via the closed-form ntile (the q84
    * oracle form). `tiebreak` must make the order total or bucket
    * membership at ties is nondeterministic; `value` must be numeric
    * ([[PrefixScan]]'s quantile boundaries).
    */
  def exactHistogram(df: DataFrame, value: Column, tiebreak: Column,
                     buckets: Int, partitions: Int = 32): DataFrame = {
    val base = df.select(value.as("v"), tiebreak.as("__ed_t"))
    Ntile.closed(base, Nil, "v", Seq("__ed_t"), buckets, "bucket", partitions)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
           min(col("v")).as("lo"),
           max(col("v")).as("hi"),
           avg(col("v")).as("avg_v"))
      .orderBy(col("bucket"))
  }

  /** Approximate equi-depth buckets: sketch cut points + broadcast
    * assignment. `accuracy` is `approx_percentile`'s knob — rank error
    * ≤ 1/accuracy of the row count.
    */
  def approxHistogram(df: DataFrame, value: Column, buckets: Int,
                      accuracy: Int = 10000): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    val probs = (1 until buckets).map(i => lit(i.toDouble / buckets))
    val cutsRow = df
      .agg(percentile_approx(value, array(probs: _*), lit(accuracy)).as("cuts"))
      .head()
    // empty/all-null input: the sketch has no cut points (NULL array);
    // fall through with zero cuts so the result is an empty histogram,
    // not an NPE (DegenerateInputsSpec posture, operator-level)
    val cuts =
      if (cutsRow.isNullAt(0)) Seq.empty[Double] else cutsRow.getSeq[Double](0)
    // bucket = 1 + |{cut : v > cut}| — a chain of codegen'd
    // conditionals over the (buckets-1) broadcast literals, no join.
    val bucket = cuts.foldLeft(lit(1L)) { (acc, c) =>
      acc + when(value > lit(c), 1L).otherwise(0L)
    }
    df.select(value.as("v"), bucket.as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
           min(col("v")).as("lo"),
           max(col("v")).as("hi"),
           avg(col("v")).as("avg_v"))
      .orderBy(col("bucket"))
  }
}
