package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Equi-depth histogram in two spellings.
  *
  * `exactHistogram` is the oracle-able contract (q84): a global ntile
  * over a total order. Spark plans that as a single-partition
  * WindowExec — every row through one task — which is fine for
  * verification-sized inputs and is exactly what DuckDB computes, but
  * is a scale-killer at 100 TB.
  *
  * `approxHistogram` is the production spelling: cut points from ONE
  * mergeable `approx_percentile` sketch aggregation (map-side partials,
  * no global sort), broadcast back as literals, bucket assignment as a
  * pure map-side codegen'd expression, then one ordinary agg shuffle.
  * No stage sees more than its slice; the whole plan is two shuffles
  * of which the first carries only sketch partials. Bucket EDGES agree
  * with the exact form within the sketch's rank error (1/accuracy);
  * bucket membership of rows tied at an edge may differ, which is the
  * documented exactness trade.
  */
object EquiDepth {

  /** Exact equi-depth buckets via global ntile (the q84 oracle form).
    * `tiebreak` must make the order total or bucket membership at ties
    * is nondeterministic.
    */
  def exactHistogram(df: DataFrame, value: Column, tiebreak: Column,
                     buckets: Int): DataFrame = {
    val w = Window.orderBy(value, tiebreak)
    df.select(value.as("v"), ntile(buckets).over(w).cast("long").as("bucket"))
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
    val cuts = df
      .agg(percentile_approx(value, array(probs: _*), lit(accuracy)).as("cuts"))
      .head().getSeq[Double](0)
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
