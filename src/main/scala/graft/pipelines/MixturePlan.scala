package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-mixture rebalancing: given a curated corpus and target source
  * shares, compute each source's sampling plan for a fixed token
  * budget, and apply it deterministically.
  *
  * The plan is pure aggregate math (one source-grain hash-agg; the
  * share window runs over the ≤|sources| aggregated frame — the
  * aggregate-then-window discipline). Application is a row-local
  * hash-uniform keep decision (q76's md5-derived u ∈ (0,1], NO
  * rand()), so the sampled corpus is reproducible across runs,
  * engines, and partitionings, and composes with the funnel's
  * deterministic splits.
  *
  * `rate` is capped at 1.0 — a single-epoch plan undersamples
  * overrepresented sources; `epochs_r` (target/actual tokens) > 1
  * reports where oversampling/repetition would be needed instead, the
  * signal a mixture designer actually acts on.
  */
object MixturePlan {

  /** Per-source plan for a `budgetFraction` of total corpus tokens,
    * targeting UNIFORM shares across observed sources (the common
    * rebalance-away-from-crawl-skew case).
    *
    * Output: (source, n_docs, n_toks, share_r, target_share_r,
    * planned_toks, rate_r, epochs_r), one row per source.
    */
  def uniform(docs: DataFrame, tokCol: Column,
              budgetFraction: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val perSource = docs.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum(tokCol).as("n_toks"))
    // bounded-grain window: |sources| rows; gpin keeps the spec
    // defined (no single-partition warning, audit-distinguishable
    // from a corpus-grain window)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(graft.functions.WindowPins.gpin($"source"))
      .orderBy($"source")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    perSource
      .withColumn("total_toks", sum($"n_toks").over(w))
      .withColumn("n_sources", count(lit(1)).over(w))
      .withColumn("target_toks",
        floor(lit(budgetFraction) * $"total_toks" / $"n_sources").cast("long"))
      .select($"source", $"n_docs", $"n_toks",
        round($"n_toks".cast("double") / $"total_toks", 4).as("share_r"),
        round(lit(1.0) / $"n_sources", 4).as("target_share_r"),
        least($"target_toks", $"n_toks").as("planned_toks"),
        round(least($"target_toks".cast("double") / $"n_toks", lit(1.0)), 4)
          .as("rate_r"),
        round($"target_toks".cast("double") / $"n_toks", 4).as("epochs_r"))
  }

  /** Deterministically apply per-source keep rates: a doc survives iff
    * its md5-derived uniform is below its source's rate. `rates` must
    * be (source, rate); unmatched sources keep nothing.
    */
  def apply(docs: DataFrame, idCol: Column, rates: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val u = (conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10)
      .cast("long") + 1L) / lit(4294967296.0)
    docs.join(broadcast(rates), Seq("source"))
      .filter(u <= col("rate"))
      .drop("rate")
  }
}
