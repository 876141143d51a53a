package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto frontier (skyline) on (minimize `cost`, maximize `gain`):
  * the rows for which no other row is both at-most-as-costly and
  * at-least-as-gainful with one strict inequality — q105's contract,
  * the quality-vs-cost data-selection shape.
  *
  * A row is dominated iff a strictly cheaper row reaches a gain ≥
  * its own (the running prefix max over the cost order), or a
  * same-cost row strictly beats its gain. The dominance test therefore
  * needs exactly one aggregate per distinct cost (its gain max) and
  * one prefix max over the cost order — never the O(n²) NOT-EXISTS
  * join the oracle runs.
  *
  * The naive spelling of the prefix max is one globally-ordered window
  * over the cost grain — a single-partition WindowExec: fine at
  * verification scale, a scale-killer once |distinct costs| is large
  * (near-continuous costs at 100 TB). This operator implements the
  * docs/SCALE.md plan instead, the classic two-level scan
  * decomposition:
  *
  *   1. collapse to cost grain (hash agg, map-side partials);
  *   2. derive a partition id from quantile boundaries of the cost —
  *      a pure function of the value ([[PrefixScan]]);
  *   3. LOCAL prefix max inside each partition — P parallel window
  *      tasks of |grain|/P rows each, keyed by that pid;
  *   4. prefix-max MERGE of the P partition maxima — the only global
  *      ordered pass in the plan, over exactly P rows;
  *   5. prefix(row) = max(local prefix, carry-in of all earlier
  *      partitions), then broadcast the annotated grain back to the
  *      fact rows.
  *
  * No stage orders more than |grain|/P rows; equality with the
  * single-window form is spec-asserted (SkylineSpec), and the
  * value-derived pid keeps equal costs in one partition so the
  * strictness of "strictly cheaper" survives the decomposition.
  * `cost` must be numeric in the p > 1 path (quantile boundaries).
  */
object Skyline {

  /** Rows of `df` on the (min `cost`, max `gain`) frontier, original
    * columns untouched. Rows with a NULL cost or gain are EXCLUDED —
    * dominance is undefined against an unknown coordinate, so they
    * can neither win nor defend a frontier slot; callers that want
    * them back union them explicitly. (The exclusion is an explicit
    * filter here, not a silent side effect of the annotate-back
    * equi-join.) `rangePartitions` is P above — the grain
    * parallelism; P ≤ 1 degenerates to the single-window spelling.
    * `broadcastBack = false` swaps the annotate-back join to a shuffle
    * join for grains past the broadcast budget (near-continuous costs
    * at full scale). */
  def frontier(df: DataFrame, cost: Column, gain: Column,
               rangePartitions: Int = 32,
               broadcastBack: Boolean = true): DataFrame = {
    val p = math.max(1, rangePartitions)
    val defined = df.filter(cost.isNotNull && gain.isNotNull)
    val grain = defined.groupBy(cost.as("sk_c")).agg(max(gain).as("sk_gmax"))

    val annotated =
      if (p == 1) {
        val w = Window.orderBy(col("sk_c"))
          .rowsBetween(Window.unboundedPreceding, -1)
        grain.withColumn("sk_prev", max(col("sk_gmax")).over(w))
      } else {
        // 3-5 via PrefixScan: quantile-derived pids (a pure function
        // of sk_c), local prefix max per pid, P-row carry merge. The
        // earlier spelling derived pids from spark_partition_id()
        // after repartitionByRange, whose SAMPLED bounds are only
        // consistent between the local and carry branches while the
        // planner reuses the exchange — a silent correctness
        // dependence on spark.sql.exchange.reuse that a value-derived
        // pid cannot have.
        PrefixScan.scan(grain, keys = Nil, orderCol = "sk_c",
          valueCol = "sk_gmax", out = "sk_prev", op = "max", partitions = p)
      }

    val ann = annotated.select(col("sk_c"), col("sk_gmax"), col("sk_prev"))
    defined.join(if (broadcastBack) broadcast(ann) else ann, cost === col("sk_c"))
      .filter(!(coalesce(col("sk_prev") >= gain, lit(false)) ||
                col("sk_gmax") > gain))
      .drop("sk_c", "sk_gmax", "sk_prev")
  }
}
