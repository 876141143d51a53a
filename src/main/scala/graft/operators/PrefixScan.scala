package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic two-level prefix scan (running sum / running max)
  * over an order column — the scale-safe decomposition of the
  * single-partition ordered window:
  *
  *   1. pid = how many quantile boundaries sit strictly below the
  *      row's order value — a PURE FUNCTION of the value, from one
  *      tiny `approxQuantile` driver action;
  *   2. local scan inside each (keys, pid) partition — parallel
  *      windows of ~|rows|/P each;
  *   3. carry-in per partition: an exclusive prefix aggregate of the
  *      per-partition totals — the only globally ordered frame, ≤ P
  *      rows per key group, broadcast back.
  *
  * Why not `repartitionByRange + spark_partition_id()`: the range
  * partitioner SAMPLES its bounds with an RDD-id-seeded PRNG, so two
  * physical executions of the same subtree can disagree on pids —
  * the local and carry branches both read that frame, and their
  * agreement then silently depends on the planner reusing the
  * exchange (`spark.sql.exchange.reuse`). A value-derived pid cannot
  * disagree with itself, however many times the subtree executes.
  *
  * Requirements: `orderCol` is numeric (quantile boundaries) and
  * DISTINCT within each key group (both callers order on a grain /
  * unique id; with ties the tie-order of any windowed spelling is
  * undefined anyway).
  */
object PrefixScan {

  /** Adds `out` = running aggregate of `valueCol` over `orderCol`
    * within `keys`. `op` is "sum" (inclusive frame) or "max"
    * (exclusive frame — the dominance/prefix-max shape, null for the
    * first row). `partitions` ≤ 1 degenerates to the single-window
    * spelling.
    */
  def scan(df: DataFrame, keys: Seq[String], orderCol: String,
           valueCol: String, out: String, op: String,
           partitions: Int): DataFrame = {
    require(op == "sum" || op == "max", s"op must be sum|max, got $op")
    val p = math.max(1, partitions)
    def aggc(c: Column): Column = if (op == "sum") sum(c) else max(c)
    val keyCols = keys.map(col)
    def frame(w: org.apache.spark.sql.expressions.WindowSpec) =
      if (op == "sum") w.rowsBetween(Window.unboundedPreceding, 0)
      else w.rowsBetween(Window.unboundedPreceding, -1)

    if (p <= 1) {
      val w = frame(Window.partitionBy(keyCols: _*).orderBy(col(orderCol)))
      return df.withColumn(out, aggc(col(valueCol)).over(w))
    }
    // The boundary action executes the caller's lineage once (the
    // approxQuantile collect); the pid-stamped frame below is then
    // lazily checkpointed, so the local and carry branches compute the
    // upstream once more between them — two total executions of the
    // caller's lineage. Correctness never depends on the recomputes:
    // `bounds` is collected exactly once, and pid is a pure function
    // of (bounds, order value).
    val qs = (1 until p).map(_.toDouble / p).toArray
    val bounds = df.stat.approxQuantile(orderCol, qs, 0.001).distinct.sorted
    val pidCol =
      if (bounds.isEmpty) lit(0)
      else size(filter(array(bounds.map(lit(_)): _*),
        b => b < col(orderCol).cast("double")))
    // Lazily checkpointed: the local and carry branches both consume
    // this frame, and their twin hashpartitioning(keys, pid) exchanges
    // over one shared lineage intermittently tripped AQE's stage
    // bookkeeping (task-level INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND under
    // concurrent query execution, ~1 in 3 runs). The checkpoint severs
    // the shared lineage into one materialized frame — also computing
    // the upstream exactly once for both branches.
    val parts = df.withColumn("__ps_pid", pidCol)
      .localCheckpoint(eager = false)
    val wLocal = frame(Window
      .partitionBy(keyCols :+ col("__ps_pid"): _*).orderBy(col(orderCol)))
    val local = parts.withColumn("__ps_local", aggc(col(valueCol)).over(wLocal))
    // exclusive prefix of the per-partition totals: ≤ P rows per key
    // group — the only globally ordered frame in the plan. The carry
    // side's output is RE-ALIASED to fresh names before the join:
    // local and carry share the `parts` lineage, and a USING-join
    // between identical attribute ids tripped Spark's self-join
    // attribute dedup intermittently (INTERNAL_ERROR_ATTRIBUTE_NOT_
    // FOUND under concurrent query execution); fresh aliases make the
    // two sides attribute-disjoint.
    val wCarry = Window.partitionBy(keyCols: _*).orderBy(col("__ps_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = parts.groupBy(keyCols :+ col("__ps_pid"): _*)
      .agg(aggc(col(valueCol)).as("__ps_ptot"))
      .withColumn("__ps_carry", aggc(col("__ps_ptot")).over(wCarry))
      .select(keys.map(k => col(k).as(s"__ps_k_$k")) :+
        col("__ps_pid").as("__ps_pid_c") :+ col("__ps_carry"): _*)
    val joinCond = keys.map(k => col(k) === col(s"__ps_k_$k"))
      .foldLeft(col("__ps_pid") === col("__ps_pid_c"))(_ && _)
    val combined =
      if (op == "sum") col("__ps_local") + coalesce(col("__ps_carry"), lit(0L))
      else greatest(col("__ps_local"), col("__ps_carry"))
    local.join(broadcast(carry), joinCond)
      .withColumn(out, combined)
      .drop(Seq("__ps_pid", "__ps_pid_c", "__ps_local", "__ps_carry") ++
        keys.map(k => s"__ps_k_$k"): _*)
  }
}
