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
  *      rows per key group, collected and folded back into the plan
  *      as a literal map lookup keyed by (keys, pid).
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
  * (`orderCol`, `tieCols`) is DISTINCT within each key group — the
  * tie-break is sound because the pid is a pure function of the
  * `orderCol` VALUE, so tied rows always share a partition and the
  * local window's (orderCol, tieCols) sort totally orders them; only
  * partition BALANCE degrades with ties (the heaviest single value
  * bounds the widest pid). With no `tieCols`, `orderCol` itself must
  * be distinct (with ties the tie-order of any windowed spelling is
  * undefined anyway).
  */
object PrefixScan {

  /** Adds `out` = running aggregate of `valueCol` over
    * (`orderCol`, `tieCols`) within `keys`. `op` is "sum" (inclusive
    * frame) or "max" (exclusive frame — the dominance/prefix-max
    * shape, null for the first row). `partitions` ≤ 1 degenerates to
    * the single-window spelling.
    */
  // 4096 entries, not more: the carry map is a LITERAL expression
  // serialized into every task of the final plan, and each entry is
  // two literal children — far above this, the expression tree
  // approaches the 64KB codegen method limit and whole-stage codegen
  // falls back to interpreted element_at per row, which defeats the
  // decomposition. Real callers sit orders of magnitude below
  // (|key groups| × P ≈ tens to hundreds).
  private val maxCarry = 1 << 12

  /** @param inputPinned the caller has ALREADY localCheckpoint'd (and
    *   [[Checkpoints]]-tracked) `df`, typically because another branch
    *   of its plan (a broadcast group-total) reads the same frame —
    *   skip the internal checkpoint and its early release so both
    *   branches share ONE materialization instead of the broadcast
    *   side silently re-running the input lineage (the q141
    *   duplicated-subplan class: a BroadcastExchange never reuses the
    *   other side's shuffle subplan). */
  def scan(df: DataFrame, keys: Seq[String], orderCol: String,
           valueCol: String, out: String, op: String,
           partitions: Int, tieCols: Seq[String] = Nil,
           inputPinned: Boolean = false): DataFrame = {
    require(op == "sum" || op == "max", s"op must be sum|max, got $op")
    val p = math.max(1, partitions)
    def aggc(c: Column): Column = if (op == "sum") sum(c) else max(c)
    val keyCols = keys.map(col)
    val orderCols = col(orderCol) +: tieCols.map(col)
    def frame(w: org.apache.spark.sql.expressions.WindowSpec) =
      if (op == "sum") w.rowsBetween(Window.unboundedPreceding, 0)
      else w.rowsBetween(Window.unboundedPreceding, -1)

    if (p <= 1) {
      val w = frame(Window.partitionBy(keyCols: _*).orderBy(orderCols: _*))
      return df.withColumn(out, aggc(col(valueCol)).over(w))
    }
    // The upstream is materialized exactly once (lazy checkpoint whose
    // first action is the quantile collect), the pid stamp is a lazy
    // checkpoint over those cached blocks, and the carry table — the
    // ≤ |key groups| × P-row frame the decomposition exists to
    // produce — is computed in ITS OWN action, collected, and folded
    // into the final plan as a LITERAL MAP LOOKUP expression, not a
    // join. Every join spelling of the carry was unsound in practice:
    // keeping it in-plan self-joins the checkpoint's LogicalRDD, and
    // Spark's relation dedup of the duplicated reference
    // intermittently mis-bound expressions across the branches
    // (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND, ~1-3 in 10 concurrent
    // runs); re-aliasing, eager checkpoints, and even joining a
    // freshly collected LocalRelation all still reproduced it. A
    // scalar `element_at(map-literal, key)` leaves NOTHING to dedup —
    // the final plan references `parts` once and joins nothing. The
    // composite key string is built by the SAME Spark expression on
    // both sides (collect side and probe side), so value-to-string
    // canonicalization can never disagree; the limit guard fails
    // loudly rather than building a degenerate map if a caller breaks
    // the low-cardinality-keys contract.
    val ckpt = if (inputPinned) df else df.localCheckpoint(eager = false)
    val qs = (1 until p).map(_.toDouble / p).toArray
    val bounds = ckpt.stat.approxQuantile(orderCol, qs, 0.001).distinct.sorted
    // Cheap budget pre-check on the input the quantile collect just
    // cached: carry rows number at least |key groups| (every group
    // occupies ≥1 pid), so a caller whose key cardinality ALONE
    // exceeds the literal-map budget fails HERE — one HLL pass over
    // the cached blocks — before the pid stamp materializes a second
    // input-scale checkpoint and the carry agg + window run at fact
    // scale. The 1.25 slack absorbs HLL overestimation (default 5%
    // rsd) so a legitimately-under-budget caller can never false-trip
    // on estimator noise; the exact post-collect require below stays
    // the authoritative guard for the |groups| ≤ budget < |groups|·P
    // band the estimate cannot decide.
    //
    // GATED on the optimizer's static size estimate of the input: the
    // pre-check exists to avoid doing FACT-SCALE work before failing,
    // so when the input itself is small (< 128 MB estimated) the
    // "fact-scale work" it would save is cheaper than the extra HLL
    // stage — the common tiny-cardinality callers skip straight to the
    // exact post-collect guard. Unknown estimates (Catalyst defaults
    // them to huge) keep the pre-check, which is the safe direction.
    // inputPinned: the caller's frame is a LogicalRDD whose stats
    // default to huge, which would force the HLL stage on every tiny
    // pinned grain; the input is also already materialized by the
    // quantile collect, so the fact-scale work the pre-check exists to
    // save is mostly spent by the time it could fire. The exact
    // post-collect guard below stays authoritative for pinned callers.
    val inputBytesEst = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (!inputPinned && keys.nonEmpty && inputBytesEst > (128L << 20)) {
      val estGroups = ckpt
        .select(approx_count_distinct(struct(keys.map(col): _*)).as("g"))
        .head.getLong(0)
      if (estGroups > maxCarry * 1.25) {
        Iterate.unpersistCheckpoint(ckpt) // fail clean: drop the cached input
        throw new IllegalArgumentException(
          s"PrefixScan pre-check: ~$estGroups key groups estimated, already " +
            s"above the literal-map budget ($maxCarry entries) before any " +
            "pid partitioning — keys are not low-cardinality; use " +
            "partitions <= 1 or re-key")
      }
    }
    val pidCol =
      if (bounds.isEmpty) lit(0)
      else size(filter(array(bounds.map(lit(_)): _*),
        b => b < col(orderCol).cast("double")))
    // tracked: the returned plan reads this checkpoint, so release is
    // only safe at a caller quiesce point — Checkpoints.releaseAll().
    // inputPinned: NO second checkpoint — the pid is a pure function
    // of the orderCol VALUE (the bounds are a collected literal) over
    // the caller's already-stable LogicalRDD, so the carry collect and
    // the returned plan cannot disagree however many times the stamp
    // re-evaluates; a second input-scale materialization would only
    // double the caller's pinned retention for the life of the query
    // (round-17 fix of the Ntile/CumeDist/WeightedQuantile double pin).
    val parts =
      if (inputPinned) ckpt.withColumn("__ps_pid", pidCol)
      else Checkpoints.track(ckpt.withColumn("__ps_pid", pidCol)
        .localCheckpoint(eager = false))
    val wLocal = frame(Window
      .partitionBy(keyCols :+ col("__ps_pid"): _*).orderBy(orderCols: _*))
    // Pin the fact-scale window exchange to the session's
    // shuffle.partitions width — but ONLY when AQE's pre-coalesce
    // width is actually raised above it (the Graft builder's
    // anti-spill cluster policy / SPARK_GRAFT_INIT_PARTITIONS), which
    // was measured to regress this shape ~5× on a single local disk
    // by multiplying reduce-side seeks. An explicit
    // repartition(n, cols) hash-partitions on exactly the window's
    // partition keys (so EnsureRequirements inserts NO second
    // exchange) and a user-given numPartitions is exempt from AQE
    // re-sizing, so the pin holds under any policy value. When the
    // pre-coalesce width is NOT raised there is nothing to pin
    // against, and pinning would only cost: it blocks AQE's normal
    // DOWNWARD coalescing of this exchange, measured ~1.3× on the
    // small-grain sf0.1 PrefixScan queries (q70/q157) whose carry
    // inputs coalesce to a handful of partitions. The scan's sizing
    // is its own either way: ~|rows|/P per (keys, pid) slice by
    // construction, already memory-bounded.
    val pinnedWidth = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    val initWidth = df.sparkSession.conf
      .get("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
           pinnedWidth.toString).toInt
    val pinned =
      if (initWidth > pinnedWidth)
        parts.repartition(pinnedWidth, keyCols :+ col("__ps_pid"): _*)
      else parts
    val local = pinned
      .withColumn("__ps_local", aggc(col(valueCol)).over(wLocal))
    // composite (keys, pid) lookup key, length-prefix coded so it is
    // uniquely decodable for ANY key content: each component is "N"
    // for null or "<charlen>:<value>" otherwise. A value component
    // always starts with a digit, so "N" cannot collide with one, and
    // the length prefix means no character IN a value can either —
    // the earlier control-separator spelling merged distinct
    // multi-key groups whenever a value contained the separator, and
    // collided a NULL key with the literal sentinel string.
    val keyStr = concat(
      (keyCols :+ col("__ps_pid")).map { k =>
        val s = k.cast("string")
        when(s.isNull, lit("N")).otherwise(concat(length(s), lit(":"), s))
      }: _*)
    // exclusive prefix of the per-partition totals: the only globally
    // ordered frame, and it never touches the big plan — it runs in
    // the collect action over parts' cached blocks
    val wCarry = Window.partitionBy(keyCols: _*).orderBy(col("__ps_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryQ = parts.groupBy(keyCols :+ col("__ps_pid"): _*)
      .agg(aggc(col(valueCol)).as("__ps_ptot"))
      .withColumn("__ps_carry", aggc(col("__ps_ptot")).over(wCarry))
      .select(keyStr.as("__ps_k"), col("__ps_carry"))
    val carryRows = carryQ.limit(maxCarry + 1).collect()
    // a caller-pinned input is released at the caller's quiesce point
    // (Checkpoints.releaseAll) — other branches still read it
    if (!inputPinned) Iterate.unpersistCheckpoint(ckpt)
    require(carryRows.length <= maxCarry,
      s"PrefixScan carry frame exceeds the literal-map budget ($maxCarry " +
        "entries): keys are not low-cardinality — use partitions <= 1 or re-key")
    val carryType = carryQ.schema(1).dataType
    val entries = carryRows.filter(!_.isNullAt(1))
    // first pid of each key group has a null exclusive prefix — absent
    // from the map, and try_element_at's null on a missing key
    // restores it (plain element_at THROWS on missing map keys under
    // this engine's ANSI mode)
    val carryLookup =
      if (entries.isEmpty) lit(null).cast(carryType)
      else try_element_at(
        map(entries.toSeq.flatMap(r => Seq(lit(r.getString(0)), lit(r.get(1)))): _*),
        keyStr)
    // null semantics must match the window form exactly: window sum
    // SKIPS nulls and is null only when the frame holds no non-null
    // value. local is null iff the current partition's frame is
    // all-null; the carry is null iff every preceding partition's
    // total is null (the map omits null carries). So a bare
    // `local + coalesce(carry, 0)` would wrongly null out rows whose
    // own partition prefix is all-null but whose carry is real —
    // both-null is the only case that stays null. greatest() already
    // has exactly this skip-nulls contract for max.
    val combined =
      if (op == "sum")
        when(col("__ps_local").isNull && carryLookup.isNull, lit(null))
          .otherwise(coalesce(col("__ps_local"), lit(0L)) +
            coalesce(carryLookup, lit(0L)))
      else greatest(col("__ps_local"), carryLookup)
    local.withColumn(out, combined)
      .drop("__ps_pid", "__ps_local")
  }
}
