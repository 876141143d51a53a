package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, pmod, xxhash64}

/** Constant window-partition pin for INTENTIONALLY single-group
  * windows over bounded (grain-collapsed) frames — per-source shares,
  * per-day series, digit histograms, funnel-stage spines.
  *
  * An empty partition spec is semantically what these windows mean,
  * but it costs two things at audit time: WindowExec logs "No
  * Partition Defined … serious performance degradation" on every
  * execution (noise that buries REAL unpartitioned-window
  * regressions), and the plan is indistinguishable from a corpus-
  * grain single-task funnel. Partitioning by a constant keeps the
  * spec DEFINED — same single group, same results — at the cost of
  * one hash exchange of the already-tiny frame.
  *
  * The constant is spelled `pmod(xxhash64(c), 1)` (always 0) rather
  * than a literal because Spark folds literal partition keys and then
  * ELIMINATES them from the window spec (`EliminateWindowPartitions`,
  * and `n*0`-style arithmetic is simplified first on non-null input),
  * silently reverting the pin — verified on the optimized plans.
  *
  * Use ONLY over frames bounded by construction. A corpus-grain frame
  * needs a real partitioning, a TakeOrdered bound, or the PrefixScan/
  * GlobalRank machinery instead — pinning it would hide the funnel,
  * not fix it. graft.WindowScan lists every unpartitioned window in
  * the catalog for exactly this audit.
  */
object WindowPins {

  /** Constant-0 partition key derived from `c` (any non-foldable
    * column of the frame); survives the optimizer, costs one hash of
    * an already-computed value per row. */
  def gpin(c: Column): Column = pmod(xxhash64(c), lit(1))
}
