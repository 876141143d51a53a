package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout.
  *
  * Sorting a table by `zValue(x, y)` clusters rows so that BOTH
  * dimensions are locally contiguous: each written file's [min, max]
  * ranges on x AND y are tight, so a selective predicate on either
  * dimension (or a 2-D box) prunes most files from their parquet/
  * manifest min-max stats. A linear sort on x alone gives tight x
  * ranges but each file spans the full y domain — y predicates prune
  * nothing. This is the layout story behind every "Z-ORDER BY"
  * clustering command; here it is a plain deterministic expression
  * (bit interleave via shift/or folds, ANSI-safe) feeding a plain
  * `orderBy` + file sink, measured by [[graft.streaming.ManifestState]]-
  * style min/max pruning in the spec.
  *
  * Inputs are rank-normalized to [0, 2^bits) by the caller (use
  * `ntile` or a linear rescale); `zValue` interleaves the low `bits`
  * of each coordinate, x in the even positions, y in the odd.
  */
object ZOrder {

  /** Morton code of two non-negative ints using `bits` bits each
    * (result has 2·bits significant bits; bits ≤ 31). */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, "bits must be in (0, 31]")
    val xb = x.cast("long")
    val yb = y.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      val xbit = shiftleft(shiftrightunsigned(xb, i).bitwiseAND(lit(1L)), 2 * i)
      val ybit = shiftleft(shiftrightunsigned(yb, i).bitwiseAND(lit(1L)), 2 * i + 1)
      acc.bitwiseOR(xbit).bitwiseOR(ybit)
    }
  }
}
