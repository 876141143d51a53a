package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnInterop

/** Bloom-filter semi-join pre-filter for selective joins.
  *
  * The 100 TB problem: a fact ⋈ dim join where the dim side is
  * selective (a filtered dimension, a sampled key set) still shuffles
  * the ENTIRE fact side before the join discards most of it. Catalyst
  * injects this rewrite itself for some plans
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), but only when
  * stats let it see the selectivity; this operator is the explicit
  * form for when the engine knows it.
  *
  * Shape: aggregate the dim keys into one Bloom filter (a distributed
  * partial+final aggregation producing a single binary sketch), attach
  * it to every fact partition as a broadcast one-row frame — the
  * DataFrame spelling of a scalar subquery — and filter the fact side
  * with `might_contain` BEFORE the join's shuffle. False positives
  * pass the pre-filter and are removed by the exact join that follows,
  * so the rewrite never changes results; the win is shuffle volume
  * ~selectivity + fpp of the fact table. Uses Spark's own
  * `BloomFilterAggregate`/`BloomFilterMightContain` expressions (the
  * ones its runtime-filter rule injects) via the ColumnInterop shim.
  */
object BloomPrefilter {

  /** m = -n ln(p) / (ln 2)^2, the standard optimal bit count. */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
  }

  private def bloomAgg(keyHash: Column, expectedItems: Long, numBits: Long): Column =
    ColumnInterop.column(new BloomFilterAggregate(
      ColumnInterop.expression(keyHash),
      ColumnInterop.expression(lit(expectedItems)),
      ColumnInterop.expression(lit(numBits))).toAggregateExpression())

  private def mightContain(bloom: Column, keyHash: Column): Column =
    ColumnInterop.column(BloomFilterMightContain(
      ColumnInterop.expression(bloom), ColumnInterop.expression(keyHash)))

  /** `fact` reduced to rows whose `factKey` is *probably* in
    * `dim.dimKey` (no false negatives; ~`fpp` false positives). An
    * empty dim yields a NULL sketch, which drops every fact row —
    * the correct inner-join limit. */
  def filterFact(fact: DataFrame, factKey: String,
                 dim: DataFrame, dimKey: String,
                 expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    // `might_contain` requires its sketch operand to be a literal or a
    // scalar subquery (CheckAnalysis rejects a joined attribute), so
    // attach the one-row aggregate with Spark 4's Dataset.scalar() —
    // the same shape Catalyst's own runtime-filter rule injects.
    val sketch = dim.agg(
      bloomAgg(xxhash64(col(dimKey)), expectedItems,
        optimalNumBits(expectedItems, fpp)).as("__graft_bloom")).scalar()
    fact.filter(mightContain(sketch, xxhash64(col(factKey))))
  }

  /** Inner equi-join with the fact side Bloom-pre-filtered on the dim
    * key set. Result is identical to `fact.join(dim, fact(factKey) ===
    * dim(dimKey))`; only the shuffled volume differs. */
  def prefilteredInner(fact: DataFrame, factKey: String,
                       dim: DataFrame, dimKey: String,
                       expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val filtered = filterFact(fact, factKey, dim, dimKey, expectedItems, fpp)
    filtered.join(dim, filtered(factKey) === dim(dimKey))
  }
}
