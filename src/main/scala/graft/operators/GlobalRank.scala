package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Global row-number over a total order WITHOUT the single-partition
  * stage Spark plans for `row_number().over(Window.orderBy(...))` —
  * that WindowExec funnels the entire input through ONE task, the
  * scale-killer flagged in every ranking query's plan audit.
  *
  * Spelling: a distributed range-partitioned sort (exactly what
  * `orderBy` already is) followed by `zipWithIndex`, which assigns
  * contiguous per-partition index ranges from one extra count job —
  * each partition then ranks its slice in parallel, and no stage ever
  * holds more than its slice. The count job re-runs the sorted
  * lineage once; callers ranking an expensive upstream should
  * localCheckpoint first (the q118-scale inputs here are a projection
  * of one scan, cheaper than the checkpoint write).
  *
  * The ordering columns must form a TOTAL order (break ties with a
  * unique id) — otherwise ranks within a tie group are partition-
  * placement-dependent, exactly like `row_number` itself.
  */
object GlobalRank {

  /** `df` plus a 1-based BIGINT `rankCol` ranking rows by `order`. */
  def withRank(df: DataFrame, rankCol: String, order: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(order: _*)
    val schema = sorted.schema.add(rankCol, LongType, nullable = false)
    val ranked = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    spark.createDataFrame(ranked, schema)
  }
}
