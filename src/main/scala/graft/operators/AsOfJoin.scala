package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right-side value
  * whose timestamp is <= the left row's timestamp, per key.
  *
  * Spark has no built-in as-of join (SURVEY.md §2.B), so this is an
  * engine operator built as a *union + running-window rewrite*:
  *
  *   1. tag right rows (carrying the value) and left rows, union them;
  *   2. one window `PARTITION BY key ORDER BY (t, rightFirst)` with
  *      `last(value, ignoreNulls) ROWS UNBOUNDED PRECEDING` propagates
  *      the most recent right value forward in time;
  *   3. keep only left rows.
  *
  * Scale: exactly ONE shuffle (the window partitioning by key), versus
  * a correlated subquery (re-scan per row) or a range theta-join
  * (broadcast-nested-loop). Skewed keys behave like any skewed window;
  * at cluster scale pre-bucketing both sides by key removes the
  * shuffle entirely.
  */
object AsOfJoin {

  /** @param left      probe side (keeps all its columns)
    * @param right     reference side
    * @param leftKey   join key column in `left`
    * @param rightKey  join key column in `right`
    * @param leftTime  event-time column in `left`
    * @param rightTime event-time column in `right`
    * @param rightVal  value column from `right` to attach
    * @param outCol    name of the attached column (null if no right row <= leftTime)
    */
  def latestOnOrBefore(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String,
                       leftTime: String, rightTime: String,
                       rightVal: String, outCol: String): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__graft_asof_k", col(leftKey))
      .withColumn("__graft_asof_t", col(leftTime))
      .withColumn("__graft_asof_r", lit(0))
      .withColumn("__graft_asof_v", lit(null).cast(right.schema(rightVal).dataType))
    val r = right
      .select(
        col(rightKey).as("__graft_asof_k"),
        col(rightTime).as("__graft_asof_t"),
        lit(1).as("__graft_asof_r"),
        col(rightVal).as("__graft_asof_v"))
    val unioned = l.select((leftCols.map(col) :+ col("__graft_asof_k") :+ col("__graft_asof_t") :+
      col("__graft_asof_r") :+ col("__graft_asof_v")): _*)
      .unionByName(r, allowMissingColumns = true)

    // Right rows sort before left rows at equal timestamps so that
    // "on or before" is inclusive.
    val w = Window.partitionBy(col("__graft_asof_k"))
      .orderBy(col("__graft_asof_t").asc, col("__graft_asof_r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn(outCol, last(col("__graft_asof_v"), ignoreNulls = true).over(w))
      .filter(col("__graft_asof_r") === 0)
      .select((leftCols.map(col) :+ col(outCol)): _*)
  }

  /** Forward as-of: for each left row, the EARLIEST right-side value
    * whose timestamp is >= the left row's timestamp, per key — the
    * "next event after" direction (e.g. first order placed after a
    * page view). Mirror image of [[latestOnOrBefore]]: same single
    * shuffle, with the window frame looking forward
    * (`CURRENT ROW .. UNBOUNDED FOLLOWING`, `first(ignoreNulls)`) and
    * right rows sorting AFTER left rows at equal timestamps so
    * "on or after" stays inclusive.
    */
  def earliestOnOrAfter(left: DataFrame, right: DataFrame,
                        leftKey: String, rightKey: String,
                        leftTime: String, rightTime: String,
                        rightVal: String, outCol: String): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__graft_asof_k", col(leftKey))
      .withColumn("__graft_asof_t", col(leftTime))
      .withColumn("__graft_asof_r", lit(0))
      .withColumn("__graft_asof_v", lit(null).cast(right.schema(rightVal).dataType))
    val r = right
      .select(
        col(rightKey).as("__graft_asof_k"),
        col(rightTime).as("__graft_asof_t"),
        lit(1).as("__graft_asof_r"),
        col(rightVal).as("__graft_asof_v"))
    val unioned = l.select((leftCols.map(col) :+ col("__graft_asof_k") :+ col("__graft_asof_t") :+
      col("__graft_asof_r") :+ col("__graft_asof_v")): _*)
      .unionByName(r, allowMissingColumns = true)

    // Ascending time; right rows sort after left rows at equal
    // timestamps, so a forward-looking frame starting at CURRENT ROW
    // still sees a right row with t == leftTime (inclusive bound).
    val w = Window.partitionBy(col("__graft_asof_k"))
      .orderBy(col("__graft_asof_t").asc, col("__graft_asof_r").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    unioned
      .withColumn(outCol, first(col("__graft_asof_v"), ignoreNulls = true).over(w))
      .filter(col("__graft_asof_r") === 0)
      .select((leftCols.map(col) :+ col(outCol)): _*)
  }
}
