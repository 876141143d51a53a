package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded time-interval self-join: all pairs of rows with the same key
  * whose timestamps are within `windowSeconds` of each other.
  *
  * A naive `a JOIN b ON key AND b.ts BETWEEN a.ts AND a.ts + w` gives
  * Spark an equi+range condition that degenerates per-key to a
  * nested-loop over the key group. This operator *bucketizes* time
  * into `windowSeconds`-wide buckets and turns the range predicate
  * into an equi-join on (key, bucket), duplicating the right side into
  * its own and the previous bucket — so the physical plan is a plain
  * shuffled hash/sort-merge join whose cost is O(pairs within band),
  * not O(pairs within key). This is the standard banded-join rewrite
  * and survives 100x scale as long as the band stays selective.
  */
object IntervalJoin {

  /** Pairs (first, second) with `first.ts <= second.ts <= first.ts + windowSeconds`,
    * same `keyCol`, ordered deterministically; equal timestamps are
    * paired once with `first.idCol < second.idCol`.
    *
    * Output: key, first_id, second_id, first_ts, second_ts, gap_seconds.
    */
  def selfPairsWithin(events: DataFrame, keyCol: String, tsCol: String,
                      idCol: String, windowSeconds: Long): DataFrame = {
    val bucket = floor(unix_timestamp(col(tsCol)) / windowSeconds)

    val a = events.select(
      col(keyCol).as("__key"),
      col(idCol).as("first_id"),
      col(tsCol).as("first_ts"),
      bucket.as("__b"))

    // Right side lands in its own bucket and the previous one, so any
    // pair spanning a bucket boundary still meets on an equi-key.
    val b = events.select(
      col(keyCol).as("__key2"),
      col(idCol).as("second_id"),
      col(tsCol).as("second_ts"),
      explode(array(bucket, bucket - 1)).as("__b2"))

    a.join(b, col("__key") === col("__key2") && col("__b") === col("__b2"))
      .filter(
        (col("second_ts") > col("first_ts") ||
          (col("second_ts") === col("first_ts") && col("first_id") < col("second_id"))) &&
        col("second_ts") <= col("first_ts") + expr(s"INTERVAL $windowSeconds SECOND"))
      .select(
        col("__key").as(keyCol),
        col("first_id"), col("second_id"),
        col("first_ts"), col("second_ts"),
        (unix_timestamp(col("second_ts")) - unix_timestamp(col("first_ts"))).as("gap_seconds"))
  }
}
