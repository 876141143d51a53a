package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `ntile(k)` in closed form over a [[PrefixScan]] rank — the
  * scale-safe decomposition of the bare ntile window (whose partition
  * holds an entire key group in ONE task):
  *
  *   1. rank within each key group via PrefixScan's two-level scan
  *      over (`orderCol`, `tieCols`) — parallel local windows plus a
  *      bounded carry merge, never a group-wide sort task;
  *   2. group sizes as a broadcast (|key groups| rows);
  *   3. ntile's bucket rule in arithmetic: the first n mod k buckets
  *      hold ⌈n/k⌉ rows, the rest ⌊n/k⌋.
  *
  * Output is identical to `ntile(k).over(partitionBy(keys)
  * .orderBy(orderCol, tieCols))` — spec-asserted (PrefixScanSpec) and
  * oracle-hash-verified through q70. The ⌊n/k⌋ divisor is zero only
  * when n < k, and then every rank falls in the ⌈n/k⌉ branch, so the
  * division never evaluates (CASE WHEN branches are lazy per row).
  * Shared by q70 and ScaleSmoke's ntile probe so the bucket formula
  * exists in exactly one place.
  */
object Ntile {

  /** Adds `out` = ntile bucket (1-based) of each row within `keys`
    * under (`orderCol`, `tieCols`) order. Same requirements as
    * [[PrefixScan.scan]]: numeric `orderCol`, (`orderCol`, `tieCols`)
    * distinct per key group.
    */
  def closed(df: DataFrame, keys: Seq[String], orderCol: String,
             tieCols: Seq[String], k: Int, out: String,
             partitions: Int): DataFrame = {
    require(k > 0, s"ntile bucket count must be positive, got $k")
    // Pinned ONCE and shared by the rank pass and the size branch:
    // `sizes` broadcasts, so without the shared pin it re-ran the
    // whole input lineage (PrefixScan pins its own copy internally,
    // but a BroadcastExchange cannot reuse it — the q141 class).
    val pinned = Checkpoints.track(
      df.withColumn("__nt_one", lit(1L)).localCheckpoint(eager = false))
    val ranked = PrefixScan.scan(pinned,
      keys, orderCol, "__nt_one", "__nt_rk", "sum", partitions, tieCols,
      inputPinned = true)
    // null-SAFE size match (`<=>`): the ntile window keeps a null-key
    // partition, so a plain using-join would silently drop those rows
    val sizes = pinned.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__nt_nr"))
      .select(keys.map(k => col(k).as(s"__nt_k_$k")) :+ col("__nt_nr"): _*)
    val joined =
      if (keys.isEmpty) ranked.crossJoin(broadcast(sizes))
      else ranked.join(broadcast(sizes),
        keys.map(k => col(k) <=> col(s"__nt_k_$k")).reduce(_ && _))
    val q = floor(col("__nt_nr") / k).cast("long")
    val r = col("__nt_nr") - q * k
    val rk = col("__nt_rk")
    joined
      .withColumn(out,
        when(rk <= r * (q + 1), floor((rk - 1) / (q + 1)))
          .otherwise(r + floor((rk - 1 - r * (q + 1)) / q))
          .cast("long") + 1)
      .drop(Seq("__nt_one", "__nt_rk", "__nt_nr") ++
        keys.map(k => s"__nt_k_$k"): _*)
  }
}
