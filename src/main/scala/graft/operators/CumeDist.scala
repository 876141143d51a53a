package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `cume_dist()` at value grain — the scale-safe decomposition of the
  * keyed cume_dist window (whose partition holds an entire key group
  * in ONE task):
  *
  *   1. collapse to (keys, `valueCol`) tie counts — cume_dist gives
  *      every tied row the full count of rows ≤ its value, so the
  *      grain loses nothing;
  *   2. inclusive cumulative of the tie counts in value order via
  *      [[PrefixScan]] — parallel local windows + bounded carry;
  *   3. group totals as a broadcast;
  *   4. annotate every input ROW back with (`cs`, `nr`);
  *      cume_dist = cs / nr.
  *
  * Every annotate-back match is null-SAFE (`<=>`): groupBy keeps
  * null-valued and null-keyed groups, and cume_dist ranks nulls
  * first — a plain equi-join would silently drop those rows from the
  * result. Identical to `cume_dist().over(partitionBy(keys)
  * .orderBy(valueCol))` up to the cs/nr division — oracle-hash-
  * verified through q157. Shared by q157 and ScaleSmoke's cdf probe
  * so the decomposition exists in exactly one place.
  */
object CumeDist {

  /** Adds inclusive cumulative count `csCol` and group total `nrCol`
    * to every row of `df` (cume_dist = csCol / nrCol). Requirements
    * as [[PrefixScan.scan]]: numeric `valueCol`; `keys` must not
    * contain columns named like the internal `__cd_*` temporaries.
    */
  def annotate(df: DataFrame, keys: Seq[String], valueCol: String,
               csCol: String, nrCol: String, partitions: Int): DataFrame = {
    val keyCols = keys.map(col)
    // Pinned ONCE and shared by PrefixScan and the group-total branch:
    // `tot` broadcasts, so without the shared pin it re-ran the full
    // input scan + grain aggregate (the q141 class — see PrefixScan's
    // inputPinned doc).
    val grain = Checkpoints.track(
      df.groupBy(keyCols :+ col(valueCol): _*)
        .agg(count(lit(1)).as("__cd_cnt"))
        .localCheckpoint(eager = false))
    val cum = PrefixScan.scan(grain, keys, valueCol, "__cd_cnt",
      csCol, "sum", partitions, inputPinned = true)
      .select(keys.map(k => col(k).as(s"__cd_k_$k")) ++
        Seq(col(valueCol).as("__cd_v"), col(csCol)): _*)
    val tot = grain.groupBy(keyCols: _*)
      .agg(sum(col("__cd_cnt")).as(nrCol))
      .select(keys.map(k => col(k).as(s"__cd_t_$k")) :+ col(nrCol): _*)
    val cumCond = (keys.map(k => col(k) <=> col(s"__cd_k_$k")) :+
      (col(valueCol) <=> col("__cd_v"))).reduce(_ && _)
    val withCum = df.join(cum, cumCond)
    val withTot =
      if (keys.isEmpty) withCum.crossJoin(broadcast(tot))
      else withCum.join(broadcast(tot),
        keys.map(k => col(k) <=> col(s"__cd_t_$k")).reduce(_ && _))
    withTot.drop(
      keys.map(k => s"__cd_k_$k") ++ keys.map(k => s"__cd_t_$k")
        :+ "__cd_v": _*)
  }
}
