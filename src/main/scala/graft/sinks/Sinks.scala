package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sink-side layout helpers — the 100 TB posture (SURVEY §7 risks):
  * date-partitioned fact tables so downstream scans prune partitions,
  * and key-bucketed tables so co-located joins skip the shuffle.
  */
object Sinks {

  /** Write date-partitioned parquet: `dir/p_date=YYYY-MM-DD/...`.
    * Downstream `spark.read.parquet(dir).filter($"p_date" === ...)`
    * prunes at file-listing time — verified by PartitionFilters in
    * the scan node.
    *
    * Repartitions on the partition column first: without it every
    * task opens a writer for every date it happens to hold, and the
    * sink degrades into tasks×dates tiny files that compound across
    * incremental writes. `filesPerDate` > 1 adds a deterministic
    * content-hash sub-split for dates too large for one task. */
  def writeDatePartitioned(df: DataFrame, tsCol: String, dir: String,
                           mode: SaveMode = SaveMode.Overwrite,
                           filesPerDate: Int = 1): Unit = {
    require(filesPerDate > 0)
    val dated = df.withColumn("p_date", to_date(col(tsCol)))
    val placed =
      if (filesPerDate == 1) dated.repartition(col("p_date"))
      else dated.repartition(col("p_date"),
        pmod(xxhash64(col(tsCol)), lit(filesPerDate)))
    placed.write.mode(mode)
      // zstd over default snappy for the long-lived fact tables: ~30%
      // smaller at comparable scan speed — at 100 TB that is tens of
      // TB of storage and scan I/O per copy
      .option("compression", "zstd")
      .partitionBy("p_date")
      .parquet(dir)
  }

  /** Write a bucketed table (requires a table name — bucketing is
    * metastore metadata). Two tables bucketed by the same key with the
    * same bucket count join with NO exchange on either side. */
  def writeBucketed(df: DataFrame, bucketCol: String, buckets: Int,
                    table: String, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .option("compression", "zstd") // same storage rationale as the date sink
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
