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
    * the scan node. */
  def writeDatePartitioned(df: DataFrame, tsCol: String, dir: String,
                           mode: SaveMode = SaveMode.Overwrite): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write.mode(mode)
      .partitionBy("p_date")
      .parquet(dir)

  /** Write a bucketed table (requires a table name — bucketing is
    * metastore metadata). Two tables bucketed by the same key with the
    * same bucket count join with NO exchange on either side. */
  def writeBucketed(df: DataFrame, bucketCol: String, buckets: Int,
                    table: String, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
