package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Plain `spark.read.parquet` so Catalyst's parquet source handles
  * predicate pushdown, column pruning and partition-bytes splitting;
  * at cluster scale the same call reads a partitioned directory tree
  * and prunes partitions from the same declarative plan.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). Read it as a
    * raw long (legacy nanosAsLong) and convert ns -> µs with *integer*
    * division — `ts div 1000`, not `/ 1000`, because nanosecond epochs
    * (~1.7e18) exceed double's 2^53 exact-integer range and a
    * double-division roundtrip would corrupt low-order digits.
    * Truncation matches DuckDB's ns->µs cast, so oracle timestamps
    * agree. */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
  }

  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  /** The driver has shipped `events.ts` under three parquet encodings so
    * far: TIMESTAMP(NANOS) (read as raw long, ns->µs below), timestamp[us]
    * with isAdjustedToUTC=false (Spark: TIMESTAMP_NTZ), and timestamp[us]
    * UTC-adjusted (Spark: TIMESTAMP). Normalize all three to TimestampType
    * so every downstream query sees one stable schema. The NTZ->TZ cast is
    * lossless here because the session timezone is pinned to UTC, and it
    * matches DuckDB, which treats the unadjusted micros as UTC instants. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = eventsRaw(spark, dir)
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")

  /** Register every table as a temp view so the whole surface is also
    * reachable through `spark.sql(...)` — the engine's SQL entry point
    * (same Catalyst plans as the DataFrame API). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(name => apply(spark, dir, name).createOrReplaceTempView(name))
}
