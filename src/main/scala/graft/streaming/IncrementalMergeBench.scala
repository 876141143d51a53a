package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the O(state)-vs-O(delta) difference between the snapshot
  * merge and the bucketed incremental merge: build a large state once,
  * then apply many small update batches to both and time them.
  *
  * Usage: runMain graft.streaming.IncrementalMergeBench [stateKeys] [batches] [batchSize]
  */
object IncrementalMergeBench {

  private def changes(spark: SparkSession, startLsn: Long, n: Long, keySpace: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).select(
      lit(CdcStream.Upsert).as("event_type"),
      concat(lit("k"), pmod(xxhash64($"id" + startLsn), lit(keySpace))).as("id"),
      (lit(startLsn) + $"id").as("create_time"),
      (lit(startLsn) + $"id").as("update_time"),
      concat(lit("payload message number "), $"id").as("message"),
      concat(lit("user"), pmod($"id", lit(100))).as("username"),
      (lit(startLsn) + $"id").as("lsn"),
      (lit(startLsn) + $"id").as("ts_ms"))
  }

  def main(args: Array[String]): Unit = {
    val stateKeys = args.headOption.map(_.toLong).getOrElse(1000000L)
    val batches = if (args.length > 1) args(1).toInt else 20
    val batchSize = if (args.length > 2) args(2).toLong else 1000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Graft.session(s"local[$cpus]", cpus.toInt)

    val root = Files.createTempDirectory("incmerge").toString
    val plainDir = s"$root/plain"; val bktDir = s"$root/bucketed"
    val mfDir = s"$root/manifest"
    val nBuckets = 1024

    // seed all three states with the same bulk load
    val base = changes(spark, 0, stateKeys, stateKeys)
    CdcStream.mergeBatch(base, plainDir)
    CdcStream.mergeBatchBucketed(base, bktDir, nBuckets)
    ManifestState.mergeBatch(base, mfDir, nBuckets)

    def applyDeltas(merge: DataFrame => Unit): Double = {
      val t0 = System.nanoTime()
      (1 to batches).foreach { i =>
        merge(changes(spark, stateKeys + i.toLong * batchSize, batchSize, stateKeys))
      }
      (System.nanoTime() - t0) / 1e9
    }

    val plainSec = applyDeltas(b => CdcStream.mergeBatch(b, plainDir))
    val bktSec = applyDeltas(b => CdcStream.mergeBatchBucketed(b, bktDir, nBuckets))
    // manifest mode = bucketed + snapshot isolation + commit protocol;
    // its delta vs bucketed is the price of multi-writer safety
    val mfSec = applyDeltas(b => ManifestState.mergeBatch(b, mfDir, nBuckets))

    // row-identity check point: all three modes have seen exactly the
    // same deltas HERE (the concurrent phase below adds further
    // batches to the manifest state only)
    val a = spark.read.parquet(plainDir).count()
    val b = spark.read.parquet(bktDir).count()
    val c = ManifestState.read(spark, mfDir).count()

    // concurrent manifest writers: same TOTAL batch count split over 2
    // threads against one state — measures what the optimistic commit
    // actually costs under contention (disjoint buckets mostly commit
    // in parallel; colliding ones retry)
    val concBatches = 2 * (batches / 2) // what actually runs below
    val mfcSec = {
      val t0 = System.nanoTime()
      val threads = (0 until 2).map { w =>
        new Thread(() => (1 to batches / 2).foreach { i =>
          ManifestState.mergeBatch(
            changes(spark, stateKeys + (w * batches + i + batches).toLong * batchSize,
                    batchSize, stateKeys),
            mfDir, nBuckets)
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }

    println(f"""{"metric":"incremental_merge","state_keys":$stateKeys,"batches":$batches,"batch_size":$batchSize,"plain_sec_per_batch":${plainSec / batches}%.3f,"bucketed_sec_per_batch":${bktSec / batches}%.3f,"manifest_sec_per_batch":${mfSec / batches}%.3f,"manifest_2writer_sec_per_batch":${mfcSec / math.max(1, concBatches)}%.3f,"speedup":${plainSec / bktSec}%.1f,"rows_plain":$a,"rows_bucketed":$b,"rows_manifest":$c}""")
    spark.stop()
  }
}
