package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-batch cost probe for [[DupSpanIngest]]'s bucketed gram index:
  * the round-13 layout appended one parquet fragment per batch and
  * re-aggregated the WHOLE index on every probe, so per-batch
  * wall-time grew with stream age. With the ManifestState bucket
  * patch, per-batch time must stay FLAT across a long stream and the
  * index file count must stay bounded by
  * `nBuckets × (1 + keepGenerations)` (+ the manifest bookkeeping),
  * no matter how many batches ran.
  *
  * Each synthetic batch carries one corpus-wide boilerplate span
  * (exercises the hot-gram index row staying a single row), a span
  * copied from the PREVIOUS batch (exercises the history probe), and
  * unique filler (grows the index every batch).
  *
  * Usage: runMain graft.streaming.DupSpanIngestBench [batches] [docsPerBatch] [nBuckets]
  */
object DupSpanIngestBench {

  private def docBatch(spark: SparkSession, batch: Int, n: Int): DataFrame = {
    import spark.implicits._
    val base = batch.toLong * 1000000L
    spark.range(n.toLong).select(
      (lit(base) + $"id").as("doc_id"),
      concat_ws(" ",
        lit("common c1 c2 c3 c4 c5 c6 c7"),
        // the previous batch planted span b<batch-1>s0..s5 — this batch
        // re-carries it, so every batch leaks from its predecessor
        lit(s"b${batch - 1}s0 b${batch - 1}s1 b${batch - 1}s2 b${batch - 1}s3 b${batch - 1}s4 b${batch - 1}s5"),
        lit(s"b${batch}s0 b${batch}s1 b${batch}s2 b${batch}s3 b${batch}s4 b${batch}s5"),
        array_join(transform(sequence(lit(0), lit(39)),
          j => concat(lit("u"), ((lit(base) + $"id") * 100 + j).cast("string"))), " ")
      ).as("text"))
  }

  private def countFiles(dir: String): Long =
    if (!Files.exists(Path.of(dir))) 0L
    else {
      val s = Files.walk(Path.of(dir))
      try s.filter(p => Files.isRegularFile(p)).count()
      finally s.close()
    }

  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(60)
    require(batches >= 21,
      s"flatness windows (skip-1 + first10 vs last10) need >= 21 batches, got $batches")
    val docsPerBatch = if (args.length > 1) args(1).toInt else 200
    val nBuckets = if (args.length > 2) args(2).toInt else DupSpanIngest.DefaultIndexBuckets
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Graft.session(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")

    val root = Files.createTempDirectory("dupspaningestbench").toString
    val (idx, cov) = (s"$root/index", s"$root/cov")

    val timed = (1 to batches).map { i =>
      val t0 = System.nanoTime()
      DupSpanIngest.mergeBatch(docBatch(spark, i, docsPerBatch),
        "text", "doc_id", idx, cov, k = 5, nBuckets = nBuckets)
      val dt = (System.nanoTime() - t0) / 1e6
      // read path probed EVERY batch: the coverage state's bucketed
      // pre-merged layout must keep readout cost flat across stream
      // age (an append log pays a growing full-log min-merge here)
      val t1 = System.nanoTime()
      DupSpanIngest.coverages(spark, cov).count()
      val rt = (System.nanoTime() - t1) / 1e6
      if (i % 10 == 0 || i == 1)
        println(f"DUPSPANINGEST batch=$i%3d ms=$dt%8.1f read_ms=$rt%7.1f index_files=${countFiles(idx)} index_rows=${DupSpanIngest.index(spark, idx).count()}")
      (dt, rt)
    }
    val (ms, rms) = timed.unzip
    val head = ms.slice(1, 11) // skip batch 1 (codegen warmup)
    val tail = ms.takeRight(10)
    val ratio = tail.sum / head.sum
    println(f"DUPSPANINGEST batches=$batches docs/batch=$docsPerBatch buckets=$nBuckets")
    println(f"DUPSPANINGEST first10(avg)=${head.sum / head.size}%.1f ms last10(avg)=${tail.sum / tail.size}%.1f ms last/first=$ratio%.2f")
    val rHead = rms.slice(1, 11)
    val rTail = rms.takeRight(10)
    println(f"DUPSPANINGEST READ first10(avg)=${rHead.sum / rHead.size}%.1f ms last10(avg)=${rTail.sum / rTail.size}%.1f ms last/first=${rTail.sum / rHead.sum}%.2f")
    val files = countFiles(idx)
    val bound = nBuckets.toLong * (1 + ManifestState.DefaultKeepGenerations)
    // data files bounded by buckets x generations; manifest archive adds
    // one tiny file per commit (bytes, not data) — report both so the
    // bound is honest about what grows (bookkeeping) vs what doesn't
    // (scan surface)
    val dataFiles = ManifestState.dataFileCount(idx)
    println(s"DUPSPANINGEST index_files_total=$files data_files=$dataFiles data_bound=$bound (nBuckets x (1+keepGenerations))")
    assert(dataFiles <= bound, s"data file count $dataFiles exceeds bucket bound $bound")
    // round 15: the coverage EMISSION state holds to the same bound —
    // previously an append log growing one fragment per batch forever
    val covFiles = ManifestState.dataFileCount(cov)
    println(s"DUPSPANINGEST cov_data_files=$covFiles data_bound=$bound")
    assert(covFiles <= bound, s"coverage state file count $covFiles exceeds bucket bound $bound")
    // The manifests/ archive is the one thing that grows per commit
    // (tiny files, bookkeeping not scan surface). Exercise the
    // retention knob the way a long-lived stream's compaction cadence
    // would, and show the post-sweep steady state.
    val prunedIdx = ManifestState.pruneArchivedManifests(idx, keepLast = 2)
    val prunedCov = ManifestState.pruneArchivedManifests(cov, keepLast = 2)
    println(s"DUPSPANINGEST manifest_retention pruned_idx=$prunedIdx pruned_cov=$prunedCov files_after=${countFiles(idx)}/${countFiles(cov)}")
    spark.stop()
  }
}
