package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Flatness probe for the OTHER two bucketed-index ingest twins
  * ([[IngestDedup]], [[LeakageIngest]]) — same claim
  * [[DupSpanIngestBench]] pins for [[DupSpanIngest]]: per-batch
  * wall-time flat across stream age, index data files bounded by
  * nBuckets × (1 + keepGenerations) no matter how many batches ran.
  *
  * Usage: runMain graft.streaming.IngestIndexBench [batches] [docsPerBatch] [nBuckets]
  */
object IngestIndexBench {

  private def docBatch(spark: SparkSession, batch: Int, n: Int): DataFrame = {
    import spark.implicits._
    val base = batch.toLong * 1000000L
    spark.range(n.toLong).select(
      (lit(base) + $"id").as("doc_id"),
      // ~10% of docs repeat the PREVIOUS batch's planted text exactly
      // (exercises the fp anti-join / leakage probe); the rest are
      // unique (grows the index every batch)
      when(pmod($"id", lit(10)) === 0, lit(s"planted text from batch ${batch - 1}"))
        .otherwise(concat(lit(s"unique b$batch d"), $"id".cast("string"),
          lit(" w1 w2 w3 w4 w5 tail"), $"id".cast("string"))).as("text"),
      concat(lit("src"), pmod($"id", lit(4)).cast("string")).as("source"))
  }

  private def probe(name: String, batches: Int, nBuckets: Int,
                    indexDir: String)(runBatch: Int => Unit): Unit = {
    require(batches >= 21,
      s"flatness windows (skip-1 + first10 vs last10) need >= 21 batches, got $batches")
    val ms = (1 to batches).map { i =>
      val t0 = System.nanoTime()
      runBatch(i)
      (System.nanoTime() - t0) / 1e6
    }
    val head = ms.slice(1, 11)
    val tail = ms.takeRight(10)
    val bound = nBuckets.toLong * (1 + ManifestState.DefaultKeepGenerations)
    val files = ManifestState.dataFileCount(indexDir)
    println(f"INGESTIDX $name batches=$batches first10(avg)=${head.sum / head.size}%.1f ms last10(avg)=${tail.sum / tail.size}%.1f ms last/first=${tail.sum / head.sum}%.2f data_files=$files bound=$bound")
    assert(files <= bound, s"$name: data file count $files exceeds bucket bound $bound")
  }

  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(50)
    val docsPerBatch = if (args.length > 1) args(1).toInt else 200
    val nBuckets = if (args.length > 2) args(2).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Graft.session(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")

    val root = Files.createTempDirectory("ingestidxbench").toString

    probe("ingest-dedup", batches, nBuckets, s"$root/dedup/idx") { i =>
      IngestDedup.mergeBatch(
        IngestDedup.withFingerprint(docBatch(spark, i, docsPerBatch), "text"),
        s"$root/dedup/out", s"$root/dedup/idx", nBuckets)
    }

    probe("leakage", batches, nBuckets, s"$root/leak/idx") { i =>
      LeakageIngest.mergeBatch(docBatch(spark, i, docsPerBatch),
        "text", "doc_id", "source", s"$root/leak/idx", s"$root/leak/rows",
        k = 5, nBuckets = nBuckets)
    }

    spark.stop()
  }
}
