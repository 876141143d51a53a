package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Flatness probe for the bucketed-index ingest twins
  * ([[IngestDedup]], [[LeakageIngest]], [[WinnowIngest]],
  * [[NearDedupIngest]]) — same claim [[DupSpanIngestBench]] pins for
  * [[DupSpanIngest]]: per-batch wall-time flat across stream age,
  * index data files bounded by nBuckets × (1 + keepGenerations) no
  * matter how many batches ran.
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

  /** Per-batch merge AND per-batch readout probe. `readState` (when
    * given) is executed after every merge — the round-15 claim is that
    * the READ path is also flat across stream age, which an append-log
    * emission state breaks (full-log groupBy/distinct per readout)
    * even when the index itself is bucketed. Every dir in `stateDirs`
    * must hold to the same data-file bound as the index. */
  private def probe(name: String, batches: Int, nBuckets: Int,
                    indexDir: String, stateDirs: Seq[String] = Nil,
                    readState: Option[() => Long] = None)
                   (runBatch: Int => Unit): Unit = {
    require(batches >= 21,
      s"flatness windows (skip-1 + first10 vs last10) need >= 21 batches, got $batches")
    val timed = (1 to batches).map { i =>
      val t0 = System.nanoTime()
      runBatch(i)
      val merge = (System.nanoTime() - t0) / 1e6
      val read = readState.map { f =>
        val t1 = System.nanoTime(); f(); (System.nanoTime() - t1) / 1e6
      }
      (merge, read)
    }
    val (ms, readOpt) = timed.unzip
    val head = ms.slice(1, 11)
    val tail = ms.takeRight(10)
    val bound = nBuckets.toLong * (1 + ManifestState.DefaultKeepGenerations)
    val files = ManifestState.dataFileCount(indexDir)
    println(f"INGESTIDX $name batches=$batches first10(avg)=${head.sum / head.size}%.1f ms last10(avg)=${tail.sum / tail.size}%.1f ms last/first=${tail.sum / head.sum}%.2f data_files=$files bound=$bound")
    assert(files <= bound, s"$name: data file count $files exceeds bucket bound $bound")
    val reads = readOpt.flatten
    if (reads.nonEmpty) {
      val rh = reads.slice(1, 11)
      val rt = reads.takeRight(10)
      println(f"INGESTIDX $name READ first10(avg)=${rh.sum / rh.size}%.1f ms last10(avg)=${rt.sum / rt.size}%.1f ms last/first=${rt.sum / rh.sum}%.2f")
    }
    stateDirs.foreach { d =>
      val f = ManifestState.dataFileCount(d)
      println(s"INGESTIDX $name state=$d data_files=$f bound=$bound")
      assert(f <= bound, s"$name: state $d file count $f exceeds bucket bound $bound")
    }
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

    probe("leakage", batches, nBuckets, s"$root/leak/idx",
      stateDirs = Seq(s"$root/leak/rows"),
      readState = Some(() =>
        LeakageIngest.leakage(spark, s"$root/leak/rows").count())) { i =>
      LeakageIngest.mergeBatch(docBatch(spark, i, docsPerBatch),
        "text", "doc_id", "source", s"$root/leak/idx", s"$root/leak/rows",
        k = 5, nBuckets = nBuckets)
    }

    // winnow: round 15 — both index sub-states (byh + bydoc) and the
    // pair state are bucketed; previously each batch re-scanned the
    // whole append-mode fingerprint log three corpus-sized shuffles
    // deep (distinct + global df + global sel_n), so per-batch cost
    // grew with stream age. The planted cross-batch span stays under
    // the guard; the unique filler grows the index every batch.
    // neardedup: round 16 — the two-tier near-dup twin. Per batch:
    // ~10% exact copies of a constant planted span (exact tier fires
    // against history from batch 2 on), ~10% one-token near variants
    // of it (the prefix probe + sorted-merge verify fire, against an
    // ever-growing set of stored variant prefixes), the rest unique
    // (grows all four states every batch).
    probe("neardedup", batches, nBuckets, s"$root/near/idx/fp",
      stateDirs = Seq(s"$root/near/idx/pre", s"$root/near/idx/doc",
                      s"$root/near/idx/df"),
      readState = Some(() =>
        NearDedupIngest.fpIndex(spark, s"$root/near/idx").count())) { i =>
      val base = i.toLong * 1000000L
      val batch = spark.range(docsPerBatch.toLong).select(
        (lit(base) + col("id")).as("doc_id"),
        when(pmod(col("id"), lit(10)) === 0,
            lit("cross batch planted span alpha beta gamma delta epsilon"))
          .when(pmod(col("id"), lit(10)) === 5,
            concat(lit("cross batch planted span alpha beta gamma delta epsilon x"),
                   (lit(base) + col("id")).cast("string")))
          .otherwise(concat(lit(s"uniq b$i d"), col("id").cast("string"),
            lit(" w1 w2 w3 w4 tail"), col("id").cast("string"))).as("text"))
      val v = NearDedupIngest.mergeBatch(batch, "text", "doc_id",
        s"$root/near/out", s"$root/near/idx",
        epoch = i.toLong, thr = 0.5, ngram = 3, nBuckets = nBuckets)
      graft.operators.Iterate.unpersistCheckpoint(v)
    }

    probe("winnow", batches, nBuckets, s"$root/win/idx/byh",
      stateDirs = Seq(s"$root/win/idx/bydoc", s"$root/win/pairs"),
      readState = Some(() =>
        WinnowIngest.pairs(spark, s"$root/win/pairs").count())) { i =>
      WinnowIngest.mergeBatch(docBatch(spark, i, docsPerBatch),
        "text", "doc_id", s"$root/win/idx", s"$root/win/pairs",
        minShared = 1L, maxDf = 1000L, nBuckets = nBuckets)
    }

    spark.stop()
  }
}
