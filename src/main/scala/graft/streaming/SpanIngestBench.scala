package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures what [[SpanIngest]]'s shared gram pass saves: per batch,
  * the SOLO spelling runs [[DupSpanIngest.mergeBatch]] +
  * [[LeakageIngest.mergeBatch]] (two gram passes over the same text),
  * the FUSED spelling runs [[SpanIngest.mergeBatch]] (one). Both
  * ingest the identical batch stream into separate state roots; the
  * probe prints per-batch averages, the fused/solo ratio, and
  * cross-checks the final states row-for-row (count grain — the spec
  * asserts full equality). A second section does the same for the
  * 3-way fold ([[SpanIngest.mergeBatchAll]] vs the three solo twins,
  * [[WinnowIngest.mergeBatch]] included).
  *
  * Usage: runMain graft.streaming.SpanIngestBench [batches] [docsPerBatch]
  */
object SpanIngestBench {

  private def docBatch(spark: SparkSession, batch: Int, n: Int): DataFrame = {
    import spark.implicits._
    val base = batch.toLong * 1000000L
    spark.range(n.toLong).select(
      (lit(base) + $"id").as("doc_id"),
      concat_ws(" ",
        lit("common c1 c2 c3 c4 c5 c6 c7"),
        lit(s"b${batch - 1}s0 b${batch - 1}s1 b${batch - 1}s2 b${batch - 1}s3 b${batch - 1}s4 b${batch - 1}s5"),
        lit(s"b${batch}s0 b${batch}s1 b${batch}s2 b${batch}s3 b${batch}s4 b${batch}s5"),
        array_join(transform(sequence(lit(0), lit(39)),
          j => concat(lit("u"), ((lit(base) + $"id") * 100 + j).cast("string"))), " ")
      ).as("text"),
      concat(lit("src"), pmod($"id", lit(4)).cast("string")).as("source"))
  }

  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(20)
    val docsPerBatch = if (args.length > 1) args(1).toInt else 200
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Graft.session(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")

    val solo = Files.createTempDirectory("spanbench-solo").toString
    val fused = Files.createTempDirectory("spanbench-fused").toString

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    val (soloMs, fusedMs) = (1 to batches).map { i =>
      val b = docBatch(spark, i, docsPerBatch).localCheckpoint()
      val s = timed {
        DupSpanIngest.mergeBatch(b, "text", "doc_id", s"$solo/covidx", s"$solo/cov")
        LeakageIngest.mergeBatch(b, "text", "doc_id", "source",
          s"$solo/leakidx", s"$solo/leak")
      }
      val f = timed {
        SpanIngest.mergeBatch(b, "text", "doc_id", "source",
          s"$fused/covidx", s"$fused/cov", s"$fused/leakidx", s"$fused/leak")
      }
      graft.operators.Iterate.unpersistCheckpoint(b)
      (s, f)
    }.unzip
    // skip batch 1 (codegen warmup) in the averages
    val sAvg = soloMs.drop(1).sum / (batches - 1)
    val fAvg = fusedMs.drop(1).sum / (batches - 1)
    println(f"SPANINGEST batches=$batches docs/batch=$docsPerBatch solo(avg)=$sAvg%.1f ms fused(avg)=$fAvg%.1f ms fused/solo=${fAvg / sAvg}%.2f")
    val covS = DupSpanIngest.coverages(spark, s"$solo/cov").count()
    val covF = DupSpanIngest.coverages(spark, s"$fused/cov").count()
    val leakS = LeakageIngest.leakage(spark, s"$solo/leak").count()
    val leakF = LeakageIngest.leakage(spark, s"$fused/leak").count()
    println(s"SPANINGEST states cov=$covF/$covS leak=$leakF/$leakS")
    assert(covS == covF && leakS == leakF, "fused and solo states diverged")

    // ---- 3-way section: + WinnowIngest ----
    val solo3 = Files.createTempDirectory("spanbench-solo3").toString
    val fused3 = Files.createTempDirectory("spanbench-fused3").toString
    val (solo3Ms, fused3Ms) = (1 to batches).map { i =>
      val b = docBatch(spark, i, docsPerBatch).localCheckpoint()
      val s = timed {
        DupSpanIngest.mergeBatch(b, "text", "doc_id", s"$solo3/covidx", s"$solo3/cov")
        LeakageIngest.mergeBatch(b, "text", "doc_id", "source",
          s"$solo3/leakidx", s"$solo3/leak")
        WinnowIngest.mergeBatch(b, "text", "doc_id",
          s"$solo3/winidx", s"$solo3/winpairs")
      }
      val f = timed {
        SpanIngest.mergeBatchAll(b, "text", "doc_id", "source",
          s"$fused3/covidx", s"$fused3/cov", s"$fused3/leakidx", s"$fused3/leak",
          s"$fused3/winidx", s"$fused3/winpairs")
      }
      graft.operators.Iterate.unpersistCheckpoint(b)
      (s, f)
    }.unzip
    val s3Avg = solo3Ms.drop(1).sum / (batches - 1)
    val f3Avg = fused3Ms.drop(1).sum / (batches - 1)
    println(f"SPANINGEST3 batches=$batches docs/batch=$docsPerBatch solo(avg)=$s3Avg%.1f ms fused(avg)=$f3Avg%.1f ms fused/solo=${f3Avg / s3Avg}%.2f")
    val cov3S = DupSpanIngest.coverages(spark, s"$solo3/cov").count()
    val cov3F = DupSpanIngest.coverages(spark, s"$fused3/cov").count()
    val leak3S = LeakageIngest.leakage(spark, s"$solo3/leak").count()
    val leak3F = LeakageIngest.leakage(spark, s"$fused3/leak").count()
    val win3S = WinnowIngest.pairs(spark, s"$solo3/winpairs").count()
    val win3F = WinnowIngest.pairs(spark, s"$fused3/winpairs").count()
    val idx3S = WinnowIngest.index(spark, s"$solo3/winidx").count()
    val idx3F = WinnowIngest.index(spark, s"$fused3/winidx").count()
    println(s"SPANINGEST3 states cov=$cov3F/$cov3S leak=$leak3F/$leak3S winpairs=$win3F/$win3S winidx=$idx3F/$idx3S")
    assert(cov3S == cov3F && leak3S == leak3F && win3S == win3F && idx3S == idx3F,
      "3-way fused and solo states diverged")
    spark.stop()
  }
}
