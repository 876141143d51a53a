package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF}

/** Quantizer-freshness probe for the STREAMED IVF state — extends the
  * docs/probes/ann_refit_r12.txt story (batch refit vs stale cells)
  * to [[IvfIngest]]: seed the quantizer on the initial corpus, stream
  * batches whose cluster structure DRIFTS, and measure recall@5 of
  * the cell-pruned search ([[IvfIngest.topKCells]]) against the exact
  * brute force over the same postings — then [[IvfIngest.refit]] and
  * measure again. The expected shape: recall rots as arriving
  * vectors land in cells fit on yesterday's density, and one in-place
  * refit (no state rebuild from the raw corpus) restores it.
  *
  * Deterministic: vectors are hash-derived (no RNG) — cluster c's
  * center drifts linearly with batch index, members jitter by
  * xxhash64 of their id.
  *
  * Usage: runMain graft.streaming.IvfIngestBench [batches] [vecsPerBatch]
  */
object IvfIngestBench {

  private val Dim = 16
  private val NClusters = 8

  /** batch b's vectors: 75% on the 8 base clusters (one-hot dims 0-7,
    * hash jitter), 25% on batch b's NEW cluster (one-hot dim
    * 8 + b mod 8 with a per-batch sign flip — a direction the seed
    * corpus never had). The stale quantizer has no cell for the new
    * material, so it piles into whichever seed cells sit closest —
    * the probed-cell candidate mass grows (the cost rot), until a
    * refit gives the new clusters their own cells. */
  private def vecs(spark: SparkSession, batch: Int, n: Int): DataFrame = {
    import spark.implicits._
    val base = batch.toLong * 1000000L
    val newDim = 8 + ((batch - 1).max(0) % 8)
    val sign = if (batch % 2 == 0) 1.0 else -1.0
    spark.range(n.toLong)
      .select((lit(base) + $"id").as("vec_id"),
              when(pmod($"id", lit(4)) === 0 && lit(batch) > 0, lit(-1))
                .otherwise(pmod($"id", lit(NClusters))).cast("int").as("c"))
      .select(col("vec_id"),
        expr(
          s"""transform(sequence(0, ${Dim - 1}), i -> CAST(
             |  (CASE WHEN c >= 0 AND i = c THEN 4.0 ELSE 0.0 END) +
             |  (CASE WHEN c < 0 AND i = $newDim THEN $sign * 4.0 ELSE 0.0 END) +
             |  ((pmod(xxhash64(vec_id * ${Dim}L + i), 1000L) / 1000.0 - 0.5) * 1.5) AS DOUBLE))
             |""".stripMargin).as("v"))
  }

  /** (mean recall@5 of topKCells vs exact brute force over the SAME
    * postings, mean fraction of postings scanned as candidates) for
    * the given query vectors — the rot metric pair: a stale quantizer
    * piles new material into few cells, so the scanned fraction
    * drifts up from ~nprobe/nlist even while recall holds. */
  private def recall(spark: SparkSession, pDir: String, qDir: String,
                     queries: DataFrame, nprobe: Int): (Double, Double) = {
    import spark.implicits._
    val got = IvfIngest.topKCells(spark, pDir, qDir, queries, nprobe, k = 5)
      .select($"qid", $"nid")
    val post = IvfIngest.postings(spark, pDir)
      .withColumn("nrm", sqrt(VF.dot($"v", $"v")))
    val q = queries.select($"vec_id".as("qid"), $"v".as("qv"))
      .withColumn("qnrm", sqrt(VF.dot($"qv", $"qv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"sim".desc, $"nid")
    val exact = post.crossJoin(q)
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id".as("nid"),
              (VF.dot($"v", $"qv") / ($"nrm" * $"qnrm")).as("sim"))
      .withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
      .select($"qid", $"nid")
    val hits = exact.join(got, Seq("qid", "nid"), "left_semi").count().toDouble
    val rec = hits / exact.count()
    // scanned fraction: per query, the probed cells' posting mass
    val cents = IvfIngest.centroids(spark, pDir.replace("postings", "quant"))
      .withColumn("cnrm", sqrt(VF.dot($"cv", $"cv")))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"csim".desc, $"c_label")
    val probes = q.crossJoin(cents)
      .withColumn("csim", VF.dot($"qv", $"cv") / ($"qnrm" * $"cnrm"))
      .withColumn("crn", row_number().over(wq)).filter($"crn" <= nprobe)
      .select($"qid", $"c_label".as("label"))
    val cellSizes = post.groupBy($"label").agg(count(lit(1)).as("sz"))
    val scanned = probes.join(cellSizes, Seq("label"), "left")
      .groupBy($"qid").agg(sum(coalesce($"sz", lit(0L))).as("scanned"))
      .agg(avg($"scanned")).collect()(0).getDouble(0)
    (rec, scanned / post.count().toDouble)
  }

  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(10)
    val perBatch = if (args.length > 1) args(1).toInt else 1000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Graft.session(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = Files.createTempDirectory("ivfingestbench").toString
    val (pDir, qDir) = (s"$root/postings", s"$root/quant")
    val nlist = 16
    val nprobe = 4 // 25% of cells

    IvfIngest.seed(vecs(spark, 0, 2 * perBatch), pDir, qDir, nlist, iters = 3)
    graft.operators.Checkpoints.releaseAll()
    for (b <- 1 to batches) {
      IvfIngest.mergeBatch(vecs(spark, b, perBatch), pDir, qDir)
      if (b % 2 == 0 || b == batches) {
        val queries = vecs(spark, b, perBatch).filter($"vec_id" % 20 === 0)
        val (r, f) = recall(spark, pDir, qDir, queries, nprobe)
        println(f"IVFINGEST batch=$b stale_recall@5=$r%.3f scanned_frac=$f%.3f (nprobe=$nprobe/$nlist ideal=${nprobe.toDouble / nlist}%.3f)")
      }
    }
    val queries = vecs(spark, batches, perBatch).filter($"vec_id" % 20 === 0)
    val t0 = System.nanoTime()
    IvfIngest.refit(spark, pDir, qDir, nlist, iters = 3)
    graft.operators.Checkpoints.releaseAll()
    val refitMs = (System.nanoTime() - t0) / 1e6
    val (r, f) = recall(spark, pDir, qDir, queries, nprobe)
    println(f"IVFINGEST refit in-place: recall@5=$r%.3f scanned_frac=$f%.3f refit_ms=$refitMs%.0f " +
      s"postings=${IvfIngest.postings(spark, pDir).count()} " +
      s"data_files=${ManifestState.dataFileCount(pDir)}")
    spark.stop()
  }
}
