package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF}
import graft.operators.IvfAnn
import graft.streaming.IvfIngest

class IvfIngestSpec extends SparkSpec {

  private val nlist = 8

  private def corpus: DataFrame = {
    import spark.implicits._
    graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(VF.usableVec($"embedding"))
      .select($"vec_id", VF.asDouble($"embedding").as("v"))
  }

  private def rows(df: DataFrame): Set[String] =
    df.select(col("vec_id"), col("label"),
              concat_ws(",", transform(col("v"), x => round(x, 6).cast("string"))))
      .collect().map(_.toString).toSet

  test("assignTo reproduces the batch fit's final assignment bit-for-bit") {
    val (labeled, cents) = IvfAnn.fitCellsWithCentroids(corpus, nlist, iters = 2)
    val re = IvfAnn.assignTo(corpus, cents)
    assert(rows(re) == rows(labeled))
    graft.operators.Checkpoints.releaseAll()
  }

  test("streamed postings equal the batch fit over the seed corpus, and merges extend them") {
    import spark.implicits._
    val root = Files.createTempDirectory("ivfingest").toString
    val (pDir, qDir) = (s"$root/postings", s"$root/quant")
    val seedPart = corpus.filter($"vec_id" % 3 === 0)
    val restA = corpus.filter($"vec_id" % 3 === 1)
    val restB = corpus.filter($"vec_id" % 3 === 2)

    IvfIngest.seed(seedPart, pDir, qDir, nlist, iters = 2)
    val cents = IvfIngest.centroids(spark, qDir)
    val (labeledSeed, _) = IvfAnn.fitCellsWithCentroids(seedPart, nlist, iters = 2)
    // collect once: releaseAll drops the fit's tracked checkpoint
    val seedRows = rows(labeledSeed)
    assert(rows(IvfIngest.postings(spark, pDir)) == seedRows,
      "seeded postings != batch fit")
    graft.operators.Checkpoints.releaseAll()

    IvfIngest.mergeBatch(restA, pDir, qDir)
    IvfIngest.mergeBatch(restB, pDir, qDir)
    val want = seedRows ++
      rows(IvfAnn.assignTo(restA.unionByName(restB), cents))
    assert(rows(IvfIngest.postings(spark, pDir)) == want,
      "merged postings != seed ∪ assignTo(arrivals, stored quantizer)")
    graft.operators.Checkpoints.releaseAll()

    // replay idempotence: same batch again, state unchanged
    val before = rows(IvfIngest.postings(spark, pDir))
    IvfIngest.mergeBatch(restB, pDir, qDir)
    assert(rows(IvfIngest.postings(spark, pDir)) == before)

    // q44 parity: topK over the streamed state is topK over the same
    // rows — and for a FULL-corpus seed, exactly the q44 frame
    val root2 = Files.createTempDirectory("ivfingest-full").toString
    IvfIngest.seed(corpus, s"$root2/p", s"$root2/q", nlist, iters = 2)
    val got = IvfAnn.topK(IvfIngest.postings(spark, s"$root2/p"),
        isQuery = col("vec_id") < 10, nprobe = 2, k = 5)
      .collect().map(_.toString).sorted.toSeq
    val wantTopK = IvfAnn.topK(IvfAnn.fitCells(corpus, nlist, iters = 2),
        isQuery = col("vec_id") < 10, nprobe = 2, k = 5)
      .collect().map(_.toString).sorted.toSeq
    assert(got == wantTopK)
    graft.operators.Checkpoints.releaseAll()
  }

  test("topKCells equals brute force restricted to the probed cells (and reads only them)") {
    import spark.implicits._
    val root = Files.createTempDirectory("ivfcells").toString
    val (pDir, qDir) = (s"$root/p", s"$root/q")
    IvfIngest.seed(corpus, pDir, qDir, nlist, iters = 2)
    graft.operators.Checkpoints.releaseAll()
    val queries = corpus.filter($"vec_id" < 10)
    val got = IvfIngest.topKCells(spark, pDir, qDir, queries, nprobe = 2, k = 5)
      .select($"qid", $"nid", $"rank", round($"sim", 6).as("s"))
      .collect().map(_.toString).sorted.toSeq

    // independent reference: rank stored centroids per query, brute
    // force within the top-2 cells over the full postings
    val cents = IvfIngest.centroids(spark, qDir)
      .withColumn("cnrm", sqrt(VF.dot($"cv", $"cv")))
    val post = IvfIngest.postings(spark, pDir)
    val q = queries.select($"vec_id".as("qid"), $"v".as("qv"))
      .withColumn("qnrm", sqrt(VF.dot($"qv", $"qv")))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"csim".desc, $"c_label")
    val probes = q.crossJoin(cents)
      .withColumn("csim", VF.dot($"qv", $"cv") / ($"qnrm" * $"cnrm"))
      .withColumn("crn", row_number().over(wq)).filter($"crn" <= 2)
      .select($"qid", $"qv", $"qnrm", $"c_label".as("label"))
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"sim".desc, $"nid")
    val want = post.join(probes, Seq("label"))
      .filter($"vec_id" =!= $"qid")
      .withColumn("nrm", sqrt(VF.dot($"v", $"v")))
      .select($"qid", $"vec_id".as("nid"),
              (VF.dot($"v", $"qv") / ($"nrm" * $"qnrm")).as("sim"))
      .withColumn("rank", row_number().over(wk).cast("long")).filter($"rank" <= 5)
      .select($"qid", $"nid", $"rank", round($"sim", 6).as("s"))
      .collect().map(_.toString).sorted.toSeq
    assert(got == want)
  }

  test("refit relabels the streamed state to the fresh batch fit, atomically") {
    import spark.implicits._
    val root = Files.createTempDirectory("ivfrefit").toString
    val (pDir, qDir) = (s"$root/p", s"$root/q")
    // seed on a skewed third, then stream the rest: the quantizer is
    // now stale relative to the full cloud
    IvfIngest.seed(corpus.filter($"vec_id" % 3 === 0), pDir, qDir, nlist, iters = 2)
    graft.operators.Checkpoints.releaseAll()
    IvfIngest.mergeBatch(corpus.filter($"vec_id" % 3 =!= 0), pDir, qDir)
    IvfIngest.refit(spark, pDir, qDir, nlist, iters = 2)
    graft.operators.Checkpoints.releaseAll()
    // the refit state equals a fresh batch fit over the same vectors
    val (labeledAll, centsAll) =
      IvfAnn.fitCellsWithCentroids(corpus, nlist, iters = 2)
    assert(rows(IvfIngest.postings(spark, pDir)) == rows(labeledAll))
    val gotCents = IvfIngest.centroids(spark, qDir)
      .select($"c_label", concat_ws(",", transform($"cv", x => x.cast("string"))))
      .collect().map(_.toString).toSet
    val wantCents = centsAll
      .select($"c_label", concat_ws(",", transform($"cv", x => x.cast("string"))))
      .collect().map(_.toString).toSet
    assert(gotCents == wantCents)
    graft.operators.Checkpoints.releaseAll()
  }

  test("unusable vectors (null / zero-norm) are excluded, never stored") {
    import spark.implicits._
    val root = Files.createTempDirectory("ivfnull").toString
    val (pDir, qDir) = (s"$root/p", s"$root/q")
    IvfIngest.seed(corpus.limit(50), pDir, qDir, 4, iters = 1)
    graft.operators.Checkpoints.releaseAll()
    val weird = Seq(
      (900001L, null.asInstanceOf[Array[Double]]),
      (900002L, Array.fill(64)(0.0)),
      (900003L, Array.tabulate(64)(i => (i + 1).toDouble))
    ).toDF("vec_id", "v")
    IvfIngest.mergeBatch(weird, pDir, qDir)
    val stored = IvfIngest.postings(spark, pDir)
      .filter($"vec_id" >= 900000L).select($"vec_id").as[Long].collect().toSet
    assert(stored == Set(900003L), stored)
  }
}
