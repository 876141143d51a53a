package graft

import org.apache.spark.sql.functions._

import graft.operators.SparseCosine

/** The sparse-cosine kernel's df-cap contract: the absolute cap is
  * EXACTLY the relative-prune kernel wherever it does not bind, and
  * excises precisely the over-df terms where it does — so the
  * linear-scale regime (maxDfAbs) and the oracle tier (q107) can
  * never drift apart inside the cap's validity domain.
  */
class SparseCosineSpec extends SparkSpec {

  private def pairMap(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] = {
    import spark.implicits._
    df.select($"doc_a", $"doc_b", round($"cos", 6).as("cos"))
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
  }

  test("a non-binding absolute cap reproduces the exact kernel at sf0.001 and sf0.01") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = graft.sources.Tables(spark, dir, "documents")
      // n docs <= 5000 at these SFs, so 0.1*n <= 500: a 500 cap never binds
      val exact = pairMap(SparseCosine.pairs(docs, "text", "doc_id", minCos = 0.3))
      val capped = pairMap(SparseCosine.pairs(docs, "text", "doc_id",
        minCos = 0.3, maxDfAbs = 500L))
      assert(exact.nonEmpty)
      assert(capped == exact)
    }
  }

  test("a binding cap excludes exactly the over-df terms (weights AND norms)") {
    import spark.implicits._
    // 'hot' has df=3 (docs 1,2,3); 'rare' df=2 (docs 1,2). With
    // maxDfAbs=2 the hot term must vanish from weights and norms both
    // — the capped result equals the exact kernel run on text with the
    // hot term already absent.
    val docs = Seq(
      (1L, "hot rare u1 u2"),
      (2L, "hot rare v1 v2"),
      (3L, "hot w1 w2 w3"),
      (4L, "x1 x2 x3 x4")).toDF("doc_id", "text")
    val capped = pairMap(SparseCosine.pairs(docs, "text", "doc_id",
      minCos = 0.0, minDf = 1L, maxDfFrac = 1.0, maxDfAbs = 2L))
    val reference = pairMap(SparseCosine.pairs(
      docs.withColumn("text", regexp_replace($"text", "hot ", "")),
      "text", "doc_id", minCos = 0.0, minDf = 1L, maxDfFrac = 1.0))
    assert(capped == reference)
    assert(capped.keySet == Set((1L, 2L)), "only the rare-term pair survives")
    // and WITHOUT the cap the hot term creates the (1,3)/(2,3) pairs
    val exact = pairMap(SparseCosine.pairs(docs, "text", "doc_id",
      minCos = 0.0, minDf = 1L, maxDfFrac = 1.0))
    assert(exact.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("q179 equals the cap-only operator spelling and its cap binds against the stopword band") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val q = graft.queries.Catalog.queries("q179_sparse_cosine_capped")(spark, dir)
      .select($"doc_a", $"doc_b", $"cos_r")
      .as[(Long, Long, Double)].collect().toSet
    val op = SparseCosine.pairs(
        graft.sources.Tables(spark, dir, "documents"), "text", "doc_id",
        minCos = 0.3, minDf = 1L, maxDfFrac = 1.0, maxDfAbs = 300L)
      .select($"doc_a", $"doc_b", round($"cos", 4).as("cos_r"))
      .as[(Long, Long, Double)].collect().toSet
    assert(q == op && q.nonEmpty)
    // the cap is load-bearing: with NO df prune at all the stopword
    // band pairs nearly everything — q179's result must be a strict
    // subset of a much larger unpruned answer, not a relabeling of it
    val unpruned = SparseCosine.pairs(
        graft.sources.Tables(spark, dir, "documents"), "text", "doc_id",
        minCos = 0.3, minDf = 1L, maxDfFrac = 1.0).count()
    assert(unpruned > 10L * q.size,
      s"cap should excise the stopword band: unpruned=$unpruned capped=${q.size}")
  }

  test("standing gate: capped pair volume grows ~linearly on a growing distinct corpus, uncapped does not") {
    import spark.implicits._
    // Distinct-content growth model (the regime that exposed q107's
    // quadratic behavior in round 14): a 'hot' term in a FIXED FRACTION
    // of docs (df/N ≈ 7.7% — the relative 10% prune keeps it at every
    // size) plus per-pair rare terms whose count grows linearly with N.
    // Σdf² for the hot term is quadratic in N; the absolute cap excises
    // it once df crosses K, pinning Σdf² ≤ K·Σdf.
    def corpus(n: Int) = spark.range(n.toLong).select(
      col("id").as("doc_id"),
      concat_ws(" ",
        when(col("id") % 13 === 0, lit("hot")).otherwise(concat(lit("f"), col("id"))),
        concat(lit("p"), (col("id") / 2).cast("long")),
        concat(lit("u"), col("id"), lit("a")),
        concat(lit("u"), col("id"), lit("b"))).as("text"))
    def pairs(n: Int, cap: Long) = SparseCosine.pairs(
      corpus(n), "text", "doc_id", minCos = 0.0, minDf = 1L,
      maxDfFrac = 0.1, maxDfAbs = cap).count()
    val (n1, n2) = (260, 2600)
    val uncapped1 = pairs(n1, Long.MaxValue)
    val uncapped2 = pairs(n2, Long.MaxValue)
    val capped1 = pairs(n1, 30L)
    val capped2 = pairs(n2, 30L)
    // cap non-binding at n1 (hot df = 20 ≤ 30): identical to uncapped
    assert(capped1 == uncapped1)
    // uncapped: hot df grows 20 → 200, its pair block 190 → 19900 —
    // the quadratic signature the relative prune cannot stop
    assert(uncapped2.toDouble / uncapped1 > 30.0,
      s"expected quadratic growth uncapped: $uncapped1 -> $uncapped2")
    // capped: hot excised at n2, pair volume follows the linear term
    assert(capped2.toDouble / capped1 <= 15.0,
      s"expected ~linear growth capped: $capped1 -> $capped2")
    assert(capped2 > 0)
  }

  test("q107 equals the operator's exact kernel") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val q = graft.queries.Catalog.queries("q107_sparse_cosine")(spark, dir)
      .select($"doc_a", $"doc_b", $"cos_r")
      .as[(Long, Long, Double)].collect().toSet
    val op = SparseCosine.pairs(
        graft.sources.Tables(spark, dir, "documents"), "text", "doc_id", 0.3)
      .select($"doc_a", $"doc_b", round($"cos", 4).as("cos_r"))
      .as[(Long, Long, Double)].collect().toSet
    assert(q == op && q.nonEmpty)
  }
}
