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
