package graft

import org.apache.spark.sql.functions._

import graft.functions.CmsEstimate

/** Count-Min-sketch probe ([[graft.functions.CmsEstimate]]) against
  * Spark's `count_min_sketch` build aggregate: exactness at adequate
  * width, the one-sided error guarantee under forced collisions,
  * partitioning invariance (the merge path), and the string item
  * representation (UTF-8 bytes, matching the aggregate's insert).
  */
class CmsSpec extends SparkSpec {

  private def skewed = {
    import spark.implicits._
    // Zipf-ish: key k appears 1000/k times, keys 1..40
    (1 to 40).flatMap(k => Seq.fill(1000 / k)(k.toLong)).toDF("k")
  }

  test("wide sketch probes exact counts; estimates are partitioning-invariant") {
    import spark.implicits._
    val exact = skewed.groupBy($"k").agg(count(lit(1)).as("n"))
    def estimates(parts: Int) = {
      val sk = skewed.repartition(parts)
        .agg(expr("count_min_sketch(k, 0.0005d, 0.999d, 42)").as("cms"))
      exact.select($"k").crossJoin(broadcast(sk))
        .select($"k", CmsEstimate($"cms", $"k").as("est"))
    }
    val one = estimates(1).orderBy($"k").collect().map(r => (r.getLong(0), r.getLong(1)))
    val thirteen = estimates(13).orderBy($"k").collect().map(r => (r.getLong(0), r.getLong(1)))
    // cell-wise merge is exact: partition layout cannot change estimates
    assert(one.toSeq == thirteen.toSeq)
    val truth = exact.orderBy($"k").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(one.toSeq == truth.toSeq) // collision-free at this width
  }

  test("narrow sketch: estimate >= exact for every key (one-sided error)") {
    import spark.implicits._
    val exact = skewed.groupBy($"k").agg(count(lit(1)).as("n"))
    // eps 0.5 => 4 cells per row: heavy forced collisions
    val sk = skewed.agg(expr("count_min_sketch(k, 0.5d, 0.9d, 7)").as("cms"))
    val rows = exact.crossJoin(broadcast(sk))
      .select($"k", $"n", CmsEstimate($"cms", $"k").as("est"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) >= r.getLong(1), s"under-count at $r"))
    // and collisions actually happened, so the test is not vacuous
    assert(rows.exists(r => r.getLong(2) > r.getLong(1)))
  }

  test("string items probe with the aggregate's UTF-8 representation") {
    import spark.implicits._
    val words = Seq("alpha", "alpha", "alpha", "beta", "beta", "gamma").toDF("w")
    val sk = words.agg(expr("count_min_sketch(w, 0.001d, 0.99d, 42)").as("cms"))
    val est = words.distinct().crossJoin(broadcast(sk))
      .select($"w", CmsEstimate($"cms", $"w").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("alpha" -> 3L, "beta" -> 2L, "gamma" -> 1L))
  }

  test("distinct per-group sketches interleaved row-by-row probe correctly") {
    import spark.implicits._
    // Three per-group sketches joined onto probe rows so consecutive
    // rows carry DIFFERENT sketch byte arrays — the MRU-cache case
    // (one slot would thrash; correctness must hold regardless).
    val data = (1 to 3).flatMap(g => Seq.fill(g * 5)((g, g * 100L))).toDF("g", "k")
    val sketches = data.groupBy($"g")
      .agg(expr("count_min_sketch(k, 0.001d, 0.99d, 42)").as("cms"))
    val probes = (1 to 3).flatMap(g => Seq.fill(4)((g, g * 100L))).toDF("g", "k")
      .join(broadcast(sketches), "g")
      .repartition(1) // force row-by-row interleaving in one task
      .select($"g", CmsEstimate($"cms", $"k").as("est"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(probes.length == 12)
    probes.foreach { case (g, est) => assert(est == g * 5L, s"group $g: $est") }
  }

  test("SQL surface: graft_cms_estimate is registered") {
    import spark.implicits._
    skewed.createOrReplaceTempView("cms_in")
    val n = spark.sql(
      """SELECT graft_cms_estimate(
        |  (SELECT count_min_sketch(k, 0.001d, 0.99d, 42) FROM cms_in), 1L) AS est
        |""".stripMargin).head().getLong(0)
    assert(n == 1000L)
  }
}
