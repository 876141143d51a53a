package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.pipelines.MixturePlan

class MixturePlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = graft.sources.Tables.documents(spark, dir)

  test("plan algebra: budget split uniformly, rates capped at 1") {
    import spark.implicits._
    val plan = MixturePlan.uniform(docs, TF.tokenCount($"text"), 0.5).collect()
    val totalToks = plan.map(_.getLong(2)).sum
    val target = (0.5 * totalToks / plan.length).toLong
    plan.foreach { r =>
      assert(r.getLong(5) == math.min(target, r.getLong(2)), r.getString(0))
      assert(r.getDouble(6) <= 1.0)
      // epochs_r is the uncapped ratio; rate_r is its cap at 1
      assert(math.abs(r.getDouble(6) - math.min(r.getDouble(7), 1.0)) < 1e-9)
    }
    // shares sum to ~1
    assert(math.abs(plan.map(_.getDouble(3)).sum - 1.0) < 0.01)
  }

  test("apply is deterministic, per-source bounded, and repartition-stable") {
    import spark.implicits._
    val rates = Seq(("src0", 0.3), ("src1", 1.0)).toDF("source", "rate")
    val in = docs.filter($"source".isin("src0", "src1", "src2"))
    val out = MixturePlan.apply(in, $"doc_id", rates).cache()
    try {
      // unmatched source keeps nothing; rate 1.0 keeps everything
      assert(out.filter($"source" === "src2").count() == 0)
      assert(out.filter($"source" === "src1").count() ==
        in.filter($"source" === "src1").count())
      // rate 0.3 keeps roughly 30% (hash-uniform, not exact)
      val k = out.filter($"source" === "src0").count().toDouble
      val n = in.filter($"source" === "src0").count().toDouble
      assert(k / n > 0.15 && k / n < 0.45, s"keep ratio ${k / n}")
      // identical survivor set under a different partitioning
      val again = MixturePlan.apply(in.repartition(13), $"doc_id", rates)
      assert(out.select($"doc_id").exceptAll(again.select($"doc_id")).count() == 0)
      assert(again.select($"doc_id").exceptAll(out.select($"doc_id")).count() == 0)
    } finally out.unpersist()
  }

  test("plan + apply round-trip: achieved tokens track planned tokens") {
    import spark.implicits._
    // sf0.01, not sf0.001: doc-grain hash sampling has ~1/sqrt(n·p)
    // relative noise, and at sf0.001 a source's planned mass is a
    // handful of documents
    val docs01 = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    val plan = MixturePlan.uniform(docs01, TF.tokenCount($"text"), 0.5)
    val rates = plan.select($"source", $"rate_r".as("rate"))
    val sampled = MixturePlan.apply(docs01, $"doc_id", rates)
      .groupBy($"source").agg(sum(TF.tokenCount($"text")).as("got"))
    val check = plan.join(sampled, "source")
      .select($"source", $"planned_toks", $"got").collect()
    check.foreach { r =>
      val planned = r.getLong(1).toDouble
      val got = r.getLong(2).toDouble
      // per-source, only where the planned mass is large enough for
      // the doc-grain binomial noise to be inside ±30% (tiny sources
      // are legitimately noisy — the corpus-level bound below still
      // covers their aggregate)
      if (planned >= 20000)
        assert(got > planned * 0.7 && got < planned * 1.3,
          s"${r.getString(0)}: planned $planned got $got")
    }
    // corpus level the noise averages out
    val planned = check.map(_.getLong(1)).sum.toDouble
    val got = check.map(_.getLong(2)).sum.toDouble
    assert(got / planned > 0.9 && got / planned < 1.1,
      s"total planned $planned got $got")
  }
}
