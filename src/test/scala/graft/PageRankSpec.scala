package graft

import graft.operators.PageRank

class PageRankSpec extends SparkSpec {

  test("PageRank converges to the analytic fixed point on a 3-node cycle") {
    import spark.implicits._
    // symmetric cycle a->b->c->a: uniform fixed point 1/3 each
    val edges = Seq(("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0))
      .toDF("src", "dst", "w")
    val pr = PageRank.run(edges).as[(String, Double)].collect().toMap
    assert(pr.size == 3)
    pr.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-5, pr))
  }

  test("PageRank handles dangling nodes and sums to 1") {
    import spark.implicits._
    // b is dangling (no out-edges); its mass must be redistributed,
    // not lost — otherwise Σpr < 1 and the hub's score deflates.
    val edges = Seq(("a", "b", 1.0), ("c", "b", 1.0)).toDF("src", "dst", "w")
    val pr = PageRank.run(edges).as[(String, Double)].collect().toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-6, pr)
    // the sink node holds the most rank; the two sources tie
    assert(pr("b") > pr("a") && math.abs(pr("a") - pr("c")) < 1e-9, pr)
  }

  test("PageRank respects edge weights") {
    import spark.implicits._
    // a splits 3:1 between b and c -> b ends above c
    val edges = Seq(("a", "b", 3.0), ("a", "c", 1.0),
                    ("b", "a", 1.0), ("c", "a", 1.0))
      .toDF("src", "dst", "w")
    val pr = PageRank.run(edges).as[(String, Double)].collect().toMap
    assert(pr("b") > pr("c"), pr)
    assert(math.abs(pr.values.sum - 1.0) < 1e-6, pr)
  }
}
