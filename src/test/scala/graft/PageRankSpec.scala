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

  test("long fixed points do not accumulate checkpointed blocks") {
    import spark.implicits._
    // A 20-node cycle forced through 10 full rounds (tol=0 never
    // converges early). Each round localCheckpoints a new ranks frame;
    // without Iterate.unpersistCheckpoint the block manager would hold
    // one |V|-sized RDD per round (+10 here). Allowed residue: the
    // permanent e/nodes/outd checkpoints and the returned final ranks.
    val edges = (1 to 20).map(i => (s"n$i", s"n${i % 20 + 1}", 1.0))
      .toDF("src", "dst", "w")
    val before = spark.sparkContext.getPersistentRDDs.size
    PageRank.run(edges, maxRounds = 10, tol = 0.0)
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 4,
      s"checkpoint leak: $before persistent RDDs before, $after after")
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
