package graft

import graft.operators.LabelPropagation

/** Label propagation: mode-of-labeled-neighbors with fixed seeds,
  * min-label tie-break, per-round provenance, early convergence. */
class LabelPropagationSpec extends SparkSpec {

  private def run(edges: Seq[(Long, Long)], seeds: Seq[(Long, Long)],
                  maxRounds: Int = 10): Map[Long, (Long, Long, Int)] = {
    import spark.implicits._
    LabelPropagation
      .propagate(edges.toDF("src", "dst"), seeds.toDF("node", "lbl"), maxRounds)
      .as[(Long, Long, Long, Int)].collect()
      .map { case (n, l, v, r) => n -> ((l, v, r)) }.toMap
  }

  test("chain propagates from both ends; equidistant node tie-breaks min") {
    // 1-2-3-4-5 with seeds 1->10, 5->20: node 3 hears both camps in
    // round 2 with one vote each -> min label wins.
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)),
                  Seq((1L, 10L), (5L, 20L)))
    assert(got(1L) == ((10L, 0L, 0)) && got(5L) == ((20L, 0L, 0)))
    assert(got(2L) == ((10L, 1L, 1)) && got(4L) == ((20L, 1L, 1)))
    assert(got(3L) == ((10L, 1L, 2)))
  }

  test("mode wins over minority label and vote counts are recorded") {
    // Star: 0 adjacent to two 7-seeds and one 5-seed -> 7 by 2 votes.
    val got = run(Seq((0L, 1L), (0L, 2L), (0L, 3L)),
                  Seq((1L, 7L), (2L, 7L), (3L, 5L)))
    assert(got(0L) == ((7L, 2L, 1)))
  }

  test("seeds never change and unreachable nodes stay unlabeled") {
    val got = run(Seq((1L, 2L), (50L, 60L)), Seq((1L, 100L), (2L, 200L)))
    assert(got(1L) == ((100L, 0L, 0)) && got(2L) == ((200L, 0L, 0)))
    assert(!got.contains(50L) && !got.contains(60L))
    assert(got.size == 2) // converged without touching the seedless pair
  }

  test("votes count ALL labeled neighbors at first reach, not a frontier slice") {
    // 4 is adjacent to seed 1 and to 2; 2 gets labeled in round 1 from
    // seed 1... but 4 is ALSO labeled in round 1 (adjacent to seed 1),
    // so give 4 two seed neighbors instead: both count in round 1.
    val got = run(Seq((1L, 4L), (2L, 4L)), Seq((1L, 9L), (2L, 9L)))
    assert(got(4L) == ((9L, 2L, 1)))
  }

  test("maxRounds caps propagation depth") {
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 4L)), Seq((1L, 5L)), maxRounds = 2)
    assert(got.contains(3L) && !got.contains(4L))
  }
}
