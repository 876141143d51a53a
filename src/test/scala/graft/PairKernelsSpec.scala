package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{CosinePairs, GlobalRank}

/** Specs for the round-6 scale kernels: the blocked exact cosine-pair
  * generator (q21/q103) and the zipWithIndex global ranker (q118).
  */
class PairKernelsSpec extends SparkSpec {

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("CosinePairs.exact matches the naive all-pairs join, boundary inclusive") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vecs = (0L until 60L).map { id =>
      (id, Array.fill(16)(rnd.nextGaussian()))
    }
    // Plant one pair exactly at a knowable cosine: duplicate a vector
    // (cos = 1.0) and one scaled copy (cos = 1.0 too, scale-invariant).
    val planted = vecs :+ ((60L, vecs(3)._2.clone())) :+
      ((61L, vecs(7)._2.map(_ * 2.5)))
    val t = 0.3
    val expected = (for {
      i <- planted.indices; j <- (i + 1) until planted.length
      sim = cosine(planted(i)._2, planted(j)._2)
      if sim >= t
    } yield (planted(i)._1 min planted(j)._1,
             planted(i)._1 max planted(j)._1)).sorted

    val got = CosinePairs.exact(planted.toDS(), t)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq.sorted
    assert(got == expected)
    assert(got.contains((3L, 60L)) && got.contains((7L, 61L)))
  }

  test("CosinePairs.exact sim values are the sequential-fold dot contract") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0, 2.0, 3.0)),
      (2L, Array(1.0, 2.0, 3.0)),
      (3L, Array(-1.0, -2.0, -3.0)))
    val out = CosinePairs.exact(vecs.toDS(), -2.0)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(out.map(r => (r._1, r._2)).toSeq == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(out(0)._3 == 1.0 && out(1)._3 == -1.0 && out(2)._3 == -1.0)
  }

  test("CosinePairs.exactBlocked equals exact for any block count") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val vecs = (0L until 80L).map(id => (id, Array.fill(12)(rnd.nextGaussian()))).toDS()
    val want = CosinePairs.exact(vecs, 0.25)
      .select($"id_a", $"id_b", round($"sim", 9).as("s"))
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(want.nonEmpty)
    for (b <- Seq(1, 3, 8)) {
      val got = CosinePairs.exactBlocked(vecs, 0.25, b)
        .select($"id_a", $"id_b", round($"sim", 9).as("s"))
        .as[(Long, Long, Double)].collect().toSeq.sorted
      assert(got == want, s"nBlocks=$b diverged")
    }
  }

  test("CosinePairs.exact on empty and singleton inputs") {
    import spark.implicits._
    val empty = spark.emptyDataset[(Long, Array[Double])]
    assert(CosinePairs.exact(empty, 0.5).count() == 0)
    val one = Seq((9L, Array(1.0, 0.0))).toDS()
    assert(CosinePairs.exact(one, 0.0).count() == 0)
  }

  test("CosinePairs.exact refuses an over-budget corpus loudly, naming the scale route") {
    import spark.implicits._
    // one row past the exact-tier ceiling: the guard must fire BEFORE
    // the driver materializes an O(n*d) matrix, and the error must
    // point at the blocked production route, not just say "too big"
    val over = spark.range(CosinePairs.maxExactRows + 1L)
      .map(i => (i.toLong, Array(1.0)))
    val ex = intercept[IllegalArgumentException] {
      CosinePairs.exact(over, 0.9)
    }
    assert(ex.getMessage.contains("exact-tier budget"), ex.getMessage)
    assert(ex.getMessage.contains("CosinePairs.clustered"), ex.getMessage)
  }

  test("GlobalRank.withRank equals row_number over the same total order") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1L to 5000L).map(id => (id, rnd.nextInt(100)))
      .toDF("id", "score").repartition(8)
    val viaWindow = df.withColumn("rk",
        row_number().over(Window.orderBy($"score".desc, $"id")).cast("long"))
      .select($"id", $"rk").as[(Long, Long)].collect().toMap
    val viaKernel = GlobalRank.withRank(df, "rk", $"score".desc, $"id")
      .select($"id", $"rk").as[(Long, Long)].collect().toMap
    assert(viaKernel == viaWindow)
  }

  test("GlobalRank output stays multi-partition (no single-task funnel)") {
    import spark.implicits._
    // AQE legitimately coalesces this toy input to one partition;
    // switch it off so the test sees the scale shape — a
    // range-partitioned sort, never a WindowExec or a 1-partition
    // funnel by construction.
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = (1L to 20000L).map(id => (id, id % 977)).toDF("id", "score")
        .repartition(16)
      val ranked = GlobalRank.withRank(df, "rk", $"score", $"id")
      assert(ranked.rdd.getNumPartitions > 1)
      assert(!df.orderBy($"score", $"id").queryExecution.executedPlan
        .toString.contains("Window"))
      // Ranks are a total 1..n sequence.
      val ranks = ranked.select($"rk").as[Long].collect().sorted
      assert(ranks.head == 1L && ranks.last == 20000L && ranks.distinct.length == 20000)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }
  test("PPJoin.similarPairs equals the naive all-pairs Jaccard join (randomized)") {
    // the exact-recall claim beyond the q98 fixture: random shingle
    // sets over a small vocabulary (heavy collisions, empty sets,
    // thresholds up to 1.0), compared pair-for-pair with the naive
    // O(n^2) join the oracle runs
    import spark.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val docs = (0 until 40).map { i =>
        val sz = rnd.nextInt(9) // 0..8, empty sets included
        (i.toLong, (0 until sz).map(_ => "t" + rnd.nextInt(20)).distinct)
      }
      val df = docs.toDF("doc_id", "sh")
      // 1/3, 2/3, 0.25 are the adversarial band for the positional
      // filter: t/(1+t) is exactly rational (0.25, 0.4, 0.2), so
      // t/(1+t)·(|A|+|B|) lands ON an integer for many size pairs —
      // where the retired ceil-of-double spelling could round a ulp
      // high and prune a true pair; the rational-comparison bound must
      // keep exact recall there too
      Seq(0.25, 0.3, 1.0 / 3, 0.5, 2.0 / 3, 0.8, 1.0).foreach { thr =>
        val naive = (for {
          (ia, sa) <- docs; (ib, sb) <- docs if ia < ib
          uni = (sa.toSet ++ sb.toSet).size if uni > 0
          j = (sa.toSet & sb.toSet).size.toDouble / uni if j >= thr
        } yield (ia, ib, j)).sortBy(p => (p._1, p._2))
        val got = graft.operators.PPJoin.similarPairs(df, "doc_id", "sh", thr)
          .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2))
        assert(got.map(p => (p._1, p._2)).toSeq == naive.map(p => (p._1, p._2)),
          s"seed=$seed thr=$thr: pair sets differ")
        got.zip(naive).foreach { case ((_, _, gj), (_, _, nj)) =>
          assert(math.abs(gj - nj) < 1e-12, s"seed=$seed thr=$thr: jaccard drifted")
        }
      }
    }
  }
}
