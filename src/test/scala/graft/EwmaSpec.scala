package graft

import graft.operators.Ewma

/** Ewma.linear vs the definitional recurrence (ewma_1 = x_1,
  * ewma_i = α·x_i + (1-α)·ewma_{i-1}) — the segmented decomposition
  * must agree with the sequential fold at every index, including
  * across segment boundaries, at multi-year lengths where the naive
  * rescaled cumsum overflows, and per key.
  */
class EwmaSpec extends SparkSpec {

  private def reference(xs: Seq[Double], alpha: Double): Seq[Double] =
    xs.tail.scanLeft(xs.head)((e, x) => alpha * x + (1 - alpha) * e)

  private def series(n: Int, seed: Long): Seq[Double] =
    (1 to n).map(i => ((i * 2654435761L + seed) % 1000).toDouble / 10.0 + 1.0)

  private def check(n: Int, alpha: Double, segLen: Int, seed: Long = 7): Unit = {
    import spark.implicits._
    val xs = series(n, seed)
    val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("i", "x")
    val got = Ewma.linear(df, Nil, "i", "x", alpha, "e", segLen)
      .orderBy($"i").select($"e").as[Double].collect()
    val want = reference(xs, alpha)
    assert(got.length == n)
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(math.abs(g - w) <= 1e-9 * math.max(1.0, math.abs(w)),
        s"n=$n segLen=$segLen idx=$i got=$g want=$w")
    }
  }

  test("matches the sequential recurrence across segment boundaries") {
    check(n = 1, alpha = 0.3, segLen = 8)
    check(n = 8, alpha = 0.3, segLen = 8)   // exactly one segment
    check(n = 9, alpha = 0.3, segLen = 8)   // first carry
    check(n = 500, alpha = 0.3, segLen = 64)
    check(n = 137, alpha = 0.9, segLen = 16)
  }

  test("multi-year series: linear spelling stays exact where the unsegmented rescale overflows") {
    // q^(-i) at i=4000, q=0.7 is ~1e619 — far past double. The
    // segmented form never rescales past q^(-(segLen-1)).
    check(n = 4000, alpha = 0.3, segLen = 64)
  }

  test("keyed series fold independently") {
    import spark.implicits._
    val alpha = 0.25
    val rows = for (k <- Seq("a", "b", "c"); i <- 0 until 150)
      yield (k, i.toLong, series(150, k.hashCode.toLong)(i))
    val df = rows.toDF("k", "i", "x")
    val got = Ewma.linear(df, Seq("k"), "i", "x", alpha, "e", segLen = 16)
      .orderBy($"k", $"i").select($"k", $"e").as[(String, Double)].collect()
    Seq("a", "b", "c").foreach { k =>
      val want = reference(series(150, k.hashCode.toLong), alpha)
      val g = got.filter(_._1 == k).map(_._2)
      g.zip(want).zipWithIndex.foreach { case ((a, w), i) =>
        assert(math.abs(a - w) <= 1e-9 * math.max(1.0, math.abs(w)), s"k=$k idx=$i")
      }
    }
  }

  test("null values contribute zero (the average keeps decaying)") {
    import spark.implicits._
    val df = Seq((0L, Some(10.0)), (1L, None), (2L, Some(4.0)))
      .toDF("i", "x")
    val got = Ewma.linear(df, Nil, "i", "x", 0.5, "e", segLen = 2)
      .orderBy($"i").select($"e").as[Double].collect()
    val want = reference(Seq(10.0, 0.0, 4.0), 0.5)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-9) }
  }

  test("alpha = 1 short-circuits to the identity (null -> 0), no NaNs") {
    import spark.implicits._
    val df = Seq((0L, Some(10.0)), (1L, None), (2L, Some(4.0)))
      .toDF("i", "x")
    val got = Ewma.linear(df, Nil, "i", "x", 1.0, "e", segLen = 2)
      .orderBy($"i").select($"e").as[Double].collect()
    assert(got.toSeq == Seq(10.0, 0.0, 4.0))
  }

  test("joint (alpha, segLen) guard: an overflowing rescale fails loudly") {
    import spark.implicits._
    val df = (0 until 10).map(i => (i.toLong, 1.0)).toDF("i", "x")
    // q = 0.01 -> q^-511 ~ 1e1022, past double
    val e = intercept[IllegalArgumentException] {
      Ewma.linear(df, Nil, "i", "x", 0.99, "e", segLen = 512)
    }
    assert(e.getMessage.contains("overflows"), e.getMessage)
    assert(e.getMessage.contains("segLen <= 155"), e.getMessage)
  }

  test("carry budget boundary: exactly 4096 segment entries pass") {
    import spark.implicits._
    val alpha = 0.3
    // 2048 keys x 4 rows at segLen=2 -> exactly 2 segments each = 4096
    val rows = for (k <- 0 until 2048; i <- 0 until 4)
      yield (s"k$k", i.toLong, (i + 1).toDouble)
    val df = rows.toDF("k", "i", "x")
    val got = Ewma.linear(df, Seq("k"), "i", "x", alpha, "e", segLen = 2)
      .filter($"k" === "k7").orderBy($"i").select($"e").as[Double].collect()
    val want = reference(Seq(1.0, 2.0, 3.0, 4.0), alpha)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-9) }
  }

  test("carry budget guard fails loudly on non-series-grain input") {
    import spark.implicits._
    val df = (0 until 5000).map(i => (s"k$i", 0L, 1.0)).toDF("k", "i", "x")
    val e = intercept[IllegalArgumentException] {
      Ewma.linear(df, Seq("k"), "i", "x", 0.3, "e")
    }
    assert(e.getMessage.contains("literal-map budget"), e.getMessage)
  }
}
