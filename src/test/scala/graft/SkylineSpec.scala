package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Skyline

class SkylineSpec extends SparkSpec {

  /** O(n²) dominance check — the oracle's NOT-EXISTS, literally. */
  private def naive(rows: Seq[(Long, Double, Int)]): Set[Long] =
    rows.filter { case (_, c, g) =>
      !rows.exists { case (_, c2, g2) =>
        c2 <= c && g2 >= g && (c2 < c || g2 > g)
      }
    }.map(_._1).toSet

  private def df(rows: Seq[(Long, Double, Int)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "c", "g")
  }

  private def ids(d: DataFrame): Set[Long] =
    d.select(col("id")).collect().map(_.getLong(0)).toSet

  test("frontier equals the O(n²) dominance check, any partition count") {
    val rnd = new scala.util.Random(7)
    // heavy ties in both dimensions: cost from 30 buckets, gain from 20
    val rows = Seq.tabulate(500)(i =>
      (i.toLong, (rnd.nextInt(30) + 1) / 2.0, rnd.nextInt(20)))
    val want = naive(rows)
    for (p <- Seq(1, 3, 8, 64))
      assert(ids(Skyline.frontier(df(rows), col("c"), col("g"), p)) == want,
        s"rangePartitions=$p")
  }

  test("two-level prefix max equals the single-window spelling on orders") {
    val o = graft.sources.Tables(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
    val single = Skyline.frontier(o, col("o_totalprice"), col("o_orderdate"),
      rangePartitions = 1)
    val multi = Skyline.frontier(o, col("o_totalprice"), col("o_orderdate"),
      rangePartitions = 32)
    val a = single.collect().map(_.getLong(0)).toSet
    val b = multi.collect().map(_.getLong(0)).toSet
    assert(a == b, s"diff: ${(a diff b) ++ (b diff a)}")
    assert(a.nonEmpty, "empty frontier — fixture broken")
  }

  test("shuffle-join annotate-back path returns the same frontier") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(300)(i =>
      (i.toLong, rnd.nextInt(40) / 4.0, rnd.nextInt(15)))
    val want = naive(rows)
    assert(ids(Skyline.frontier(df(rows), col("c"), col("g"),
      rangePartitions = 8, broadcastBack = false)) == want)
  }

  test("degenerate inputs: empty, single row, all-identical rows") {
    import spark.implicits._
    assert(ids(Skyline.frontier(df(Seq.empty), col("c"), col("g"), 8)).isEmpty)
    assert(ids(Skyline.frontier(df(Seq((1L, 2.0, 3))), col("c"), col("g"), 8)) == Set(1L))
    // identical rows: none dominates another (no strict inequality) —
    // the whole set is the frontier
    val same = Seq((1L, 5.0, 2), (2L, 5.0, 2), (3L, 5.0, 2))
    assert(ids(Skyline.frontier(df(same), col("c"), col("g"), 8)) == Set(1L, 2L, 3L))
  }

  test("null cost/gain rows are excluded by contract, without disturbing the frontier") {
    import spark.implicits._
    // dominance is undefined against an unknown coordinate — the
    // operator documents exclusion, and the null rows must not
    // change which defined rows survive
    val rows = Seq(
      (1L, Some(1.0), Some(5)), (2L, Some(2.0), Some(9)),
      (3L, Some(3.0), Some(9)), // dominated by 2
      (4L, None, Some(100)),    // null cost
      (5L, Some(0.5), None))    // null gain
    val d = rows.toDF("id", "c", "g")
    val got = Skyline.frontier(d, col("c"), col("g"), 8)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }
}
