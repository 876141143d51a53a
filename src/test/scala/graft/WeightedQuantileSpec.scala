package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.WeightedQuantile

class WeightedQuantileSpec extends SparkSpec {

  // Ties on value (both within and across groups), uneven weights,
  // and a group whose crossing lands exactly ON a cumulative boundary
  // (g2 at q=0.5: cum 4 of 8 at v=2.0 — >= picks 2.0, not 3.0).
  private val rows = Seq(
    ("g1", 1.0, 2.0), ("g1", 2.0, 1.0), ("g1", 2.0, 1.0), ("g1", 5.0, 3.0),
    ("g2", 1.0, 1.0), ("g2", 2.0, 3.0), ("g2", 3.0, 4.0),
    ("g3", 7.0, 10.0))

  private def df(rs: Seq[(String, Double, Double)]): DataFrame = {
    import spark.implicits._
    rs.toDF("g", "v", "wt")
  }

  /** The definition, computed directly: min v with cumW(<=v) >= q*tot. */
  private def naive(rs: Seq[(String, Double, Double)], q: Double): Map[String, Double] =
    rs.groupBy(_._1).map { case (g, grp) =>
      val byV = grp.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
      val tot = byV.map(_._2).sum
      var cum = 0.0
      g -> byV.collectFirst { case (v, w) if { cum += w; cum >= tot * q } => v }.get
    }

  private def got(d: DataFrame): Map[String, Double] =
    d.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("exact equals the naive cumulative definition at several q") {
    for (q <- Seq(0.1, 0.25, 0.5, 0.9, 1.0))
      assert(got(WeightedQuantile.exact(df(rows), Seq("g"), col("v"), col("wt"), q))
        == naive(rows, q), s"q=$q")
  }

  test("exact equals the row-level cumulative window spelling") {
    // the pre-collapse plan q160 used to run: cumulative over every ROW
    val d = df(rows)
    val w = Window.partitionBy(col("g")).orderBy(col("v"))
    val rowLevel = d
      .withColumn("cumw", sum(col("wt"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("totw", sum(col("wt")).over(Window.partitionBy(col("g"))))
      .filter(col("cumw") >= col("totw") / 2)
      .groupBy(col("g")).agg(min(col("v")).as("wq"))
    assert(got(WeightedQuantile.exact(d, Seq("g"), col("v"), col("wt"), 0.5))
      == got(rowLevel))
  }

  test("exact keeps a null-keyed group (null-safe totals match, like Ntile/CumeDist)") {
    import spark.implicits._
    // groupBy keeps a null-keyed group and the window spelling scans
    // it; the totals annotate-back must be `<=>`, or the null group
    // silently vanishes from the output
    val d = Seq((Some("g1"), 1.0, 1.0), (Some("g1"), 3.0, 1.0),
      (None: Option[String], 2.0, 1.0), (None: Option[String], 4.0, 3.0))
      .toDF("g", "v", "wt")
    val out = WeightedQuantile.exact(d, Seq("g"), col("v"), col("wt"), 0.5)
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    // null group: weights (2.0->1, 4.0->3), total 4, q=0.5 crosses at 4.0
    assert(out == Map(Some("g1") -> 1.0, None -> 4.0))
  }

  test("property: exact matches naive on randomized weighted data") {
    val rnd = new scala.util.Random(42)
    val rs = Seq.fill(400) {
      (s"g${rnd.nextInt(4)}", (rnd.nextInt(20) + 1).toDouble, (rnd.nextInt(10) + 1).toDouble)
    }
    for (q <- Seq(0.05, 0.5, 0.75, 0.95))
      assert(got(WeightedQuantile.exact(df(rs), Seq("g"), col("v"), col("wt"), q))
        == naive(rs, q), s"q=$q")
  }

  test("approx with fine cuts and a small grid equals exact") {
    // every distinct value gets its own sketch cut: the weight-CDF is
    // then exact and approx must agree with exact everywhere
    for (q <- Seq(0.25, 0.5, 0.9)) {
      val e = got(WeightedQuantile.exact(df(rows), Seq("g"), col("v"), col("wt"), q))
      val a = got(WeightedQuantile.approx(df(rows), Seq("g"), col("v"), col("wt"), q,
        cuts = 1000, accuracy = 10000))
      assert(a == e, s"q=$q: approx $a != exact $e")
    }
  }

  test("approx CDF position stays within the bucket-weight bound (lineitem)") {
    val li = graft.sources.Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"),
        col("l_quantity").as("wt"))
    val tot = li.groupBy(col("g")).agg(sum(col("wt")).as("tot"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (q <- Seq(0.25, 0.5, 0.9)) {
      val a = got(WeightedQuantile.approx(li, Seq("g"), col("v"), col("wt"), q, cuts = 64))
      a.foreach { case (g, v) =>
        val below = li.filter(col("g") === g && col("v") <= v)
          .agg(sum(col("wt"))).head().getDouble(0)
        val cdf = below / tot(g)
        // one bucket holds ~1/64 of the rows; quantity is 1..50
        // uniform-ish so bucket weight share stays well under 5%
        assert(math.abs(cdf - q) <= 0.05,
          s"q=$q group=$g: approx value $v sits at CDF $cdf")
      }
      // and the approx answer is never below exact by more than one
      // bucket either: exact >= approx always (approx returns the
      // crossing bucket's smallest value)
      val e = got(WeightedQuantile.exact(li, Seq("g"), col("v"), col("wt"), q))
      a.foreach { case (g, v) => assert(v <= e(g), s"q=$q group=$g") }
    }
  }

  test("null values and weights are excluded, like percentile functions") {
    import spark.implicits._
    val base = Seq(
      ("a", Some(1.0), Some(1.0)), ("a", Some(2.0), Some(1.0)),
      ("a", Some(3.0), Some(1.0)), ("b", Some(10.0), Some(2.0)),
      ("b", Some(20.0), Some(2.0)))
    val noisy = base ++ Seq(
      ("a", None, Some(99.0)),      // null value, heavy weight
      ("a", Some(0.5), None),       // null weight
      ("b", None, None))
    def med(rows: Seq[(String, Option[Double], Option[Double])]) =
      WeightedQuantile.exact(rows.toDF("g", "v", "wt"),
          Seq("g"), col("v"), col("wt"), 0.5)
        .as[(String, Double)].collect().toMap
    assert(med(noisy) == med(base),
      "null value/weight rows changed the exact weighted median")
    val approxClean = WeightedQuantile.approx(noisy.toDF("g", "v", "wt"),
        Seq("g"), col("v"), col("wt"), 0.5, cuts = 4)
      .as[(String, Double)].collect().toMap
    val approxBase = WeightedQuantile.approx(base.toDF("g", "v", "wt"),
        Seq("g"), col("v"), col("wt"), 0.5, cuts = 4)
      .as[(String, Double)].collect().toMap
    assert(approxClean == approxBase,
      "null value/weight rows changed the approx weighted median")
  }
}
