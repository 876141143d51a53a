package graft

import org.apache.spark.sql.functions._

import graft.operators.EquiDepth

/** Exact (ntile, q84's oracle contract) vs approximate (sketch cut
  * points, the 100 TB spelling) equi-depth histograms must agree
  * within the sketch's rank error.
  */
class EquiDepthSpec extends SparkSpec {

  test("approxHistogram bucket edges and counts track exactHistogram within sketch error") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val n = 20000
    val df = (1L to n.toLong).map(id => (id, rnd.nextDouble() * 1000.0))
      .toDF("id", "v").repartition(8)

    val exact = EquiDepth.exactHistogram(df, $"v", $"id", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val approx = EquiDepth.approxHistogram(df, $"v", 10, accuracy = 10000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))

    assert(exact.map(_._1).toSeq == (1L to 10L) &&
           approx.map(_._1).toSeq == (1L to 10L))
    // Partition of the input: every row lands in exactly one bucket.
    assert(exact.map(_._2).sum == n && approx.map(_._2).sum == n)
    // Rank error <= n/accuracy = 2 rows here; allow a loose 1% of the
    // per-bucket depth for count drift and 1% of the value range for
    // edge drift (uniform data: rank error ~ value error / range).
    exact.zip(approx).foreach { case ((_, en, elo, ehi), (_, an, alo, ahi)) =>
      assert(math.abs(en - an) <= n / 10 / 100 + 2,
        s"bucket depth drifted: exact $en vs approx $an")
      assert(math.abs(elo - alo) <= 10.0 && math.abs(ehi - ahi) <= 10.0,
        s"bucket edges drifted: [$elo,$ehi] vs [$alo,$ahi]")
    }
  }

  test("approxHistogram on empty and all-null input returns an empty histogram, not an NPE") {
    import spark.implicits._
    val empty = Seq.empty[Double].toDF("x")
    assert(EquiDepth.approxHistogram(empty, col("x"), 10).count() == 0)
    val allNull = Seq[Option[Double]](None, None, None).toDF("x")
    // percentile sketch sees no values -> zero cut points -> the only
    // rows that could land in bucket 1 are the null values, which the
    // count keeps but lo/hi/avg are null — accept either empty or a
    // single all-null-stats bucket; the contract is NO crash
    EquiDepth.approxHistogram(allNull, col("x"), 10).collect()
  }

  test("approxHistogram plan has no single-partition global sort") {
    import spark.implicits._
    val df = (1L to 5000L).map(id => (id, (id * 37 % 1000).toDouble))
      .toDF("id", "v").repartition(8)
    val plan = EquiDepth.approxHistogram(df, $"v", 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window stage:\n$plan")
  }
}
