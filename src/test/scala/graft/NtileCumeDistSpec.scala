package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{CumeDist, Ntile}

/** The shared closed-form decompositions must equal their window
  * spellings exactly — including ties, null values, and null keys
  * (the cases a plain equi-join annotate-back silently drops).
  */
class NtileCumeDistSpec extends SparkSpec {

  private def docs(n: Int, seed: Long) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val k = if (rnd.nextInt(10) == 0) None else Some("s" + rnd.nextInt(3))
      val v = if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(12).toLong)
      (i.toLong, k, v)
    }.toDF("id", "k", "v")
  }

  test("Ntile.closed equals the ntile window for every k — null keys and values included") {
    import spark.implicits._
    // the window keeps a null-key partition and ranks null values
    // first; the closed form must not lose either (null-safe size
    // match, value-derived pid treating null as the lowest bucket)
    val df = docs(200, 42L)
    Seq(1, 3, 10, 250).foreach { k =>
      val w = Window.partitionBy($"k").orderBy($"v", $"id")
      val expect = df.withColumn("b", ntile(k).over(w).cast("long"))
        .select($"id", $"b").as[(Long, Long)].collect().sorted
      val got = Ntile.closed(df, Seq("k"), "v", Seq("id"), k, "b", 8)
        .select($"id", $"b").as[(Long, Long)].collect().sorted
      assert(got.length == expect.length,
        s"k=$k: row count drifted — null rows dropped?")
      assert(got.toSeq == expect.toSeq, s"k=$k")
    }
  }

  test("CumeDist.annotate equals the cume_dist window, nulls included") {
    import spark.implicits._
    val df = docs(300, 7L)
    val w = Window.partitionBy($"k").orderBy($"v")
    val expect = df.withColumn("cd", cume_dist().over(w))
      .select($"id", $"cd").as[(Long, Double)].collect().sorted
    val got = CumeDist.annotate(df, Seq("k"), "v", "cs", "nr", 8)
      .select($"id", ($"cs".cast("double") / $"nr").as("cd"))
      .as[(Long, Double)].collect().sorted
    assert(got.length == expect.length,
      s"row count drifted: ${got.length} vs ${expect.length} — null rows dropped?")
    got.zip(expect).foreach { case ((gi, gv), (ei, ev)) =>
      assert(gi == ei && math.abs(gv - ev) < 1e-12, s"id $gi: $gv vs $ev")
    }
  }

  test("CumeDist.annotate global (no keys) equals the global window") {
    import spark.implicits._
    val df = docs(150, 11L).drop("k")
    val w = Window.orderBy($"v")
    val expect = df.withColumn("cd", cume_dist().over(w))
      .select($"id", $"cd").as[(Long, Double)].collect().sorted
    val got = CumeDist.annotate(df, Nil, "v", "cs", "nr", 8)
      .select($"id", ($"cs".cast("double") / $"nr").as("cd"))
      .as[(Long, Double)].collect().sorted
    assert(got.toSeq.map(_._1) == expect.toSeq.map(_._1))
    got.zip(expect).foreach { case ((_, gv), (_, ev)) =>
      assert(math.abs(gv - ev) < 1e-12)
    }
  }
}
