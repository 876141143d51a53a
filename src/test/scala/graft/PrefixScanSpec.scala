package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.PrefixScan

/** The two-level decomposition must equal the single-window spelling
  * exactly — sum and max, keyed and global, any partition count,
  * including P far larger than the row count.
  */
class PrefixScanSpec extends SparkSpec {

  private def gen(seed: Long): Seq[(String, Long, Long)] = {
    val g = for {
      n <- Gen.choose(0, 120)
      rows <- Gen.listOfN(n, for {
        k <- Gen.oneOf("a", "b", "c")
        v <- Gen.choose(-50L, 50L)
      } yield (k, v))
    } yield rows.zipWithIndex.map { case ((k, v), i) => (k, i.toLong * 7, v) }
    g.apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
  }

  test("prefix sum (inclusive, keyed) equals the window form") {
    import spark.implicits._
    (1 to 6).foreach { s =>
      val df = gen(1000L + s).toDF("k", "ord", "v")
      val w = Window.partitionBy($"k").orderBy($"ord")
        .rowsBetween(Window.unboundedPreceding, 0)
      val expect = df.withColumn("cum", sum($"v").over(w))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).sorted
      Seq(1, 4, 300).foreach { p =>
        val got = PrefixScan.scan(df, Seq("k"), "ord", "v", "cum", "sum", p)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).sorted
        assert(got.toSeq == expect.toSeq, s"seed $s p=$p")
      }
    }
  }

  test("prefix max (exclusive, global) equals the window form") {
    import spark.implicits._
    (1 to 6).foreach { s =>
      val df = gen(2000L + s).toDF("k", "ord", "v").drop("k")
      val w = Window.orderBy($"ord")
        .rowsBetween(Window.unboundedPreceding, -1)
      val expect = df.withColumn("m", max($"v").over(w))
        .collect().map(r => (r.getLong(0), if (r.isNullAt(2)) Long.MinValue else r.getLong(2))).sorted
      Seq(1, 4, 300).foreach { p =>
        val got = PrefixScan.scan(df, Nil, "ord", "v", "m", "max", p)
          .collect().map(r => (r.getLong(0), if (r.isNullAt(2)) Long.MinValue else r.getLong(2))).sorted
        assert(got.toSeq == expect.toSeq, s"seed $s p=$p")
      }
    }
  }

  test("prefix sum over TWO keys incl. nulls and a literal \"NULL\" key equals the window form") {
    // covers the multi-key composite lookup key: several key columns
    // concat_ws'd with pid, nulls mapped to the control-char-framed
    // sentinel — a group whose key is the STRING "NULL" must not
    // collide with a null-keyed group
    import spark.implicits._
    (1 to 4).foreach { s =>
      val rows = gen(4000L + s).map { case (k, o, v) =>
        val k2 = if (v % 5 == 0) None else if (v % 3 == 0) Some("NULL") else Some(s"g${v % 2}")
        (k, k2, o, v)
      }
      val df = rows.toDF("k1", "k2", "ord", "v")
      val w = Window.partitionBy($"k1", $"k2").orderBy($"ord")
        .rowsBetween(Window.unboundedPreceding, 0)
      val expect = df.withColumn("cum", sum($"v").over(w))
        .collect().map(r => (r.getString(0), Option(r.getString(1)), r.getLong(2), r.getLong(4))).sorted
      Seq(4, 300).foreach { p =>
        val got = PrefixScan.scan(df, Seq("k1", "k2"), "ord", "v", "cum", "sum", p)
          .collect().map(r => (r.getString(0), Option(r.getString(1)), r.getLong(2), r.getLong(4))).sorted
        assert(got.toSeq == expect.toSeq, s"seed $s p=$p")
      }
    }
  }

  test("concurrent consumers: the five PrefixScan queries run in parallel without planner errors") {
    // Regression for the AQE flake the lazy checkpoint fixed: the
    // local/carry branches' twin (keys, pid) exchanges over one shared
    // lineage intermittently threw task-level
    // INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND (~1 in 3) when several
    // PrefixScan plans executed concurrently in one session — exactly
    // how Verify and the driver run the catalog. Three rounds of all
    // five consumers in parallel; any planner/runtime error fails.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = "/root/testdata/sf0.001"
    // the five direct consumers, plus the funnel (PrefixScan inside
    // its packing stage AND repeated pinned-frame references — the
    // same repeated-relation topology) and the epoch-shard layout
    val names = Seq("q70_decile_stats", "q77_sequence_pack",
      "q105_skyline", "q157_cdf_normalize", "q160_weighted_median",
      "q166_pretrain_funnel", "q170_epoch_shuffle")
    (1 to 3).foreach { round =>
      val fs = names.map { n =>
        Future(graft.queries.Catalog.byName(n).run(spark, dir).count())
      }
      val counts = Await.result(Future.sequence(fs), 5.minutes)
      assert(counts.forall(_ > 0), s"round $round: $counts")
    }
  }

  test("pid derivation is a pure function: repartitioned input agrees") {
    import spark.implicits._
    val df = gen(3000L).toDF("k", "ord", "v")
    val a = PrefixScan.scan(df, Seq("k"), "ord", "v", "cum", "sum", 8)
      .select($"k", $"ord", $"cum")
    val b = PrefixScan.scan(df.repartition(11), Seq("k"), "ord", "v", "cum", "sum", 8)
      .select($"k", $"ord", $"cum")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }
}
