package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: AsOfJoin.latestOnOrBefore equals the naive
  * per-row scan ("max right.t <= left.t per key, take its value"). */
class AsOfJoinPropertySpec extends SparkSpec {

  private val genCase: Gen[(List[(String, Long)], List[(String, Long, Long)])] = for {
    nl <- Gen.choose(0, 40)
    nr <- Gen.choose(0, 40)
    keys = Seq("a", "b", "c")
    left <- Gen.listOfN(nl, for {
      k <- Gen.oneOf(keys); t <- Gen.choose(0L, 50L)
    } yield (k, t))
    right <- Gen.listOfN(nr, for {
      k <- Gen.oneOf(keys); t <- Gen.choose(0L, 50L); v <- Gen.choose(0L, 999L)
    } yield (k, t, v))
  } yield (left, right)

  test("latestOnOrBefore == naive scan for random inputs") {
    import spark.implicits._
    val params = Gen.Parameters.default
    (1 to 12).foreach { i =>
      val (left, right) = genCase.apply(params, Seed(7L + i)).getOrElse((Nil, Nil))
      if (left.nonEmpty) {
        // dedup right to one row per (key, t) like q08 does — required
        // for a deterministic result on both sides
        val rightDedup = right.groupBy(r => (r._1, r._2))
          .map { case ((k, t), rows) => (k, t, rows.map(_._3).max) }.toList

        val expected = left.map { case (k, t) =>
          val candidates = rightDedup.filter(r => r._1 == k && r._2 <= t)
          val v = if (candidates.isEmpty) None
                  else Some(candidates.maxBy(_._2)._3)
          (k, t, v)
        }.sorted

        val l = left.toDF("k", "t")
        val r = rightDedup.toDF("rk", "rt", "rv")
        val got = graft.operators.AsOfJoin
          .latestOnOrBefore(l, r, "k", "rk", "t", "rt", "rv", "v")
          .collect()
          .map(row => (row.getString(0), row.getLong(1),
                       if (row.isNullAt(2)) None else Some(row.getLong(2))))
          .toList.sorted
        assert(got == expected, s"seed ${7L + i}")
      }
    }
  }
}
