package graft

import org.apache.spark.sql.functions._

import graft.functions.JaroWinkler

/** Pins the native JaroWinkler expression to the conventional
  * semantics (match window, transposition halving, 0.7 boost
  * threshold, 4-char prefix cap) via the published worked examples
  * and the edge cases that distinguish implementation variants. The
  * q138 oracle hash-match additionally pins it bit-for-bit against
  * DuckDB's jaro_winkler_similarity over the whole part corpus.
  */
class JaroWinklerSpec extends SparkSpec {

  private val eps = 1e-12

  test("worked examples match the conventional Jaro-Winkler values") {
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("CRATE", "TRACE", 0.7333333333333334),
      ("apple inc", "apple incorporated", 0.9))
    for ((a, b, want) <- cases) {
      val got = JaroWinkler.similarity(a, b)
      assert(math.abs(got - want) < eps, s"($a, $b): got $got want $want")
    }
  }

  test("edge cases: equality, empties, disjoint, tight window") {
    assert(JaroWinkler.similarity("abc", "abc") == 1.0)
    assert(JaroWinkler.similarity("x", "x") == 1.0)
    assert(JaroWinkler.similarity("", "") == 1.0)
    assert(JaroWinkler.similarity("a", "") == 0.0)
    assert(JaroWinkler.similarity("abc", "xyz") == 0.0)
    // window = max(2,2)/2 - 1 = 0: adjacent transposition can't match
    assert(JaroWinkler.similarity("ab", "ba") == 0.0)
    // symmetric
    assert(math.abs(JaroWinkler.similarity("DIXON", "DICKSONX") -
                    JaroWinkler.similarity("DICKSONX", "DIXON")) < eps)
  }

  test("prefix boost applies only above the 0.7 jaro threshold") {
    // jaro("abcdefgh","abzzzzzz") = (2/8 + 2/8 + 1)/3 = 0.5 <= 0.7:
    // the 2-char common prefix must NOT boost.
    assert(math.abs(JaroWinkler.similarity("abcdefgh", "abzzzzzz") - 0.5) < eps)
    // jaro("abcdx","abcdy") = (4/5+4/5+1)/3 = 0.8666... > 0.7, l=4:
    // boosted to 0.92.
    assert(math.abs(JaroWinkler.similarity("abcdx", "abcdy") - 0.92) < eps)
  }

  test("properties over random strings: range, identity, symmetry, prefix monotonicity") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      n <- Gen.choose(0, 12)
      cs <- Gen.listOfN(n, Gen.oneOf("abcdez 19!".toSeq))
    } yield cs.mkString
    val params = Gen.Parameters.default
    val strs = (1 to 80).map(i => gen.apply(params, Seed(31L + i)).getOrElse(""))
    for (a <- strs.take(40); b <- strs.drop(40)) {
      val s = JaroWinkler.similarity(a, b)
      assert(s >= 0.0 && s <= 1.0, s"range violated: ($a, $b) -> $s")
      assert(s == JaroWinkler.similarity(b, a), s"asymmetric: ($a, $b)")
    }
    for (a <- strs) assert(JaroWinkler.similarity(a, a) == 1.0)
  }

  test("column form evaluates the same function, null-safe") {
    import spark.implicits._
    val df = Seq(("MARTHA", "MARHTA"), ("abc", "xyz"))
      .toDF("a", "b")
      .select(JaroWinkler(col("a"), col("b")).as("jw"))
    val got = df.as[Double].collect().sorted
    assert(math.abs(got(0) - 0.0) < eps)
    assert(math.abs(got(1) - 0.9611111111111111) < eps)
    val n = Seq((Option("abc"), Option.empty[String])).toDF("a", "b")
      .select(JaroWinkler(col("a"), col("b")).as("jw"))
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("q138's 16-char verify resolution is clamp-identical on the oracle corpus") {
    import spark.implicits._
    // p_name ≤ 12 chars at every SF, so substring(_, 1, 16) is the
    // identity there — the clamp only ever binds on corpora with
    // longer names (e.g. the replica-prefixed mutate model), where it
    // bounds the O(len²) per-pair cost by contract.
    val dir = "/root/testdata/sf0.001"
    val p = graft.sources.Tables(spark, dir, "part")
    assert(p.select(max(length($"p_name"))).collect()(0).getInt(0) <= 16)
    val clamped = graft.queries.Catalog.queries("q138_entity_resolution")(spark, dir)
      .collect().map(_.toSeq).toSet
    val unclamped = {
      val blk = p.withColumn("blk", concat($"p_brand", lit("|"),
        split($"p_name", " ").getItem(0)))
      val names = blk.select($"blk", $"p_name").distinct()
      val np = names.as("x").join(names.as("y"),
          $"x.blk" === $"y.blk" && $"x.p_name" < $"y.p_name")
        .select($"x.blk".as("blk"), $"x.p_name".as("n1"), $"y.p_name".as("n2"))
        .withColumn("jw", JaroWinkler($"n1", $"n2"))
        .filter($"jw" >= 0.88)
      np.join(blk.select($"blk", $"p_name".as("n1"), $"p_partkey".as("ka")), Seq("blk", "n1"))
        .join(blk.select($"blk", $"p_name".as("n2"), $"p_partkey".as("kb")), Seq("blk", "n2"))
        .select(least($"ka", $"kb").as("k1"), greatest($"ka", $"kb").as("k2"),
                round($"jw", 4).as("jw_r"))
        .collect().map(_.toSeq).toSet
    }
    assert(clamped == unclamped && clamped.nonEmpty)
  }
}
