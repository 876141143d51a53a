package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: FuzzyJoin.editDistance1SelfJoin equals the naive
  * O(n²) levenshtein filter for random strings over a tiny alphabet
  * (small alphabet + short strings force heavy signature collisions,
  * the regime where false-positive handling must be exact).
  */
class FuzzyJoinPropertySpec extends SparkSpec {

  private val genStrings: Gen[List[String]] = for {
    n <- Gen.choose(2, 30)
    ss <- Gen.listOfN(n, for {
      len <- Gen.choose(0, 6)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString)
  } yield ss

  test("signature join == naive levenshtein filter for random inputs") {
    import spark.implicits._
    val params = Gen.Parameters.default
    (1 to 10).foreach { i =>
      val strings = genStrings.apply(params, Seed(41L + i)).getOrElse(Nil)
      val df = strings.zipWithIndex.map { case (s, k) => (k.toLong, s) }
        .toDF("id", "nm")
      val fast = graft.operators.FuzzyJoin.editDistance1SelfJoin(df, "id", "nm")
        .orderBy("k1", "k2").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val naive = df.select($"id".as("k1"), $"nm".as("n1"))
        .join(df.select($"id".as("k2"), $"nm".as("n2")), $"k1" < $"k2")
        .withColumn("dist", levenshtein($"n1", $"n2").cast("long"))
        .filter($"dist" <= 1).select("k1", "k2", "dist")
        .orderBy("k1", "k2").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(fast.toSeq == naive.toSeq, s"mismatch on seed ${41L + i}: $strings")
    }
  }
}
