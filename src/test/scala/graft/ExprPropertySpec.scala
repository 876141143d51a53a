package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{JaccardSortedLongs, SyllableCount, TextFunctions => TF}

/** Property tests for the round-5 native expressions against their
  * built-in compositions, over adversarial random inputs (empty
  * strings, punctuation-only tokens, single-char vocabularies —
  * the shapes where a hand-rolled scan diverges from the regex/set
  * semantics if anything is off by one).
  */
class ExprPropertySpec extends SparkSpec {

  private val genDoc: Gen[String] = for {
    n <- Gen.choose(0, 12)
    ws <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 8)
      cs <- Gen.listOfN(len, Gen.oneOf("aeiouybcdzq!.,9 ".toSeq))
    } yield cs.mkString)
  } yield ws.mkString(" ")

  test("SyllableCount == HOF regex fold for random documents") {
    import spark.implicits._
    val params = Gen.Parameters.default
    val docs = (1 to 60).map(i =>
      genDoc.apply(params, Seed(7L + i)).getOrElse("")).toDF("text")
    val rows = docs.select(
        SyllableCount(TF.tokens(lower($"text"))).as("native"),
        aggregate(TF.tokens(lower($"text")), lit(0L),
          (acc, w) => acc + greatest(lit(1L),
            size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0))).cast("long")))
          .as("hof"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("JaccardSortedLongs == array_intersect/array_union for random sets") {
    import spark.implicits._
    val genSet: Gen[List[Long]] = for {
      n <- Gen.choose(0, 20)
      xs <- Gen.listOfN(n, Gen.choose(-5L, 15L)) // tight range -> heavy overlap
    } yield xs
    val params = Gen.Parameters.default
    val pairs = (1 to 60).map { i =>
      (genSet.apply(params, Seed(100L + i)).getOrElse(Nil),
       genSet.apply(params, Seed(500L + i)).getOrElse(Nil))
    }.toDF("xa", "xb")
      // the operator's input contract: sorted distinct long arrays
      .select(array_sort(array_distinct($"xa")).as("ha"),
              array_sort(array_distinct($"xb")).as("hb"))
    val rows = pairs.select(
        JaccardSortedLongs($"ha", $"hb").as("native"),
        when(size(array_union($"ha", $"hb")) === 0, lit(1.0))
          .otherwise(size(array_intersect($"ha", $"hb")).cast("double") /
                     size(array_union($"ha", $"hb"))).as("builtin"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1), r.toString))
  }
}
