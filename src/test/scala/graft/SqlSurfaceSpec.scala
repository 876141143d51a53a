package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The same engine surface through `spark.sql(...)`: registered temp
  * views + SQL text produce the same results (and plans) as the
  * DataFrame API. */
class SqlSurfaceSpec extends SparkSpec {

  test("spark.sql over registered views matches the DataFrame catalog query") {
    val dir = "/root/testdata/sf0.001"
    graft.sources.Tables.registerAll(spark, dir)
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |       count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
      .collect().map(_.toString)
    val viaDf = graft.queries.Catalog.queries("q02_group_agg")(spark, dir)
      .selectExpr("l_returnflag", "l_linestatus", "sum_qty", "count_order")
      .collect().map(_.toString)
    assert(viaSql.toSeq == viaDf.toSeq)
  }

  test("IntervalJoin property: equals naive O(n^2) band join") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val params = Gen.Parameters.default
    val gen = for {
      n <- Gen.choose(0, 60)
      rows <- Gen.listOfN(n, for {
        k <- Gen.oneOf(1L, 2L, 3L)
        t <- Gen.choose(0L, 400L)
      } yield (k, t))
    } yield rows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }

    (1 to 10).foreach { i =>
      val rows = gen.apply(params, Seed(99L + i)).getOrElse(Nil)
      if (rows.nonEmpty) {
        val w = 60L
        val expected = (for {
          a <- rows; b <- rows
          if a._1 == b._1
          if (b._2 > a._2 || (b._2 == a._2 && a._3 < b._3)) && b._2 <= a._2 + w
        } yield (a._1, a._3, b._3, b._2 - a._2)).sorted

        val df = rows.toDF("user_id", "sec", "event_id")
          .withColumn("ts", timestamp_seconds($"sec"))
        val got = graft.operators.IntervalJoin
          .selfPairsWithin(df, "user_id", "ts", "event_id", w)
          .select("user_id", "first_id", "second_id", "gap_seconds")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toList.sorted
        assert(got == expected, s"seed ${99L + i}")
      }
    }
  }

  test("GraftExtensions registers the custom expressions as SQL functions") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // dot product: plain literal check
    val dot = spark.sql(
      "SELECT graft_dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect().head.getDouble(0)
    assert(dot == 32.0)
    // hamming: popcount of xor
    val ham = spark.sql("SELECT graft_hamming64(7L, 1L) AS h").collect().head.getLong(0)
    assert(ham == 2L)
    // shingles / minhash / simhash: SQL results bit-identical to the
    // Column-API expressions over the same input
    val df = Seq("a b c d", "x y z").toDF("text")
    val viaCol = df.select(
        graft.functions.TextFunctions.shingles($"text", 2).as("sh"),
        graft.functions.TextFunctions.minhashSignature(
          graft.functions.TextFunctions.tokens($"text"), 8).as("mh"),
        graft.functions.TextFunctions.simhash64($"text").as("si"))
      .collect().map(_.toString)
    df.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT graft_word_shingles(split(trim(text), '\\s+'), 2) AS sh,
        |       graft_minhash_signature(split(trim(text), '\\s+'), 8) AS mh,
        |       graft_simhash64(split(trim(text), '\\s+')) AS si
        |FROM ext_docs""".stripMargin)
      .collect().map(_.toString)
    assert(viaSql.toSeq == viaCol.toSeq)
    // non-literal k is rejected with a clear error
    val err = intercept[Exception] {
      spark.sql("SELECT graft_word_shingles(array('a'), cast(id AS int)) FROM range(1)")
        .collect()
    }
    assert(err.getMessage.contains("integer literal"))
    // jaro-winkler: the MARTHA/MARHTA worked example
    val jw = spark.sql("SELECT graft_jaro_winkler('MARTHA', 'MARHTA') AS jw")
      .collect().head.getDouble(0)
    assert(math.abs(jw - 0.9611111111111111) < 1e-12)
    // l2sq: (1-4)^2 + (2-5)^2 + (3-6)^2 = 27
    val l2 = spark.sql(
      "SELECT graft_l2sq(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS l")
      .collect().head.getDouble(0)
    assert(l2 == 27.0)
    // syllables: vowel-group estimate, same as the Column API
    val syl = spark.sql(
      "SELECT graft_syllables(split('beautiful day', ' ')) AS s")
      .collect().head.getLong(0)
    val sylCol = Seq("beautiful day").toDF("t")
      .select(graft.functions.SyllableCount(split($"t", " ")))
      .collect().head.getLong(0)
    assert(syl == sylCol && syl > 0L)
    // jaccard over sorted bigint arrays: |{2,3}| / |{1,2,3,4}| = 0.5
    val jac = spark.sql(
      "SELECT graft_jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j")
      .collect().head.getDouble(0)
    assert(jac == 0.5)
  }
}
