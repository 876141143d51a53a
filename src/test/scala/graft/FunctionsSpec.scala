package graft

class TopKAggregatorSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("TopKAggregator equals the window top-k across many partitions and ties") {
    import spark.implicits._
    // 4 groups x 500 rows over 13 partitions; duplicate scores force
    // the id tie-break through both reduce and merge paths.
    val df = spark.range(2000).repartition(13)
      .select(($"id" % 4).as("g"), ($"id" % 7).cast("double").as("score"), $"id")
    val topk = udaf(new graft.functions.TopKAggregator(5))
    val agg = df.groupBy($"g")
      .agg(topk($"score", $"id").as("top"))
      .select($"g", posexplode($"top").as(Seq("pos", "e")))
      .select($"g", ($"pos" + 1).cast("long").as("rank"), $"e._1".as("score"), $"e._2".as("id"))
      .orderBy($"g", $"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"score".desc, $"id")
    val win = df.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5).select($"g", $"rank".cast("long"), $"score", $"id")
      .orderBy($"g", $"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(agg.toSeq == win.toSeq)
  }

  test("TopKAggregator keeps groups smaller than k intact") {
    import spark.implicits._
    val df = Seq((1L, 2.0, 10L), (1L, 1.0, 11L)).toDF("g", "score", "id")
    val topk = udaf(new graft.functions.TopKAggregator(5))
    val out = df.groupBy($"g").agg(topk($"score", $"id").as("top"))
      .select(size($"top")).collect().head.getInt(0)
    assert(out == 2)
  }
}

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}

class FunctionsSpec extends SparkSpec {

  test("tokens / shingles / fingerprint") {
    import spark.implicits._
    val df = Seq(("a b c d", 1L), ("  A   b  ", 2L), ("x", 3L)).toDF("text", "id")
    val sh = df.filter($"id" === 1)
      .select(TF.shingles($"text", 2).as("s")).head().getSeq[String](0)
    assert(sh == Seq("a b", "b c", "c d"))
    // shorter than n -> single whole-text shingle
    val short = df.filter($"id" === 3)
      .select(TF.shingles($"text", 3).as("s")).head().getSeq[String](0)
    assert(short == Seq("x"))
    // fingerprint is whitespace/case-insensitive
    val fps = Seq(("a b", 1), ("  A   B ", 2)).toDF("text", "id")
      .select(TF.fingerprint($"text")).distinct().count()
    assert(fps == 1)
  }

  test("minhash signature shape and determinism; identical docs collide") {
    import spark.implicits._
    val df = Seq(("spark is fast and general", 1L),
                 ("spark is fast and general", 2L),
                 ("completely different words here entirely", 3L))
      .toDF("text", "id")
      .select($"id", TF.minhashSignature(array_distinct(TF.tokens($"text")), 32).as("sig"))
    val rows = df.collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    assert(rows.forall(_._2.length == 32))
    val byId = rows.toMap
    assert(byId(1L) == byId(2L))     // identical text -> identical signature
    assert(byId(1L) != byId(3L))     // different text -> different signature
  }

  test("native SyllableCount equals the HOF regex fold") {
    import spark.implicits._
    import graft.functions.SyllableCount
    val docs = Seq("the quick brown fox", "rhythm tsk 12345 ...",
                   "", "queueing aioli yyy", "a e i o u y")
      .toDF("text")
    val rows = docs.select(
        SyllableCount(TF.tokens(lower($"text"))).as("native"),
        aggregate(TF.tokens(lower($"text")), lit(0L),
          (acc, w) => acc + greatest(lit(1L),
            size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0))).cast("long")))
          .as("hof"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    // spot-check absolute values: vowel groups floored at 1 per token
    val v = docs.select(SyllableCount(TF.tokens(lower($"text")))).collect().map(_.getLong(0))
    assert(v(1) == 4L, // rhythm=1 (y), tsk/12345/... = 1 each (floor)
      s"expected 4 syllables for 'rhythm tsk 12345 ...', got ${v(1)}")
    assert(v(3) == 4L, // queueing: 'ueuei'=1 group; aioli: 'aio'+'i'=2; yyy: 1
      s"expected 4 for 'queueing aioli yyy', got ${v(3)}")
  }

  test("JaccardSortedLongs equals the array_intersect/array_union composition") {
    import spark.implicits._
    import graft.functions.JaccardSortedLongs
    // random-ish overlapping sets from the documents fixture shape:
    // hashed, deduped, sorted — exactly the q98 verify pipeline
    val docs = Seq(
      ("a b c d e", "c d e f g"),
      ("a b c", "x y z"),
      ("same same", "same same"),
      ("one", "one two three four")).toDF("ta", "tb")
      .select(
        array_sort(transform(array_distinct(TF.tokens($"ta")), x => xxhash64(x))).as("ha"),
        array_sort(transform(array_distinct(TF.tokens($"tb")), x => xxhash64(x))).as("hb"))
    val rows = docs.select(
        JaccardSortedLongs($"ha", $"hb").as("native"),
        (size(array_intersect($"ha", $"hb")).cast("double") /
         size(array_union($"ha", $"hb"))).as("builtin"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1), r.toString))
  }

  test("native SimHash64 is bit-identical to the HOF composition") {
    import spark.implicits._
    val docs = Seq("the quick brown fox", "pack my box with five dozen jugs",
                   "", "one", "repeated repeated repeated words words")
      .toDF("text")
    val rows = docs.select(TF.simhash64($"text").as("native"),
                           TF.simhash64Hof($"text").as("hof")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("simhash: equal for identical, hamming zero to self, small for near-dup") {
    import spark.implicits._
    val df = Seq(("the quick brown fox jumps over the lazy dog", 1L),
                 ("the quick brown fox jumps over the lazy dog", 2L),
                 ("the quick brown fox jumped over the lazy dog", 3L))
      .toDF("text", "id")
      .select($"id", TF.simhash64($"text").as("sig"))
    val sigs = df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sigs(1L) == sigs(2L))
    val ham = spark.range(1)
      .select(TF.hamming64(lit(sigs(1L)), lit(sigs(3L))).as("h"))
      .head().getLong(0)
    assert(ham >= 0 && ham <= 16, s"near-dup hamming was $ham")
    val self = spark.range(1)
      .select(TF.hamming64(lit(sigs(1L)), lit(sigs(1L)))).head().getLong(0)
    assert(self == 0)
  }

  test("vector math: dot, cosine, l2sq; native expression matches HOF fold bit-for-bit") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val row = df.select(
      VF.dot($"a", $"b").as("d"),
      VF.dotHof($"a", $"b").as("dh"),
      VF.cosine($"a", $"a").as("self"),
      VF.l2sq($"a", $"b").as("l2")).head()
    assert(row.getDouble(0) == 32.0)
    assert(row.getDouble(0) == row.getDouble(1))
    assert(math.abs(row.getDouble(2) - 1.0) < 1e-12)
    assert(row.getDouble(3) == 27.0)

    // bit-identity on irrational values, not just integers
    val v = Seq((Array(0.1, 0.2, 0.7, -0.3), Array(0.9, -0.4, 0.05, 2.2))).toDF("a", "b")
    val l2 = v.select(VF.l2sq($"a", $"b"), VF.l2sqHof($"a", $"b")).head()
    assert(l2.getDouble(0) == l2.getDouble(1),
           "native L2Sq must match the HOF fold bit-for-bit")
    val r2 = v.select(VF.dot($"a", $"b"), VF.dotHof($"a", $"b")).head()
    assert(java.lang.Double.doubleToLongBits(r2.getDouble(0)) ==
           java.lang.Double.doubleToLongBits(r2.getDouble(1)))
  }

  test("hyperplaneBucket: deterministic, dim-checked") {
    import spark.implicits._
    val df = Seq((1L, Array.fill(8)(0.25f)), (2L, Array.fill(8)(0.25f)))
      .toDF("id", "v")
    val buckets = df.select(VF.hyperplaneBucket($"v", bits = 6, dim = 8).as("b"))
      .collect().map(_.getLong(0))
    assert(buckets(0) == buckets(1))          // identical vectors collide
    assert(buckets(0) >= 0 && buckets(0) < (1L << 6))
    // a vector whose length != dim must raise, not silently truncate
    val bad = Seq((1L, Array.fill(12)(0.5f))).toDF("id", "v")
    val e = intercept[Exception] {
      bad.select(VF.hyperplaneBucket($"v", bits = 6, dim = 8)).collect()
    }
    assert(e.getMessage.contains("expected 8-dim"), e.getMessage)
  }

  test("quality metrics on a known document") {
    import spark.implicits._
    val row = Seq("Hello WORLD 123 !").toDF("text")
      .select(TF.tokenCount($"text").as("n"),
              TF.upperRatio($"text").as("u"),
              TF.digitRatio($"text").as("d"),
              TF.distinctTokenRatio($"text").as("r")).head()
    assert(row.getLong(0) == 4)
    assert(row.getDouble(1) == 6.0 / 17)   // ORLD + W + H... 6 uppercase chars
    assert(row.getDouble(2) == 3.0 / 17)
    assert(row.getDouble(3) == 1.0)
  }


  test("LshPlanner meets target recall with the most selective banding") {
    import graft.functions.LshPlanner
    val p = LshPlanner.plan(threshold = 0.8, targetRecall = 0.999, maxSignature = 64)
    assert(p.signatureLength <= 64)
    assert(p.detectProb(0.8) >= 0.999, s"plan $p prob ${p.detectProb(0.8)}")
    // more selective than 1-row bands: some false-candidate suppression
    assert(p.rowsPerBand >= 2, p.toString)
    // q33's hand-tuned setting is confirmed by the model
    val q33 = LshPlanner.Plan(64, 2)
    assert(q33.detectProb(0.5) > 0.999999)
    // and q15's ORIGINAL 16x4 setting is shown insufficient at J=0.8
    assert(LshPlanner.Plan(16, 4).detectProb(0.8) < 0.9999)
  }

  test("q22 LSH ANN recall vs brute-force ground truth (q13's exact ranking)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // Everything in q22 is deterministic (literal hyperplanes), so its
    // recall against exact top-3 cosine is a fixed property of the
    // test corpus. This corpus's true neighbors are WEAKLY similar
    // (cosine ~0.35, θ ≈ 69°): a single 6-bit probe has ~0.06
    // per-neighbor collision probability and measured recall 0 — the
    // 16-table union holds measured recall at 0.57 on both sf0.001
    // and sf0.01. Assert it never regresses below 0.5.
    val dir = "/root/testdata/sf0.001"
    val approx = graft.queries.Catalog.byName("q22_ann_lsh").run(spark, dir)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = graft.sources.Tables(spark, dir, "embeddings")
      .select($"vec_id", graft.functions.VectorFunctions.asDouble($"embedding").as("v"))
    val q = e.filter($"vec_id" < 10).select($"vec_id".as("qid"), $"v".as("qv"))
    val sims = q.join(e.select($"vec_id".as("nid"), $"v".as("nv")), $"nid" =!= $"qid")
      .select($"qid", $"nid",
        graft.functions.VectorFunctions.cosine($"qv", $"nv").as("sim"))
    val w = Window.partitionBy($"qid").orderBy($"sim".desc, $"nid")
    val exact = sims.withColumn("rank", row_number().over(w)).filter($"rank" <= 3)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.5, f"multi-table LSH recall degraded to $recall%.2f")
    // and what it does report is real: reported pairs are true
    // near-neighbors (exact top-20), not bucket noise
    val exact20 = sims.withColumn("rank", row_number().over(w)).filter($"rank" <= 20)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val noise = (approx -- exact20).size.toDouble / approx.size
    assert(noise <= 0.2, f"LSH noise fraction $noise%.2f; outside-top20: ${approx -- exact20}")
  }

  test("tokenJaccard: identical = 1, disjoint = 0") {
    import spark.implicits._
    val row = Seq(("a b c", "a b c", "x y z")).toDF("t1", "t2", "t3")
      .select(TF.tokenJaccard($"t1", $"t2"), TF.tokenJaccard($"t1", $"t3")).head()
    assert(row.getDouble(0) == 1.0)
    assert(row.getDouble(1) == 0.0)
  }
}
