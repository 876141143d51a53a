package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin
import graft.sinks.Sinks

class ScaleToolsSpec extends SparkSpec {

  test("salted join equals plain join result") {
    import spark.implicits._
    // one hot key (90% of rows) + tail
    val left = ((1 to 900).map(i => ("hot", i.toLong)) ++
                (1 to 100).map(i => (s"k$i", i.toLong)))
      .toDF("k", "lv")
    val right = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("rk", "rv")

    val plain = left.join(right, $"k" === $"rk")
      .select($"k", $"lv", $"rv").collect().map(_.toString).sorted
    val salted = SkewJoin.saltedInner(left, right, "k", "rk", buckets = 8)
      .select($"k", $"lv", $"rv").collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)
    assert(plain.length == 902) // 900 hot + k1 + k2
    // the salt must actually spread the hot key over several buckets
    val spread = left
      .withColumn("__salt", pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(8)))
      .filter($"k" === "hot").select($"__salt").distinct().count()
    assert(spread > 4, s"hot key only reached $spread of 8 salt buckets")
  }

  test("salted join works when both key columns share a name") {
    import spark.implicits._
    val left = (1 to 50).map(i => ("hot", i.toLong)).toDF("id", "lv")
    val right = Seq(("hot", "H"), ("cold", "C")).toDF("id", "rv")
    val n = SkewJoin.saltedInner(left, right, "id", "id", buckets = 4)
      .select($"lv", $"rv").count()
    assert(n == 50)
  }

  test("date-partitioned sink prunes partitions on read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sink").toString + "/events"
    val df = Seq(
      ("2024-01-01 10:00:00", 1L), ("2024-01-02 11:00:00", 2L),
      ("2024-01-02 12:00:00", 3L))
      .toDF("ts_s", "id").withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    Sinks.writeDatePartitioned(df, "ts", dir)

    val read = spark.read.parquet(dir).filter($"p_date" === "2024-01-02")
    assert(read.count() == 2)
    // partition filter must reach the scan (pruning, not post-filter)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("p_date"), plan)
  }

  test("bucketed tables join without exchange") {
    import spark.implicits._
    val warehouse = Files.createTempDirectory("wh").toString
    val a = (1L to 100L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (1L to 100L).map(i => (i, s"b$i")).toDF("k", "vb")
    Sinks.writeBucketed(a, "k", 4, "bucketed_a", s"$warehouse/a")
    Sinks.writeBucketed(b, "k", 4, "bucketed_b", s"$warehouse/b")

    // tiny tables would broadcast (also shuffle-free, but that's not
    // the property under test) — force the sort-merge path
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bucketed_a").join(spark.table("bucketed_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)
      assert(joined.count() == 100)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    spark.sql("DROP TABLE IF EXISTS bucketed_a")
    spark.sql("DROP TABLE IF EXISTS bucketed_b")
  }

  test("observe() rides the action: pipeline metrics without a second scan") {
    import spark.implicits._
    import org.apache.spark.sql.Observation
    // The 100 TB observability hook: data-quality counters (rows seen,
    // nulls dropped, bytes of text) are accumulated ON the existing
    // pass via Dataset.observe — no .count()/.filter().count() second
    // job over the input. Same mechanism feeds streaming progress
    // events (QueryProgressEvent.observedMetrics) in the CDC path.
    val obs = Observation("quality")
    val docs = Seq(
      (1L, "good text"), (2L, null.asInstanceOf[String]), (3L, "more text"))
      .toDF("id", "text")
    val cleaned = docs
      .observe(obs,
        count(lit(1)).as("rows_in"),
        count($"text").as("rows_with_text"),
        sum(length($"text")).as("total_chars"))
      .filter($"text".isNotNull)
    assert(cleaned.count() == 2)
    val m = obs.get
    assert(m("rows_in") == 3L, s"got $m")
    assert(m("rows_with_text") == 2L, s"got $m")
    assert(m("total_chars") == 18L, s"got $m")
  }

  test("ORC, CSV and JSON sources round-trip the engine's row schema") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // Interchange-format coverage: parquet is the engine's primary
    // columnar format (every query reads it), but a complete source
    // surface also reads/writes ORC (the other columnar on the
    // classpath), CSV and JSON line files — e.g. raw crawl drops or
    // exports from engines that don't speak parquet.
    val dir = Files.createTempDirectory("fmt").toString
    val df = Seq(
      (1L, "alpha", 3.5, "2024-01-01 10:00:00"),
      (2L, "beta", -0.25, "2024-02-03 04:05:06"),
      (3L, null.asInstanceOf[String], 0.0, "2024-12-31 23:59:59"))
      .toDF("id", "name", "score", "ts_s")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")

    // ORC: schema embedded, types preserved exactly (columnar, splittable)
    df.write.mode("overwrite").orc(s"$dir/orc")
    val orc = spark.read.orc(s"$dir/orc")
    // files can't promise non-null, so the reader relaxes nullability;
    // names and types must survive exactly
    assert(orc.schema.map(f => (f.name, f.dataType)) ==
           df.schema.map(f => (f.name, f.dataType)))
    assert(orc.orderBy($"id").collect().toSeq == df.orderBy($"id").collect().toSeq)

    // CSV: schema-on-read with an explicit schema (no inference scan —
    // at 100 TB inference is a full extra pass)
    df.write.mode("overwrite").option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss").csv(s"$dir/csv")
    val csvSchema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("ts", TimestampType)))
    val csv = spark.read.schema(csvSchema).option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss").csv(s"$dir/csv")
    assert(csv.orderBy($"id").collect().toSeq == df.orderBy($"id").collect().toSeq)

    // JSON lines: the envelope-interchange format of the CDC path
    df.write.mode("overwrite").json(s"$dir/json")
    val json = spark.read.schema(csvSchema).json(s"$dir/json")
    assert(json.orderBy($"id").collect().toSeq == df.orderBy($"id").collect().toSeq)
  }

  test("schema evolution: mergeSchema unions parquet batches written years apart") {
    import spark.implicits._
    // A 100 TB fact table accretes columns over years; old files must
    // stay readable with new columns null-filled, without a rewrite.
    val dir = Files.createTempDirectory("evo").toString + "/facts"
    Seq((1L, "a")).toDF("id", "v1")
      .write.parquet(s"$dir/p_date=2023-01-01")
    Seq((2L, "b", 9.5)).toDF("id", "v1", "v2_added_later")
      .write.parquet(s"$dir/p_date=2024-01-01")

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "v1", "v2_added_later", "p_date"))
    val rows = merged.orderBy($"id")
      .select($"id", $"v1", $"v2_added_later").collect()
    assert(rows(0).getLong(0) == 1L && rows(0).isNullAt(2), rows.toSeq)
    assert(rows(1).getDouble(2) == 9.5, rows.toSeq)
    // pushdown still reaches the evolved scan: filter on the new column
    assert(merged.filter($"v2_added_later" > 5).count() == 1)
  }

  test("z-order layout prunes 2-D box queries where a linear sort cannot") {
    import spark.implicits._
    import graft.functions.ZOrder
    // 64x64 grid of points; files = 16 equal row ranges after sorting.
    // A file can be skipped for a box query iff its [min,max] envelope
    // on x AND y misses the box — exactly what parquet row-group /
    // manifest min-max stats give a scan planner for free.
    val pts = (for { x <- 0 until 64; y <- 0 until 64 } yield (x, y))
      .toDF("x", "y")
    def fileEnvelopes(sorted: org.apache.spark.sql.DataFrame) = {
      sorted
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy($"sk", $"x", $"y")))
        .withColumn("file", (($"rn" - 1) / lit(256)).cast("int")) // 4096/16
        .groupBy($"file")
        .agg(min($"x").as("x0"), max($"x").as("x1"),
             min($"y").as("y0"), max($"y").as("y1"))
        .collect()
        .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    }
    // box query: x in [8,15], y in [8,15] (1.5% of the domain)
    def survivors(env: Array[(Int, Int, Int, Int)]): Int =
      env.count { case (x0, x1, y0, y1) =>
        x1 >= 8 && x0 <= 15 && y1 >= 8 && y0 <= 15 }

    val zEnv = fileEnvelopes(pts.withColumn("sk", ZOrder.zValue($"x", $"y", 6)))
    val linEnv = fileEnvelopes(pts.withColumn("sk", $"x".cast("long")))
    // linear-by-x: every x-matching file spans all of y -> no y pruning;
    // z-order: both dims tight -> the box touches very few files
    assert(survivors(zEnv) < survivors(linEnv),
      s"z-order should prune harder: z=${survivors(zEnv)} linear=${survivors(linEnv)}")
    assert(survivors(zEnv) <= 2, s"z-order box should hit <=2 of 16 files, got ${survivors(zEnv)}")
  }
  test("ScaleBench --mutate invariants: replica-0 identity, disjoint shingles, exact isometry") {
    import spark.implicits._
    import org.apache.spark.sql.functions._

    // documents: token-prefix mutation
    val docs = Seq(
      (1L, "the quick brown fox jumps", "en", "src0", 25L),
      (2L, null.asInstanceOf[String], "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .withColumn("__rep", explode(sequence(lit(0), lit(2))))
    val md = ScaleBench.mutateContent("documents", docs).cache()
    // replica 0 keeps the original bytes; nulls stay null everywhere
    assert(md.filter($"__rep" === 0 && $"doc_id" === 1)
      .select($"text").as[String].head() == "the quick brown fox jumps")
    assert(md.filter($"doc_id" === 2 && $"text".isNotNull).count() == 0)
    // token count preserved, token sets disjoint across replicas
    val toks = md.filter($"doc_id" === 1)
      .select($"__rep", split($"text", "\\s+").as("tk"))
      .as[(Int, Seq[String])].collect().toMap
    assert(toks.values.forall(_.length == 5), s"token counts drifted: $toks")
    assert(toks(1).toSet.intersect(toks(2).toSet).isEmpty &&
           toks(0).toSet.intersect(toks(1).toSet).isEmpty,
      s"replica tokens must be disjoint: $toks")
    assert(toks(1).forall(_.startsWith("r1_")) && toks(2).forall(_.startsWith("r2_")))

    // embeddings: sign-flip isometry — every within-replica dot product
    // and norm is BIT-exact vs replica 0 (diagonal +-1 is orthogonal and
    // the summation order is unchanged)
    val vecs = Seq(
      (1L, Array(0.25f, -1.5f, 3.0f, 0.125f), 0),
      (2L, Array(-2.0f, 0.5f, -0.75f, 4.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .withColumn("__rep", explode(sequence(lit(0), lit(2))))
    val me = ScaleBench.mutateContent("embeddings", vecs)
      .select($"__rep", $"vec_id", $"embedding").as[(Int, Long, Array[Float])]
      .collect().groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    for (rep <- 1 to 2) {
      val Seq(a0, b0) = me(0).toSeq; val Seq(a, b) = me(rep).toSeq
      assert(dot(a, a) == dot(a0, a0) && dot(b, b) == dot(b0, b0),
        s"replica $rep norms drifted")
      assert(dot(a, b) == dot(a0, b0), s"replica $rep pairwise dot drifted")
      // and the replica is actually scrambled, not a copy or global negation
      assert(!a.sameElements(a0) && !a.sameElements(a0.map(x => -x)),
        s"replica $rep embedding not scrambled")
    }
    md.unpersist()
  }

}
