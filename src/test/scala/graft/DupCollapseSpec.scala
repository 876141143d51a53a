package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.DupCollapse
import graft.queries.Catalog

/** The identical-content collapse (DupCollapse) must be output-
  * INVISIBLE: on a duplicate-heavy corpus, q17 (SimHash blocks), q33
  * (MinHash bands) and q138 (blocked ER, name-collapsed) must produce
  * exactly the pair set their pre-collapse all-members spellings
  * produce — the collapse removes the quadratic candidate growth,
  * never a pair. Each test builds a replicated corpus (every doc/name
  * duplicated, the growth mode the factor-10 ScaleBench measured at
  * 23–66x) and compares against an inline naive spelling.
  */
class DupCollapseSpec extends SparkSpec {

  import graft.functions.{TextFunctions => TF}

  /** sf0.001 documents with `reps` key-shifted replicas of every doc
    * (same text — the ScaleBench replica model), written as a
    * documents.parquet a catalog query can read. */
  private def replicatedDocsDir(reps: Int, docs: Int = 60): String = {
    import spark.implicits._
    val base = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").filter($"doc_id" < docs)
    val replicated = (0 until reps).map(r =>
      base.select(($"doc_id" + lit(r * 100000L)).as("doc_id"), $"text"))
      .reduce(_ unionByName _)
    val dir = java.nio.file.Files.createTempDirectory("dupcollapse").toString
    replicated.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("q17 with signature collapse equals the all-members block join on a replicated corpus") {
    import spark.implicits._
    val dir = replicatedDocsDir(reps = 3)
    val naive = {
      val sigs = graft.sources.Tables.documents(spark, dir)
        .select($"doc_id", TF.simhash64($"text").as("sig"))
      val blocks = sigs.select($"doc_id", $"sig",
        explode(sequence(lit(0), lit(3))).as("blk"))
        .withColumn("blkval", expr("shiftrightunsigned(sig, blk * 16)").bitwiseAND(lit(0xFFFFL)))
      blocks.as("a").join(blocks.as("b"),
          $"a.blk" === $"b.blk" && $"a.blkval" === $"b.blkval" &&
          $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("doc_a"), $"a.sig".as("sig_a"),
                $"b.doc_id".as("doc_b"), $"b.sig".as("sig_b"))
        .dropDuplicates("doc_a", "doc_b")
        .withColumn("hamming", TF.hamming64($"sig_a", $"sig_b"))
        .filter($"hamming" <= 12)
        .select($"doc_a", $"doc_b", $"hamming")
    }
    val got = Catalog.queries("q17_simhash_neardup")(spark, dir)
    assert(rows(got) == rows(naive))
    // replicas actually pair: every cross-replica identity pair present
    assert(got.filter($"hamming" === 0).count() >= 3L * 60)
  }

  test("q33 with content collapse equals the all-members band join on a replicated corpus") {
    import spark.implicits._
    val dir = replicatedDocsDir(reps = 3)
    val naive = {
      val lsh = graft.functions.LshPlanner.plan(
        threshold = 0.5, targetRecall = 0.9999, maxSignature = 128)
      val docs = graft.sources.Tables.documents(spark, dir)
        .select($"doc_id", array_distinct(TF.shingles($"text", 3)).as("sh"))
      val sig = docs.select($"doc_id",
        TF.minhashSignature($"sh", lsh.signatureLength).as("sig"))
      val bands = sig.select($"doc_id",
        explode(TF.minhashBands($"sig", lsh.bands, lsh.rowsPerBand)).as("band"))
      val cand = bands.as("a").join(bands.as("b"),
          $"a.band" === $"b.band" && $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
        .dropDuplicates("doc_a", "doc_b")
      val sa = docs.select($"doc_id".as("doc_a"), $"sh".as("sha"))
      val sb = docs.select($"doc_id".as("doc_b"), $"sh".as("shb"))
      cand.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("jaccard",
          size(array_intersect($"sha", $"shb")).cast("double") /
          size(array_union($"sha", $"shb")))
        .filter($"jaccard" >= 0.5)
        .select($"doc_a", $"doc_b", round($"jaccard", 4).as("jaccard_r"))
    }
    val got = Catalog.queries("q33_minhash_shingle")(spark, dir)
    assert(rows(got) == rows(naive))
    assert(got.filter($"jaccard_r" === 1.0).count() >= 3L * 60)
  }

  test("q138 name collapse equals the all-members blocked join; hot block fails loudly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q138rep").toString
    // replicate every part 3x (same name/brand, shifted key) — the
    // duplicate-heavy mode where the naive spelling is 9x the JW calls
    val base = graft.sources.Tables.part(spark, "/root/testdata/sf0.001")
    (0 until 3).map(r => base.withColumn("p_partkey", $"p_partkey" + lit(r * 100000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val naive = {
      val p = graft.sources.Tables.part(spark, dir)
        .withColumn("blk", concat($"p_brand", lit("|"), split($"p_name", " ").getItem(0)))
      val a = p.select($"p_partkey".as("k1"), $"p_name".as("n1"), $"blk")
      val b = p.select($"p_partkey".as("k2"), $"p_name".as("n2"), $"blk".as("blk2"))
      a.join(b, $"blk" === $"blk2" && $"k1" < $"k2" && $"n1" =!= $"n2")
        .withColumn("jw", graft.functions.JaroWinkler($"n1", $"n2"))
        .filter($"jw" >= 0.88)
        .select($"k1", $"k2", round($"jw", 4).as("jw_r"))
    }
    val got = Catalog.queries("q138_entity_resolution")(spark, dir)
    assert(rows(got) == rows(naive))

    // hot block: > 4096 DISTINCT names under one (brand, first-token)
    // key must fail with the block named, not go quadratic silently
    val hotDir = java.nio.file.Files.createTempDirectory("q138hot").toString
    spark.range(4100).select(
        $"id".as("p_partkey"),
        concat(lit("axle unit variant "), $"id").as("p_name"),
        lit("Brand#99").as("p_brand"))
      .write.mode("overwrite").parquet(s"$hotDir/part.parquet")
    val e = intercept[Exception] {
      Catalog.queries("q138_entity_resolution")(spark, hotDir)
        .write.format("noop").mode("overwrite").save()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    val msg = messages(e).mkString(" | ")
    assert(msg.contains("Brand#99|axle") && msg.contains("refine the blocking key"), msg)
  }

  test("expandCross and withinPairs reconstruct the exact member pair set") {
    import spark.implicits._
    // groups: fp by value; ids 1..6, values: a a a b b c
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"), (6L, "c"))
      .toDF("doc_id", "v")
    val annotated = DupCollapse.withRep(docs, "doc_id", xxhash64($"v"))
    val reps = DupCollapse.reps(annotated, "doc_id")
    assert(reps.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 4L, 6L))
    // rep pair machinery: pretend (a,b) and (b,c) are similar
    val repPairs = Seq((1L, 4L, 0.7), (4L, 6L, 0.6)).toDF("doc_a", "doc_b", "sim")
    val cross = DupCollapse.expandCross(repPairs, annotated, "doc_id")
      .as[(Long, Long, Double)].collect().toSet
    val wantCross = (for (x <- Seq(1L, 2L, 3L); y <- Seq(4L, 5L)) yield (x, y, 0.7)).toSet ++
      (for (x <- Seq(4L, 5L); y <- Seq(6L)) yield (x, y, 0.6)).toSet
    assert(cross == wantCross)
    val within = DupCollapse.withinPairs(annotated, "doc_id", lit(true), Seq("sim" -> lit(1.0)))
      .as[(Long, Long, Double)].collect().toSet
    assert(within == Set((1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 1.0), (4L, 5L, 1.0)))
  }
}
