package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("multimodal pipeline: payload plumbing + stub decode schema and determinism") {
    import spark.implicits._
    val docs = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")
    val out = Multimodal.pipeline(spark, docs).orderBy("doc_id")
    assert(out.columns.toSeq ==
      Seq("doc_id", "kind", "n_bytes", "sha256", "width", "height", "features"))

    val rows = out.collect()
    val r1 = rows(0)
    assert(r1.getLong(0) == 1L && r1.getString(1) == "image")
    assert(r1.getLong(2) == 11L)              // "hello world" is 11 bytes
    assert(r1.getInt(4) == 1 + 11 % 640)
    assert(r1.getSeq[Float](6).length == 8)
    // sha matches Spark's own sha2 over the same bytes
    val expectedSha = docs.filter($"doc_id" === 1)
      .select(sha2(encode($"text", "UTF-8"), 256)).head().getString(0)
    assert(r1.getString(3) == expectedSha)

    // empty payload doesn't crash the batch path
    val r2 = rows(1)
    assert(r2.getLong(2) == 0L && r2.getSeq[Float](6) == Seq(0.0f))

    // deterministic across runs
    val again = Multimodal.pipeline(spark, docs).orderBy("doc_id").collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("frame sampling explodes media rows into offset-indexed frames") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefghij")).toDF("doc_id", "text")  // 10 bytes
    val frames = Multimodal.sampleFrames(
      Multimodal.fromDocuments(docs), stride = 4, window = 4).collect()
    assert(frames.map(f => (f.frame_idx, f.offset_bytes)).toSeq ==
      Seq((0, 0L), (1, 4L), (2, 8L)))
    assert(frames(0).features.length == 4)
    assert(frames(2).features.length == 2) // tail frame clipped
  }

  test("decoded multimodal features flow into IVF ANN search with no format shim") {
    import spark.implicits._
    // decode (stub) -> resize to a common dim -> similarity search:
    // the composition a media dedup/retrieval pipeline runs. The
    // decoded Dataset feeds operators.IvfAnn directly — same typed
    // plan, no collect, no re-encoding hop.
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val feats = graft.multimodal.Multimodal.resizeFeatures(
      graft.multimodal.Multimodal.decodeStub(
        graft.multimodal.Multimodal.fromDocuments(docs)), 16).toDF()
    val input = feats.select($"doc_id".as("vec_id"),
      pmod(xxhash64($"doc_id"), lit(8)).cast("int").as("label"),
      expr("transform(features, x -> cast(x as double))").as("v"))
    val top = graft.operators.IvfAnn.topK(
      input, isQuery = col("vec_id") < 5, nprobe = 2, k = 3)
    val rows = top.collect()
    assert(rows.length == 15, s"expected 5 queries x top-3, got ${rows.length}")
    // deterministic end-to-end: stub decode + IVF ranking re-runs identically
    val again = graft.operators.IvfAnn.topK(
      input, isQuery = col("vec_id") < 5, nprobe = 2, k = 3).collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("feature resize interpolates to the target dimension") {
    import spark.implicits._
    val docs = Seq((1L, "hello world")).toDF("doc_id", "text")
    val decoded = Multimodal.decodeStub(Multimodal.fromDocuments(docs))
    val resized = Multimodal.resizeFeatures(decoded, 16).collect().head
    assert(resized.features.length == 16)
    val src = decoded.collect().head.features
    // endpoints preserved by linear interpolation
    assert(resized.features.head == src.head && resized.features.last == src.last)
  }

  test("perceptual average-hash clusters near-identical payloads") {
    import spark.implicits._
    import graft.functions.{TextFunctions => TF}
    val base = "the quick brown fox jumps over the lazy dog " * 20
    val docs = Seq(
      (1L, base),                          // original
      (2L, base),                          // exact duplicate
      (3L, base.replace("quick", "quack")),// near-duplicate
      (4L, base.reverse)                   // different content
    ).toDF("doc_id", "text")
    val hashed = Multimodal.avgHash64(Multimodal.fromDocuments(docs))
    val h = hashed.as[(Long, Long)].collect().toMap
    assert(h(1L) == h(2L), "identical payloads must hash identically")
    // near-dup within a small Hamming radius, distinct content far away
    val near = hashed.as("a").join(hashed.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id",
        TF.hamming64($"a.phash", $"b.phash").as("d"))
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, d) => (a, b) -> d }.toMap
    assert(near((1L, 3L)) <= 8, s"near-dup too far: ${near((1L, 3L))}")
    assert(near((1L, 4L)) > 8, s"distinct content too close: ${near((1L, 4L))}")
  }

  test("avgHash64 is bit-exact against an independent reference on the corpus") {
    import spark.implicits._
    // q164's oracle recomputes this hash in SQL (byte sampling, mean
    // threshold, bit 63 as -2^63); this pins the Scala side to an
    // independently-spelled reference for EVERY sf0.001 document, so
    // a bit-layout drift cannot hide behind a sparse pair set.
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val got = Multimodal.avgHash64(Multimodal.fromDocuments(docs))
      .as[(Long, Long)].collect().toMap
    val want = docs.as[(Long, String)].collect().map { case (id, text) =>
      val b = text.getBytes("UTF-8")
      val n = b.length
      val smp = Array.tabulate(64)(i => if (n == 0) 0 else b(((i.toLong * n) / 64).toInt) & 0xFF)
      val mean = smp.sum.toDouble / 64
      var h = 0L
      var i = 0
      while (i < 64) { if (smp(i) > mean) h |= (1L << i); i += 1 }
      id -> h
    }.toMap
    assert(got == want)
  }

  test("binaryFile source ingests blobs with glob pruning and a size guard") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("blobs").toString
    Files.write(Paths.get(s"$dir/7.jpg"), Array.tabulate(300)(_.toByte))
    Files.write(Paths.get(s"$dir/12.jpg"), Array.tabulate(40)(i => (i * 3).toByte))
    Files.write(Paths.get(s"$dir/9.wav"), Array.fill(10)(1.toByte))   // pruned by glob
    Files.write(Paths.get(s"$dir/5.jpg"), Array.fill(2048)(2.toByte)) // over maxBytes
    Files.write(Paths.get(s"$dir/cover.jpg"), Array.fill(8)(3.toByte)) // no id digits

    val media = graft.multimodal.Multimodal
      .fromBinaryFiles(spark, dir, glob = "*.jpg", maxBytes = 1024)
    val rows = media.collect().sortBy(_.doc_id)
    assert(rows.map(_.doc_id).toSeq == Seq(7L, 12L), rows.toSeq.map(_.doc_id))
    assert(rows.forall(_.kind == "jpg"))
    assert(rows.find(_.doc_id == 7L).get.payload.length == 300)

    // the ingested records feed the existing decode path unchanged
    val decoded = graft.multimodal.Multimodal.decodeStub(media).collect()
    assert(decoded.map(_.doc_id).sorted.toSeq == Seq(7L, 12L))
    assert(decoded.forall(_.sha256.length == 64))
  }
}
