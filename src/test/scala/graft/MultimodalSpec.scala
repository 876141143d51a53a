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
}
