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
      graft.multimodal.Multimodal.decode(
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
    val decoded = Multimodal.decode(Multimodal.fromDocuments(docs))
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

  test("real image decode: a known-pixel gray PNG round-trips bit-exactly") {
    import spark.implicits._
    // 8x8 grid with every value distinct mod 255 — PNG is lossless and
    // the 8x8 resample is the identity, so decode must return EXACTLY
    // these pixels (features = px/255) and the true dimensions.
    val px = Array.tabulate(64)(i => (i * 4 + 3) % 256)
    val png = Multimodal.encodeGrayPng(px, 8, 8)
    val media = Seq(Multimodal.MediaRecord(1L, "png", png)).toDS()
    val d = Multimodal.decode(media).collect().head
    assert(d.width == 8 && d.height == 8, s"${d.width}x${d.height}")
    assert(d.features.length == 64)
    d.features.zip(px).zipWithIndex.foreach { case ((f, p), i) =>
      assert(f == (p / 255.0).toFloat, s"pixel $i: got $f want ${p / 255.0}")
    }
    // non-square true dimensions survive too
    val wide = Multimodal.encodeGrayPng(Array.fill(32 * 4)(7), 32, 4)
    val dw = Multimodal.decode(
      Seq(Multimodal.MediaRecord(2L, "png", wide)).toDS()).collect().head
    assert(dw.width == 32 && dw.height == 4)
  }

  test("real image decode: color PNG uses ITU-R 601 luma, gray pixels unperturbed") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, (200 << 16) | (100 << 8) | 50)  // luma = (299*200+587*100+114*50+500)/1000 = 124
    img.setRGB(1, 0, (90 << 16) | (90 << 8) | 90)    // gray pixel -> exactly 90
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val d = Multimodal.decode(
      Seq(Multimodal.MediaRecord(1L, "png", bos.toByteArray)).toDS()).collect().head
    assert(d.width == 2 && d.height == 1)
    // 8x8 upsample of a 2x1 image: each half replicates its source pixel
    val feats = d.features
    assert(feats.take(4).forall(_ == (124 / 255.0).toFloat), feats.take(4).toSeq)
    assert(feats.slice(4, 8).forall(_ == (90 / 255.0).toFloat), feats.slice(4, 8).toSeq)
  }

  test("real aHash: decoded-pixel hash matches the independent mean-threshold reference") {
    import spark.implicits._
    val px = Array.tabulate(64)(i => if (i % 3 == 0) 200 else 20)
    val png = Multimodal.encodeGrayPng(px, 8, 8)
    val got = Multimodal.avgHash64(
      Seq(Multimodal.MediaRecord(1L, "png", png)).toDS())
      .as[(Long, Long)].collect().head._2
    val mean = px.sum.toDouble / 64
    var want = 0L
    px.zipWithIndex.foreach { case (p, i) => if (p > mean) want |= (1L << i) }
    assert(got == want, f"got $got%016x want $want%016x")
    // and a LARGER image hashes through the real area-average resample:
    // 16x16 where each 2x2 block replicates px -> identical hash
    val big = Array.tabulate(256)(j => px((j / 32) * 8 + (j % 16) / 2))
    val gotBig = Multimodal.avgHash64(
      Seq(Multimodal.MediaRecord(2L, "png", Multimodal.encodeGrayPng(big, 16, 16))).toDS())
      .as[(Long, Long)].collect().head._2
    assert(gotBig == want, f"resampled hash drifted: $gotBig%016x")
  }

  test("undecodable payloads keep the byte-derived fallback (one bad blob = one row)") {
    import spark.implicits._
    val junk = Array.tabulate(100)(_.toByte)
    val truncatedPng = Multimodal.encodeGrayPng(Array.fill(64)(1), 8, 8).take(20)
    val media = Seq(
      Multimodal.MediaRecord(1L, "bin", junk),
      Multimodal.MediaRecord(2L, "png", truncatedPng)).toDS()
    val rows = Multimodal.decode(media).collect().sortBy(_.doc_id)
    assert(rows(0).width == 1 + 100 % 640 && rows(0).features.length == 8)
    assert(rows(1).width == 1 + 20 % 640, "truncated PNG must fall back, not throw")
  }

  test("palette images decode by resolved color; 16-bit gray stays in [0,1]") {
    import spark.implicits._
    import java.awt.image.{BufferedImage, IndexColorModel}
    // an all-WHITE 2-color GIF whose palette puts white at INDEX 0: a
    // raw-sample reading would call every pixel black (gray 0)
    val cm = new IndexColorModel(1, 2,
      Array(255.toByte, 0.toByte), Array(255.toByte, 0.toByte), Array(255.toByte, 0.toByte))
    val gif = new BufferedImage(8, 8, BufferedImage.TYPE_BYTE_BINARY, cm)
    // all pixels stay at sample 0 = palette white
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(gif, "gif", bos)
    val rows = Multimodal.decode(
      Seq(Multimodal.MediaRecord(1L, "gif", bos.toByteArray)).toDS()).collect()
    assert(rows.head.width == 8 && rows.head.height == 8)
    assert(rows.head.features.forall(f => f > 0.99f),
      s"palette white read as ${rows.head.features.min} — palette index leaked through")

    // 16-bit gray PNG: features must stay in [0,1], not 0..257
    val us = new BufferedImage(8, 8, BufferedImage.TYPE_USHORT_GRAY)
    (0 until 64).foreach(i => us.getRaster.setSample(i % 8, i / 8, 0, 65535))
    val bos2 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(us, "png", bos2)
    val r2 = Multimodal.decode(
      Seq(Multimodal.MediaRecord(2L, "png", bos2.toByteArray)).toDS()).collect().head
    assert(r2.features.forall(f => f >= 0f && f <= 1f),
      s"16-bit gray leaked raw samples: max ${r2.features.max}")
    assert(r2.features.forall(_ > 0.9f), "white 16-bit gray must decode near 1.0")
  }

  test("16-bit gray mid-tones are linear, not sRGB-mapped: 8-bit twin decodes identically") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    // the same image at both depths: v16 = v8 * 257 is the standard
    // lossless 8->16 widening (65535 = 257 * 255), so every pixel must
    // map back to EXACTLY v8. getRGB on a gray raster applies a
    // linear-gray -> sRGB tone map that shifts mid-tones (e.g. raw 64
    // reads as ~137) — this gradient catches that distortion where the
    // white-only test above cannot.
    val px = Array.tabulate(64)(i => i * 4) // 0..252 gradient, mid-tone heavy
    val png8 = Multimodal.encodeGrayPng(px, 8, 8)
    val us = new BufferedImage(8, 8, BufferedImage.TYPE_USHORT_GRAY)
    px.zipWithIndex.foreach { case (v, i) =>
      us.getRaster.setSample(i % 8, i / 8, 0, v * 257)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(us, "png", bos)
    val media = Seq(
      Multimodal.MediaRecord(1L, "png", png8),
      Multimodal.MediaRecord(2L, "png", bos.toByteArray)).toDS()
    val rows = Multimodal.decode(media).collect().sortBy(_.doc_id)
    assert(rows(0).features.sameElements(rows(1).features),
      s"8-bit vs 16-bit gray diverged: ${rows(0).features.toSeq.take(8)} vs ${rows(1).features.toSeq.take(8)}")
    val hashes = Multimodal.avgHash64(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(1L) == hashes(2L),
      f"aHash depth-dependent: ${hashes(1L)}%016x vs ${hashes(2L)}%016x")
    // and the features are the RAW linear values, not tone-mapped
    assert(rows(1).features(16) == (px(16) / 255.0).toFloat,
      s"mid-tone distorted: ${rows(1).features(16)} want ${px(16) / 255.0}")
  }

  test("imageSummary equals decode+avgHash64 on mixed decodable/undecodable payloads") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRecord(1L, "png", Multimodal.encodeGrayPng(Array.tabulate(64)(i => i * 4), 8, 8)),
      Multimodal.MediaRecord(2L, "bin", Array.tabulate(100)(_.toByte))).toDS()
    val one = Multimodal.imageSummary(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    val meta = Multimodal.decode(media).collect().map(m => m.doc_id -> ((m.width.toLong, m.height.toLong))).toMap
    val hash = Multimodal.avgHash64(media).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    one.foreach { case (id, w, h, p) =>
      assert((w, h) == meta(id), s"dims drifted for $id")
      assert(p == hash(id), s"phash drifted for $id")
    }
  }

  test("audio: WAV PCM decode is bit-exact on known samples, both endiannesses") {
    import spark.implicits._
    // a waveform with known hand-computable features: two sign flips,
    // a zero sample that breaks one flip
    val samples = Array[Short](1000, -2000, 0, 3000, -100)
    val wav = Multimodal.encodePcm16Wav(samples, 8000)
    val got = Multimodal.decodeAudio(
      Seq(Multimodal.MediaRecord(1L, "wav", wav)).toDS()).collect().head
    assert(got.sample_rate == 8000L && got.channels == 1)
    assert(got.n_samples == 5L)
    assert(got.sum_abs == 1000L + 2000 + 0 + 3000 + 100)
    // flips: 1000->-2000 yes; -2000->0 no (product 0); 0->3000 no;
    // 3000->-100 yes
    assert(got.zero_cross == 2L)

    // big-endian branch via the JDK's AIFF writer (PCM_SIGNED 16-bit
    // big-endian container) — identical features to the WAV spelling
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val be = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      be(2 * i) = ((s >> 8) & 0xFF).toByte; be(2 * i + 1) = (s & 0xFF).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(be),
        new AudioFormat(8000f, 16, 1, true, true), samples.length.toLong),
      AudioFileFormat.Type.AIFF, bos)
    val gotBe = Multimodal.decodeAudio(
      Seq(Multimodal.MediaRecord(2L, "aiff", bos.toByteArray)).toDS()).collect().head
    assert((gotBe.n_samples, gotBe.sum_abs, gotBe.zero_cross, gotBe.afp) ==
           ((got.n_samples, got.sum_abs, got.zero_cross, got.afp)),
      "big-endian AIFF decode drifted from little-endian WAV")
  }

  test("audio: stereo WAV downmixes per frame — n_samples is the FRAME count") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // 3 frames of (L, R): L all positive, R all negative — a naive
    // interleaved reading would report n_samples=6 and ~6 zero
    // crossings for two signals that never cross zero
    val frames = Array[(Short, Short)]((1000, -200), (2000, -400), (3000, -600))
    val data = new Array[Byte](frames.length * 4)
    frames.zipWithIndex.foreach { case ((l, r), i) =>
      data(4 * i) = (l & 0xFF).toByte; data(4 * i + 1) = ((l >> 8) & 0xFF).toByte
      data(4 * i + 2) = (r & 0xFF).toByte; data(4 * i + 3) = ((r >> 8) & 0xFF).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(data),
        new AudioFormat(8000f, 16, 2, true, false), frames.length.toLong),
      AudioFileFormat.Type.WAVE, bos)
    val got = Multimodal.decodeAudio(
      Seq(Multimodal.MediaRecord(1L, "wav", bos.toByteArray)).toDS()).collect().head
    assert(got.channels == 2 && got.n_samples == 3L,
      s"stereo frame count wrong: ${got.n_samples}")
    // downmix = floorDiv(L+R, 2): (400, 800, 1200) — all positive
    assert(got.zero_cross == 0L, s"cross-channel zero crossings leaked: ${got.zero_cross}")
    assert(got.sum_abs == 400L + 800 + 1200, s"downmix drifted: ${got.sum_abs}")
  }

  test("audio: undecodable payloads keep the byte-derived fallback") {
    import spark.implicits._
    val junk = Array.tabulate(10)(i => (i * 17).toByte)
    val truncated = Multimodal.encodePcm16Wav(Array[Short](1, 2, 3), 8000).take(10)
    val rows = Multimodal.decodeAudio(Seq(
      Multimodal.MediaRecord(1L, "bin", junk),
      Multimodal.MediaRecord(2L, "wav", truncated)).toDS())
      .collect().sortBy(_.doc_id)
    // fallback marks itself: rate 0 / channels 0, samples from bytes
    assert(rows.forall(r => r.sample_rate == 0L && r.channels == 0))
    assert(rows(0).n_samples == 10L)
    assert(rows(0).sum_abs ==
      junk.map(b => math.abs(((b & 0xFF) - 128) * 256).toLong).sum)
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
    val decoded = graft.multimodal.Multimodal.decode(media).collect()
    assert(decoded.map(_.doc_id).sorted.toSeq == Seq(7L, 12L))
    assert(decoded.forall(_.sha256.length == 64))
  }
}
