package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.security.MessageDigest

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in
  * partition-sized batches via `mapPartitions` (the Scala analog of
  * `mapInPandas` — one iterator per partition, vectorizable inside).
  *
  * The IMAGE path is REAL: `javax.imageio` (JDK `java.desktop`, no
  * extra dependency) decodes PNG/JPEG/BMP/GIF/WBMP headless —
  * [[decode]] reports the true raster dimensions and an 8×8
  * area-averaged grayscale feature grid, and [[avgHash64]] computes
  * the genuine perceptual average-hash (8×8 resample → mean
  * threshold) over decoded pixels. Payloads ImageIO cannot decode
  * (text stand-ins, truncated blobs, codecs the JDK lacks) fall back
  * to a clearly-marked deterministic byte-derived spelling instead of
  * failing the task — at 100 TB one corrupt blob must cost one row,
  * not a stage retry storm.
  *
  * The AUDIO path is real for what the JDK actually ships:
  * `javax.sound.sampled` parses WAV/AIFF/AU containers headless, so
  * [[decodeAudio]] decodes PCM_SIGNED 16-bit payloads to true sample
  * arrays (rate, channels, frame count from the container; verified
  * bit-exact round-trip in MultimodalSpec) and derives integer-exact
  * features (sum |amplitude|, zero crossings, a 64-bit energy
  * fingerprint that feeds q17's dedup machinery like [[avgHash64]]
  * does). COMPRESSED audio/video (MP3/AAC/H.264/VP9) stays stubbed —
  * the JDK genuinely ships no codec for those — with the same
  * fallback-not-fail contract; the Spark-side shape (schema, encoder,
  * partition batching, row explosion) is the production design
  * either way.
  */
object Multimodal extends Serializable {

  // ImageIO defaults to a DISK-backed stream cache per decode call;
  // payloads are already in memory, so that is pure NVMe churn on the
  // executor. Headless is set defensively — raster decode needs no
  // display, but some toolkit paths probe for one at class init.
  locally {
    System.setProperty("java.awt.headless", "true")
    ImageIO.setUseCache(false)
  }

  /** An ingested media row: opaque payload + typed metadata. */
  case class MediaRecord(doc_id: Long, kind: String, payload: Array[Byte])

  /** Decoded media features. For a payload ImageIO decodes:
    * `width`/`height` are the true raster dimensions and `features`
    * the 8×8 area-averaged grayscale grid scaled to [0,1]. For an
    * undecodable payload: byte-derived fallback dims/features. */
  case class DecodedMedia(doc_id: Long, kind: String, n_bytes: Long,
                          sha256: String, width: Int, height: Int,
                          features: Array[Float])

  /** Wrap a text table as media records (UTF-8 payloads) — the test
    * stand-in for reading real image/audio blobs. Rows with NULL text
    * are EXCLUDED here: a media record without bytes is not a media
    * record, and every downstream kernel (`decode`, `avgHash64`,
    * `sampleFrames`) reads `payload` unconditionally — admitting a
    * null would NPE mid-task at fact scale instead of failing the one
    * upstream row (DegenerateInputsSpec null lane). */
  def fromDocuments(documents: DataFrame): Dataset[MediaRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select($"doc_id", lit("image").as("kind"),
              encode($"text", "UTF-8").as("payload"))
      .filter($"payload".isNotNull)
      .as[MediaRecord]
  }

  /** Ingest real media blobs via Spark's `binaryFile` source — the
    * production 100 TB path: files stream straight into executor
    * partitions as (path, length, content) rows, never through the
    * driver; `pathGlobFilter` prunes by extension at the LISTING
    * stage (unmatched files are never opened); oversized blobs guard
    * against executor OOM via the length metadata column BEFORE
    * content is materialized downstream.
    *
    * doc_id derives from the file name's trailing digits (the usual
    * `<id>.<ext>` layout); kind = lowercased extension. Files the glob
    * admits but whose names carry no trailing digits (`cover.jpg`)
    * are dropped BEFORE the typed cast — a null doc_id would otherwise
    * fail MediaRecord's non-nullable Long encoder and poison the whole
    * read.
    */
  def fromBinaryFiles(spark: SparkSession, dir: String,
                      glob: String = "*", maxBytes: Long = 64L << 20): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .filter(col("length") <= maxBytes &&
              col("path").rlike("\\d+\\.[A-Za-z0-9]+$"))
      .select(
        regexp_extract(col("path"), "(\\d+)\\.[A-Za-z0-9]+$", 1).cast("long").as("doc_id"),
        lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1)).as("kind"),
        col("content").as("payload"))
      .as[MediaRecord]
  }

  // ---- the real image kernel ------------------------------------------

  /** ImageIO decode; None for anything the JDK cannot decode (wrong
    * magic, truncated stream, unshipped codec). Exceptions are part of
    * the "undecodable" contract: a corrupt blob downgrades that ROW to
    * the fallback path instead of failing the task. */
  private def tryDecodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(payload)))
    catch { case _: Exception => None }

  /** True iff the decoded image is a non-indexed grayscale raster whose
    * band-0 sample IS luma: gray COLOR SPACE (the ColorModel's space
    * type, not the BufferedImage type constant — a gray PNG can decode
    * to TYPE_USHORT_GRAY or a custom type), and NOT a palette image
    * (GIF / indexed PNG/BMP also have one band, but its sample is a
    * palette INDEX, not luma). */
  private def isGrayRaster(img: java.awt.image.BufferedImage): Boolean = {
    val cm = img.getColorModel
    cm.getColorSpace.getType == java.awt.color.ColorSpace.TYPE_GRAY &&
      !cm.isInstanceOf[java.awt.image.IndexColorModel]
  }

  /** Grayscale value of pixel (x, y) in [0, 255]. GRAY rasters of ANY
    * depth read the RAW sample — `getRGB` on them applies a
    * linear-gray → sRGB tone mapping that silently distorts mid-tone
    * pixel values, so a gray PNG would NOT round-trip through it.
    * Non-8-bit samples rescale linearly by the band's sample depth
    * (65535 = 257·255, so 16-bit v·257 maps back to exactly v — the
    * common 8→16-bit widening is lossless both ways). Everything else
    * goes through `getRGB`: palette images (sample = palette index)
    * and color, where integer ITU-R 601 luma (299R + 587G + 114B)/1000
    * with half-up rounding is exactly G when R=G=B, so the formula
    * never perturbs a gray pixel. */
  private def grayAt(img: java.awt.image.BufferedImage, x: Int, y: Int): Int =
    if (isGrayRaster(img)) {
      val bits = img.getColorModel.getComponentSize(0)
      val s = img.getRaster.getSample(x, y, 0)
      if (bits == 8) s
      else ((s.toLong * 255 + ((1L << bits) - 1) / 2) / ((1L << bits) - 1)).toInt
    } else {
      val rgb = img.getRGB(x, y)
      val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
      (299 * r + 587 * g + 114 * b + 500) / 1000
    }

  /** Area-average grayscale resample to `w`×`h` (row-major). Each
    * output cell averages its source box — the real downscale kernel
    * (box filter), and the IDENTITY when the source is already
    * `w`×`h`, which is what lets an oracle recompute the 8×8 hash
    * from source pixels bit-for-bit. */
  private[multimodal] def resampleGray(img: java.awt.image.BufferedImage,
                                       w: Int, h: Int): Array[Double] = {
    val sw = img.getWidth; val sh = img.getHeight
    val out = new Array[Double](w * h)
    var y = 0
    while (y < h) {
      val y0 = y * sh / h; val y1 = math.max(y0 + 1, (y + 1) * sh / h)
      var x = 0
      while (x < w) {
        val x0 = x * sw / w; val x1 = math.max(x0 + 1, (x + 1) * sw / w)
        var sum = 0L; var yy = y0
        while (yy < y1) {
          var xx = x0
          while (xx < x1) { sum += grayAt(img, xx, yy); xx += 1 }
          yy += 1
        }
        out(y * w + x) = sum.toDouble / ((y1 - y0) * (x1 - x0))
        x += 1
      }
      y += 1
    }
    out
  }

  /** The real perceptual average-hash over a decoded image: 8×8
    * area-average resample, bit i (row-major) set iff cell i is
    * strictly above the 64-cell mean. */
  private[multimodal] def aHashOf(img: java.awt.image.BufferedImage): Long = {
    val g = resampleGray(img, 8, 8)
    val mean = g.sum / 64
    var hash = 0L; var i = 0
    while (i < 64) { if (g(i) > mean) hash |= (1L << i); i += 1 }
    hash
  }

  /** Encode an 8-bit grayscale pixel grid (row-major, values clamped
    * to [0,255]) as a PNG — the test-data generator for the real
    * decode path (PNG is lossless, so decode ∘ encode is the
    * identity on pixels and an oracle can predict decoded values from
    * the source grid). */
  def encodeGrayPng(pixels: Array[Int], w: Int, h: Int): Array[Byte] = {
    require(pixels.length == w * h, s"${pixels.length} pixels for ${w}x$h")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var i = 0
    while (i < pixels.length) {
      img.getRaster.setSample(i % w, i / w, 0, math.max(0, math.min(255, pixels(i))))
      i += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Batch decode over partitions: REAL ImageIO decode for payloads
    * the JDK can read (true dimensions, 8×8 grayscale feature grid in
    * [0,1]); deterministic byte-derived fallback otherwise (marked by
    * the stub dims formula). Per-partition setup allocates once — the
    * `mapPartitions` shape real codecs need. */
  def decode(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val md = MessageDigest.getInstance("SHA-256")
      it.map { rec =>
        md.reset()
        val digest = md.digest(rec.payload)
        val sha = digest.map(b => f"$b%02x").mkString
        val n = rec.payload.length
        tryDecodeImage(rec.payload) match {
          case Some(img) =>
            val feats = resampleGray(img, 8, 8).map(g => (g / 255.0).toFloat)
            DecodedMedia(rec.doc_id, rec.kind, n.toLong, sha,
              img.getWidth, img.getHeight, feats)
          case None =>
            // FALLBACK (undecodable payload): deterministic fake dims/
            // features derived from the bytes.
            val width = 1 + (n % 640)
            val height = 1 + (n % 480)
            val features = rec.payload.take(8).map(b => (b & 0xFF) / 255.0f)
            DecodedMedia(rec.doc_id, rec.kind, n.toLong, sha, width, height,
              if (features.nonEmpty) features else Array(0.0f))
        }
      }
    }
  }

  // ---- the real audio kernel (WAV/AIFF/AU PCM via javax.sound) --------

  /** Decoded audio features, all integer-exact so an oracle can
    * recompute them from source samples with no float drift:
    * `n_samples` from the container's frame count, `sum_abs` =
    * Σ|sample| over the decoded 16-bit values, `zero_cross` = count of
    * strict sign flips between consecutive samples (a zero sample
    * breaks the flip, product semantics), `afp` = 64-bit energy
    * fingerprint (64 evenly-spaced |sample| probes, mean-thresholded —
    * the audio analog of [[avgHash64]], same bit conventions). */
  case class DecodedAudio(doc_id: Long, kind: String, sample_rate: Long,
                          channels: Int, n_samples: Long, sum_abs: Long,
                          zero_cross: Long, afp: Long)

  /** Encode signed 16-bit mono PCM as a WAV container — the test-data
    * generator for the real audio path (PCM is lossless, so
    * decode ∘ encode is the identity on samples and an oracle can
    * predict every decoded feature from the source array). */
  def encodePcm16Wav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xFF).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(data), fmt, samples.length.toLong),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** javax.sound decode; Some((rate, channels, per-FRAME mono
    * samples)) for containers the JDK parses to PCM_SIGNED 16-bit
    * (WAV/AIFF/AU, either endianness, any channel count); None
    * otherwise — same row-downgrade contract as [[tryDecodeImage]].
    * Multi-channel frames are downmixed to mono by integer-average
    * (floorDiv — deterministic, exact for mono), so `n_samples` is
    * the container's FRAME count and zero-cross/fingerprint read one
    * signal, never interleaved L/R values. Other PCM widths exist in
    * the wild but not in this engine's ingest contract, so they take
    * the fallback rather than a silently-lossy widen. */
  private def tryDecodeAudio(payload: Array[Byte]): Option[(Int, Int, Array[Short])] =
    try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val f = in.getFormat
        if (f.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
            f.getSampleSizeInBits != 16) None
        else {
          val bytes = in.readAllBytes()
          val ch = f.getChannels
          def sampleAt(i: Int): Int =
            if (f.isBigEndian) (((bytes(2 * i) & 0xFF) << 8) | (bytes(2 * i + 1) & 0xFF)).toShort.toInt
            else (((bytes(2 * i + 1) & 0xFF) << 8) | (bytes(2 * i) & 0xFF)).toShort.toInt
          val frames = bytes.length / (2 * ch)
          val out = new Array[Short](frames)
          var fr = 0
          while (fr < frames) {
            var sum = 0; var c = 0
            while (c < ch) { sum += sampleAt(fr * ch + c); c += 1 }
            out(fr) = math.floorDiv(sum, ch).toShort
            fr += 1
          }
          Some((f.getSampleRate.round, ch, out))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  private def audioFeatures(id: Long, kind: String, rate: Int, channels: Int,
                            samples: Array[Short]): DecodedAudio = {
    val n = samples.length
    var sumAbs = 0L; var zc = 0L; var i = 0
    while (i < n) {
      sumAbs += math.abs(samples(i).toLong)
      if (i > 0 && samples(i).toInt * samples(i - 1).toInt < 0) zc += 1
      i += 1
    }
    // 64 evenly-spaced |sample| probes, mean threshold — bit i set iff
    // probe i is strictly above the 64-probe mean (q172's conventions)
    var afp = 0L
    if (n > 0) {
      val probes = Array.tabulate(64)(i => math.abs(samples(((i.toLong * n) / 64).toInt).toLong))
      val mean = probes.sum.toDouble / 64
      i = 0
      while (i < 64) { if (probes(i) > mean) afp |= (1L << i); i += 1 }
    }
    DecodedAudio(id, kind, rate.toLong, channels, n.toLong, sumAbs, zc, afp)
  }

  /** Batch audio decode over partitions: REAL javax.sound decode for
    * PCM payloads (true rate/channels/frame count + integer-exact
    * features over decoded samples); deterministic byte-derived
    * fallback otherwise (bytes re-centered to [-128,127] and scaled
    * ×256 — the same affine a 16-bit mono source would apply, so the
    * fallback stays comparable across near-identical payloads). */
  def decodeAudio(media: Dataset[MediaRecord]): Dataset[DecodedAudio] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { rec =>
        tryDecodeAudio(rec.payload) match {
          case Some((rate, channels, samples)) =>
            audioFeatures(rec.doc_id, rec.kind, rate, channels, samples)
          case None =>
            val samples = rec.payload.map(b => (((b & 0xFF) - 128) * 256).toShort)
            audioFeatures(rec.doc_id, rec.kind, 0, 0, samples)
        }
      }
    }
  }

  /** A sampled frame from a media payload (video frame-sampling
    * shape: one media row explodes to `nFrames` frame rows). */
  case class Frame(doc_id: Long, frame_idx: Int, offset_bytes: Long,
                   features: Array[Float])

  /** Frame sampling: every `stride` bytes becomes one "frame" whose
    * features are the following `window` bytes scaled to [0,1).
    * STUB for a real video codec's keyframe extraction (no H.264/VP9
    * decoder ships with the JDK); the row-explosion shape (1 media
    * row -> N frame rows, computed per partition, never on the
    * driver) is the real design.
    */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int, window: Int = 4): Dataset[Frame] = {
    require(stride > 0 && window > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { rec =>
        val n = rec.payload.length
        (0 until n by stride).zipWithIndex.map { case (off, idx) =>
          val feats = rec.payload.slice(off, math.min(n, off + window))
            .map(b => (b & 0xFF) / 255.0f)
          Frame(rec.doc_id, idx, off.toLong,
            if (feats.nonEmpty) feats else Array(0.0f))
        }
      }
    }
  }

  /** Feature "resize" (dimension change) via linear interpolation
    * over an already-extracted feature vector; pixel-grid resampling
    * happens upstream in [[decode]] via [[resampleGray]]. Runs inside
    * the same typed Dataset plan. */
  def resizeFeatures(decoded: Dataset[DecodedMedia], dim: Int): Dataset[DecodedMedia] = {
    require(dim > 0)
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.map { m =>
      val src = m.features
      val out = Array.tabulate(dim) { i =>
        val pos = i.toDouble * (src.length - 1) / math.max(1, dim - 1)
        val lo = pos.toInt
        val hi = math.min(src.length - 1, lo + 1)
        val frac = (pos - lo).toFloat
        src(lo) * (1 - frac) + src(hi) * frac
      }
      m.copy(features = out)
    }
  }

  /** End-to-end: documents -> payloads -> decoded features table. */
  def pipeline(spark: SparkSession, documents: DataFrame): DataFrame =
    decode(fromDocuments(documents)).toDF()

  /** Perceptual average-hash (aHash) of a media payload. Decodable
    * image → the REAL aHash (8×8 grayscale area-average, mean
    * threshold) over decoded pixels. Undecodable payload → fallback:
    * 64 evenly-spaced BYTE samples through the same mean-threshold
    * spelling (deterministic, near-identical payloads still land
    * within a small Hamming distance). Either way the dedup contract
    * downstream is unchanged: image near-dup dedup reuses the SimHash
    * machinery (16-bit block bucketing + `graft_hamming64` verify,
    * exactly q17's plan over `phash` instead of `simhash`).
    */
  /** Dims + aHash in ONE decode per payload — what a metadata+dedup
    * pass should run instead of [[decode]] followed by [[avgHash64]]
    * (each would pay its own codec invocation; the codec IS the cost).
    * Same per-path semantics as those two: real decode → real dims and
    * pixel aHash; undecodable → the byte-derived fallbacks of both. */
  def imageSummary(media: Dataset[MediaRecord]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { rec =>
        tryDecodeImage(rec.payload) match {
          case Some(img) => (rec.doc_id, img.getWidth.toLong, img.getHeight.toLong, aHashOf(img))
          case None =>
            val n = rec.payload.length
            (rec.doc_id, (1 + (n % 640)).toLong, (1 + (n % 480)).toLong, byteSampledHash(rec.payload))
        }
      }
    }.toDF("doc_id", "width", "height", "phash")
  }

  /** The undecodable-payload hash fallback: 64 evenly-spaced byte
    * samples through the same mean-threshold spelling (deterministic;
    * near-identical payloads land within a small Hamming distance). */
  private def byteSampledHash(payload: Array[Byte]): Long = {
    val n = payload.length
    val samples = Array.tabulate(64) { i =>
      if (n == 0) 0 else payload(((i.toLong * n) / 64).toInt) & 0xFF
    }
    val mean = samples.sum.toDouble / 64
    samples.zipWithIndex.foldLeft(0L) { case (acc, (s, i)) =>
      if (s > mean) acc | (1L << i) else acc
    }
  }

  def avgHash64(media: Dataset[MediaRecord]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { rec =>
      val hash = tryDecodeImage(rec.payload) match {
        case Some(img) => aHashOf(img)
        case None => byteSampledHash(rec.payload)
      }
      (rec.doc_id, hash)
    }.toDF("doc_id", "phash")
  }
}
