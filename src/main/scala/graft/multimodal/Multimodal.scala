package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in
  * partition-sized batches via `mapPartitions` (the Scala analog of
  * `mapInPandas` — one iterator per partition, vectorizable inside).
  *
  * The actual codec step is a STUB: this container has no image/audio
  * libraries, so [[decodeStub]] derives deterministic fake dimensions
  * and features from the bytes. Everything around it — schema, encoder,
  * partitioning, batch iteration shape — is the real 100 TB design:
  * payloads stay off the driver, decode is embarrassingly parallel per
  * partition, and downstream ops see a typed Dataset.
  */
object Multimodal {

  /** An ingested media row: opaque payload + typed metadata. */
  case class MediaRecord(doc_id: Long, kind: String, payload: Array[Byte])

  /** Decoded media features (stub dims/features derived from bytes). */
  case class DecodedMedia(doc_id: Long, kind: String, n_bytes: Long,
                          sha256: String, width: Int, height: Int,
                          features: Array[Float])

  /** Wrap a text table as media records (UTF-8 payloads) — the test
    * stand-in for reading real image/audio blobs. Rows with NULL text
    * are EXCLUDED here: a media record without bytes is not a media
    * record, and every downstream kernel (`decodeStub`, `avgHash64`,
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

  /** Batch decode over partitions. STUB decode: real deployments swap
    * `decodeOne` for an actual codec (JPEG decode, resample, frame
    * sample); the Spark-side contract is unchanged. */
  def decodeStub(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // Per-partition setup (real codecs allocate decoders here, once
      // per partition — not per record).
      val md = MessageDigest.getInstance("SHA-256")
      it.map { rec =>
        md.reset()
        val digest = md.digest(rec.payload)
        val sha = digest.map(b => f"$b%02x").mkString
        // STUB: deterministic fake decode derived from the bytes.
        val n = rec.payload.length
        val width = 1 + (n % 640)
        val height = 1 + (n % 480)
        val features = rec.payload.take(8).map(b => (b & 0xFF) / 255.0f)
        DecodedMedia(rec.doc_id, rec.kind, n.toLong, sha, width, height,
          if (features.nonEmpty) features else Array(0.0f))
      }
    }
  }

  /** A sampled frame from a media payload (video frame-sampling
    * shape: one media row explodes to `nFrames` frame rows). */
  case class Frame(doc_id: Long, frame_idx: Int, offset_bytes: Long,
                   features: Array[Float])

  /** Frame sampling: every `stride` bytes becomes one "frame" whose
    * features are the following `window` bytes scaled to [0,1).
    * STUB for a real codec's keyframe extraction; the row-explosion
    * shape (1 media row -> N frame rows, computed per partition,
    * never on the driver) is the real design.
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

  /** Feature "resize" (dimension change) via linear interpolation —
    * STUB for a real image resample; runs inside the same typed
    * Dataset plan. */
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
    decodeStub(fromDocuments(documents)).toDF()

  /** Perceptual average-hash (aHash) of a media payload: 64 evenly-
    * spaced samples, bit i = sample i above the sample mean. STUB for
    * a real DCT pHash over decoded pixels, but the dedup contract is
    * the real one: near-identical payloads land within a small
    * Hamming distance, so image near-dup dedup reuses the SimHash
    * machinery unchanged (16-bit block bucketing + `graft_hamming64`
    * verify, exactly q17's plan over `phash` instead of `simhash`).
    */
  def avgHash64(media: Dataset[MediaRecord]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { rec =>
      val n = rec.payload.length
      val samples = Array.tabulate(64) { i =>
        if (n == 0) 0 else rec.payload(((i.toLong * n) / 64).toInt) & 0xFF
      }
      val mean = samples.sum.toDouble / 64
      val hash = samples.zipWithIndex.foldLeft(0L) { case (acc, (s, i)) =>
        if (s > mean) acc | (1L << i) else acc
      }
      (rec.doc_id, hash)
    }.toDF("doc_id", "phash")
  }
}
