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
    * stand-in for reading real image/audio blobs. */
  def fromDocuments(documents: DataFrame): Dataset[MediaRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select($"doc_id", lit("image").as("kind"),
              encode($"text", "UTF-8").as("payload"))
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

  /** End-to-end: documents -> payloads -> decoded features table. */
  def pipeline(spark: SparkSession, documents: DataFrame): DataFrame =
    decodeStub(fromDocuments(documents)).toDF()
}
