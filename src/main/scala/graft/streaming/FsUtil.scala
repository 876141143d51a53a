package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Filesystem helpers shared by the ingest twins ([[IngestDedup]],
  * [[WinnowIngest]], [[DupSpanIngest]]).
  *
  * Their state reads must probe existence through Spark's Hadoop
  * FileSystem layer — the SAME layer the writes go through — not
  * `java.io.File`, which only resolves local paths: an HDFS/S3 index
  * directory would always look absent to a local-file probe, and the
  * twin would silently treat a populated history as empty and reset
  * it. `Path.getFileSystem` routes by URI scheme, so local paths keep
  * their exact previous behavior and remote ones become correct.
  */
object FsUtil {

  /** True iff `dir` exists on whatever filesystem its URI names. */
  def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }
}
