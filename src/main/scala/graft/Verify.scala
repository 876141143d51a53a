package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [queryName...] — an explicit subset runs
    // only those queries (dev iteration); the driver passes none.
    val (Array(sfDir, outDir), subsetArr) = args.splitAt(2)
    val subset: Set[String] = subsetArr.toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Same pinned session as the bench (AQE, broadcast threshold,
    // UTC): the correctness gate should exercise the same plans that
    // get measured.
    val spark = graft.engine.Graft
      .builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dump queries a few at a time: each is small at sf0.01 and mostly
    // latency-bound (plan + a few tasks), so overlapping them cuts the
    // driver's correctness-gate wall-clock ~3x; SparkSession is
    // thread-safe and every query writes its own directory. Pool size
    // follows the session's core count so one knob governs both.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(8, cpus.toInt / 4)))
    val tasks = SparkEntry.queries.toSeq
      .filter { case (name, _) => subset.isEmpty || subset(name) }
      .map { case (name, fn) =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
          // thread-scoped release: the write above fully consumed this
          // worker's plan, so its own checkpoint pins (PrefixScan,
          // CosinePairs.clustered, the funnel) can drop now instead of
          // accumulating for the whole round — and it cannot touch a
          // concurrent worker's in-flight pins (Checkpoints is keyed
          // by tracking thread)
          graft.operators.Checkpoints.release()
        }
      })
    }
    pool.shutdown()
    tasks.foreach(_.get())
    // full quiesce point (no query in flight on any thread): sweep any
    // remaining plan-pinned checkpoints the per-worker release missed
    graft.operators.Checkpoints.releaseAll()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
