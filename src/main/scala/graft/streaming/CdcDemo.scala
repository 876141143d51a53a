package graft.streaming

/** Runnable demo of the CDC pipeline (reference R1–R6 end-to-end):
  * consume Debezium-envelope JSON files, maintain the latest-wins
  * materialized view, print it.
  *
  * Usage: runMain graft.streaming.CdcDemo <inputDir> <workDir>
  */
object CdcDemo {
  def main(args: Array[String]): Unit = {
    val Array(inputDir, workDir) = args.take(2)
    val spark = graft.engine.Graft.session("local[4]", 4)
    val q = CdcStream.runFileStream(
      spark, inputDir, s"$workDir/checkpoint", s"$workDir/state")
    q.awaitTermination()
    val view = CdcStream.readView(spark, s"$workDir/state").orderBy("id")
    view.show(100, truncate = false)
    println(s"view_rows=${view.count()}")
    spark.stop()
  }
}
