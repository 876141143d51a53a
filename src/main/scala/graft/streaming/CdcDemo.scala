package graft.streaming

/** Runnable demo of the CDC pipeline (reference R1–R6 end-to-end):
  * consume Debezium-envelope JSON files, maintain the latest-wins
  * materialized view, print it.
  *
  * Usage: runMain graft.streaming.CdcDemo <inputDir> <workDir> [mode]
  *   mode = snapshot (default): foreachBatch merge into parquet state
  *   mode = lowlatency: flatMapGroupsWithState per-key update stream
  *   mode = aggview: delta-maintained aggregate view from before/after images
  */
object CdcDemo {
  def main(args: Array[String]): Unit = {
    val Array(inputDir, workDir) = args.take(2)
    val mode = if (args.length > 2) args(2) else "snapshot"
    val spark = graft.engine.Graft.session("local[4]", 4)

    if (mode == "tws") {
      val raw = spark.readStream.schema(CdcStream.fileRecordSchema).json(inputDir)
      val updates = CdcStream.latestWinsUpdatesTws(
        CdcStream.asChanges(CdcStream.decodeFile(raw)))
      val q = updates.writeStream
        .option("checkpointLocation", s"$workDir/checkpoint")
        .format("console").option("truncate", "false")
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      println("tws_done")
    } else if (mode == "aggview") {
      val q = AggView.run(spark, inputDir, s"$workDir/checkpoint", s"$workDir/aggstate")
      q.awaitTermination()
      val view = AggView.readView(spark, s"$workDir/aggstate").orderBy("username")
      view.show(100, truncate = false)
      println(s"agg_rows=${view.count()}")
    } else if (mode == "lowlatency") {
      val raw = spark.readStream.schema(CdcStream.fileRecordSchema).json(inputDir)
      val updates = CdcStream.latestWinsUpdates(
        CdcStream.asChanges(CdcStream.decodeFile(raw)))
      val q = updates.writeStream
        .option("checkpointLocation", s"$workDir/checkpoint")
        .format("console").option("truncate", "false")
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      println("lowlatency_done")
    } else {
      val q = CdcStream.runFileStream(
        spark, inputDir, s"$workDir/checkpoint", s"$workDir/state")
      q.awaitTermination()
      val view = CdcStream.readView(spark, s"$workDir/state").orderBy("id")
      view.show(100, truncate = false)
      println(s"view_rows=${view.count()}")
    }
    spark.stop()
  }
}
