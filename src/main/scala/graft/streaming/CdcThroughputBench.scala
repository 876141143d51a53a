package graft.streaming

import java.nio.file.{Files, Paths}

/** Bulk CDC throughput: N envelope records (across `files` JSON files,
  * ~10% updates to existing keys, ~5% deletes) consumed end-to-end —
  * decode → classify → latest-wins merge into the state snapshot —
  * in one Trigger.AvailableNow run. Reports events/sec.
  *
  * The reference's consume path is one-record-at-a-time Jackson +
  * Spring listener per Kafka partition (`MessageConsumer.kt:28-52`);
  * this measures the engine's bulk replacement for the same work.
  *
  * Usage: runMain graft.streaming.CdcThroughputBench [nEvents] [files] [snapshot|manifest]
  */
object CdcThroughputBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val files = if (args.length > 1) args(1).toInt else 8
    val mode = if (args.length > 2) args(2) else "snapshot"
    val root = Files.createTempDirectory("cdctp").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))

    val rnd = new scala.util.Random(42)
    val perFile = n / files
    var lsn = 0L
    (0 until files).foreach { f =>
      val sb = new StringBuilder(perFile * 220)
      (0 until perFile).foreach { _ =>
        lsn += 1
        val isDelete = rnd.nextInt(100) < 5
        val keySpace = math.max(1, (n * 0.9).toInt)
        val id = s"k${rnd.nextInt(keySpace)}"
        if (isDelete)
          sb.append(s"""{"key":{"id":"$id"},"value":{"before":null,"after":null,"source":{"lsn":$lsn,"ts_ms":$lsn,"txId":$lsn},"op":"d","ts_ms":$lsn}}""")
        else
          sb.append(s"""{"key":{"id":"$id"},"value":{"before":null,"after":{"id":"$id","create_time":$lsn,"update_time":$lsn,"message":"payload message number $lsn for $id","username":"user${lsn % 100}"},"source":{"lsn":$lsn,"ts_ms":$lsn,"txId":$lsn},"op":"c","ts_ms":$lsn}}""")
        sb.append('\n')
      }
      Files.write(Paths.get(s"$in/part$f.json"), sb.toString.getBytes("UTF-8"))
    }

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Graft.session(s"local[$cpus]", cpus.toInt)
    val t0 = System.nanoTime()
    val q =
      if (mode == "manifest") {
        val raw = spark.readStream.schema(CdcStream.fileRecordSchema).json(in)
        CdcStream.decodeFile(raw).writeStream
          .option("checkpointLocation", s"$root/cp")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch {
            (b: org.apache.spark.sql.DataFrame, _: Long) =>
              ManifestState.mergeBatch(b, s"$root/state", nBuckets = 1024)
          }
          .start()
      } else CdcStream.runFileStream(spark, in, s"$root/cp", s"$root/state")
    q.awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9
    val viewRows =
      if (mode == "manifest") ManifestState.readView(spark, s"$root/state").count()
      else CdcStream.readView(spark, s"$root/state").count()
    val total = perFile.toLong * files
    println(f"""{"metric":"cdc_throughput","mode":"$mode","unit":"events_per_sec","events":$total,"sec":$sec%.2f,"events_per_sec":${total / sec}%.0f,"view_rows":$viewRows}""")
    spark.stop()
  }
}
