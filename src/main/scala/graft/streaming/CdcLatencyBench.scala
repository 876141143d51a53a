package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

/** Measures end-to-end CDC latency: envelope file appears → change
  * observable downstream. The reference's only quantitative
  * performance bound is ≤ 1 s for this path (its e2e test polls
  * 10 × 100 ms, `MessageEventTestListener.kt:31-42`); this harness
  * reports the engine's numbers for BASELINE.md, for both view modes:
  *
  *  - `snapshot`: foreachBatch merge into the parquet state snapshot
  *    (throughput-oriented; latency includes a full state rewrite)
  *  - `lowlatency`: flatMapGroupsWithState per-key updates into a
  *    memory sink (the push path, analog of the reference's WebSocket
  *    broadcast)
  *  - `push`: the full reference-parity path — per-key updates
  *    broadcast through [[graft.sinks.PushServer]] and observed by a
  *    real TCP client, so the number includes serialization, the
  *    driver fan-out, and the socket hop (what the reference's ≤ 1 s
  *    bound actually measures end-to-end)
  *
  * First `warmup` events are excluded — they pay one-time codegen
  * compilation that a long-lived pipeline amortizes.
  *
  * Usage: runMain graft.streaming.CdcLatencyBench [nEvents] [mode]
  */
object CdcLatencyBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20)
    val mode = if (args.length > 1) args(1) else "snapshot"
    val warmup = 3
    val root = Files.createTempDirectory("cdclat").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val state = s"$root/state"

    val spark = graft.engine.Graft.session("local[4]", 4)

    val (q, viewHas) =
      if (mode == "push") {
        val server = new graft.sinks.PushServer()
        val client = new java.net.Socket("127.0.0.1", server.boundPort)
        val reader = new java.io.BufferedReader(new java.io.InputStreamReader(
          client.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
        val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
        val drain = new Thread(() => {
          try {
            var line = reader.readLine()
            while (line != null) {
              """"id":"([^"]+)"""".r.findFirstMatchIn(line)
                .foreach(m => seen.add(m.group(1)))
              line = reader.readLine()
            }
          } catch { case _: java.io.IOException => () }
        }, "push-client-drain")
        drain.setDaemon(true); drain.start()
        val raw = spark.readStream.schema(CdcStream.fileRecordSchema).json(in)
        val updates = CdcStream.latestWinsUpdates(
          CdcStream.asChanges(CdcStream.decodeFile(raw)))
        val query = graft.sinks.PushSink.run(updates, server, s"$root/cp")
        (query, (id: String) => seen.contains(id))
      } else if (mode == "lowlatency") {
        val raw = spark.readStream.schema(CdcStream.fileRecordSchema).json(in)
        val updates = CdcStream.latestWinsUpdates(
          CdcStream.asChanges(CdcStream.decodeFile(raw)))
        val query = updates.writeStream
          .option("checkpointLocation", s"$root/cp")
          .format("memory").queryName("cdclat")
          .outputMode("update")
          .trigger(Trigger.ProcessingTime(100))
          .start()
        (query, (id: String) =>
          try spark.table("cdclat").filter(col("id") === id).count() > 0
          catch { case _: Throwable => false })
      } else {
        val query = CdcStream.runFileStream(spark, in, s"$root/cp", state,
          trigger = Trigger.ProcessingTime(100))
        (query, (id: String) =>
          try CdcStream.readView(spark, state).filter(col("id") === id).count() > 0
          catch { case _: Throwable => false })
      }

    val latencies = (1 to (n + warmup)).map { i =>
      val id = s"m$i"
      val line =
        s"""{"key":{"id":"$id"},"value":{"before":null,"after":{"id":"$id","create_time":$i,"update_time":$i,"message":"msg$i","username":"u"},"source":{"lsn":$i,"ts_ms":$i,"txId":$i},"op":"i","ts_ms":$i}}"""
      val t0 = System.nanoTime()
      Files.write(Paths.get(s"$in/ev$i.json"), line.getBytes("UTF-8"))
      while (!viewHas(id)) Thread.sleep(10)
      (System.nanoTime() - t0) / 1e9
    }.drop(warmup)
    q.stop()

    val sorted = latencies.sorted
    def pct(p: Double) = sorted((p * (sorted.size - 1)).round.toInt)
    println(f"""{"metric":"cdc_e2e_latency","mode":"$mode","unit":"sec","n":$n,"p50":${pct(0.5)}%.3f,"p95":${pct(0.95)}%.3f,"max":${sorted.last}%.3f}""")
    spark.stop()
  }
}
