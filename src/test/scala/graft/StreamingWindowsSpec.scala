package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Windows

/** Watermark semantics with a manual-clock MemoryStream: windows
  * finalize once the watermark passes; late data beyond the horizon is
  * dropped — the engine's documented improvement over the reference's
  * unbounded state (SURVEY.md §2.B Streaming).
  */
class StreamingWindowsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("tumbling windows with watermark finalize and drop late data") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ms = MemoryStream[(Timestamp, String)]
    val counts = Windows.tumblingCounts(
      ms.toDF().toDF("ts", "event_type"), "ts", "10 minutes", "10 minutes",
      col("event_type"))
    val q = counts
      .select(col("window.start").as("w"), col("event_type"), col("n"))
      .writeStream.format("memory").queryName("wc").outputMode("append").start()

    // window [10:00,10:10): three clicks
    ms.addData((ts(1), "click"), (ts(2), "click"), (ts(3), "click"))
    q.processAllAvailable()
    // advance event time far past the watermark horizon -> finalizes 10:00
    ms.addData((Timestamp.valueOf("2024-01-01 11:00:00"), "view"))
    q.processAllAvailable()
    // watermark computed at the END of a batch applies from the NEXT
    // batch — one benign propagation batch before the late row
    ms.addData((Timestamp.valueOf("2024-01-01 11:01:00"), "view"))
    q.processAllAvailable()
    // late click for the finalized 10:00 window -> dropped
    ms.addData((ts(4), "click"))
    q.processAllAvailable()
    // move watermark again so any (wrongly) accepted late row would emit
    ms.addData((Timestamp.valueOf("2024-01-01 12:00:00"), "view"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("wc")
      .filter(col("event_type") === "click")
      .collect().map(r => (r.getTimestamp(0), r.getLong(2)))
    assert(rows.toSeq == Seq((Timestamp.valueOf("2024-01-01 10:00:00"), 3L)),
      s"got ${rows.toSeq}") // late row did NOT bump the count to 4
  }

  test("watermarked per-id dedup drops redeliveries even at a new ts") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ms = MemoryStream[(Timestamp, Long)]
    val dedup = Windows.dedupByIds(
      ms.toDF().toDF("ts", "event_id"), "ts", "10 minutes", "event_id")
    val q = dedup.writeStream.format("memory").queryName("dd")
      .outputMode("append").start()

    ms.addData((ts(1), 100L), (ts(1), 100L), (ts(2), 101L))
    q.processAllAvailable()
    ms.addData((ts(3), 100L))  // same id, later ts -> still a duplicate
    ms.addData((ts(1), 100L))  // exact redelivery -> dropped
    q.processAllAvailable()
    q.stop()

    val got = spark.table("dd").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1))).sortBy(_._1.getTime)
    // exactly one row per id within the watermark horizon
    assert(got.toSeq == Seq((ts(1), 100L), (ts(2), 101L)), s"got ${got.toSeq}")
  }

  test("session windows group by gap") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ms = MemoryStream[(Timestamp, Long)]
    val sessions = Windows.sessionCounts(
      ms.toDF().toDF("ts", "user_id"), "ts", "5 minutes", "10 minutes",
      col("user_id"))
    val q = sessions
      .select(col("user_id"), col("n"))
      .writeStream.format("memory").queryName("sess").outputMode("append").start()

    // user 1: events at 10:01,10:03,10:05 (one session), 10:30 (another)
    ms.addData((ts(1), 1L), (ts(3), 1L), (ts(5), 1L), (ts(30), 1L))
    ms.addData((Timestamp.valueOf("2024-01-01 12:00:00"), 2L)) // advance watermark
    q.processAllAvailable()
    ms.addData((Timestamp.valueOf("2024-01-01 13:00:00"), 2L)) // flush
    q.processAllAvailable()
    q.stop()

    val u1 = spark.table("sess").filter(col("user_id") === 1L)
      .collect().map(_.getLong(1)).sorted
    assert(u1.toSeq == Seq(1L, 3L), s"got ${u1.toSeq}")
  }

  test("rate-micro-batch source feeds the window transforms") {
    // the declared source surface includes the rate family
    // (SURVEY §2.B scans); rate-micro-batch emits a deterministic
    // rowsPerBatch with event timestamps, so it composes with the
    // watermarked transforms like any other stream
    val counts = Windows.tumblingCounts(
      spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", "10").load()
        .selectExpr("timestamp AS ts", "CAST(value % 2 AS STRING) AS event_type"),
      "ts", "10 seconds", "0 seconds", col("event_type"))
    val q = counts.writeStream.format("memory").queryName("ratewc")
      .outputMode("update").start()
    // the rate family is UNBOUNDED — processAllAvailable would never
    // return; poll the sink until the first batch lands, and stop the
    // query even if the poll throws (a leaked rate stream would keep
    // producing for the rest of the shared-session suite)
    def total(): Long = spark.table("ratewc")
      .agg(coalesce(sum(col("n")), lit(0L))).head().getLong(0)
    try {
      val deadline = System.nanoTime() + 60e9.toLong
      while (total() < 10 && System.nanoTime() < deadline) Thread.sleep(100)
      assert(total() >= 10, s"rate source produced ${total()} rows")
    } finally q.stop()
  }

  test("complete output mode re-emits the whole aggregate each batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ms = MemoryStream[(Timestamp, String)]
    val counts = ms.toDF().toDF("ts", "event_type")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val q = counts.writeStream.format("memory").queryName("cm")
      .outputMode("complete").start()

    ms.addData((ts(1), "click"), (ts(2), "view"))
    q.processAllAvailable()
    ms.addData((ts(3), "click"))
    q.processAllAvailable()
    q.stop()

    // complete mode: the memory sink holds the FULL current aggregate,
    // including groups untouched by the last batch
    val got = spark.table("cm").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq == Seq(("click", 2L), ("view", 1L)), s"got ${got.toSeq}")
  }

  test("stream-static enrichment join: dimension broadcast onto the stream, per batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // The enrichment shape: an unbounded stream joined to a bounded
    // dimension table. Stateless — each micro-batch joins against the
    // CURRENT dim snapshot (broadcast at 100 TB scale), no watermark
    // or join state involved.
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user", "tier")
    val ms = MemoryStream[(Timestamp, Long)]
    val enriched = ms.toDF().toDF("ts", "user")
      .join(broadcast(dim), Seq("user"), "left")
    val q = enriched.select($"user", coalesce($"tier", lit("unknown")).as("tier"))
      .writeStream.format("memory").queryName("enrich").outputMode("append").start()

    ms.addData((ts(1), 1L), (ts(2), 2L), (ts(3), 7L))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("enrich").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == Seq((1L, "gold"), (2L, "basic"), (7L, "unknown")), s"got $got")
  }

  test("stream-stream inner join within watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val clicks = MemoryStream[(Timestamp, Long)]
    val views = MemoryStream[(Timestamp, Long)]
    val c = clicks.toDF().toDF("cts", "user").withWatermark("cts", "10 minutes")
    val v = views.toDF().toDF("vts", "vuser").withWatermark("vts", "10 minutes")
    val joined = c.join(v,
      expr("user = vuser AND vts BETWEEN cts AND cts + INTERVAL 5 MINUTES"))
    val q = joined.select(col("user"), col("cts"), col("vts"))
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()

    clicks.addData((ts(1), 1L), (ts(20), 2L))
    views.addData((ts(3), 1L), (ts(40), 2L))   // 1 matches (within 5m), 2 does not
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ssj").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(1L), s"got ${got.toSeq}")
  }

  test("stream-stream LEFT OUTER join emits null rows once the watermark closes the band") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val clicks = MemoryStream[(Timestamp, Long)]
    val views = MemoryStream[(Timestamp, Long)]
    val c = clicks.toDF().toDF("cts", "user").withWatermark("cts", "10 minutes")
    val v = views.toDF().toDF("vts", "vuser").withWatermark("vts", "10 minutes")
    // Outer stream-stream join: unmatched left rows are held in state
    // until the watermark proves no matching right row can still
    // arrive, THEN emitted with nulls — the unbounded-state-safe
    // spelling of "left join a stream".
    val joined = c.join(v,
      expr("user = vuser AND vts BETWEEN cts AND cts + INTERVAL 5 MINUTES"),
      "left_outer")
    val q = joined.select(col("user"), col("cts"), col("vts"))
      .writeStream.format("memory").queryName("sslj").outputMode("append").start()

    clicks.addData((ts(1), 1L), (ts(2), 2L))   // 1 will match; 2 never does
    views.addData((ts(3), 1L))
    q.processAllAvailable()
    // matched row is out; the unmatched user=2 row must NOT be out yet
    val early = spark.table("sslj").collect().map(r => (r.getLong(0), r.isNullAt(2)))
    assert(early.toSeq == Seq((1L, false)), s"got ${early.toSeq}")

    // advance both watermarks far past cts=2 + 5m band + 10m delay
    clicks.addData((Timestamp.valueOf("2024-01-01 11:00:00"), 99L))
    views.addData((Timestamp.valueOf("2024-01-01 11:00:00"), 98L))
    q.processAllAvailable()
    // one more batch so the state-eviction pass runs after the advance
    clicks.addData((Timestamp.valueOf("2024-01-01 11:30:00"), 97L))
    views.addData((Timestamp.valueOf("2024-01-01 11:30:00"), 96L))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sslj").collect()
      .map(r => (r.getLong(0), r.isNullAt(2))).sortBy(_._1).toSeq
    assert(got.contains((2L, true)),
      s"unmatched left row never emitted with nulls: $got")
    assert(got.contains((1L, false)), s"matched row lost: $got")
  }

  test("chained stateful operators: per-id dedup feeding a tumbling aggregate in ONE query") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // Spark 4 supports multiple stateful operators in one streaming
    // query — the dedup's state and the window's state live in the
    // same checkpoint, no intermediate sink needed. The exactly-once
    // ingest + windowed rollup is the CDC metrics pipeline in one hop.
    val ms = MemoryStream[(Timestamp, Long)]
    val deduped = Windows.dedupByIds(
      ms.toDF().toDF("ts", "event_id"), "ts", "10 minutes", "event_id")
    val counts = deduped
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = counts.select(col("window.start").as("w"), col("n"))
      .writeStream.format("memory").queryName("chained").outputMode("append").start()

    // two distinct ids + one redelivery (same id, different ts) in one window
    ms.addData((ts(1), 1L), (ts(2), 2L), (ts(4), 1L))
    q.processAllAvailable()
    // advance the watermark far enough to close the 10:00 window
    ms.addData((Timestamp.valueOf("2024-01-01 11:00:00"), 50L))
    q.processAllAvailable()
    ms.addData((Timestamp.valueOf("2024-01-01 11:30:00"), 51L))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("chained").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1))).toMap
    // the redelivered id=1 must count ONCE: dedup ran before the window
    assert(got(Timestamp.valueOf("2024-01-01 10:00:00")) == 2L, s"got $got")
  }

  test("sliding windows assign events to overlapping windows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ms = MemoryStream[(Timestamp, String)]
    val counts = Windows.slidingCounts(
      ms.toDF().toDF("ts", "event_type"), "ts", "10 minutes", "5 minutes",
      "10 minutes", col("event_type"))
    val q = counts
      .select(col("window.start").as("w"), col("event_type"), col("n"))
      .writeStream.format("memory").queryName("swc").outputMode("append").start()

    // one event at 10:07 -> windows [10:00,10:10) and [10:05,10:15)
    ms.addData((ts(7), "click"))
    ms.addData((Timestamp.valueOf("2024-01-01 12:00:00"), "view"))
    q.processAllAvailable()
    ms.addData((Timestamp.valueOf("2024-01-01 13:00:00"), "view"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("swc").filter(col("event_type") === "click")
      .collect().map(r => (r.getTimestamp(0), r.getLong(2))).sortBy(_._1.getTime)
    assert(got.toSeq == Seq(
      (Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
      (Timestamp.valueOf("2024-01-01 10:05:00"), 1L)), s"got ${got.toSeq}")
  }

}
