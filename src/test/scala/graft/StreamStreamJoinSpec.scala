package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamStreamJoin

/** Native watermarked stream-stream interval join: pairs equal the
  * batch join while both inputs are on time, late rows drop at the
  * watermark, and the left-outer spelling emits its null-padded rows
  * only after the watermark closes the row's match window.
  */
class StreamStreamJoinSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def joined(imps: MemoryStream[(Long, Timestamp)],
                     clicks: MemoryStream[(Long, Timestamp)],
                     joinType: String) =
    StreamStreamJoin.intervalJoin(
      imps.toDF().toDF("ad_id", "its"),
      clicks.toDF().toDF("c_ad", "cts"),
      "ad_id", "c_ad", "its", "cts",
      lowerSec = 0L, upperSec = 1800L, watermark = "10 minutes",
      joinType = joinType)

  test("inner interval join equals the batch join on on-time data") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val q = joined(imps, clicks, "inner")
      .select($"ad_id", $"its", $"cts")
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()

    val impRows = Seq((1L, ts(0)), (2L, ts(2)), (3L, ts(5)))
    // ad 1: click inside [0, 30 min] -> match; ad 2: click 35 min
    // later -> outside; ad 9: click with no impression -> no match
    val clickRows = Seq((1L, ts(10)), (2L, ts(37)), (9L, ts(11)))
    imps.addData(impRows: _*)
    clicks.addData(clickRows: _*)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ssj").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
    val want = StreamStreamJoin.intervalJoin(
        impRows.toDF("ad_id", "its"), clickRows.toDF("c_ad", "cts"),
        "ad_id", "c_ad", "its", "cts", 0L, 1800L, "10 minutes")
      .select($"ad_id", $"its", $"cts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
    assert(got == want && got == Set((1L, ts(0), ts(10))), s"got $got")
  }

  test("rows later than the watermark never join") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val q = joined(imps, clicks, "inner")
      .select($"ad_id", $"its", $"cts")
      .writeStream.format("memory").queryName("ssj_late").outputMode("append").start()

    imps.addData((1L, ts(0)))
    q.processAllAvailable()
    // advance BOTH watermarks far past 10:00 + interval + delay
    imps.addData((100L, Timestamp.valueOf("2024-01-01 13:00:00")))
    clicks.addData((200L, Timestamp.valueOf("2024-01-01 13:00:00")))
    q.processAllAvailable()
    // propagation batch (watermark applies from the NEXT batch)
    imps.addData((101L, Timestamp.valueOf("2024-01-01 13:01:00")))
    q.processAllAvailable()
    // this click WOULD match ad 1 at 10:10, but it is hours late
    clicks.addData((1L, ts(10)))
    q.processAllAvailable()
    q.stop()

    assert(spark.table("ssj_late").filter($"ad_id" === 1L).isEmpty,
      "late click joined against an evicted impression")
  }

  test("left-outer emits the unmatched row only after its window closes") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val q = joined(imps, clicks, "leftOuter")
      .select($"ad_id", $"its", $"cts")
      .writeStream.format("memory").queryName("ssj_outer").outputMode("append").start()

    imps.addData((1L, ts(0)))
    q.processAllAvailable()
    // while a click is still possible, NO null-padded row may emit
    assert(spark.table("ssj_outer").isEmpty,
      "outer row emitted before the match window closed")

    // close the window: watermark beyond 10:00 + 30 min + 10 min delay
    imps.addData((100L, Timestamp.valueOf("2024-01-01 12:00:00")))
    clicks.addData((200L, Timestamp.valueOf("2024-01-01 12:00:00")))
    q.processAllAvailable()
    imps.addData((101L, Timestamp.valueOf("2024-01-01 12:01:00")))
    clicks.addData((201L, Timestamp.valueOf("2024-01-01 12:01:00")))
    q.processAllAvailable()
    imps.addData((102L, Timestamp.valueOf("2024-01-01 12:02:00")))
    clicks.addData((202L, Timestamp.valueOf("2024-01-01 12:02:00")))
    q.processAllAvailable()
    q.stop()

    val unmatched = spark.table("ssj_outer")
      .filter($"ad_id" === 1L).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.get(2)))
    assert(unmatched.toSeq == Seq((1L, ts(0), null)),
      s"expected one null-padded row, got ${unmatched.toSeq}")
  }
}
