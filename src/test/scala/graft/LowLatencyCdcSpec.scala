package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.CdcStream
import graft.streaming.CdcStream.{Change, ViewUpdate}

class LowLatencyCdcSpec extends SparkSpec {

  private def up(id: String, lsn: Long, msg: String): Change =
    Change(CdcStream.Upsert, id, Some(lsn * 100), Some(lsn * 100),
           Some(msg), Some("u"), Some(lsn), Some(lsn * 100))

  private def del(id: String, lsn: Long): Change =
    Change(CdcStream.Delete, id, None, None, None, None, Some(lsn), Some(lsn * 100))

  test("flatMapGroupsWithState emits one update per changed key per batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ms = MemoryStream[Change]
    val updates = CdcStream.latestWinsUpdates(ms.toDS())
    val q = updates.writeStream.format("memory").queryName("llv")
      .outputMode("update").start()

    ms.addData(up("a", 1, "v1"), up("b", 2, "b1"))
    q.processAllAvailable()
    ms.addData(up("a", 3, "v2"), del("b", 4))
    q.processAllAvailable()
    // out-of-order redelivery of an older change: state must not regress
    ms.addData(up("a", 1, "v1"))
    q.processAllAvailable()
    q.stop()

    val emissions = spark.table("llv").as[ViewUpdate].collect()
    // batch1: a->v1 present, b->b1 present; batch2: a->v2, b tombstone;
    // batch3: no change (older lsn) -> no emission
    assert(emissions.length == 4, s"got ${emissions.toSeq}")
    val lastA = emissions.filter(_.id == "a").last
    assert(lastA.present && lastA.message.contains("v2"))
    val lastB = emissions.filter(_.id == "b").last
    assert(!lastB.present)
  }

  test("decodeKafka parses raw kafka-shaped key/value strings") {
    import spark.implicits._
    val raw = Seq(
      ("""{"id":"k1"}""",
       """{"before":null,"after":{"id":"k1","create_time":1,"update_time":2,"message":"m","username":"u"},"source":{"lsn":7,"ts_ms":9,"txId":7},"op":"c","ts_ms":9}"""),
      ("""{"id":"k2"}""",
       """{"before":null,"after":null,"source":{"lsn":8,"ts_ms":10,"txId":8},"op":"d","ts_ms":10}"""))
      .toDF("key", "value")
    val out = CdcStream.decodeKafka(raw).orderBy("id")
      .select("id", "event_type", "lsn").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("k1", CdcStream.Upsert, 7L), ("k2", CdcStream.Delete, 8L)))
  }

  test("transformWithState variant matches flatMapGroupsWithState semantics") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ms = MemoryStream[Change]
    val updates = CdcStream.latestWinsUpdatesTws(ms.toDS())
    val q = updates.writeStream.format("memory").queryName("tws")
      .outputMode("update").start()

    ms.addData(up("a", 1, "v1"), up("b", 2, "b1"))
    q.processAllAvailable()
    ms.addData(up("a", 3, "v2"), del("b", 4))
    q.processAllAvailable()
    ms.addData(up("a", 1, "v1"))   // stale redelivery -> no regression
    q.processAllAvailable()
    q.stop()

    val emissions = spark.table("tws").as[ViewUpdate].collect()
    assert(emissions.length == 4, s"got ${emissions.toSeq}")
    val lastA = emissions.filter(_.id == "a").last
    assert(lastA.present && lastA.message.contains("v2"))
    assert(!emissions.filter(_.id == "b").last.present)
  }

  test("envelope decode tolerates schema evolution (extra and missing fields)") {
    import spark.implicits._
    val lines = Seq(
      // extra unknown fields at every level -> ignored
      """{"key":{"id":"e1","shard":7},"value":{"before":null,"after":{"id":"e1","create_time":1,"update_time":1,"message":"m","username":"u","new_col":"x"},"source":{"lsn":1,"ts_ms":1,"txId":1,"sequence":"[1,2]"},"op":"c","ts_ms":1,"transaction":null}}""",
      // missing optional fields (no source.txId, no ts_ms) -> nulls
      """{"key":{"id":"e2"},"value":{"before":null,"after":{"id":"e2","create_time":2,"update_time":2,"message":"n","username":"u"},"source":{"lsn":2},"op":"c"}}""")
    val df = spark.read.schema(CdcStream.fileRecordSchema).json(lines.toDS())
    val out = CdcStream.decodeFile(df).orderBy("id")
      .select("id", "event_type", "lsn").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("e1", CdcStream.Upsert, 1L), ("e2", CdcStream.Upsert, 2L)))
  }

  test("transformWithState with a real TTL starts and processes (processing-time mode)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ms = MemoryStream[Change]
    val updates = CdcStream.latestWinsUpdatesTws(ms.toDS(),
      org.apache.spark.sql.streaming.TTLConfig(java.time.Duration.ofHours(1)))
    val q = updates.writeStream.format("memory").queryName("twsttl")
      .outputMode("update").start()
    ms.addData(up("x", 1, "v1"))
    q.processAllAvailable()
    ms.addData(up("x", 2, "v2"))
    q.processAllAvailable()
    q.stop()

    val emissions = spark.table("twsttl").as[ViewUpdate].collect()
    assert(emissions.length == 2 && emissions.last.message.contains("v2"),
      s"got ${emissions.toSeq}")
  }
}
