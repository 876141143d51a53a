package graft

import java.io.{BufferedReader, InputStreamReader}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.sinks.{PushServer, PushSink}
import graft.streaming.CdcStream
import graft.streaming.CdcStream.Change

/** End-to-end push fan-out: CDC change stream → latest-wins updates →
  * broadcast to every connected TCP client — the reference's
  * WebSocket pipeline (`MessageConsumer` → event bus →
  * `MessageWebSocketHandler.broadcast`) re-expressed as a streaming
  * sink, including its per-client failure tolerance.
  */
class PushSinkSpec extends SparkSpec {

  private def up(id: String, lsn: Long, msg: String): Change =
    Change(CdcStream.Upsert, id, Some(lsn * 100), Some(lsn * 100),
           Some(msg), Some("u"), Some(lsn), Some(lsn * 100))

  private def del(id: String, lsn: Long): Change =
    Change(CdcStream.Delete, id, None, None, None, None, Some(lsn), Some(lsn * 100))

  private final class Client(port: Int) extends AutoCloseable {
    val socket = new Socket("127.0.0.1", port)
    socket.setSoTimeout(10000)
    private val in = new BufferedReader(
      new InputStreamReader(socket.getInputStream, StandardCharsets.UTF_8))
    def readLine(): String = in.readLine()
    override def close(): Unit = socket.close()
  }

  private def awaitClients(server: PushServer, n: Int): Unit = {
    val deadline = System.nanoTime() + 10e9.toLong
    while (server.clientCount < n && System.nanoTime() < deadline) Thread.sleep(10)
    assert(server.clientCount >= n, s"only ${server.clientCount} of $n clients connected")
  }

  test("broadcasts UPSERT/DELETE frames to all clients; dead client is isolated") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val server = new PushServer()
    val c1 = new Client(server.boundPort)
    val c2 = new Client(server.boundPort)
    awaitClients(server, 2)

    val ms = MemoryStream[Change]
    val q = PushSink.run(
      CdcStream.latestWinsUpdates(ms.toDS()), server,
      Files.createTempDirectory("pushcp").toString)
    try {
      ms.addData(up("m1", 1, "hello"))
      q.processAllAvailable()

      val f1 = c1.readLine(); val f2 = c2.readLine()
      assert(f1 == f2, s"clients diverged: $f1 vs $f2")
      assert(f1.contains(""""type":"UPSERT"""") && f1.contains(""""id":"m1"""") &&
             f1.contains(""""message":"hello""""), f1)

      // one client dies mid-stream: the broadcast must drop it and
      // keep serving the survivor (reference MessageWebSocketHandler
      // swallows per-session failures)
      c2.close()
      ms.addData(del("m1", 2))
      q.processAllAvailable()
      // a dead TCP peer may need a second write to surface the error;
      // push one more frame so eviction is observable
      ms.addData(up("m2", 3, "still here"))
      q.processAllAvailable()

      val tomb = c1.readLine()
      assert(tomb.contains(""""type":"DELETE"""") && tomb.contains(""""id":"m1""""), tomb)
      // DELETE carries no row image, like the reference's tombstone frame
      assert(!tomb.contains("message"), tomb)
      val next = c1.readLine()
      assert(next.contains(""""id":"m2"""") && next.contains("still here"), next)
    } finally {
      q.stop()
      c1.close()
      server.close()
    }
  }

  test("wire frame shape matches the reference WsEvent contract") {
    import spark.implicits._
    val updates = Seq(
      CdcStream.ViewUpdate("a", present = true, Some("msg"), Some("alice"),
                           Some(100L), Some(200L)),
      CdcStream.ViewUpdate("b", present = false, None, None, None, None)).toDS()
    val frames = PushSink.toWireFrames(updates).collect().map(_.getString(0)).sorted
    assert(frames(1) ==
      """{"type":"UPSERT","id":"a","content":{"create_time":100,"update_time":200,"message":"msg","username":"alice"}}""")
    // to_json omits null struct fields -> tombstone has no content key,
    // the same "no row image" semantics as the reference DELETE frame
    assert(frames(0) == """{"type":"DELETE","id":"b"}""")
  }
}
