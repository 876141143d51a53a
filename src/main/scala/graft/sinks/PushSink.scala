package graft.sinks

import java.io.IOException
import java.net.{ServerSocket, Socket, SocketException}
import java.util.concurrent.CopyOnWriteArrayList

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.CdcStream

/** Push fan-out sink — the Spark analog of the reference's WebSocket
  * broadcast (`MessageWebSocketHandler.kt:25,56-66` + registration
  * `WebSocketConfiguration.kt:14-18`): every connected client receives
  * every view update, serialized once per event; a failing client is
  * dropped without affecting the others or the pipeline (the reference
  * swallows per-session send failures at
  * `MessageWebSocketHandler.kt:62-64`).
  *
  * The transport is pluggable ([[PushTransport]]): the default is a
  * plain TCP line protocol (newline-delimited JSON, dependency-free),
  * and [[WebSocketTransport]] speaks the reference's actual transport
  * — RFC 6455 handshake + text frames — so a browser `WebSocket`
  * client consumes the stream directly. The semantics under test
  * (broadcast, per-client failure isolation, UPSERT/DELETE frame
  * shape) are transport-independent.
  *
  * Scale posture: what flows here is the CHANGE stream (one frame per
  * changed key per micro-batch, from
  * [[CdcStream.latestWinsUpdates]]), not table scans — the same
  * driver-side volume the reference's single-JVM consumer handles. A
  * deployment fanning out to many thousands of clients would put a
  * broker between the query and the clients (executors publish via
  * `foreachPartition`); the frame schema is identical either way.
  */
final class PushServer(port: Int = 0, outboxFrames: Int = 1024,
                       transport: PushTransport = LineTransport) extends AutoCloseable {

  /** One connected client: a bounded outbox drained by its own writer
    * thread. `broadcast` only ever enqueues, so a STALLED client (hung
    * reader, TCP backpressure — no IOException, the write just blocks)
    * fills its own queue and gets evicted; it can never block the
    * streaming pipeline or starve the other clients. The transport
    * handshake runs HERE (not on the accept loop), so a client that
    * connects and never completes it only stalls itself; frames
    * broadcast meanwhile wait in its outbox and flush after the 101. */
  private final class Client(val socket: Socket) {
    val outbox = new java.util.concurrent.LinkedBlockingQueue[Array[Byte]](outboxFrames)
    @volatile var dead = false
    val writer = new Thread(() => {
      try {
        if (!transport.handshake(socket)) evict(Client.this)
        else {
          val out = socket.getOutputStream
          while (!dead) {
            val frame = outbox.poll(1, java.util.concurrent.TimeUnit.SECONDS)
            if (frame != null) { out.write(frame); out.flush() }
          }
        }
      } catch {
        case _: IOException | _: InterruptedException => ()
      } finally evict(this)
    }, s"push-client-writer-${socket.getPort}")
    writer.setDaemon(true)
  }

  private val server = new ServerSocket(port)
  private val clients = new CopyOnWriteArrayList[Client]()
  @volatile private var closed = false

  /** Actual bound port (pass 0 to let the OS pick — tests do). */
  val boundPort: Int = server.getLocalPort

  private def evict(c: Client): Unit = {
    c.dead = true
    clients.remove(c)
    try c.socket.close() catch { case _: IOException => () }
  }

  private val acceptor = new Thread(() => {
    try while (!closed) {
      val s = server.accept()
      s.setTcpNoDelay(true)
      val c = new Client(s)
      clients.add(c)
      c.writer.start()
    } catch {
      case _: SocketException => () // server socket closed — shutdown
      case _: IOException     => ()
    }
  }, s"push-server-accept-$boundPort")
  acceptor.setDaemon(true)
  acceptor.start()

  def clientCount: Int = clients.size()

  /** Enqueue one frame for every connected client. Serialization AND
    * transport encoding happen once per broadcast; the byte array is
    * shared across outboxes. Never blocks: a client that cannot keep
    * up (full outbox) or whose writer died is evicted, exactly like
    * the reference swallowing per-session send failures — the other
    * clients and the pipeline are unaffected. */
  def broadcast(frame: String): Unit = {
    val bytes = transport.encode(frame)
    clients.forEach { c =>
      if (c.dead || !c.outbox.offer(bytes)) evict(c)
    }
  }

  override def close(): Unit = {
    closed = true
    try server.close() catch { case _: IOException => () }
    clients.forEach(evict)
    clients.clear()
  }
}

object PushSink {

  /** Serialize view updates to the reference's wire shape
    * (`WsEvent(type, id, content)` — `MessageWebSocketHandler.kt:68-84`):
    * `{"type":"UPSERT"|"DELETE","id":...,"content":{...}|null}`,
    * with `content` null on DELETE exactly like the reference's
    * tombstone frame. */
  def toWireFrames(updates: Dataset[CdcStream.ViewUpdate]): DataFrame =
    updates.toDF().select(
      to_json(struct(
        when(col("present"), lit(CdcStream.Upsert))
          .otherwise(lit(CdcStream.Delete)).as("type"),
        col("id"),
        when(col("present"), struct(
          col("create_time"), col("update_time"),
          col("message"), col("username"))).as("content")
      )).as("frame"))

  /** Stream view updates into a [[PushServer]]: one broadcast per
    * changed key per micro-batch. The collect is bounded by the change
    * volume of the batch (not table size) — the driver is the fan-out
    * point exactly as in the reference's consumer JVM. */
  def run(updates: Dataset[CdcStream.ViewUpdate], server: PushServer,
          checkpointDir: String,
          trigger: org.apache.spark.sql.streaming.Trigger =
            org.apache.spark.sql.streaming.Trigger.ProcessingTime(100)): StreamingQuery =
    toWireFrames(updates).writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.collect().foreach(r => server.broadcast(r.getString(0)))
      }
      .start()
}
