package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.sinks.{PushServer, PushSink, WebSocketTransport}

/** Browser demo of the push surface (reference R5/R6 end-to-end in an
  * actual browser): the engine's CDC update stream fans out through
  * [[graft.sinks.PushServer]] speaking RFC 6455, and
  * `static/index.html` (served here, checked in under
  * `src/main/resources/static/`) maintains the client-side
  * materialized view exactly as the reference's demo page does
  * (`static/index.html:87-212` there): keyed map ← UPSERT/DELETE
  * frames, rendered newest-create_time-first (R5 order).
  *
  * Differences from the reference demo, by design: the reference page
  * also POSTs new messages to its Spring REST API backed by Postgres —
  * the engine is a query/streaming library whose write path is the
  * envelope-file test-input generator (SURVEY §2.A R7/R8), so this
  * demo is driven by appending Debezium-envelope JSON lines to
  * `inputDir` (same fixtures as CdcStreamSpec), and the page is
  * read-only. Frame field names are the engine's wire contract
  * (`create_time` epoch millis, PushSinkSpec) rather than the
  * reference's camelCase — the demo surface under test is the
  * materialized-view UX, which is behavior-identical.
  *
  * Usage: runMain graft.streaming.CdcWebDemo <inputDir> <workDir> [httpPort]
  * Then open the printed URL and append envelope files to <inputDir>.
  * Binds 127.0.0.1 only.
  */
object CdcWebDemo {

  /** Start the HTTP side: serves the demo page at `/` and the push
    * server's bound WebSocket port at `/ws-port` (the page can't know
    * the OS-assigned port). Returns the running server. */
  def startHttp(httpPort: Int, wsPort: Int): HttpServer = {
    val http = HttpServer.create(new InetSocketAddress("127.0.0.1", httpPort), 0)
    def respond(x: HttpExchange, status: Int, mime: String, body: Array[Byte]): Unit = {
      x.getResponseHeaders.set("Content-Type", mime)
      x.sendResponseHeaders(status, body.length.toLong)
      try x.getResponseBody.write(body) finally x.close()
    }
    http.createContext("/", (x: HttpExchange) =>
      x.getRequestURI.getPath match {
        case "/" | "/index.html" =>
          val in = getClass.getResourceAsStream("/static/index.html")
          if (in == null) respond(x, 404, "text/plain", "page missing".getBytes(UTF_8))
          else respond(x, 200, "text/html; charset=utf-8",
            try in.readAllBytes() finally in.close())
        case "/ws-port" =>
          respond(x, 200, "text/plain", wsPort.toString.getBytes(UTF_8))
        case _ =>
          respond(x, 404, "text/plain", "not found".getBytes(UTF_8))
      })
    http.start()
    http
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: CdcWebDemo <inputDir> <workDir> [httpPort]")
      sys.exit(2)
    }
    val inputDir = args(0)
    val workDir = args(1)
    val httpPort = if (args.length > 2) args(2).toInt else 8080
    val spark = graft.engine.Graft.session("local[4]", 4)

    val push = new PushServer(port = 0, transport = WebSocketTransport)
    val http = startHttp(httpPort, push.boundPort)
    println(s"demo_url=http://127.0.0.1:$httpPort/ ws_port=${push.boundPort}")

    val changes = CdcStream.asChanges(CdcStream.decodeFile(
      spark.readStream.schema(CdcStream.fileRecordSchema).json(inputDir)))
    val q = PushSink.run(CdcStream.latestWinsUpdates(changes), push,
      s"$workDir/checkpoint")
    try q.awaitTermination()
    finally { http.stop(0); push.close(); spark.stop() }
  }
}
