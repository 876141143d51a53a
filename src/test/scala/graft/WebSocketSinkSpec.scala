package graft

import java.io.{InputStream, OutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.{PushServer, WebSocketTransport}

/** RFC 6455 WebSocket transport over the push fan-out sink: handshake
  * digest (RFC sample vector), end-to-end text frames readable by a
  * minimal client, 16-bit length frames, per-client failure isolation
  * and the silent-client (never handshakes) case.
  */
class WebSocketSinkSpec extends AnyFunSuite {

  /** Minimal WS client: do the upgrade, then read unmasked text
    * frames. */
  private final class WsClient(port: Int) extends AutoCloseable {
    val socket = new Socket("127.0.0.1", port)
    socket.setSoTimeout(10000)
    private val out: OutputStream = socket.getOutputStream
    private val in: InputStream = socket.getInputStream

    def handshake(key: String = "dGhlIHNhbXBsZSBub25jZQ=="): String = {
      out.write(("GET /events HTTP/1.1\r\n" +
        "Host: localhost\r\nUpgrade: websocket\r\nConnection: Upgrade\r\n" +
        s"Sec-WebSocket-Key: $key\r\n" +
        "Sec-WebSocket-Version: 13\r\n\r\n").getBytes(ISO_8859_1))
      out.flush()
      val head = new StringBuilder
      while (head.length < 4 || head.substring(head.length - 4) != "\r\n\r\n") {
        val b = in.read()
        assert(b >= 0, "connection closed during handshake")
        head.append(b.toChar)
      }
      head.toString
    }

    def readFrame(): String = {
      def byte(): Int = { val b = in.read(); assert(b >= 0, "eof"); b }
      val b0 = byte()
      assert(b0 == 0x81, f"expected FIN+text opcode, got 0x$b0%02x")
      val b1 = byte()
      assert((b1 & 0x80) == 0, "server frames must be unmasked")
      val len = (b1 & 0x7f) match {
        case 126 => (byte() << 8) | byte()
        case 127 => (0 until 8).foldLeft(0L)((acc, _) => (acc << 8) | byte()).toInt
        case n => n
      }
      val buf = new Array[Byte](len)
      var off = 0
      while (off < len) {
        val r = in.read(buf, off, len - off)
        assert(r > 0, "eof mid-frame")
        off += r
      }
      new String(buf, UTF_8)
    }

    override def close(): Unit = socket.close()
  }

  private def awaitClients(server: PushServer, n: Int): Unit = {
    val deadline = System.nanoTime() + 5_000_000_000L
    while (server.clientCount != n && System.nanoTime() < deadline)
      Thread.sleep(10)
    assert(server.clientCount == n)
  }

  test("Sec-WebSocket-Accept matches the RFC 6455 sample vector") {
    assert(WebSocketTransport.acceptKey("dGhlIHNhbXBsZSBub25jZQ==") ==
      "s3pPLMBiTxaQ9kYGzzhZRbK+xOo=")
  }

  test("upgrade handshake + text frames end-to-end, including 16-bit lengths") {
    val server = new PushServer(0, transport = WebSocketTransport)
    try {
      val c = new WsClient(server.boundPort)
      val resp = c.handshake()
      assert(resp.startsWith("HTTP/1.1 101"))
      assert(resp.contains("Sec-WebSocket-Accept: s3pPLMBiTxaQ9kYGzzhZRbK+xOo="))
      awaitClients(server, 1)

      server.broadcast("""{"type":"UPSERT","id":"a"}""")
      assert(c.readFrame() == """{"type":"UPSERT","id":"a"}""")

      val big = "x" * 300 // forces the 126/16-bit length path
      server.broadcast(big)
      assert(c.readFrame() == big)
      c.close()
    } finally server.close()
  }

  test("a dead client and a never-handshaking client cannot affect the others") {
    val server = new PushServer(0, transport = WebSocketTransport)
    try {
      val healthy = new WsClient(server.boundPort)
      healthy.handshake()
      val dying = new WsClient(server.boundPort)
      dying.handshake()
      // connects but never sends the HTTP upgrade — must not block
      // the accept loop or the broadcasts
      val silent = new Socket("127.0.0.1", server.boundPort)
      awaitClients(server, 3)

      server.broadcast("one")
      assert(healthy.readFrame() == "one" && dying.readFrame() == "one")

      dying.close()
      server.broadcast("two")
      assert(healthy.readFrame() == "two")
      server.broadcast("three")
      assert(healthy.readFrame() == "three")

      healthy.close()
      silent.close()
    } finally server.close()
  }

  test("handshake without a Sec-WebSocket-Key is rejected with 400") {
    val server = new PushServer(0, transport = WebSocketTransport)
    try {
      val s = new Socket("127.0.0.1", server.boundPort)
      s.setSoTimeout(10000)
      s.getOutputStream.write(
        "GET / HTTP/1.1\r\nHost: x\r\n\r\n".getBytes(ISO_8859_1))
      s.getOutputStream.flush()
      val head = new StringBuilder
      var b = s.getInputStream.read()
      while (b >= 0) { head.append(b.toChar); b = s.getInputStream.read() }
      assert(head.toString.startsWith("HTTP/1.1 400"))
      s.close()
    } finally server.close()
  }
}
