package graft.sinks

import java.net.Socket
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.security.MessageDigest
import java.util.Base64

/** Wire protocol of a [[PushServer]] connection: how a client is
  * greeted and how one broadcast frame is encoded. The broadcast /
  * failure-isolation semantics live in [[PushServer]] and are
  * transport-independent; this seam is what lets the engine speak the
  * reference's actual transport (WebSocket,
  * `MessageWebSocketHandler.kt:25,56-66`) as well as the
  * dependency-free line protocol the other specs use.
  */
trait PushTransport extends Serializable {
  /** Connection setup on the freshly accepted socket. Runs on the
    * client's own writer thread (NEVER the accept loop — a client
    * that connects and goes silent must not block other accepts).
    * Return false to reject the connection. */
  def handshake(socket: Socket): Boolean

  /** Encode one broadcast payload; called once per broadcast, the
    * resulting bytes are shared by every client's outbox. */
  def encode(frame: String): Array[Byte]
}

/** Newline-delimited JSON over raw TCP — the minimal transport. */
object LineTransport extends PushTransport {
  override def handshake(socket: Socket): Boolean = true
  override def encode(frame: String): Array[Byte] =
    (frame + "\n").getBytes(UTF_8)
}

/** RFC 6455 WebSocket server transport, hand-rolled on the JDK (no
  * dependencies): HTTP Upgrade handshake with the
  * `Sec-WebSocket-Accept` digest, then unmasked server→client text
  * frames (FIN + opcode 0x1; 7/16/64-bit payload lengths). Matches
  * the reference's transport (`MessageWebSocketHandler.kt`,
  * registration `WebSocketConfiguration.kt:14-18`) closely enough
  * that a browser `WebSocket` client can consume the event stream
  * directly. Client→server traffic after the handshake (pings, close
  * frames) is not read — a closed peer surfaces as a write failure
  * and the server evicts it, the same isolation path as every other
  * client death.
  */
object WebSocketTransport extends PushTransport {

  private val Rfc6455Guid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

  /** `Sec-WebSocket-Accept` for a client key (RFC 6455 §4.2.2):
    * Base64(SHA-1(key + GUID)). */
  def acceptKey(clientKey: String): String =
    Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("SHA-1")
        .digest((clientKey + Rfc6455Guid).getBytes(ISO_8859_1)))

  override def handshake(socket: Socket): Boolean = {
    socket.setSoTimeout(5000)
    val in = socket.getInputStream
    // Read the HTTP request head (through the blank line). Headers are
    // ISO-8859-1 per HTTP; bounded so a garbage client cannot grow the
    // buffer without limit.
    val head = new StringBuilder
    var done = false
    while (!done) {
      val b = in.read()
      if (b < 0 || head.length > 16384) return false
      head.append(b.toChar)
      if (head.length >= 4 && head.substring(head.length - 4) == "\r\n\r\n")
        done = true
    }
    val key = head.toString.split("\r\n").iterator
      .map(_.split(":", 2))
      .collectFirst {
        case Array(k, v) if k.trim.equalsIgnoreCase("Sec-WebSocket-Key") => v.trim
      }
    key match {
      case None =>
        socket.getOutputStream.write(
          "HTTP/1.1 400 Bad Request\r\nConnection: close\r\n\r\n".getBytes(ISO_8859_1))
        false
      case Some(k) =>
        val resp = "HTTP/1.1 101 Switching Protocols\r\n" +
          "Upgrade: websocket\r\n" +
          "Connection: Upgrade\r\n" +
          s"Sec-WebSocket-Accept: ${acceptKey(k)}\r\n\r\n"
        val out = socket.getOutputStream
        out.write(resp.getBytes(ISO_8859_1))
        out.flush()
        socket.setSoTimeout(0)
        true
    }
  }

  override def encode(frame: String): Array[Byte] = {
    val payload = frame.getBytes(UTF_8)
    val n = payload.length
    val header =
      if (n < 126) Array[Byte](0x81.toByte, n.toByte)
      else if (n < 65536)
        Array[Byte](0x81.toByte, 126, (n >>> 8).toByte, n.toByte)
      else
        Array[Byte](0x81.toByte, 127, 0, 0, 0, 0,
          (n >>> 24).toByte, (n >>> 16).toByte, (n >>> 8).toByte, n.toByte)
    val buf = new Array[Byte](header.length + n)
    System.arraycopy(header, 0, buf, 0, header.length)
    System.arraycopy(payload, 0, buf, header.length, n)
    buf
  }
}
