package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.streaming.CdcWebDemo

class CdcWebDemoSpec extends SparkSpec {

  test("demo HTTP surface: page served from the jar, /ws-port reports the live port") {
    val http = CdcWebDemo.startHttp(httpPort = 0, wsPort = 45678)
    try {
      val port = http.getAddress.getPort
      val client = HttpClient.newHttpClient()
      def get(path: String): HttpResponse[String] =
        client.send(
          HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).build(),
          HttpResponse.BodyHandlers.ofString())

      val page = get("/")
      assert(page.statusCode() == 200)
      assert(page.headers().firstValue("Content-Type").orElse("").startsWith("text/html"))
      // the page's contract with the engine: discovers the socket via
      // /ws-port and applies the PushSink wire frames into a keyed
      // map, presented newest-create_time-first
      for (hook <- Seq("/ws-port", "UPSERT", "DELETE", "create_time", "WebSocket"))
        assert(page.body().contains(hook), s"page lost its '$hook' hook")

      assert(get("/ws-port").body().trim == "45678")
      assert(get("/nope").statusCode() == 404)
    } finally http.stop(0)
  }
}
