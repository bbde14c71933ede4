package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import org.scalatest.funsuite.AnyFunSuite
import graft.stream.Alerts
import graft.stream.Heartbeat.NodeEvent

/** T6 deployment form: the HTTP alert poster delivers the ntfy-shaped
  * request (Title header + label body) and surfaces server errors. */
class HttpAlertSpec extends AnyFunSuite {

  private def withServer(status: Int)(f: (String, java.util.List[(String, String)]) => Unit): Unit = {
    val received = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(String, String)]())
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/alert", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        received.add((ex.getRequestHeaders.getFirst("Title"), body))
        ex.sendResponseHeaders(status, -1)
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/alert", received)
    finally server.stop(0)
  }

  test("posts the label with the Title header") {
    withServer(200) { (url, received) =>
      val sink = new Alerts.HttpAlertSink(url, title = "farm-monitor")
      sink.deliver(NodeEvent(7L, "OFFLINE", 123456L))
      assert(received.size() == 1)
      val (title, body) = received.get(0)
      assert(title == "farm-monitor")
      assert(body == Alerts.label(NodeEvent(7L, "OFFLINE", 123456L)))
    }
  }

  test("server error surfaces as an exception (epoch retries, at-least-once)") {
    withServer(500) { (url, _) =>
      val sink = new Alerts.HttpAlertSink(url)
      intercept[java.io.IOException] {
        sink.deliver(NodeEvent(7L, "OFFLINE", 1L))
      }
    }
  }
}
