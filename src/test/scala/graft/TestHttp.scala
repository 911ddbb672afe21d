package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** A real localhost HTTP server for remote-source tests (the JDK's
  * `com.sun.net.httpserver` — zero egress, real sockets). Routes are
  * (path → () => (status, body)); handlers re-evaluate per request so
  * tests can mutate served content between fetches. */
object TestHttp {
  def withServer(routes: Map[String, () => (Int, String)])(
      f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, handler) =>
      server.createContext(path, (ex: HttpExchange) => {
        val (code, body) = handler()
        val bytes = body.getBytes("UTF-8")
        // RFC 9112: -1 sends no body (404s and empty 200 pages)
        ex.sendResponseHeaders(code,
          if (code == 404 || bytes.isEmpty) -1L else bytes.length.toLong)
        try if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
        finally ex.close()
      })
    }
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }
}
