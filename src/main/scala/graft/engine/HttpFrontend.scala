package graft.engine

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Minimal REST front-end over the Engine — the reference's HTTP command
  * surface (/root/reference/edge_lake/tcpip/http_server.py:931 `do_GET`:
  * the command arrives in the `command` header or query parameter, e.g.
  * `command=sql edge format=json select ...`; POST executes commands,
  * PUT ingests data). JDK-built-in server, zero dependencies; one route:
  *
  *   GET /?command=<urlencoded command>   -> Engine.execute output
  *   POST / with the command as the body  -> same
  *
  * The Spark driver owns the engine; each request runs on the server's
  * dispatch thread against the shared SparkSession (Spark sessions are
  * thread-safe for concurrent actions — the reference's REST worker
  * thread does the same, member_cmd.py:5070-5079).
  */
final class HttpFrontend(engine: Engine, port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  server.createContext("/", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      // PUT = data ingest (http_server.py:1844 do_PUT): headers carry
      // dbms/table/instructions, the body carries the JSON rows
      if (ex.getRequestMethod == "PUT") { handlePut(ex); return }
      val command = ex.getRequestMethod match {
        case "GET" =>
          // the reference's canonical REST shape sends the command in
          // the `command` HEADER (http_server.py:931 do_GET; curl
          // examples use -H "command: sql ..."); the ?command= query
          // param is the browser-friendly alternative
          Option(ex.getRequestHeaders.getFirst("command")).getOrElse(
            Option(ex.getRequestURI.getRawQuery).getOrElse("")
              .split("&").collectFirst {
                case p if p.startsWith("command=") =>
                  java.net.URLDecoder.decode(
                    p.substring("command=".length), "UTF-8")
              }.getOrElse(""))
        case _ =>
          // POST: the reference reads the `command` HEADER first
          // (http_server.py:1268 do_POST) — its canonical clients send
          // it with an empty body; the body is the fallback shape
          Option(ex.getRequestHeaders.getFirst("command"))
            .filter(_.nonEmpty)
            .getOrElse(new String(ex.getRequestBody.readAllBytes(),
              StandardCharsets.UTF_8))
      }
      val (code, body) =
        try (200, engine.execute(command))
        catch { case e: Exception => (400, Render.errorJson(e.getMessage)) }
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
  })

  /** PUT data ingest: `table` (and optional `instructions` = mapping
    * policy id) arrive as headers, matching the reference's
    * put_params_from_header (http_server.py:2708); the `dbms` header is
    * accepted and ignored (one catalog here). Replies with the appended
    * row count. */
  private def handlePut(ex: HttpExchange): Unit = {
    val hdr = (k: String) => Option(ex.getRequestHeaders.getFirst(k))
    val body = new String(ex.getRequestBody.readAllBytes(),
      StandardCharsets.UTF_8)
    val (code, reply) =
      try {
        val table = hdr("table").getOrElse(
          throw new IllegalArgumentException(
            "Missing 'table' name in REST PUT command"))
        val n = engine.ingest(table, body, hdr("instructions"))
        // header value is caller-supplied — escape it or a quote in
        // the name makes this application/json body unparseable
        (200, s"""{"appended": $n, "table": ${Render.jsonStr(table)}}""")
      } catch { case e: Exception => (400, Render.errorJson(e.getMessage)) }
    val bytes = reply.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  // Grafana JSON-datasource route (al_grafana.py over HTTP — §3.3):
  // POST /grafana with the panel payload -> json rows
  server.createContext("/grafana", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val payload = new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      val (code, body) =
        try (200, Render.json(GrafanaRoute.run(engine, payload)))
        catch { case e: Exception => (400, Render.errorJson(e.getMessage)) }
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
  })

  @volatile private var live = false

  def start(): Int = {
    server.start()
    live = true
    val port = server.getAddress.getPort
    // @port extends report the live REST port (the reference stamps the
    // answering node's address, unify_results.py:1260)
    engine.nodeAddress = (engine.nodeAddress._1, port)
    // surface on the `get processes` board (member_cmd.py:8521)
    engine.registerService("REST Server", () => live,
      () => s"listening on ${engine.nodeAddress._1}:$port")
    port
  }

  def stop(): Unit = { live = false; server.stop(0) }
}
