package graft.api

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.VectorizeEngine
import graft.providers.Json
import graft.types.{FilterValue, Model, VectorizeJob}
import org.apache.spark.sql.functions.{col, struct, to_json}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

/** Thin HTTP facade over [[VectorizeEngine]] — the Spark analogue of
  * the reference's actix server (SURVEY §7.1 item 8), mirroring its
  * route shapes:
  *
  *   - `POST   /api/v1/table`            (server/src/routes/table.rs:25-61)
  *   - `DELETE /api/v1/table/{job_name}` (table.rs:69-110)
  *   - `GET    /api/v1/search`           (search.rs:110-117, hybrid semantics)
  *   - `POST   /api/v1/search`           (search.rs:120-133, JSON body)
  *   - `GET    /health`, `/health/live`, `/health/ready` (health.rs:6-66)
  *
  * Built on the JDK's HttpServer (build.sbt is dependency-closed).
  * One facade per driver: requests run Spark jobs through the engine,
  * so the server is a control/query plane, not a data plane — result
  * sets are the engine's LIMITed search outputs, never table scans.
  *
  * Divergences from the reference, by design:
  *   - job ids are name-derived UUIDs (no database to generate them);
  *   - `/health` reports the engine's job catalog reachability instead
  *     of a worker heartbeat (the worker process does not exist here —
  *     refresh runs inside Spark);
  *   - `update_time_col` type validation happens at first refresh, not
  *     at registration (sources are DataFrames, not Postgres tables).
  */
final class HttpApi(engine: VectorizeEngine, port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  // small pool: each request may run Spark jobs; Spark's scheduler
  // handles concurrent job submission from multiple threads
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
  @volatile private var started = false
  @volatile private var stopped = false

  /** The actual port (useful with port = 0 → ephemeral). */
  def boundPort: Int = server.getAddress.getPort

  def start(): Unit = synchronized {
    // the JDK HttpServer cannot be restarted after stop(); make that
    // an explicit error instead of a confusing duplicate-context one
    if (stopped) throw new IllegalStateException(
      "HttpApi cannot be restarted after stop(); create a new instance")
    if (!started) {
      server.createContext("/api/v1/table", exchange => safely(exchange) {
        val path = exchange.getRequestURI.getPath
        // the JDK server routes by PREFIX; reject non-exact suffixes
        // like the reference's actix router would (404, not a handler)
        (exchange.getRequestMethod, path.stripPrefix("/api/v1/table")) match {
          case ("POST", "" | "/") => createTable(exchange)
          case ("DELETE", sub) if sub.startsWith("/") && sub.length > 1
              && !sub.drop(1).contains('/') =>
            deleteTable(exchange, sub.drop(1))
          case (_, "" | "/") => respond(exchange, 405, jsonError("method not allowed"))
          case _ => respond(exchange, 404, jsonError("not found"))
        }
      })
      server.createContext("/api/v1/search", exchange => safely(exchange) {
        if (exchange.getRequestURI.getPath != "/api/v1/search")
          respond(exchange, 404, jsonError("not found"))
        else exchange.getRequestMethod match {
          case "GET" => search(exchange, parseQueryParams(exchange))
          case "POST" => search(exchange, parseSearchBody(exchange))
          case _ => respond(exchange, 405, jsonError("method not allowed"))
        }
      })
      server.createContext("/health", exchange => safely(exchange) {
        health(exchange, exchange.getRequestURI.getPath.stripPrefix("/health"))
      })
      server.setExecutor(pool)
      server.start()
      started = true
    }
  }

  def stop(): Unit = synchronized {
    if (started) {
      server.stop(0)
      pool.shutdown() // non-daemon workers would otherwise pin the JVM
      started = false
      stopped = true
    }
  }

  // -----------------------------------------------------------------
  // routes
  // -----------------------------------------------------------------

  private def createTable(exchange: HttpExchange): Unit = {
    val body = new String(exchange.getRequestBody.readAllBytes(), UTF_8)
    MiniJson.parse(body) match {
      case Left(err) => respond(exchange, 400, jsonError(s"invalid JSON: $err"))
      case Right(v) =>
        val o = v.asObj.getOrElse(
          return respond(exchange, 400, jsonError("body must be a JSON object")))
        def str(k: String): Option[String] = o.get(k).flatMap(_.asString)
        def req(k: String): String = str(k).getOrElse(
          throw new IllegalArgumentException(s"missing required field '$k'"))
        val job = VectorizeJob(
          jobName = req("job_name"),
          srcTable = req("src_table"),
          srcColumns = o.get("src_columns").flatMap(_.asArr).getOrElse(
              throw new IllegalArgumentException("missing required field 'src_columns'"))
            .map(_.asString.getOrElse(throw new IllegalArgumentException(
              "'src_columns' must be an array of strings"))),
          primaryKey = req("primary_key"),
          updateTimeCol = str("update_time_col"),
          model = Model.parse(req("model")).fold(
            e => throw new IllegalArgumentException(e), identity),
          schedule = str("schedule").getOrElse("* * * * *"))
        engine.createJob(job)
        // deterministic name-derived id: no database generates one here
        val id = java.util.UUID.nameUUIDFromBytes(
          job.jobName.getBytes(UTF_8)).toString
        respond(exchange, 200, s"""{"id":${Json.str(id)}}""")
    }
  }

  private def deleteTable(exchange: HttpExchange, jobName: String): Unit =
    if (!engine.listJobs.exists(_.jobName == jobName))
      respond(exchange, 404, jsonError(s"Job not found: $jobName"))
    else {
      engine.deleteJob(jobName)
      respond(exchange, 200,
        s"""{"job_name":${Json.str(jobName)},""" +
          s""""message":${Json.str(s"Successfully deleted job '$jobName'")}}""")
    }

  /** Search request fields (reference defaults, search.rs:67-84). */
  private final case class SearchReq(jobName: String, query: String,
      limit: Int, windowSize: Int, rrfK: Double, semanticWt: Double,
      ftsWt: Double, filters: Map[String, FilterValue])

  private def search(exchange: HttpExchange, req: SearchReq): Unit = {
    if (!engine.listJobs.exists(_.jobName == req.jobName))
      return respond(exchange, 404, jsonError(s"Job not found: ${req.jobName}"))
    // the reference's /search runs HYBRID search and returns the rows
    // as a JSON array of to_jsonb values (search.rs:185-225)
    val rows = engine.hybridSearch(req.jobName, req.query, limit = req.limit,
        windowSize = Some(req.windowSize), rrfK = req.rrfK,
        semanticWt = req.semanticWt, ftsWt = req.ftsWt, filters = req.filters)
      .select(to_json(struct(col("*"))).as("results"))
      .collect().map(_.getString(0))
    respond(exchange, 200, rows.mkString("[", ",", "]"))
  }

  private val knownSearchKeys =
    Set("job_name", "query", "limit", "window_size", "rrf_k", "semantic_wt", "fts_wt")

  private def buildSearchReq(get: String => Option[String],
      filterPairs: Iterable[(String, String)]): SearchReq = {
    def reqStr(k: String): String = get(k).getOrElse(
      throw new IllegalArgumentException(s"missing required field '$k'"))
    val limit = get("limit").map(_.toInt).getOrElse(10)
    SearchReq(
      jobName = reqStr("job_name"),
      query = reqStr("query"),
      limit = limit,
      windowSize = get("window_size").map(_.toInt).getOrElse(5 * limit),
      rrfK = get("rrf_k").map(_.toDouble).getOrElse(60.0),
      semanticWt = get("semantic_wt").map(_.toDouble).getOrElse(1.0),
      ftsWt = get("fts_wt").map(_.toDouble).getOrElse(1.0),
      // every unknown key is a filter in "op.value" form, the same
      // flattening the reference's GET route uses (search.rs:29-30)
      filters = filterPairs.map { case (k, raw) =>
        k -> FilterValue.parse(raw).fold(
          e => throw new IllegalArgumentException(s"filter '$k': $e"), identity)
      }.toMap)
  }

  private def parseQueryParams(exchange: HttpExchange): SearchReq = {
    val params = Option(exchange.getRequestURI.getRawQuery).getOrElse("")
      .split("&").filter(_.nonEmpty).map { kv =>
        val Array(k, v) = kv.split("=", 2).padTo(2, "")
        java.net.URLDecoder.decode(k, UTF_8) -> java.net.URLDecoder.decode(v, UTF_8)
      }.toMap
    buildSearchReq(params.get, params.view.filterKeys(!knownSearchKeys(_)).toSeq)
  }

  private def parseSearchBody(exchange: HttpExchange): SearchReq = {
    val body = new String(exchange.getRequestBody.readAllBytes(), UTF_8)
    val o = MiniJson.parse(body).fold(
        e => throw new IllegalArgumentException(s"invalid JSON: $e"), identity)
      .asObj.getOrElse(throw new IllegalArgumentException("body must be a JSON object"))
    def get(k: String): Option[String] = o.get(k).map {
      case MiniJson.JStr(s) => s
      case MiniJson.JNum(d) => if (d == d.toLong) d.toLong.toString else d.toString
      case other => throw new IllegalArgumentException(s"field '$k': unexpected $other")
    }
    // POST carries filters as a nested object (search.rs:34-49), each
    // value an "op.value" string
    val filterPairs = o.get("filters").flatMap(_.asObj).getOrElse(Map.empty)
      .map { case (k, v) => k -> v.asString.getOrElse(
        throw new IllegalArgumentException(s"filter '$k' must be a string")) }
    buildSearchReq(get, filterPairs)
  }

  private def health(exchange: HttpExchange, sub: String): Unit = {
    val now = System.currentTimeMillis() / 1000
    sub match {
      case "/live" =>
        respond(exchange, 200, s"""{"status":"alive","timestamp":$now}""")
      case "/ready" | "" | "/" =>
        // readiness = the catalog is reachable (the engine refreshes
        // inside Spark; there is no separate worker to heartbeat)
        val (code, status, nJobs) =
          try { val n = engine.listJobs.size
            (200, if (sub == "/ready") "ready" else "healthy", n) }
          catch { case scala.util.control.NonFatal(_) => (503,
            if (sub == "/ready") "not_ready" else "unhealthy", 0) }
        respond(exchange, code,
          s"""{"status":"$status","jobs":$nJobs,"timestamp":$now}""")
      case _ => respond(exchange, 404, jsonError("not found"))
    }
  }

  // -----------------------------------------------------------------
  // plumbing
  // -----------------------------------------------------------------

  /** Uniform error mapping, mirroring ServerError → HTTP status
    * (server/src/errors.rs): bad input → 400, unknown entity → 404,
    * anything else → 500 with the message in a JSON body.
    */
  private def safely(exchange: HttpExchange)(body: => Unit): Unit =
    try body
    catch {
      case e: IllegalArgumentException =>
        respond(exchange, 400, jsonError(Option(e.getMessage).getOrElse("bad request")))
      case e: NoSuchElementException =>
        respond(exchange, 404, jsonError(Option(e.getMessage).getOrElse("not found")))
      case scala.util.control.NonFatal(e) =>
        respond(exchange, 500, jsonError(
          s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"))
    }

  private def jsonError(msg: String): String = s"""{"error":${Json.str(msg)}}"""

  private def respond(exchange: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    exchange.getResponseHeaders.set("Content-Type", "application/json")
    exchange.sendResponseHeaders(code, bytes.length)
    val os = exchange.getResponseBody
    try os.write(bytes) finally os.close()
  }
}
