package graft.catalog

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.spec.{TableMetadataJson, ViewMetadataJson}

/** Minimal Iceberg-REST-protocol server over any [[Catalog]] backend —
  * serves a warehouse to [[RestCatalog]] clients (and is the in-process
  * stub the client's tests run against; JDK `com.sun.net.httpserver`, no
  * extra dependencies). Commit requests run the backend's own
  * requirement-check + CAS, so optimistic concurrency holds across every
  * client of the server: a lost race maps to HTTP 409.
  */
class RestCatalogServer(inner: Catalog, port: Int = 0) {
  private val mapper = new ObjectMapper()
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  def start(): Int = {
    server.createContext("/v1/", handle _)
    server.setExecutor(null) // single-threaded dispatch; Catalog does its own locking
    server.start()
    server.getAddress.getPort
  }

  def uri: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  def stop(): Unit = server.stop(0)

  // getRequestURI.getPath arrives percent-DECODED; multi-level namespaces
  // are joined by the 0x1F unit separator (REST spec)
  private def splitNs(seg: String): Seq[String] = seg.split('\u001F').toSeq

  private def respond(ex: HttpExchange, code: Int, body: String = ""): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** Error payloads go through jackson — a message containing quotes or
    * newlines must still serialize as valid JSON. */
  private def errorJson(e: Throwable): String = {
    val n = mapper.createObjectNode()
    n.put("error", Option(e.getMessage).getOrElse(e.getClass.getName))
    n.toString
  }

  private def tableJson(t: graft.table.IceTable): String = {
    val n = mapper.createObjectNode()
    n.put("metadata-location", s"${t.metadata.location}/metadata")
    n.set[com.fasterxml.jackson.databind.JsonNode]("metadata",
      mapper.readTree(TableMetadataJson.toJson(t.metadata)))
    n.toString
  }

  private def handle(ex: HttpExchange): Unit = try {
    val method = ex.getRequestMethod
    val parts = ex.getRequestURI.getPath.stripPrefix("/v1/").split('/').filter(_.nonEmpty).toSeq
    def body(): String = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

    (method, parts) match {
      // ---- namespaces ----
      case ("GET", Seq("namespaces")) =>
        val n = mapper.createObjectNode()
        val arr = n.putArray("namespaces")
        inner.listNamespaces().foreach { ns =>
          val e = arr.addArray(); ns.foreach(e.add)
        }
        respond(ex, 200, n.toString)
      case ("POST", Seq("namespaces")) =>
        import scala.jdk.CollectionConverters._
        val ns = mapper.readTree(body()).get("namespace").elements().asScala.map(_.asText()).toSeq
        inner.createNamespace(ns)
        respond(ex, 200, """{}""")
      case ("DELETE", Seq("namespaces", ns)) =>
        inner.dropNamespace(splitNs(ns)); respond(ex, 204)

      // ---- tables ----
      case ("GET", Seq("namespaces", ns, "tables")) =>
        val n = mapper.createObjectNode()
        val arr = n.putArray("identifiers")
        inner.listTables(splitNs(ns)).foreach { id =>
          val e = arr.addObject()
          val nsArr = e.putArray("namespace"); id.namespace.foreach(nsArr.add)
          e.put("name", id.name)
        }
        respond(ex, 200, n.toString)
      case ("POST", Seq("namespaces", ns, "tables")) =>
        val req = mapper.readTree(body())
        val ident = TableIdent(splitNs(ns), req.get("name").asText())
        import scala.jdk.CollectionConverters._
        val props = Option(req.get("properties")).map(_.properties().asScala
          .map(e => e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty[String, String])
        val t = inner.createTable(ident,
          TableMetadataJson.parseSchema(req.get("schema")),
          Option(req.get("partition-spec")).map(TableMetadataJson.parseSpec)
            .getOrElse(graft.spec.PartitionSpec.unpartitioned),
          props)
        respond(ex, 200, tableJson(t))
      case ("GET", Seq("namespaces", ns, "tables", t)) =>
        inner.loadTable(TableIdent(splitNs(ns), t)) match {
          case Some(tab) => respond(ex, 200, tableJson(tab))
          case None => respond(ex, 404, """{"error":"no such table"}""")
        }
      case ("POST", Seq("namespaces", ns, "register")) =>
        val req = mapper.readTree(body())
        val ident = TableIdent(splitNs(ns), req.get("name").asText())
        val t = inner.registerTable(ident, req.get("metadata-location").asText())
        respond(ex, 200, tableJson(t))
      case ("DELETE", Seq("namespaces", ns, "tables", t)) =>
        inner.dropTable(TableIdent(splitNs(ns), t)); respond(ex, 204)
      case ("POST", Seq("namespaces", ns, "tables", t)) =>
        val ident = TableIdent(splitNs(ns), t)
        try {
          val next = inner.updateTable(RestJson.parseCommit(ident, body()))
          val n = mapper.createObjectNode()
          n.put("metadata-location", s"${next.location}/metadata")
          n.set[com.fasterxml.jackson.databind.JsonNode]("metadata",
            mapper.readTree(TableMetadataJson.toJson(next)))
          respond(ex, 200, n.toString)
        } catch {
          case e: CommitConflictException => respond(ex, 409, errorJson(e))
          case e: IllegalStateException => respond(ex, 404, errorJson(e))
        }

      // ---- rename (REST OpenAPI renameTable/renameView shape) ----
      case ("POST", Seq("tables", "rename")) | ("POST", Seq("views", "rename")) =>
        import scala.jdk.CollectionConverters._
        val req = mapper.readTree(body())
        def ident(field: String): TableIdent = {
          val n = req.get(field)
          TableIdent(n.get("namespace").elements().asScala.map(_.asText()).toSeq,
            n.get("name").asText())
        }
        try {
          if (parts.head == "tables") inner.renameTable(ident("source"), ident("destination"))
          else inner.renameView(ident("source"), ident("destination"))
          respond(ex, 204)
        } catch {
          // "already exists" → 409 (destination conflict); anything else
          // the backends raise for rename is a missing source → 404
          case e: IllegalArgumentException if
            Option(e.getMessage).exists(_.contains("already exists")) =>
            respond(ex, 409, errorJson(e))
          case e @ (_: IllegalArgumentException | _: IllegalStateException) =>
            respond(ex, 404, errorJson(e))
        }

      // ---- views (full versioned metadata documents on the wire) ----
      case ("POST", Seq("namespaces", ns, "views")) =>
        val req = mapper.readTree(body())
        inner.createView(TableIdent(splitNs(ns), req.get("name").asText()),
          ViewMetadataJson.fromJson(req.get("metadata").toString))
        respond(ex, 200, """{}""")
      case ("PUT", Seq("namespaces", ns, "views", v)) =>
        val req = mapper.readTree(body())
        try {
          inner.replaceView(TableIdent(splitNs(ns), v),
            ViewMetadataJson.fromJson(req.get("metadata").toString))
          respond(ex, 200, """{}""")
        } catch {
          case e: IllegalArgumentException => respond(ex, 404, errorJson(e))
        }
      case ("GET", Seq("namespaces", ns, "views", v)) =>
        inner.loadView(TableIdent(splitNs(ns), v)) match {
          case Some(m) =>
            val n = mapper.createObjectNode()
            n.set[com.fasterxml.jackson.databind.JsonNode]("metadata",
              mapper.readTree(ViewMetadataJson.toJson(m)))
            respond(ex, 200, n.toString)
          case None => respond(ex, 404, """{"error":"no such view"}""")
        }
      case ("DELETE", Seq("namespaces", ns, "views", v)) =>
        inner.dropView(TableIdent(splitNs(ns), v)); respond(ex, 204)

      case _ => respond(ex, 404, """{"error":"no such route"}""")
    }
  } catch {
    case e: Exception => respond(ex, 500, errorJson(e))
  }
}
