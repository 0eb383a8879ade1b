package graft.catalog

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.spec._
import graft.table.IceTable

/** Iceberg-REST-protocol wire codecs for the commit body (reference:
  * `catalogs/iceberg-rest-catalog/src/` — commit = requirements checked
  * against current metadata + updates applied to produce the next version,
  * the same `TableRequirement`/`TableUpdate` ADTs the local catalogs use).
  * Field names follow the Apache Iceberg REST OpenAPI spec (kebab-case,
  * `type` discriminator on requirements, `action` on updates).
  */
object RestJson {
  private val mapper = new ObjectMapper()
  import TableMetadataJson._

  def requirementNode(r: TableRequirement): ObjectNode = {
    val n = mapper.createObjectNode()
    r match {
      case TableRequirement.AssertRefSnapshotId(ref, snap) =>
        n.put("type", "assert-ref-snapshot-id"); n.put("ref", ref)
        snap match {
          case Some(id) => n.put("snapshot-id", id)
          case None => n.putNull("snapshot-id")
        }
      case TableRequirement.AssertCurrentSchemaId(id) =>
        n.put("type", "assert-current-schema-id"); n.put("current-schema-id", id)
      case TableRequirement.AssertDefaultSpecId(id) =>
        n.put("type", "assert-default-spec-id"); n.put("default-spec-id", id)
    }
    n
  }

  def parseRequirement(n: JsonNode): TableRequirement = n.get("type").asText() match {
    case "assert-ref-snapshot-id" =>
      val snap = Option(n.get("snapshot-id")).filter(!_.isNull).map(_.asLong())
      TableRequirement.AssertRefSnapshotId(n.get("ref").asText(), snap)
    case "assert-current-schema-id" =>
      TableRequirement.AssertCurrentSchemaId(n.get("current-schema-id").asInt())
    case "assert-default-spec-id" =>
      TableRequirement.AssertDefaultSpecId(n.get("default-spec-id").asInt())
    case other => throw new IllegalArgumentException(s"unknown table requirement: $other")
  }

  def updateNode(u: TableUpdate): ObjectNode = {
    val n = mapper.createObjectNode()
    u match {
      case TableUpdate.AddSnapshot(s) =>
        n.put("action", "add-snapshot"); n.set[JsonNode]("snapshot", snapshotNode(s))
      case TableUpdate.SetSnapshotRef(name, id, refType, maxAge, minKeep) =>
        n.put("action", "set-snapshot-ref"); n.put("ref-name", name)
        n.put("snapshot-id", id); n.put("type", refType)
        maxAge.foreach(v => n.put("max-ref-age-ms", v))
        minKeep.foreach(v => n.put("min-snapshots-to-keep", v))
      case TableUpdate.RemoveSnapshotRef(name) =>
        n.put("action", "remove-snapshot-ref"); n.put("ref-name", name)
      case TableUpdate.AddSchema(s, lastCol) =>
        n.put("action", "add-schema"); n.set[JsonNode]("schema", schemaNode(s))
        n.put("last-column-id", lastCol)
      case TableUpdate.SetCurrentSchema(id) =>
        n.put("action", "set-current-schema"); n.put("schema-id", id)
      case TableUpdate.AddPartitionSpec(s) =>
        n.put("action", "add-spec"); n.set[JsonNode]("spec", specNode(s))
      case TableUpdate.SetDefaultSpec(id) =>
        n.put("action", "set-default-spec"); n.put("spec-id", id)
      case TableUpdate.SetProperties(p) =>
        n.put("action", "set-properties")
        val up = n.putObject("updates"); p.toSeq.sortBy(_._1).foreach { case (k, v) => up.put(k, v) }
      case TableUpdate.RemoveProperties(ks) =>
        n.put("action", "remove-properties")
        val arr = n.putArray("removals"); ks.foreach(arr.add)
      case TableUpdate.RemoveSnapshots(ids) =>
        n.put("action", "remove-snapshots")
        val arr = n.putArray("snapshot-ids"); ids.foreach(arr.add)
      case TableUpdate.AddSortOrder(o) =>
        n.put("action", "add-sort-order"); n.set[JsonNode]("sort-order", sortOrderNode(o))
      case TableUpdate.SetDefaultSortOrder(id) =>
        n.put("action", "set-default-sort-order"); n.put("sort-order-id", id)
    }
    n
  }

  def parseUpdate(n: JsonNode): TableUpdate = n.get("action").asText() match {
    case "add-snapshot" => TableUpdate.AddSnapshot(parseSnapshot(n.get("snapshot")))
    case "set-snapshot-ref" => TableUpdate.SetSnapshotRef(
      n.get("ref-name").asText(), n.get("snapshot-id").asLong(), n.get("type").asText(),
      Option(n.get("max-ref-age-ms")).map(_.asLong()),
      Option(n.get("min-snapshots-to-keep")).map(_.asInt()))
    case "remove-snapshot-ref" => TableUpdate.RemoveSnapshotRef(n.get("ref-name").asText())
    case "add-schema" => TableUpdate.AddSchema(
      parseSchema(n.get("schema")),
      Option(n.get("last-column-id")).map(_.asInt()).getOrElse(0))
    case "set-current-schema" => TableUpdate.SetCurrentSchema(n.get("schema-id").asInt())
    case "add-spec" => TableUpdate.AddPartitionSpec(parseSpec(n.get("spec")))
    case "set-default-spec" => TableUpdate.SetDefaultSpec(n.get("spec-id").asInt())
    case "set-properties" =>
      import scala.jdk.CollectionConverters._
      TableUpdate.SetProperties(n.get("updates").properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap)
    case "remove-properties" =>
      import scala.jdk.CollectionConverters._
      TableUpdate.RemoveProperties(n.get("removals").elements().asScala.map(_.asText()).toSeq)
    case "remove-snapshots" =>
      import scala.jdk.CollectionConverters._
      TableUpdate.RemoveSnapshots(n.get("snapshot-ids").elements().asScala.map(_.asLong()).toSeq)
    case "add-sort-order" => TableUpdate.AddSortOrder(parseSortOrder(n.get("sort-order")))
    case "set-default-sort-order" => TableUpdate.SetDefaultSortOrder(n.get("sort-order-id").asInt())
    case other => throw new IllegalArgumentException(s"unknown table update: $other")
  }

  def commitBody(commit: CommitTable): String = {
    val n = mapper.createObjectNode()
    val reqs = n.putArray("requirements")
    commit.requirements.foreach(r => reqs.add(requirementNode(r)))
    val ups = n.putArray("updates")
    commit.updates.foreach(u => ups.add(updateNode(u)))
    n.toString
  }

  def parseCommit(ident: TableIdent, body: String): CommitTable = {
    import scala.jdk.CollectionConverters._
    val n = mapper.readTree(body)
    CommitTable(ident,
      Option(n.get("requirements")).map(_.elements().asScala.map(parseRequirement).toSeq).getOrElse(Nil),
      Option(n.get("updates")).map(_.elements().asScala.map(parseUpdate).toSeq).getOrElse(Nil))
  }

  def createTableBody(name: String, schema: IceSchema, spec: PartitionSpec,
                      properties: Map[String, String]): String = {
    val n = mapper.createObjectNode()
    n.put("name", name)
    n.set[JsonNode]("schema", schemaNode(schema))
    n.set[JsonNode]("partition-spec", specNode(spec))
    val p = n.putObject("properties")
    properties.toSeq.sortBy(_._1).foreach { case (k, v) => p.put(k, v) }
    n.toString
  }
}

/** REST catalog client (reference: `catalogs/iceberg-rest-catalog/src/` —
  * the first backend a real deployment needs, since a filesystem catalog
  * cannot arbitrate commits between machines). Metadata operations go over
  * HTTP to a catalog service speaking the Apache Iceberg REST protocol;
  * data/manifest IO still goes straight to storage via the table's
  * `location`, exactly like the reference splits catalog RPC from object
  * IO. Commit = requirements + updates; a 409 surfaces as
  * [[CommitConflictException]], retried by the caller's transaction loop
  * like any local CAS failure.
  */
class RestCatalog(baseUri: String) extends Catalog {
  private val mapper = new ObjectMapper()
  private val http = HttpClient.newHttpClient()
  private val base = baseUri.stripSuffix("/")

  /** PATH percent-encoding: URLEncoder produces form encoding ('+' for
    * space), which a URI-path decoder leaves literal — translate to %20 so
    * the server's `URI.getPath` decode round-trips names with spaces. */
  private def enc(s: String): String = URLEncoder.encode(s, "UTF-8").replace("+", "%20")
  /** Multi-level namespaces join with the %1F unit separator (REST spec). */
  private def nsPath(ns: Seq[String]): String = ns.map(enc).mkString("%1F")

  private def send(method: String, path: String, body: Option[String] = None): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"$base$path"))
      .header("Content-Type", "application/json")
    val req = (body match {
      case Some(j) => b.method(method, HttpRequest.BodyPublishers.ofString(j, StandardCharsets.UTF_8))
      case None => b.method(method, HttpRequest.BodyPublishers.noBody())
    }).build()
    http.send(req, HttpResponse.BodyHandlers.ofString())
  }

  private def expect(r: HttpResponse[String], codes: Int*): HttpResponse[String] = {
    if (!codes.contains(r.statusCode()))
      throw new IllegalStateException(s"REST catalog error ${r.statusCode()}: ${r.body()}")
    r
  }

  private def tablePath(ident: TableIdent): String =
    s"/v1/namespaces/${nsPath(ident.namespace)}/tables/${enc(ident.name)}"

  private def parseTableResponse(ident: TableIdent, body: String): IceTable = {
    val n = mapper.readTree(body)
    new IceTable(ident, this, TableMetadataJson.fromJson(n.get("metadata").toString))
  }

  override def createTable(ident: TableIdent, schema: IceSchema, spec: PartitionSpec,
                           properties: Map[String, String] = Map.empty): IceTable = {
    val r = expect(send("POST", s"/v1/namespaces/${nsPath(ident.namespace)}/tables",
      Some(RestJson.createTableBody(ident.name, schema, spec, properties))), 200)
    parseTableResponse(ident, r.body())
  }

  override def loadTable(ident: TableIdent): Option[IceTable] = {
    val r = send("GET", tablePath(ident))
    if (r.statusCode() == 404) None
    else Some(parseTableResponse(ident, expect(r, 200).body()))
  }

  /** Iceberg REST register endpoint: the server attaches the existing
    * metadata document (it shares the metadata's storage) to its backend. */
  override def registerTable(ident: TableIdent, metadataLocation: String): IceTable = {
    val n = mapper.createObjectNode()
    n.put("name", ident.name)
    n.put("metadata-location", metadataLocation)
    val r = expect(send("POST",
      s"/v1/namespaces/${nsPath(ident.namespace)}/register", Some(n.toString)), 200)
    parseTableResponse(ident, r.body())
  }

  override def dropTable(ident: TableIdent): Unit =
    expect(send("DELETE", tablePath(ident)), 200, 204)

  /** Wire shape per the Iceberg REST OpenAPI rename operation:
    * POST /v1/tables/rename {"source": {"namespace": [...], "name": ...},
    * "destination": {...}}. */
  private def renameBody(from: TableIdent, to: TableIdent): String = {
    val n = mapper.createObjectNode()
    def identNode(id: TableIdent): ObjectNode = {
      val e = mapper.createObjectNode()
      val nsArr = e.putArray("namespace"); id.namespace.foreach(nsArr.add)
      e.put("name", id.name)
      e
    }
    n.set[JsonNode]("source", identNode(from))
    n.set[JsonNode]("destination", identNode(to))
    n.toString
  }

  override def renameTable(from: TableIdent, to: TableIdent): Unit = {
    val r = send("POST", "/v1/tables/rename", Some(renameBody(from, to)))
    r.statusCode() match {
      case 200 | 204 => ()
      case 404 => throw new IllegalArgumentException(s"no such table $from: ${r.body()}")
      case 409 => throw new IllegalArgumentException(s"table $to already exists: ${r.body()}")
      case code => throw new IllegalStateException(s"REST rename failed ($code): ${r.body()}")
    }
  }

  override def renameView(from: TableIdent, to: TableIdent): Unit = {
    val r = send("POST", "/v1/views/rename", Some(renameBody(from, to)))
    r.statusCode() match {
      case 200 | 204 => ()
      case 404 => throw new IllegalArgumentException(s"no such view $from: ${r.body()}")
      case 409 => throw new IllegalArgumentException(s"view $to already exists: ${r.body()}")
      case code => throw new IllegalStateException(s"REST rename failed ($code): ${r.body()}")
    }
  }

  override def listTables(namespace: Seq[String]): Seq[TableIdent] = {
    import scala.jdk.CollectionConverters._
    val r = expect(send("GET", s"/v1/namespaces/${nsPath(namespace)}/tables"), 200)
    mapper.readTree(r.body()).get("identifiers").elements().asScala.map { id =>
      TableIdent(id.get("namespace").elements().asScala.map(_.asText()).toSeq,
        id.get("name").asText())
    }.toSeq
  }

  override def createNamespace(namespace: Seq[String]): Unit = {
    val n = mapper.createObjectNode()
    val arr = n.putArray("namespace"); namespace.foreach(arr.add)
    expect(send("POST", "/v1/namespaces", Some(n.toString)), 200)
  }

  override def dropNamespace(namespace: Seq[String]): Unit =
    expect(send("DELETE", s"/v1/namespaces/${nsPath(namespace)}"), 200, 204)

  override def listNamespaces(): Seq[Seq[String]] = {
    import scala.jdk.CollectionConverters._
    val r = expect(send("GET", "/v1/namespaces"), 200)
    mapper.readTree(r.body()).get("namespaces").elements().asScala
      .map(_.elements().asScala.map(_.asText()).toSeq).toSeq
  }

  override def updateTable(commit: CommitTable): TableMetadata = {
    val r = send("POST", tablePath(commit.ident), Some(RestJson.commitBody(commit)))
    r.statusCode() match {
      case 200 => TableMetadataJson.fromJson(
        mapper.readTree(r.body()).get("metadata").toString)
      case 409 => throw new CommitConflictException(
        s"concurrent commit rejected by REST catalog: ${r.body()}")
      case code => throw new IllegalStateException(s"REST commit failed ($code): ${r.body()}")
    }
  }

  private def viewPath(ident: TableIdent): String =
    s"/v1/namespaces/${nsPath(ident.namespace)}/views/${enc(ident.name)}"

  override def createView(ident: TableIdent, metadata: ViewMetadata): Unit = {
    val n = mapper.createObjectNode()
    n.put("name", ident.name)
    n.set[JsonNode]("metadata", mapper.readTree(ViewMetadataJson.toJson(metadata)))
    expect(send("POST", s"/v1/namespaces/${nsPath(ident.namespace)}/views", Some(n.toString)), 200)
  }

  override def replaceView(ident: TableIdent, metadata: ViewMetadata): Unit = {
    val n = mapper.createObjectNode()
    n.set[JsonNode]("metadata", mapper.readTree(ViewMetadataJson.toJson(metadata)))
    expect(send("PUT", viewPath(ident), Some(n.toString)), 200)
  }

  override def loadView(ident: TableIdent): Option[ViewMetadata] = {
    val r = send("GET", viewPath(ident))
    if (r.statusCode() == 404) None
    else {
      val n = mapper.readTree(expect(r, 200).body())
      Some(ViewMetadataJson.fromJson(n.get("metadata").toString))
    }
  }

  override def dropView(ident: TableIdent): Unit =
    expect(send("DELETE", viewPath(ident)), 200, 204)
}
