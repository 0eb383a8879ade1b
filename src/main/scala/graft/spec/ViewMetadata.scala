package graft.spec

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** Iceberg view metadata (reference:
  * iceberg-rust-spec/src/spec/view_metadata.rs:50-146,307-380): the view's
  * SQL lives inside VERSIONS, each carrying dialect-tagged representations,
  * a schema id, default catalog/namespace for unqualified references, and a
  * summary; `version-log` records every change of the current version. A
  * REPLACE appends a version instead of overwriting the definition, so the
  * history is auditable and other engines can pick their dialect.
  */
final case class ViewRepresentation(sql: String, dialect: String)

final case class ViewVersion(
    versionId: Long,
    schemaId: Int,
    timestampMs: Long,
    summary: Map[String, String],
    representations: Seq[ViewRepresentation],
    defaultCatalog: Option[String] = None,
    defaultNamespace: Seq[String] = Nil)

final case class ViewHistoryEntry(timestampMs: Long, versionId: Long)

final case class ViewMetadata(
    viewUuid: String,
    formatVersion: Int,
    location: String,
    currentVersionId: Long,
    versions: Map[Long, ViewVersion],
    versionLog: Seq[ViewHistoryEntry],
    schemas: Map[Int, IceSchema],
    properties: Map[String, String]) {

  def currentVersion: ViewVersion = versions.getOrElse(currentVersionId,
    throw new IllegalStateException(
      s"view current-version-id $currentVersionId not found in versions"))

  def currentSchema: IceSchema = schemas.getOrElse(currentVersion.schemaId,
    throw new IllegalStateException(
      s"view schema ${currentVersion.schemaId} not found in schemas"))

  /** SQL of the current version for `dialect`, if represented. */
  def sqlFor(dialect: String): Option[String] =
    currentVersion.representations.find(_.dialect == dialect).map(_.sql)

  /** Current SQL: the spark dialect if present, else the sole/first
    * representation (matches the reference's lenient dialect fallback). */
  def sql: String = sqlFor(ViewMetadata.Dialect)
    .orElse(currentVersion.representations.headOption.map(_.sql))
    .getOrElse(throw new IllegalStateException("view version has no representations"))

  /** REPLACE semantics: append a new version (monotonic id) + schema, move
    * the current pointer, extend the version log. Old versions are retained
    * up to `version.history.num-entries` (default 10, like the reference's
    * history control property) — the CURRENT version is always kept.
    */
  def replaced(newSql: String, schema: IceSchema, nowMs: Long,
               dialect: String = ViewMetadata.Dialect): ViewMetadata = {
    val vid = versions.keys.max + 1
    val sid = schemas.keys.max + 1
    val version = ViewVersion(vid, sid, nowMs,
      Map("operation" -> "replace"),
      Seq(ViewRepresentation(newSql, dialect)),
      currentVersion.defaultCatalog, currentVersion.defaultNamespace)
    val keep = properties.getOrElse("version.history.num-entries", "10").toInt.max(1)
    val keptVersions = (versions + (vid -> version)).toSeq
      .sortBy(-_._1).take(keep).toMap
    val keptSchemas = (schemas + (sid -> schema.copy(schemaId = sid)))
      .filter { case (id, _) => keptVersions.values.exists(_.schemaId == id) }
    copy(
      currentVersionId = vid,
      versions = keptVersions,
      versionLog = versionLog :+ ViewHistoryEntry(nowMs, vid),
      schemas = keptSchemas)
  }
}

object ViewMetadata {
  val Dialect = "spark"

  def create(uuid: String, location: String, sqlText: String, schema: IceSchema,
             nowMs: Long, dialect: String = Dialect,
             defaultCatalog: Option[String] = None,
             defaultNamespace: Seq[String] = Nil,
             properties: Map[String, String] = Map.empty): ViewMetadata = {
    val v = ViewVersion(1L, schema.schemaId, nowMs,
      Map("operation" -> "create"),
      Seq(ViewRepresentation(sqlText, dialect)), defaultCatalog, defaultNamespace)
    ViewMetadata(uuid, 1, location, 1L, Map(1L -> v),
      Seq(ViewHistoryEntry(nowMs, 1L)), Map(schema.schemaId -> schema), properties)
  }
}

/** JSON codec over the kebab-case wire shape of view_metadata.rs (fixture:
  * view_metadata.rs:476-522). Schemas reuse the table-metadata schema serde.
  */
object ViewMetadataJson {
  private val mapper = new ObjectMapper()

  def toJson(m: ViewMetadata): String = {
    val root = mapper.createObjectNode()
    root.put("view-uuid", m.viewUuid)
    root.put("format-version", m.formatVersion)
    root.put("location", m.location)
    root.put("current-version-id", m.currentVersionId)
    val props = root.putObject("properties")
    m.properties.toSeq.sortBy(_._1).foreach { case (k, v) => props.put(k, v) }
    val versions = root.putArray("versions")
    m.versions.values.toSeq.sortBy(_.versionId).foreach { v =>
      val n = versions.addObject()
      n.put("version-id", v.versionId)
      n.put("schema-id", v.schemaId)
      n.put("timestamp-ms", v.timestampMs)
      v.defaultCatalog.foreach(c => n.put("default-catalog", c))
      if (v.defaultNamespace.nonEmpty) {
        val ns = n.putArray("default-namespace"); v.defaultNamespace.foreach(ns.add)
      }
      val sm = n.putObject("summary")
      v.summary.toSeq.sortBy(_._1).foreach { case (k, s) => sm.put(k, s) }
      val reps = n.putArray("representations")
      v.representations.foreach { r =>
        val rn = reps.addObject()
        rn.put("type", "sql"); rn.put("sql", r.sql); rn.put("dialect", r.dialect)
      }
    }
    val schemas = root.putArray("schemas")
    m.schemas.values.toSeq.sortBy(_.schemaId).foreach(s =>
      schemas.add(TableMetadataJson.schemaNode(s)))
    val vlog = root.putArray("version-log")
    m.versionLog.foreach { e =>
      val n = vlog.addObject()
      n.put("timestamp-ms", e.timestampMs); n.put("version-id", e.versionId)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def fromJson(json: String): ViewMetadata = {
    val n = mapper.readTree(json)
    def required(f: String): JsonNode = Option(n.get(f)).filter(!_.isNull).getOrElse(
      throw new IllegalArgumentException(s"view metadata is missing required field $f"))
    val versions = required("versions").elements().asScala.map { v =>
      val reps = Option(v.get("representations")).map(_.elements().asScala.map { r =>
        ViewRepresentation(r.get("sql").asText(), r.get("dialect").asText())
      }.toSeq).getOrElse(Nil)
      val summary = Option(v.get("summary")).map(_.properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty)
      ViewVersion(
        v.get("version-id").asLong(),
        v.get("schema-id").asInt(),
        v.get("timestamp-ms").asLong(),
        summary, reps,
        Option(v.get("default-catalog")).map(_.asText()),
        Option(v.get("default-namespace")).map(_.elements().asScala.map(_.asText()).toSeq)
          .getOrElse(Nil))
    }.map(v => v.versionId -> v).toMap
    val schemas = required("schemas").elements().asScala
      .map(TableMetadataJson.parseSchema).map(s => s.schemaId -> s).toMap
    val vlog = Option(n.get("version-log")).map(_.elements().asScala.map { e =>
      ViewHistoryEntry(e.get("timestamp-ms").asLong(), e.get("version-id").asLong())
    }.toSeq).getOrElse(Nil)
    val props = Option(n.get("properties")).map(_.properties().asScala
      .map(e => e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty)
    ViewMetadata(
      required("view-uuid").asText(),
      required("format-version").asInt(),
      required("location").asText(),
      required("current-version-id").asLong(),
      versions, vlog, schemas, props)
  }
}
