package graft.spec

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.core.Transform

import scala.jdk.CollectionConverters._

/** Partition spec (reference: iceberg-rust-spec/src/spec/partition.rs).
  * Partition field ids start at 1000 (planner.rs:146-220).
  */
final case class PartitionField(sourceId: Int, fieldId: Int, name: String, transform: Transform)

final case class PartitionSpec(specId: Int, fields: Seq[PartitionField]) {
  def isUnpartitioned: Boolean = fields.isEmpty
  /** Iceberg partition-struct type for this spec against `schema`. */
  def partitionType(schema: IceSchema): IceType.StructT =
    IceType.StructT(fields.map { f =>
      val src = schema.fieldById(f.sourceId)
        .getOrElse(throw new IllegalArgumentException(s"partition source id ${f.sourceId} not in schema"))
      NestedField(f.fieldId, f.name, required = false, f.transform.resultType(src.fieldType))
    })
}

object PartitionSpec {
  val unpartitioned: PartitionSpec = PartitionSpec(0, Nil)
}

/** Sort order metadata (iceberg-rust-spec/src/spec/sort.rs). Stored but the
  * write path does not sort, matching the reference (SURVEY §2.6 O1).
  */
final case class SortField(sourceId: Int, transform: Transform, direction: String, nullOrder: String)
final case class SortOrder(orderId: Int, fields: Seq[SortField])
object SortOrder { val unsorted: SortOrder = SortOrder(0, Nil) }

/** Snapshot (iceberg-rust-spec/src/spec/snapshot.rs:34-60). */
final case class Snapshot(
    snapshotId: Long,
    parentSnapshotId: Option[Long],
    sequenceNumber: Long,
    timestampMs: Long,
    manifestList: String,
    summary: Map[String, String],
    schemaId: Option[Int],
    // Iceberg V3 row lineage: the first row id this snapshot assigned
    // (None on pre-lineage snapshots and metadata-only commits)
    firstRowId: Option[Long] = None)

/** Branch/tag reference with retention policy (snapshot.rs:258-307):
  * `maxRefAgeMs` bounds how long the ref itself survives expiration;
  * `minSnapshotsToKeep` protects that many ancestors of a branch head.
  */
final case class SnapshotReference(snapshotId: Long, refType: String, // "branch" | "tag"
                                   maxRefAgeMs: Option[Long] = None,
                                   minSnapshotsToKeep: Option[Int] = None)

final case class SnapshotLogEntry(snapshotId: Long, timestampMs: Long)
final case class MetadataLogEntry(metadataFile: String, timestampMs: Long)

/** Table metadata, format V2
  * (iceberg-rust-spec/src/spec/table_metadata.rs:58-145; V2 serde :390-572).
  * Wire format keeps the spec's kebab-case field names for cross-engine
  * credibility.
  */
final case class TableMetadata(
    formatVersion: Int,
    tableUuid: String,
    location: String,
    lastSequenceNumber: Long,
    lastUpdatedMs: Long,
    lastColumnId: Int,
    schemas: Map[Int, IceSchema],
    currentSchemaId: Int,
    partitionSpecs: Map[Int, PartitionSpec],
    defaultSpecId: Int,
    lastPartitionId: Int,
    properties: Map[String, String],
    currentSnapshotId: Option[Long],
    snapshots: Map[Long, Snapshot],
    snapshotLog: Seq[SnapshotLogEntry],
    metadataLog: Seq[MetadataLogEntry],
    sortOrders: Map[Int, SortOrder],
    defaultSortOrderId: Int,
    refs: Map[String, SnapshotReference],
    // Iceberg V3 row lineage: the next row id to assign (monotone across
    // commits; 0 on tables that never assigned lineage)
    nextRowId: Long = 0L) {

  val MainBranch = "main"

  def currentSchema: IceSchema = schemas(currentSchemaId)
  def defaultSpec: PartitionSpec = partitionSpecs(defaultSpecId)

  /** Branch-scoped snapshot lookup with fallback to main
    * (table_metadata.rs:147-269).
    */
  def currentSnapshot(branch: Option[String] = None): Option[Snapshot] =
    branch match {
      case Some(b) => refs.get(b).flatMap(r => snapshots.get(r.snapshotId))
        .orElse(currentSnapshotId.flatMap(snapshots.get))
      case None => currentSnapshotId.flatMap(snapshots.get)
    }

  def schemaAt(snapshot: Option[Snapshot]): IceSchema =
    snapshot.flatMap(_.schemaId).flatMap(schemas.get).getOrElse(currentSchema)

  def snapshotById(id: Long): Option[Snapshot] = snapshots.get(id)

  /** Ancestor chain of `id` (inclusive) via parent pointers. Bounded by the
    * snapshot count so corrupted metadata with a parent cycle cannot hang
    * maintenance, history, or fast-forward walks. */
  def ancestorsOf(id: Long): Seq[Long] =
    Iterator.iterate(snapshotById(id))(_.flatMap(_.parentSnapshotId).flatMap(snapshotById))
      .takeWhile(_.isDefined).map(_.get.snapshotId)
      .take(snapshots.size).toSeq
}

/** JSON codecs for the V2 metadata file. Hand-rolled over jackson so the
  * kebab-case wire names match table_metadata.rs:390-572 exactly.
  */
object TableMetadataJson {
  private val mapper = new ObjectMapper()

  // ---------- write ----------

  def toJson(m: TableMetadata): String =
    if (m.formatVersion == 1) toJsonV1(m) else toJsonV2(m)

  /** V1 wire shape (table_metadata.rs:498-572 `TableMetadataV1`): singular
    * `schema` + bare `partition-spec` FIELD array (the V1-required forms),
    * with the modern plural forms alongside (they are optional in V1 and
    * real V1 writers emit both); snapshots carry NO sequence numbers; no
    * `last-sequence-number`, no `refs`. Round-trips tables owned by
    * V1-pinned engines without forcing a format upgrade.
    */
  private def toJsonV1(m: TableMetadata): String = {
    val root = mapper.createObjectNode()
    root.put("format-version", 1)
    root.put("table-uuid", m.tableUuid)
    root.put("location", m.location)
    root.put("last-updated-ms", m.lastUpdatedMs)
    root.put("last-column-id", m.lastColumnId)
    root.set[JsonNode]("schema", schemaNode(m.currentSchema))
    val schemas = root.putArray("schemas")
    m.schemas.values.toSeq.sortBy(_.schemaId).foreach(s => schemas.add(schemaNode(s)))
    root.put("current-schema-id", m.currentSchemaId)
    val psFields = root.putArray("partition-spec")
    m.defaultSpec.fields.foreach { f =>
      val fn = psFields.addObject()
      fn.put("source-id", f.sourceId); fn.put("field-id", f.fieldId)
      fn.put("name", f.name); fn.put("transform", f.transform.name)
    }
    val specs = root.putArray("partition-specs")
    m.partitionSpecs.values.toSeq.sortBy(_.specId).foreach(s => specs.add(specNode(s)))
    root.put("default-spec-id", m.defaultSpecId)
    root.put("last-partition-id", m.lastPartitionId)
    val props = root.putObject("properties")
    m.properties.toSeq.sortBy(_._1).foreach { case (k, v) => props.put(k, v) }
    m.currentSnapshotId.foreach(id => root.put("current-snapshot-id", id))
    val snaps = root.putArray("snapshots")
    m.snapshots.values.toSeq.sortBy(_.timestampMs).foreach { s =>
      val n = snapshotNode(s)
      n.remove("sequence-number") // V1 snapshots have none
      snaps.add(n)
    }
    val slog = root.putArray("snapshot-log")
    m.snapshotLog.foreach { e =>
      val n = slog.addObject(); n.put("snapshot-id", e.snapshotId); n.put("timestamp-ms", e.timestampMs)
    }
    val mlog = root.putArray("metadata-log")
    m.metadataLog.foreach { e =>
      val n = mlog.addObject(); n.put("metadata-file", e.metadataFile); n.put("timestamp-ms", e.timestampMs)
    }
    val orders = root.putArray("sort-orders")
    m.sortOrders.values.toSeq.sortBy(_.orderId).foreach(o => orders.add(sortOrderNode(o)))
    root.put("default-sort-order-id", m.defaultSortOrderId)
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  private def toJsonV2(m: TableMetadata): String = {
    val root = mapper.createObjectNode()
    root.put("format-version", m.formatVersion)
    root.put("table-uuid", m.tableUuid)
    root.put("location", m.location)
    root.put("last-sequence-number", m.lastSequenceNumber)
    root.put("last-updated-ms", m.lastUpdatedMs)
    root.put("last-column-id", m.lastColumnId)
    val schemas = root.putArray("schemas")
    m.schemas.values.toSeq.sortBy(_.schemaId).foreach(s => schemas.add(schemaNode(s)))
    root.put("current-schema-id", m.currentSchemaId)
    val specs = root.putArray("partition-specs")
    m.partitionSpecs.values.toSeq.sortBy(_.specId).foreach(s => specs.add(specNode(s)))
    root.put("default-spec-id", m.defaultSpecId)
    root.put("last-partition-id", m.lastPartitionId)
    if (m.nextRowId > 0L) root.put("next-row-id", m.nextRowId)
    val props = root.putObject("properties")
    m.properties.toSeq.sortBy(_._1).foreach { case (k, v) => props.put(k, v) }
    m.currentSnapshotId.foreach(id => root.put("current-snapshot-id", id))
    val snaps = root.putArray("snapshots")
    m.snapshots.values.toSeq.sortBy(_.sequenceNumber).foreach(s => snaps.add(snapshotNode(s)))
    val slog = root.putArray("snapshot-log")
    m.snapshotLog.foreach { e =>
      val n = slog.addObject(); n.put("snapshot-id", e.snapshotId); n.put("timestamp-ms", e.timestampMs)
    }
    val mlog = root.putArray("metadata-log")
    m.metadataLog.foreach { e =>
      val n = mlog.addObject(); n.put("metadata-file", e.metadataFile); n.put("timestamp-ms", e.timestampMs)
    }
    val orders = root.putArray("sort-orders")
    m.sortOrders.values.toSeq.sortBy(_.orderId).foreach(o => orders.add(sortOrderNode(o)))
    root.put("default-sort-order-id", m.defaultSortOrderId)
    val refs = root.putObject("refs")
    m.refs.toSeq.sortBy(_._1).foreach { case (name, r) =>
      val n = refs.putObject(name); n.put("snapshot-id", r.snapshotId); n.put("type", r.refType)
      r.maxRefAgeMs.foreach(v => n.put("max-ref-age-ms", v))
      r.minSnapshotsToKeep.foreach(v => n.put("min-snapshots-to-keep", v))
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def schemaNode(s: IceSchema): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("type", "struct")
    n.put("schema-id", s.schemaId)
    if (s.identifierFieldIds.nonEmpty) {
      val ids = n.putArray("identifier-field-ids"); s.identifierFieldIds.foreach(ids.add)
    }
    val fields = n.putArray("fields")
    s.fields.foreach(f => fields.add(fieldNode(f)))
    n
  }

  private def fieldNode(f: NestedField): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("id", f.id); n.put("name", f.name); n.put("required", f.required)
    n.set[JsonNode]("type", typeNode(f.fieldType))
    f.doc.foreach(d => n.put("doc", d))
    // Iceberg V3 default values (JSON single-value serialization)
    f.initialDefault.foreach(v => n.set[JsonNode]("initial-default",
      DefaultValues.toJson(f.fieldType, v, mapper.getNodeFactory)))
    f.writeDefault.foreach(v => n.set[JsonNode]("write-default",
      DefaultValues.toJson(f.fieldType, v, mapper.getNodeFactory)))
    n
  }

  def typeNode(t: IceType): JsonNode = t match {
    case IceType.StructT(fields) =>
      val n = mapper.createObjectNode(); n.put("type", "struct")
      val fs = n.putArray("fields"); fields.foreach(f => fs.add(fieldNode(f))); n
    case IceType.ListT(eid, ereq, el) =>
      val n = mapper.createObjectNode(); n.put("type", "list")
      n.put("element-id", eid); n.put("element-required", ereq)
      n.set[JsonNode]("element", typeNode(el)); n
    case IceType.MapT(kid, k, vid, vreq, v) =>
      val n = mapper.createObjectNode(); n.put("type", "map")
      n.put("key-id", kid); n.set[JsonNode]("key", typeNode(k))
      n.put("value-id", vid); n.put("value-required", vreq)
      n.set[JsonNode]("value", typeNode(v)); n
    case prim => mapper.getNodeFactory.textNode(prim.jsonName)
  }

  def specNode(s: PartitionSpec): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("spec-id", s.specId)
    val fs = n.putArray("fields")
    s.fields.foreach { f =>
      val fn = fs.addObject()
      fn.put("source-id", f.sourceId); fn.put("field-id", f.fieldId)
      fn.put("name", f.name); fn.put("transform", f.transform.name)
    }
    n
  }

  def sortOrderNode(o: SortOrder): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("order-id", o.orderId)
    val fs = n.putArray("fields")
    o.fields.foreach { f =>
      val fn = fs.addObject()
      fn.put("source-id", f.sourceId); fn.put("transform", f.transform.name)
      fn.put("direction", f.direction); fn.put("null-order", f.nullOrder)
    }
    n
  }

  def snapshotNode(s: Snapshot): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("snapshot-id", s.snapshotId)
    s.parentSnapshotId.foreach(p => n.put("parent-snapshot-id", p))
    n.put("sequence-number", s.sequenceNumber)
    n.put("timestamp-ms", s.timestampMs)
    n.put("manifest-list", s.manifestList)
    val sm = n.putObject("summary")
    s.summary.toSeq.sortBy(_._1).foreach { case (k, v) => sm.put(k, v) }
    s.schemaId.foreach(id => n.put("schema-id", id))
    s.firstRowId.foreach(f => n.put("first-row-id", f))
    n
  }

  // ---------- read ----------

  /** Reads V2 metadata AND the V1 legacy shape (reference dual serde:
    * table_metadata.rs:390-572). V1 files carry a singular `schema` (no
    * schema-id), a bare `partition-spec` field array (no spec-id), no
    * sequence numbers, `current-snapshot-id: -1` for "none", and optional
    * sort orders — all normalized here into the V2-shaped model with id 0
    * defaults, exactly like the reference's `try_from`. Required-field
    * violations raise the same conditions the reference's broken golden
    * fixtures (`testdata/table_metadata/TableMetadataV2Missing*.json`) pin.
    */
  def fromJson(json: String): TableMetadata = {
    val n = mapper.readTree(json)
    def optLong(field: String): Option[Long] =
      Option(n.get(field)).filter(!_.isNull).map(_.asLong())
    def required(field: String): JsonNode =
      Option(n.get(field)).filter(!_.isNull).getOrElse(
        throw new IllegalArgumentException(s"metadata is missing required field $field"))
    val fv = required("format-version").asInt()
    if (fv != 1 && fv != 2)
      throw new IllegalArgumentException(s"unsupported metadata format version $fv")
    val schemas: Map[Int, IceSchema] = Option(n.get("schemas")) match {
      case Some(arr) => arr.elements().asScala.map(parseSchema).map(s => s.schemaId -> s).toMap
      case None if fv == 1 =>
        val s = parseSchema(required("schema")) // V1 singular, schema-id defaults 0
        Map(s.schemaId -> s)
      case None => throw new IllegalArgumentException("V2 metadata is missing schemas")
    }
    val currentSchemaId = Option(n.get("current-schema-id")).map(_.asInt())
      .getOrElse(if (fv == 1) schemas.keys.min
        else throw new IllegalArgumentException("V2 metadata is missing current-schema-id"))
    if (!schemas.contains(currentSchemaId))
      throw new IllegalArgumentException(s"current schema $currentSchemaId not found in schemas")
    val specs: Map[Int, PartitionSpec] = Option(n.get("partition-specs")) match {
      case Some(arr) => arr.elements().asScala.map(parseSpec).map(s => s.specId -> s).toMap
      case None if fv == 1 =>
        // V1 singular: a bare array of partition FIELDS, normalized to spec 0
        val fields = required("partition-spec").elements().asScala.map { f =>
          PartitionField(
            f.get("source-id").asInt(), f.get("field-id").asInt(),
            f.get("name").asText(), graft.core.Transform.parse(f.get("transform").asText()))
        }.toSeq
        Map(0 -> PartitionSpec(0, fields))
      case None => throw new IllegalArgumentException("V2 metadata is missing partition-specs")
    }
    val lastPartitionId = Option(n.get("last-partition-id")).map(_.asInt()).getOrElse {
      if (fv == 1) (specs.values.flatMap(_.fields.map(_.fieldId)) ++ Seq(999)).max
      else throw new IllegalArgumentException("V2 metadata is missing last-partition-id")
    }
    val sortOrders: Map[Int, SortOrder] = Option(n.get("sort-orders")) match {
      case Some(arr) => arr.elements().asScala.map(parseSortOrder).map(o => o.orderId -> o).toMap
      case None if fv == 1 => Map(0 -> SortOrder.unsorted)
      case None => throw new IllegalArgumentException("V2 metadata is missing sort-orders")
    }
    val snapshots = Option(n.get("snapshots")).map(_.elements().asScala.map(parseSnapshot)
      .map(s => s.snapshotId -> s).toMap).getOrElse(Map.empty)
    TableMetadata(
      formatVersion = fv,
      tableUuid = required("table-uuid").asText(),
      location = required("location").asText(),
      lastSequenceNumber = optLong("last-sequence-number").getOrElse {
        if (fv == 1) 0L
        else throw new IllegalArgumentException("V2 metadata is missing last-sequence-number")
      },
      lastUpdatedMs = required("last-updated-ms").asLong(),
      lastColumnId = required("last-column-id").asInt(),
      schemas = schemas,
      currentSchemaId = currentSchemaId,
      partitionSpecs = specs,
      defaultSpecId = Option(n.get("default-spec-id")).map(_.asInt()).getOrElse(specs.keys.min),
      lastPartitionId = lastPartitionId,
      properties = Option(n.get("properties")).map(p => p.properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty),
      currentSnapshotId = optLong("current-snapshot-id").filter(_ != -1),
      snapshots = snapshots,
      snapshotLog = Option(n.get("snapshot-log")).map(_.elements().asScala.map(e =>
        SnapshotLogEntry(e.get("snapshot-id").asLong(), e.get("timestamp-ms").asLong())).toSeq)
        .getOrElse(Nil),
      metadataLog = Option(n.get("metadata-log")).map(_.elements().asScala.map(e =>
        MetadataLogEntry(e.get("metadata-file").asText(), e.get("timestamp-ms").asLong())).toSeq)
        .getOrElse(Nil),
      sortOrders = sortOrders,
      defaultSortOrderId = Option(n.get("default-sort-order-id")).map(_.asInt()).getOrElse(0),
      refs = Option(n.get("refs")).map(r => r.properties().asScala.map { e =>
        e.getKey -> SnapshotReference(
          e.getValue.get("snapshot-id").asLong(), e.getValue.get("type").asText(),
          Option(e.getValue.get("max-ref-age-ms")).map(_.asLong()),
          Option(e.getValue.get("min-snapshots-to-keep")).map(_.asInt()))
      }.toMap).getOrElse(Map.empty),
      nextRowId = Option(n.get("next-row-id")).map(_.asLong()).getOrElse(0L))
  }

  def parseSchema(n: JsonNode): IceSchema = {
    val fields = n.get("fields").elements().asScala.map(parseField).toSeq
    val idFields = Option(n.get("identifier-field-ids"))
      .map(_.elements().asScala.map(_.asInt()).toSeq).getOrElse(Nil)
    IceSchema(Option(n.get("schema-id")).map(_.asInt()).getOrElse(0), fields, idFields)
  }

  private def parseField(n: JsonNode): NestedField = {
    val t = parseType(n.get("type"))
    NestedField(
      id = n.get("id").asInt(),
      name = n.get("name").asText(),
      required = n.get("required").asBoolean(),
      fieldType = t,
      doc = Option(n.get("doc")).map(_.asText()),
      initialDefault = Option(n.get("initial-default")).map(DefaultValues.fromJson(t, _)),
      writeDefault = Option(n.get("write-default")).map(DefaultValues.fromJson(t, _)))
  }

  def parseType(n: JsonNode): IceType =
    if (n.isTextual) IceType.fromPrimitiveName(n.asText())
    else n.get("type").asText() match {
      case "struct" => IceType.StructT(n.get("fields").elements().asScala.map(parseField).toSeq)
      case "list" => IceType.ListT(
        n.get("element-id").asInt(), n.get("element-required").asBoolean(),
        parseType(n.get("element")))
      case "map" => IceType.MapT(
        n.get("key-id").asInt(), parseType(n.get("key")),
        n.get("value-id").asInt(), n.get("value-required").asBoolean(),
        parseType(n.get("value")))
    }

  def parseSpec(n: JsonNode): PartitionSpec =
    PartitionSpec(
      n.get("spec-id").asInt(),
      n.get("fields").elements().asScala.map { f =>
        PartitionField(
          f.get("source-id").asInt(), f.get("field-id").asInt(),
          f.get("name").asText(), Transform.parse(f.get("transform").asText()))
      }.toSeq)

  def parseSortOrder(n: JsonNode): SortOrder =
    SortOrder(
      n.get("order-id").asInt(),
      n.get("fields").elements().asScala.map { f =>
        SortField(
          f.get("source-id").asInt(), Transform.parse(f.get("transform").asText()),
          f.get("direction").asText(), f.get("null-order").asText())
      }.toSeq)

  def parseSnapshot(n: JsonNode): Snapshot =
    Snapshot(
      snapshotId = n.get("snapshot-id").asLong(),
      parentSnapshotId = Option(n.get("parent-snapshot-id")).map(_.asLong()),
      // V1 snapshots carry no sequence numbers (all 0 per spec V1→V2 rules)
      sequenceNumber = Option(n.get("sequence-number")).map(_.asLong()).getOrElse(0L),
      timestampMs = n.get("timestamp-ms").asLong(),
      // V1 may list manifests directly instead of a manifest-list file —
      // a shape this reader does not support; fail AT PARSE with a clear
      // error rather than letting "" crash the first scan far from the cause
      manifestList = Option(n.get("manifest-list")).map(_.asText()).getOrElse(
        throw new IllegalArgumentException(
          "snapshot has no manifest-list (V1 legacy inline `manifests` arrays are not supported)")),
      summary = Option(n.get("summary")).map(s => s.properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty),
      schemaId = Option(n.get("schema-id")).map(_.asInt()),
      firstRowId = Option(n.get("first-row-id")).map(_.asLong()))
}
