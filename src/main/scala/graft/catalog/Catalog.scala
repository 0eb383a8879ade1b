package graft.catalog

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util.UUID

import graft.spec._
import graft.table.IceTable

/** Commit protocol ADTs (reference: iceberg-rust/src/catalog/commit.rs:43-553).
  * A commit is a list of requirements checked against the CURRENT metadata,
  * plus a list of updates applied to produce the next metadata version.
  */
sealed trait TableRequirement
object TableRequirement {
  /** commit.rs:198-239 — the ref must still point at the expected snapshot. */
  final case class AssertRefSnapshotId(ref: String, snapshotId: Option[Long]) extends TableRequirement
  final case class AssertCurrentSchemaId(schemaId: Int) extends TableRequirement
  final case class AssertDefaultSpecId(specId: Int) extends TableRequirement
}

sealed trait TableUpdate
object TableUpdate {
  final case class AddSnapshot(snapshot: Snapshot) extends TableUpdate
  final case class SetSnapshotRef(refName: String, snapshotId: Long, refType: String,
                                  maxRefAgeMs: Option[Long] = None,
                                  minSnapshotsToKeep: Option[Int] = None) extends TableUpdate
  final case class RemoveSnapshotRef(refName: String) extends TableUpdate
  final case class AddSchema(schema: IceSchema, lastColumnId: Int) extends TableUpdate
  final case class SetCurrentSchema(schemaId: Int) extends TableUpdate
  final case class AddPartitionSpec(spec: PartitionSpec) extends TableUpdate
  final case class SetDefaultSpec(specId: Int) extends TableUpdate
  final case class SetProperties(updates: Map[String, String]) extends TableUpdate
  final case class RemoveProperties(removals: Seq[String]) extends TableUpdate
  final case class RemoveSnapshots(snapshotIds: Seq[Long]) extends TableUpdate
  final case class AddSortOrder(order: SortOrder) extends TableUpdate
  final case class SetDefaultSortOrder(orderId: Int) extends TableUpdate
}

final case class TableIdent(namespace: Seq[String], name: String) {
  override def toString: String = (namespace :+ name).mkString(".")
}
object TableIdent {
  def parse(s: String): TableIdent = {
    val parts = s.split('.').toSeq
    TableIdent(parts.init, parts.last)
  }
}

final case class CommitTable(ident: TableIdent, requirements: Seq[TableRequirement],
                             updates: Seq[TableUpdate])

class CommitConflictException(msg: String) extends RuntimeException(msg)

/** Catalog abstraction (reference: iceberg-rust/src/catalog/mod.rs trait). */
trait Catalog {
  def createTable(ident: TableIdent, schema: IceSchema, spec: PartitionSpec,
                  properties: Map[String, String] = Map.empty): IceTable
  def loadTable(ident: TableIdent): Option[IceTable]
  def tableExists(ident: TableIdent): Boolean = loadTable(ident).isDefined
  def dropTable(ident: TableIdent): Unit
  def listTables(namespace: Seq[String]): Seq[TableIdent]
  def createNamespace(namespace: Seq[String]): Unit
  def dropNamespace(namespace: Seq[String]): Unit
  def listNamespaces(): Seq[Seq[String]]
  /** Requirement check + CAS; returns committed metadata
    * (commit.rs:417-490 + sql catalog CAS, iceberg-sql-catalog/src/lib.rs:429-480).
    */
  def updateTable(commit: CommitTable): TableMetadata
  /** Attaches an EXISTING table to this catalog from its on-storage metadata
    * JSON document (the Iceberg register_table operation). No data movement:
    * manifests and data files stay where the metadata's absolute paths point
    * — the metadata's own `location` is preserved, so subsequent writes keep
    * landing there; only the catalog's pointer is created. Fails if the
    * identifier already exists. */
  def registerTable(ident: TableIdent, metadataLocation: String): IceTable
  /** Moves the catalog's name→metadata pointer from `from` to `to` (the REST
    * protocol's rename_table, catalog_api_api.rs:879-898). Metadata
    * documents, manifests and data files stay where the table's `location`
    * points — only the catalog mapping changes, so a rename is O(1) in data
    * size. Fails if `from` is missing or `to` already exists. */
  def renameTable(from: TableIdent, to: TableIdent): Unit
  /** View counterpart (rename_view, catalog_api_api.rs:900-918). */
  def renameView(from: TableIdent, to: TableIdent): Unit
  // ---- views (SURVEY §2.8 D2; versioned metadata per view_metadata.rs) ----
  /** Creates the view from full metadata; fails if it already exists. A
    * blank `location` is filled in by the backend. */
  def createView(ident: TableIdent, metadata: ViewMetadata): Unit
  /** Replaces the stored metadata (REPLACE = a new version appended by the
    * caller via [[ViewMetadata.replaced]]); fails if the view does not
    * exist or the uuid changed. */
  def replaceView(ident: TableIdent, metadata: ViewMetadata): Unit
  def loadView(ident: TableIdent): Option[ViewMetadata]
  def dropView(ident: TableIdent): Unit

  /** Convenience: create from SQL + schema with defaulted metadata. */
  def createView(ident: TableIdent, sql: String, schema: IceSchema): Unit =
    createView(ident, ViewMetadata.create(
      java.util.UUID.randomUUID().toString, "", sql, schema,
      System.currentTimeMillis(), defaultNamespace = ident.namespace))
}

object CatalogOps {
  /** Applies updates to metadata (commit.rs:417-490): AddSnapshot also bumps
    * last-sequence-number and appends to snapshot-log.
    */
  def applyUpdates(base: TableMetadata, updates: Seq[TableUpdate]): TableMetadata = {
    import TableUpdate._
    updates.foldLeft(base) { (m, u) =>
      u match {
        case AddSnapshot(s) => m.copy(
          snapshots = m.snapshots + (s.snapshotId -> s),
          lastSequenceNumber = math.max(m.lastSequenceNumber, s.sequenceNumber),
          snapshotLog = m.snapshotLog :+ SnapshotLogEntry(s.snapshotId, s.timestampMs),
          lastUpdatedMs = s.timestampMs,
          // V3 row lineage: a lineage-assigning snapshot advances the
          // table's next-row-id by the rows it assigned (summary-carried
          // so the bump replays identically on any catalog backend)
          nextRowId = s.firstRowId match {
            case Some(f) => math.max(m.nextRowId,
              f + s.summary.get("assigned-row-ids").map(_.toLong).getOrElse(0L))
            case None => m.nextRowId
          })
        case SetSnapshotRef(name, id, refType, maxAge, minKeep) =>
          // liveness at APPLY time, against the committed base plus this
          // commit's own AddSnapshot: a ref created from stale metadata must
          // not dangle at a snapshot a concurrent expire already removed
          if (!m.snapshots.contains(id))
            throw new CommitConflictException(
              s"ref $name targets snapshot $id, which no longer exists")
          val m2 = m.copy(refs = m.refs + (name -> SnapshotReference(id, refType, maxAge, minKeep)))
          if (name == m.MainBranch) m2.copy(currentSnapshotId = Some(id)) else m2
        case RemoveSnapshotRef(name) =>
          val m2 = m.copy(refs = m.refs - name)
          if (name == m.MainBranch) m2.copy(currentSnapshotId = None) else m2
        case AddSchema(s, lastCol) => m.copy(
          schemas = m.schemas + (s.schemaId -> s),
          lastColumnId = math.max(m.lastColumnId, lastCol))
        case SetCurrentSchema(id) => m.copy(currentSchemaId = id)
        case AddPartitionSpec(s) => m.copy(
          partitionSpecs = m.partitionSpecs + (s.specId -> s),
          lastPartitionId = math.max(m.lastPartitionId,
            (s.fields.map(_.fieldId) :+ m.lastPartitionId).max))
        case SetDefaultSpec(id) => m.copy(defaultSpecId = id)
        case AddSortOrder(o) => m.copy(sortOrders = m.sortOrders + (o.orderId -> o))
        case SetDefaultSortOrder(id) => m.copy(defaultSortOrderId = id)
        case SetProperties(p) => m.copy(properties = m.properties ++ p)
        case RemoveProperties(ks) => m.copy(properties = m.properties -- ks)
        case RemoveSnapshots(ids) => m.copy(
          snapshots = m.snapshots -- ids,
          snapshotLog = m.snapshotLog.filterNot(e => ids.contains(e.snapshotId)),
          refs = m.refs.filterNot { case (_, r) => ids.contains(r.snapshotId) })
      }
    }
  }

  /** Table property `format-version` selects the metadata wire format at
    * create time (1 or 2, default 2 like current-format engines). */
  def formatVersionFrom(properties: Map[String, String]): Int =
    properties.get("format-version") match {
      case Some("1") => 1
      case Some("2") | None => 2
      case Some(other) =>
        throw new IllegalArgumentException(s"unsupported format-version $other")
    }

  /** Requirement check against current metadata (commit.rs:198-239). */
  def checkRequirements(m: TableMetadata, reqs: Seq[TableRequirement]): Unit = {
    import TableRequirement._
    reqs.foreach {
      case AssertRefSnapshotId(ref, expected) =>
        val actual =
          if (ref == m.MainBranch) m.currentSnapshotId.orElse(m.refs.get(ref).map(_.snapshotId))
          else m.refs.get(ref).map(_.snapshotId)
        if (actual != expected)
          throw new CommitConflictException(
            s"ref $ref moved: expected $expected, found $actual")
      case AssertCurrentSchemaId(id) =>
        if (m.currentSchemaId != id)
          throw new CommitConflictException(s"current schema changed: expected $id, found ${m.currentSchemaId}")
      case AssertDefaultSpecId(id) =>
        if (m.defaultSpecId != id)
          throw new CommitConflictException(s"default spec changed: expected $id, found ${m.defaultSpecId}")
    }
  }
}

/** Filesystem catalog (mirrors catalogs/iceberg-file-catalog): table metadata
  * at `<warehouse>/<ns...>/<table>/metadata/%05d-<uuid>.metadata.json`
  * (naming per table_metadata.rs:360-371) with a best-effort
  * `version-hint.text` pointer. The commit CAS is exclusive file creation of
  * the next metadata version (`CREATE_NEW` — atomic on POSIX): two racing
  * committers target the same version file name, exactly one create succeeds.
  */
class FileCatalog(val warehouse: String) extends Catalog {
  private def tableDir(ident: TableIdent): Path =
    Paths.get((warehouse +: ident.namespace :+ ident.name).mkString("/"))
  private def metadataDir(ident: TableIdent): Path = tableDir(ident).resolve("metadata")

  private def listVersions(ident: TableIdent): Seq[(Int, Path)] = {
    val dir = metadataDir(ident)
    if (!Files.isDirectory(dir)) return Nil
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(_.getFileName.toString.endsWith(".metadata.json"))
        .map(p => p.getFileName.toString.take(5).toInt -> p).toSeq.sortBy(_._1)
    } finally s.close()
  }

  private def writeVersion(ident: TableIdent, version: Int, m: TableMetadata): Path = {
    val dir = metadataDir(ident)
    Files.createDirectories(dir)
    val path = dir.resolve(f"$version%05d-${UUID.randomUUID()}.metadata.json")
    // CAS step 1: only one committer can own version N. Versions are claimed
    // via a lock file keyed on version number alone (the uuid suffix keeps
    // the metadata file name spec-shaped).
    val lock = dir.resolve(f"$version%05d.version.lock")
    Files.write(lock, path.getFileName.toString.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE) // throws if claimed
    // stage + atomic move: a concurrent reader listing *.metadata.json must
    // NEVER see a partially-written file — a half-flushed JSON would surface
    // as a parse error instead of a clean older-version read
    val stage = dir.resolve(path.getFileName.toString + ".tmp")
    Files.write(stage, TableMetadataJson.toJson(m).getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    Files.move(stage, path, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    val hint = dir.resolve("version-hint.text")
    val tmp = dir.resolve(s"version-hint.${UUID.randomUUID()}.tmp")
    Files.write(tmp, version.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, hint, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    path
  }

  private def currentVersion(ident: TableIdent): Option[(Int, Path)] =
    listVersions(ident).lastOption

  def loadMetadata(ident: TableIdent): Option[TableMetadata] =
    currentVersion(ident).map { case (_, p) =>
      TableMetadataJson.fromJson(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
    }

  override def createTable(ident: TableIdent, schema: IceSchema, spec: PartitionSpec,
                           properties: Map[String, String]): IceTable = {
    require(loadMetadata(ident).isEmpty, s"table $ident already exists")
    val now = System.currentTimeMillis()
    val m = TableMetadata(
      formatVersion = CatalogOps.formatVersionFrom(properties),
      tableUuid = UUID.randomUUID().toString,
      location = tableDir(ident).toAbsolutePath.toString,
      lastSequenceNumber = 0L,
      lastUpdatedMs = now,
      lastColumnId = schema.maxFieldId,
      schemas = Map(schema.schemaId -> schema),
      currentSchemaId = schema.schemaId,
      partitionSpecs = Map(spec.specId -> spec),
      defaultSpecId = spec.specId,
      lastPartitionId = (spec.fields.map(_.fieldId) :+ 999).max,
      properties = DefaultProperties.table ++ properties,
      currentSnapshotId = None,
      snapshots = Map.empty,
      snapshotLog = Nil,
      metadataLog = Nil,
      sortOrders = Map(0 -> SortOrder.unsorted),
      defaultSortOrderId = 0,
      refs = Map.empty)
    writeVersion(ident, 1, m)
    new IceTable(ident, this, m)
  }

  override def loadTable(ident: TableIdent): Option[IceTable] =
    loadMetadata(ident).map(m => new IceTable(ident, this, m))

  override def registerTable(ident: TableIdent, metadataLocation: String): IceTable = {
    require(loadMetadata(ident).isEmpty, s"table $ident already exists")
    val m = TableMetadataJson.fromJson(new String(
      Files.readAllBytes(Paths.get(metadataLocation)), StandardCharsets.UTF_8))
    // pointer = this catalog's version-file chain (necessarily starting at 1
    // — the require above means no versions exist); the metadata body keeps
    // its original `location`, so data/manifest paths (absolute) and future
    // writes stay rooted at the source table directory
    writeVersion(ident, 1, m)
    new IceTable(ident, this, m)
  }

  override def dropTable(ident: TableIdent): Unit = {
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try { import scala.jdk.CollectionConverters._; s.iterator().asScala.foreach(rm) }
        finally s.close()
      }
      Files.deleteIfExists(p)
    }
    rm(tableDir(ident))
  }

  /** Pointer move: the current metadata document is re-anchored as version 1
    * of a fresh chain at the target ident (exactly registerTable's shape —
    * the body keeps its `location`, so manifests/data stay put and future
    * writes keep landing there), then the SOURCE pointer chain is retired.
    * Only pointer artifacts are deleted — manifest Avro files sharing the
    * source metadata/ directory survive, since the renamed table's snapshots
    * still reference them by absolute path. The CREATE_NEW version-1 lock at
    * the target arbitrates two racing renames to the same name. */
  override def renameTable(from: TableIdent, to: TableIdent): Unit = {
    val (_, cur) = currentVersion(from).getOrElse(
      throw new IllegalArgumentException(s"no such table $from"))
    require(loadMetadata(to).isEmpty, s"table $to already exists")
    val m = TableMetadataJson.fromJson(
      new String(Files.readAllBytes(cur), StandardCharsets.UTF_8))
    writeVersion(to, 1, m)
    retirePointerChain(from)
  }

  override def renameView(from: TableIdent, to: TableIdent): Unit = {
    require(Files.exists(viewFile(from)), s"no such view $from")
    require(!Files.exists(viewFile(to)), s"view $to already exists")
    Files.createDirectories(metadataDir(to))
    Files.move(viewFile(from), viewFile(to))
  }

  /** Deletes the catalog-pointer artifacts (metadata documents, version
    * locks, version hint) of `ident` without touching manifests or data. */
  private def retirePointerChain(ident: TableIdent): Unit = {
    val dir = metadataDir(ident)
    if (!Files.isDirectory(dir)) return
    val s = Files.list(dir)
    val pointerFiles =
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter { p =>
          val n = p.getFileName.toString
          n.endsWith(".metadata.json") || n.endsWith(".version.lock") ||
            n.startsWith("version-hint")
        }.toList
      } finally s.close()
    pointerFiles.foreach(Files.deleteIfExists(_))
  }

  override def listTables(namespace: Seq[String]): Seq[TableIdent] = {
    val dir = Paths.get((warehouse +: namespace).mkString("/"))
    if (!Files.isDirectory(dir)) return Nil
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      // a retired rename source keeps its metadata/ dir (manifests live
      // there) but has no version files — only dirs with a live pointer
      // chain are tables
      s.iterator().asScala.filter(p => Files.isDirectory(p.resolve("metadata")))
        .map(p => TableIdent(namespace, p.getFileName.toString))
        .filter(id => currentVersion(id).isDefined).toSeq
    } finally s.close()
  }

  override def createNamespace(namespace: Seq[String]): Unit =
    Files.createDirectories(Paths.get((warehouse +: namespace).mkString("/")))
  override def dropNamespace(namespace: Seq[String]): Unit =
    Files.deleteIfExists(Paths.get((warehouse +: namespace).mkString("/")))
  override def listNamespaces(): Seq[Seq[String]] = {
    val dir = Paths.get(warehouse)
    if (!Files.isDirectory(dir)) return Nil
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(Files.isDirectory(_)).map(p => Seq(p.getFileName.toString)).toSeq
    } finally s.close()
  }

  override def updateTable(commit: CommitTable): TableMetadata = {
    val (version, path) = currentVersion(commit.ident)
      .getOrElse(throw new IllegalStateException(s"table ${commit.ident} does not exist"))
    val current = TableMetadataJson.fromJson(
      new String(Files.readAllBytes(path), StandardCharsets.UTF_8))
    CatalogOps.checkRequirements(current, commit.requirements)
    val next = CatalogOps.applyUpdates(current, commit.updates)
      .copy(metadataLog = current.metadataLog :+
        MetadataLogEntry(path.toString, current.lastUpdatedMs))
    try writeVersion(commit.ident, version + 1, next)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new CommitConflictException(
          s"concurrent commit claimed version ${version + 1} of ${commit.ident}")
    }
    next
  }

  // ---- views: full versioned metadata JSON (view_metadata.rs shape) ----

  private def viewFile(ident: TableIdent): Path = metadataDir(ident).resolve("view.json")

  private def writeView(ident: TableIdent, metadata: ViewMetadata): Unit = {
    Files.createDirectories(metadataDir(ident))
    val m = if (metadata.location.isEmpty)
      metadata.copy(location = tableDir(ident).toAbsolutePath.toString) else metadata
    Files.write(viewFile(ident),
      ViewMetadataJson.toJson(m).getBytes(StandardCharsets.UTF_8))
  }

  override def createView(ident: TableIdent, metadata: ViewMetadata): Unit = {
    if (Files.exists(viewFile(ident)))
      throw new IllegalStateException(s"view $ident already exists")
    writeView(ident, metadata)
  }

  override def replaceView(ident: TableIdent, metadata: ViewMetadata): Unit = {
    val prev = loadView(ident).getOrElse(
      throw new IllegalArgumentException(s"no view $ident to replace"))
    require(prev.viewUuid == metadata.viewUuid,
      s"view uuid changed on replace: ${prev.viewUuid} -> ${metadata.viewUuid}")
    writeView(ident, metadata)
  }

  override def loadView(ident: TableIdent): Option[ViewMetadata] = {
    val p = viewFile(ident)
    if (!Files.exists(p)) None
    else Some(ViewMetadataJson.fromJson(
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8)))
  }

  override def dropView(ident: TableIdent): Unit = Files.deleteIfExists(viewFile(ident))
}

/** Default table properties (iceberg-rust/src/table/mod.rs:75-85). */
object DefaultProperties {
  val table: Map[String, String] = Map(
    "write.parquet.compression-codec" -> "zstd",
    "write.parquet.compression-level" -> "1",
    "write.target-file-size-bytes" -> "512000000") // MAX_PARQUET_SIZE, write.rs:66
}
