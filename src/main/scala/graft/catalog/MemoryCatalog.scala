package graft.catalog

import java.util.UUID

import scala.collection.concurrent.TrieMap

import graft.spec.{IceSchema, PartitionSpec, SortOrder, TableMetadata, ViewMetadata}
import graft.table.IceTable

/** In-memory catalog backend: the metadata POINTER lives in process memory
  * with compare-and-swap commits, while data and manifest files live under
  * the scratch warehouse directory — the same split a REST or JDBC catalog
  * makes (pointer in the catalog service, files on the object store;
  * reference CAS: catalogs/iceberg-sql-catalog/src/lib.rs:429-480). The
  * `Catalog` trait is the backend seam: everything above it (transactions,
  * scans, MVs, SQL plugin) runs unchanged against either backend.
  * Useful for tests and ephemeral session-local tables.
  */
class MemoryCatalog(val warehouse: String) extends Catalog {

  private val tables = TrieMap.empty[TableIdent, TableMetadata]
  private val views = TrieMap.empty[TableIdent, ViewMetadata]
  private val namespaces = TrieMap.empty[Seq[String], Unit]

  override def createTable(ident: TableIdent, schema: IceSchema, spec: PartitionSpec,
                           properties: Map[String, String]): IceTable = {
    require(!tables.contains(ident), s"table $ident already exists")
    val location = (Seq(warehouse) ++ ident.namespace :+ ident.name).mkString("/")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(location, "metadata"))
    val m = TableMetadata(
      formatVersion = CatalogOps.formatVersionFrom(properties),
      tableUuid = UUID.randomUUID().toString,
      location = location,
      lastSequenceNumber = 0L,
      lastUpdatedMs = System.currentTimeMillis(),
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
    namespaces.put(ident.namespace, ())
    tables.put(ident, m)
    new IceTable(ident, this, m)
  }

  override def loadTable(ident: TableIdent): Option[IceTable] =
    tables.get(ident).map(m => new IceTable(ident, this, m))

  override def registerTable(ident: TableIdent, metadataLocation: String): IceTable = {
    val m = graft.spec.TableMetadataJson.fromJson(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(metadataLocation)),
      java.nio.charset.StandardCharsets.UTF_8))
    require(tables.putIfAbsent(ident, m).isEmpty, s"table $ident already exists")
    namespaces.put(ident.namespace, ())
    new IceTable(ident, this, m)
  }

  override def dropTable(ident: TableIdent): Unit = tables.remove(ident)

  /** Pointer move under the commit lock: a rename can't interleave with a
    * CAS commit, so the metadata re-keyed to `to` is always the latest. */
  override def renameTable(from: TableIdent, to: TableIdent): Unit = synchronized {
    val m = tables.getOrElse(from, throw new IllegalArgumentException(s"no such table $from"))
    require(!tables.contains(to), s"table $to already exists")
    tables.put(to, m)
    tables.remove(from)
    namespaces.put(to.namespace, ())
  }

  override def renameView(from: TableIdent, to: TableIdent): Unit = synchronized {
    val m = views.getOrElse(from, throw new IllegalArgumentException(s"no such view $from"))
    require(!views.contains(to), s"view $to already exists")
    views.put(to, m)
    views.remove(from)
  }

  override def listTables(namespace: Seq[String]): Seq[TableIdent] =
    tables.keys.filter(_.namespace == namespace).toSeq.sortBy(_.toString)

  override def createNamespace(namespace: Seq[String]): Unit = namespaces.put(namespace, ())
  override def dropNamespace(namespace: Seq[String]): Unit = namespaces.remove(namespace)
  override def listNamespaces(): Seq[Seq[String]] = namespaces.keys.toSeq.sortBy(_.mkString("."))

  /** CAS commit: requirements checked and the pointer swapped under one
    * lock — concurrent stale committers fail with CommitConflictException
    * exactly like the filesystem backend's version-file CAS. */
  override def updateTable(commit: CommitTable): TableMetadata = synchronized {
    val current = tables.getOrElse(commit.ident,
      throw new IllegalArgumentException(s"no such table ${commit.ident}"))
    CatalogOps.checkRequirements(current, commit.requirements)
    val updated = CatalogOps.applyUpdates(current, commit.updates)
    tables.put(commit.ident, updated)
    updated
  }

  override def createView(ident: TableIdent, metadata: ViewMetadata): Unit = {
    val m = if (metadata.location.isEmpty) metadata.copy(
      location = (Seq(warehouse) ++ ident.namespace :+ ident.name).mkString("/")) else metadata
    if (views.putIfAbsent(ident, m).isDefined)
      throw new IllegalStateException(s"view $ident already exists")
  }
  override def replaceView(ident: TableIdent, metadata: ViewMetadata): Unit = {
    val prev = views.getOrElse(ident,
      throw new IllegalArgumentException(s"no view $ident to replace"))
    require(prev.viewUuid == metadata.viewUuid,
      s"view uuid changed on replace: ${prev.viewUuid} -> ${metadata.viewUuid}")
    views.put(ident, metadata)
  }
  override def loadView(ident: TableIdent): Option[ViewMetadata] = views.get(ident)
  override def dropView(ident: TableIdent): Unit = views.remove(ident)
}
