package graft.catalog

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.sql.{Connection, DriverManager, SQLException}
import java.util.UUID

import graft.spec._
import graft.table.IceTable

/** SQL-database catalog backend over JDBC (reference: the most-used backend,
  * `catalogs/iceberg-sql-catalog/src/lib.rs:429-480`): the database holds
  * ONLY per-table metadata-location POINTER rows; metadata documents are
  * immutable JSON files on the warehouse store. A commit writes the next
  * metadata file, then runs
  * `UPDATE iceberg_tables SET metadata_location = ? WHERE … AND
  * metadata_location = <previous>` — the affected-row count IS the CAS
  * verdict: 0 rows means a concurrent committer moved the pointer first and
  * the commit raises [[CommitConflictException]] (the reference issues the
  * same conditional UPDATE; we additionally check the row count and use
  * bind parameters instead of string interpolation).
  *
  * Works against any JDBC database; tests run on the Derby engine bundled
  * with Spark (`jdbc:derby:<dir>;create=true`). Table layout mirrors the
  * reference's `iceberg_tables` / `iceberg_namespaces` (lib.rs:73-105),
  * plus an `iceberg_views` pointer table for versioned view metadata.
  */
class JdbcCatalog(val warehouse: String, jdbcUrl: String,
                  catalogName: String = "graft") extends Catalog {

  private val conn: Connection = DriverManager.getConnection(jdbcUrl)

  // idempotent DDL: Derby has no IF NOT EXISTS — X0Y32 = already exists
  private def ddl(sql: String): Unit =
    try { val st = conn.createStatement(); try st.execute(sql) finally st.close() }
    catch { case e: SQLException if e.getSQLState == "X0Y32" => }

  ddl("""CREATE TABLE iceberg_tables (
        |  catalog_name VARCHAR(255) NOT NULL,
        |  table_namespace VARCHAR(255) NOT NULL,
        |  table_name VARCHAR(255) NOT NULL,
        |  metadata_location VARCHAR(4000),
        |  previous_metadata_location VARCHAR(4000),
        |  PRIMARY KEY (catalog_name, table_namespace, table_name))""".stripMargin)
  ddl("""CREATE TABLE iceberg_namespaces (
        |  catalog_name VARCHAR(255) NOT NULL,
        |  namespace VARCHAR(255) NOT NULL,
        |  PRIMARY KEY (catalog_name, namespace))""".stripMargin)
  ddl("""CREATE TABLE iceberg_views (
        |  catalog_name VARCHAR(255) NOT NULL,
        |  view_namespace VARCHAR(255) NOT NULL,
        |  view_name VARCHAR(255) NOT NULL,
        |  metadata_location VARCHAR(4000),
        |  PRIMARY KEY (catalog_name, view_namespace, view_name))""".stripMargin)

  private def ns(ident: TableIdent): String = ident.namespace.mkString(".")

  private def tableDir(ident: TableIdent): Path =
    Paths.get((warehouse +: ident.namespace :+ ident.name).mkString("/"))

  /** Immutable metadata document write: `%05d-<uuid>.metadata.json`. */
  private def writeMetadataFile(ident: TableIdent, version: Int, json: String): Path =
    writeMetadataFileAt(tableDir(ident), version, json)

  /** Registered tables keep their metadata chain under their own location
    * (which may sit outside this catalog's warehouse — e.g. a FileCatalog
    * table dir). The FileCatalog-compatible `NNNNN.version.lock` is claimed
    * before each write so a SHARED directory can never end up holding two
    * metadata files of the same version number (FileCatalog.listVersions
    * would tie them and pick nondeterministically); a claimed number is
    * skipped, not fought over. The row CAS in [[updateTable]] remains the
    * commit arbiter for THIS catalog — with two catalogs actively writing
    * the same chain, last-pointer-wins divergence is still possible, so a
    * registered table should have one writing catalog at a time. */
  private def writeMetadataFileAt(tableRoot: Path, version: Int, json: String): Path = {
    val dir = tableRoot.resolve("metadata")
    Files.createDirectories(dir)
    var v = version
    var name: String = null
    while (name == null) {
      require(v < version + 100000, s"could not claim a metadata version under $dir")
      val candidate = f"$v%05d-${UUID.randomUUID()}.metadata.json"
      try {
        Files.write(dir.resolve(f"$v%05d.version.lock"),
          candidate.getBytes(StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        name = candidate
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => v += 1
      }
    }
    val path = dir.resolve(name)
    Files.write(path, json.getBytes(StandardCharsets.UTF_8))
    path
  }

  private def versionOf(location: String): Int = {
    // registered tables may point at foreign-named documents; fall back to 0
    // so their first catalog-owned successor becomes version 1
    val name = Paths.get(location).getFileName.toString
    scala.util.Try(name.take(5).toInt).getOrElse(0)
  }

  private def pointer(table: String, nsCol: String, nameCol: String,
                      ident: TableIdent): Option[String] = synchronized {
    val ps = conn.prepareStatement(
      s"SELECT metadata_location FROM $table WHERE catalog_name = ? AND $nsCol = ? AND $nameCol = ?")
    try {
      ps.setString(1, catalogName); ps.setString(2, ns(ident)); ps.setString(3, ident.name)
      val rs = ps.executeQuery()
      try { if (rs.next()) Option(rs.getString(1)) else None } finally rs.close()
    } finally ps.close()
  }

  private def readTableMetadata(location: String): TableMetadata =
    TableMetadataJson.fromJson(
      new String(Files.readAllBytes(Paths.get(location)), StandardCharsets.UTF_8))

  override def createTable(ident: TableIdent, schema: IceSchema, spec: PartitionSpec,
                           properties: Map[String, String]): IceTable = synchronized {
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
    val path = writeMetadataFile(ident, 1, TableMetadataJson.toJson(m))
    val ps = conn.prepareStatement(
      "INSERT INTO iceberg_tables (catalog_name, table_namespace, table_name, metadata_location) VALUES (?, ?, ?, ?)")
    try {
      ps.setString(1, catalogName); ps.setString(2, ns(ident))
      ps.setString(3, ident.name); ps.setString(4, path.toString)
      ps.executeUpdate()
    } catch {
      case e: SQLException if e.getSQLState != null && e.getSQLState.startsWith("23") =>
        Files.deleteIfExists(path)
        throw new IllegalArgumentException(s"table $ident already exists", e)
    } finally ps.close()
    createNamespace(ident.namespace)
    new IceTable(ident, this, m)
  }

  override def loadTable(ident: TableIdent): Option[IceTable] =
    pointer("iceberg_tables", "table_namespace", "table_name", ident)
      .map(loc => new IceTable(ident, this, readTableMetadata(loc)))

  /** The purest register form: the pointer row references the source
    * metadata document directly — zero copies; the next commit's CAS swings
    * the pointer to a catalog-written successor file as usual. */
  override def registerTable(ident: TableIdent, metadataLocation: String): IceTable = synchronized {
    val m = readTableMetadata(metadataLocation) // validates the document first
    val ps = conn.prepareStatement(
      "INSERT INTO iceberg_tables (catalog_name, table_namespace, table_name, metadata_location) VALUES (?, ?, ?, ?)")
    try {
      ps.setString(1, catalogName); ps.setString(2, ns(ident))
      ps.setString(3, ident.name); ps.setString(4, metadataLocation)
      ps.executeUpdate()
    } catch {
      case e: SQLException if e.getSQLState != null && e.getSQLState.startsWith("23") =>
        throw new IllegalArgumentException(s"table $ident already exists", e)
    } finally ps.close()
    createNamespace(ident.namespace)
    new IceTable(ident, this, m)
  }

  override def dropTable(ident: TableIdent): Unit = synchronized {
    val ps = conn.prepareStatement(
      "DELETE FROM iceberg_tables WHERE catalog_name = ? AND table_namespace = ? AND table_name = ?")
    try {
      ps.setString(1, catalogName); ps.setString(2, ns(ident)); ps.setString(3, ident.name)
      ps.executeUpdate()
    } finally ps.close()
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

  /** Rename = an UPDATE of the identifier columns on the pointer row (the
    * metadata-location column is untouched, so the document chain and all
    * data stay in place). The primary key rejects a taken destination
    * (SQLState 23505 → IllegalArgumentException); affected-rows 0 means the
    * source vanished. */
  private def renameRow(table: String, nsCol: String, nameCol: String,
                        from: TableIdent, to: TableIdent): Unit = synchronized {
    val ps = conn.prepareStatement(
      s"""UPDATE $table SET $nsCol = ?, $nameCol = ?
         | WHERE catalog_name = ? AND $nsCol = ? AND $nameCol = ?""".stripMargin)
    val updated =
      try {
        ps.setString(1, ns(to)); ps.setString(2, to.name)
        ps.setString(3, catalogName); ps.setString(4, ns(from)); ps.setString(5, from.name)
        ps.executeUpdate()
      } catch {
        case e: SQLException if e.getSQLState != null && e.getSQLState.startsWith("23") =>
          throw new IllegalArgumentException(s"$to already exists", e)
      } finally ps.close()
    if (updated == 0) throw new IllegalArgumentException(s"no such $table entry $from")
  }

  override def renameTable(from: TableIdent, to: TableIdent): Unit = {
    renameRow("iceberg_tables", "table_namespace", "table_name", from, to)
    createNamespace(to.namespace)
  }

  override def renameView(from: TableIdent, to: TableIdent): Unit =
    renameRow("iceberg_views", "view_namespace", "view_name", from, to)

  override def listTables(namespace: Seq[String]): Seq[TableIdent] = synchronized {
    val ps = conn.prepareStatement(
      "SELECT table_name FROM iceberg_tables WHERE catalog_name = ? AND table_namespace = ? ORDER BY table_name")
    try {
      ps.setString(1, catalogName); ps.setString(2, namespace.mkString("."))
      val rs = ps.executeQuery()
      try {
        val out = Seq.newBuilder[TableIdent]
        while (rs.next()) out += TableIdent(namespace, rs.getString(1))
        out.result()
      } finally rs.close()
    } finally ps.close()
  }

  override def createNamespace(namespace: Seq[String]): Unit = synchronized {
    val ps = conn.prepareStatement(
      "INSERT INTO iceberg_namespaces (catalog_name, namespace) VALUES (?, ?)")
    try {
      ps.setString(1, catalogName); ps.setString(2, namespace.mkString("."))
      ps.executeUpdate()
    } catch {
      case e: SQLException if e.getSQLState != null && e.getSQLState.startsWith("23") => // exists
    } finally ps.close()
  }

  override def dropNamespace(namespace: Seq[String]): Unit = synchronized {
    val ps = conn.prepareStatement(
      "DELETE FROM iceberg_namespaces WHERE catalog_name = ? AND namespace = ?")
    try { ps.setString(1, catalogName); ps.setString(2, namespace.mkString(".")); ps.executeUpdate() }
    finally ps.close()
  }

  override def listNamespaces(): Seq[Seq[String]] = synchronized {
    val ps = conn.prepareStatement(
      "SELECT namespace FROM iceberg_namespaces WHERE catalog_name = ? ORDER BY namespace")
    try {
      ps.setString(1, catalogName)
      val rs = ps.executeQuery()
      try {
        val out = Seq.newBuilder[Seq[String]]
        while (rs.next()) out += rs.getString(1).split('.').toSeq
        out.result()
      } finally rs.close()
    } finally ps.close()
  }

  /** Requirement check + pointer CAS (lib.rs:429-480 shape). */
  override def updateTable(commit: CommitTable): TableMetadata = synchronized {
    val prevLoc = pointer("iceberg_tables", "table_namespace", "table_name", commit.ident)
      .getOrElse(throw new IllegalStateException(s"table ${commit.ident} does not exist"))
    val current = readTableMetadata(prevLoc)
    CatalogOps.checkRequirements(current, commit.requirements)
    val next = CatalogOps.applyUpdates(current, commit.updates)
      .copy(metadataLog = current.metadataLog :+
        MetadataLogEntry(prevLoc, current.lastUpdatedMs))
    val nextPath = writeMetadataFileAt(Paths.get(next.location), versionOf(prevLoc) + 1,
      TableMetadataJson.toJson(next))
    val ps = conn.prepareStatement(
      """UPDATE iceberg_tables SET metadata_location = ?, previous_metadata_location = ?
        | WHERE catalog_name = ? AND table_namespace = ? AND table_name = ?
        |   AND metadata_location = ?""".stripMargin)
    val updated =
      try {
        ps.setString(1, nextPath.toString); ps.setString(2, prevLoc)
        ps.setString(3, catalogName); ps.setString(4, ns(commit.ident))
        ps.setString(5, commit.ident.name); ps.setString(6, prevLoc)
        ps.executeUpdate()
      } finally ps.close()
    if (updated == 0) {
      Files.deleteIfExists(nextPath) // lost the race; orphan cleanup
      throw new CommitConflictException(
        s"concurrent commit on ${commit.ident}: metadata pointer moved past $prevLoc")
    }
    next
  }

  // ---- views: pointer rows at versioned view-metadata documents ----

  private def writeViewFile(ident: TableIdent, version: Int, m: ViewMetadata): Path = {
    val dir = tableDir(ident).resolve("metadata")
    Files.createDirectories(dir)
    val path = dir.resolve(f"$version%05d-${UUID.randomUUID()}.view-metadata.json")
    Files.write(path, ViewMetadataJson.toJson(m).getBytes(StandardCharsets.UTF_8))
    path
  }

  override def createView(ident: TableIdent, metadata: ViewMetadata): Unit = synchronized {
    val m = if (metadata.location.isEmpty)
      metadata.copy(location = tableDir(ident).toAbsolutePath.toString) else metadata
    val path = writeViewFile(ident, 1, m)
    val ps = conn.prepareStatement(
      "INSERT INTO iceberg_views (catalog_name, view_namespace, view_name, metadata_location) VALUES (?, ?, ?, ?)")
    try {
      ps.setString(1, catalogName); ps.setString(2, ns(ident))
      ps.setString(3, ident.name); ps.setString(4, path.toString)
      ps.executeUpdate()
    } catch {
      case e: SQLException if e.getSQLState != null && e.getSQLState.startsWith("23") =>
        Files.deleteIfExists(path)
        throw new IllegalStateException(s"view $ident already exists", e)
    } finally ps.close()
  }

  override def replaceView(ident: TableIdent, metadata: ViewMetadata): Unit = synchronized {
    val prevLoc = pointer("iceberg_views", "view_namespace", "view_name", ident)
      .getOrElse(throw new IllegalArgumentException(s"no view $ident to replace"))
    val prev = ViewMetadataJson.fromJson(
      new String(Files.readAllBytes(Paths.get(prevLoc)), StandardCharsets.UTF_8))
    require(prev.viewUuid == metadata.viewUuid,
      s"view uuid changed on replace: ${prev.viewUuid} -> ${metadata.viewUuid}")
    val path = writeViewFile(ident, versionOf(prevLoc) + 1, metadata)
    val ps = conn.prepareStatement(
      """UPDATE iceberg_views SET metadata_location = ?
        | WHERE catalog_name = ? AND view_namespace = ? AND view_name = ?
        |   AND metadata_location = ?""".stripMargin)
    val updated =
      try {
        ps.setString(1, path.toString); ps.setString(2, catalogName)
        ps.setString(3, ns(ident)); ps.setString(4, ident.name); ps.setString(5, prevLoc)
        ps.executeUpdate()
      } finally ps.close()
    if (updated == 0) {
      Files.deleteIfExists(path)
      throw new CommitConflictException(s"concurrent view replace on $ident")
    }
  }

  override def loadView(ident: TableIdent): Option[ViewMetadata] =
    pointer("iceberg_views", "view_namespace", "view_name", ident).map(loc =>
      ViewMetadataJson.fromJson(
        new String(Files.readAllBytes(Paths.get(loc)), StandardCharsets.UTF_8)))

  override def dropView(ident: TableIdent): Unit = synchronized {
    val ps = conn.prepareStatement(
      "DELETE FROM iceberg_views WHERE catalog_name = ? AND view_namespace = ? AND view_name = ?")
    try {
      ps.setString(1, catalogName); ps.setString(2, ns(ident)); ps.setString(3, ident.name)
      ps.executeUpdate()
    } finally ps.close()
  }
}
