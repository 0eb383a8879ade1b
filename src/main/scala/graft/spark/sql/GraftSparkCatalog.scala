package graft.spark.sql

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{BucketTransform, FieldReference, IdentityTransform, Literal => V2Literal, Transform}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.{Catalog, FileCatalog, JdbcCatalog, RestCatalog, TableIdent}
import graft.core.{Transform => IceTransform}
import graft.spark.IceWrite
import graft.spec.{IceSchema, IceType, PartitionField, PartitionSpec}
import graft.table.IceTable

/** Spark `TableCatalog` plugin over the graft filesystem catalog (SURVEY
  * §2.8 D1–D4): registers as a first-class Spark catalog so plain SQL works —
  *
  * {{{
  *   spark.sql.catalog.graft = graft.spark.sql.GraftSparkCatalog
  *   spark.sql.catalog.graft.warehouse = /path/to/warehouse
  *   // + GraftExtensions for the read path
  *   CREATE TABLE graft.db.orders (id BIGINT, d DATE) PARTITIONED BY (months(d));
  *   INSERT INTO graft.db.orders VALUES ...;
  *   SELECT count(*) FROM graft.db.orders WHERE d >= '2020-02-01';
  * }}}
  *
  * Reads resolve through [[GraftExtensions]], which swaps the relation for a
  * pruned [[graft.spark.IceScan]] plan during analysis (so time travel, MoR
  * deletes and statistics pruning all apply). Writes use the V1 insert
  * bridge — one ACID append/replace transaction per INSERT.
  */
class GraftSparkCatalog extends TableCatalog with SupportsNamespaces with ProcedureCatalog {

  private var catalogName: String = _
  private[sql] var catalog: Catalog = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    // backend selection: `uri` → REST catalog service, `jdbc.url` → SQL
    // database pointer catalog (Derby etc.), else `warehouse` → filesystem
    // catalog. Data IO always goes straight to each table's `location`;
    // only metadata operations differ.
    def wh = Option(options.get("warehouse")).getOrElse(throw new IllegalArgumentException(
      s"catalog $name requires spark.sql.catalog.$name.warehouse or .uri"))
    catalog = (Option(options.get("uri")), Option(options.get("jdbc.url"))) match {
      case (Some(uri), _) => new RestCatalog(uri)
      case (None, Some(url)) => new JdbcCatalog(wh, url, name)
      case _ => new FileCatalog(wh)
    }
  }

  override def name(): String = catalogName

  private def toIdent(ident: Identifier): TableIdent =
    TableIdent(ident.namespace.toSeq, ident.name)

  override def listTables(namespace: Array[String]): Array[Identifier] =
    catalog.listTables(namespace.toSeq)
      .map(t => Identifier.of(t.namespace.toArray, t.name)).toArray

  override def loadTable(ident: Identifier): Table =
    catalog.loadTable(toIdent(ident)) match {
      case Some(t) => new GraftSparkTable(t)
      case None =>
        // metadata tables: `db.t.snapshots` parses as namespace [db, t] +
        // name "snapshots" — serve table t's metadata relation (Iceberg's
        // inspection surface; reference exposes the same structs via its
        // metadata APIs)
        val kind = ident.name.toLowerCase(java.util.Locale.ROOT)
        if (ident.namespace.length >= 2 && GraftMetadataTable.Kinds.contains(kind)) {
          val base = TableIdent(ident.namespace.init.toSeq, ident.namespace.last)
          catalog.loadTable(base) match {
            case Some(t) => new GraftMetadataTable(t, kind)
            case None => throw new NoSuchTableException(ident)
          }
        } else if (ident.namespace.length >= 2 &&
            (kind.startsWith("branch_") || kind.startsWith("tag_"))) {
          // Iceberg's branch/tag identifier convention: `db.t.branch_dev`
          // reads AND writes the branch; `db.t.tag_v1` is a read-only pin
          val base = TableIdent(ident.namespace.init.toSeq, ident.namespace.last)
          val refName = ident.name.substring(ident.name.indexOf('_') + 1)
          catalog.loadTable(base) match {
            case Some(t) =>
              val ref = t.metadata.refs.getOrElse(refName,
                throw new IllegalArgumentException(s"table $base has no ref '$refName'"))
              if (kind.startsWith("tag_")) {
                require(ref.refType == "tag", s"'$refName' is a ${ref.refType}, not a tag")
                new GraftSparkTable(t, Some(ref.snapshotId), None, readOnlyPin = true)
              } else {
                require(ref.refType == "branch", s"'$refName' is a ${ref.refType}, not a branch")
                new GraftSparkTable(t, Some(ref.snapshotId), Some(refName))
              }
            case None => throw new NoSuchTableException(ident)
          }
        } else catalog.loadView(toIdent(ident)) match {
          // plain views resolve as relations (D5); tables take precedence
          case Some(vm) => new GraftViewTable(catalog, toIdent(ident), vm)
          case None => throw new NoSuchTableException(ident)
        }
    }

  /** SQL time travel: `SELECT ... FROM graft.db.t VERSION AS OF <snapshotId>`
    * pins the scan to that snapshot (T6); a non-numeric version resolves as
    * a tag or branch name (`VERSION AS OF 'v1'`). */
  override def loadTable(ident: Identifier, version: String): Table =
    catalog.loadTable(toIdent(ident)) match {
      case Some(t) =>
        // ref names win over numeric snapshot ids: a tag named '123' would
        // otherwise be unreachable (misread as a snapshot-id lookup), while
        // real snapshot ids are 63-bit randoms that essentially never
        // collide with a human-chosen ref name
        val snapId = t.metadata.refs.get(version).map(_.snapshotId)
          .orElse(version.toLongOption.filter(t.snapshotById(_).isDefined))
          .getOrElse(throw new IllegalArgumentException(
            s"table $ident has no ref or snapshot '$version'"))
        require(t.snapshotById(snapId).isDefined,
          s"table $ident has no snapshot $version")
        new GraftSparkTable(t, Some(snapId))
      case None => throw new NoSuchTableException(ident)
    }

  /** `TIMESTAMP AS OF`: latest snapshot at or before the timestamp (µs). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    catalog.loadTable(toIdent(ident)) match {
      case Some(t) =>
        val tsMs = timestampMicros / 1000L
        val snap = t.metadata.snapshotLog.filter(_.timestampMs <= tsMs).lastOption
          .map(_.snapshotId)
          .getOrElse(throw new IllegalArgumentException(
            s"table $ident has no snapshot at or before $tsMs ms"))
        new GraftSparkTable(t, Some(snap))
      case None => throw new NoSuchTableException(ident)
    }

  /** Declares V3 column-DEFAULT support so Spark routes
    * `CREATE/ALTER TABLE ... DEFAULT` literals to this catalog instead of
    * rejecting the syntax. */
  override def capabilities(): util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  /** Parses a SQL DEFAULT literal and canonicalizes it for column type `t`
    * (Iceberg V3 default values; nested/non-literal defaults reject). */
  private def defaultLiteral(t: IceType, sql: String): Any = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    val parsed = org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseExpression(sql)
    require(parsed.foldable, s"DEFAULT must be a literal expression: $sql")
    val folded = Literal.create(parsed.eval(), parsed.dataType)
    val target = IceType.toSpark(t)
    val value = if (folded.dataType == target) folded.value
      else Cast(folded, target, Some("UTC")).eval()
    graft.spec.DefaultValues.fromCatalyst(t, value)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (catalog.tableExists(toIdent(ident))) throw new TableAlreadyExistsException(ident)
    val (struct, nextId) = IceType.fromSparkAssignIds(schema)
    // CREATE TABLE ... DEFAULT literals arrive as Spark column metadata:
    // EXISTS_DEFAULT is the frozen initial-default, CURRENT_DEFAULT the
    // (mutable) write-default — both canonicalized onto the schema model
    val withDefaults = struct.fields.map { f =>
      val md = schema(f.name).metadata
      val init = if (md.contains("EXISTS_DEFAULT"))
        Some(defaultLiteral(f.fieldType, md.getString("EXISTS_DEFAULT"))) else None
      val write = if (md.contains("CURRENT_DEFAULT"))
        Some(defaultLiteral(f.fieldType, md.getString("CURRENT_DEFAULT"))) else None
      f.copy(initialDefault = init, writeDefault = write)
    }
    val ice = IceSchema(0, withDefaults)
    val fields = partitions.zipWithIndex.map { case (t, i) =>
      val (srcName, iceT, nameSuffix) = toIceTransform(t)
      val src = ice.fieldByName(srcName).getOrElse(
        throw new IllegalArgumentException(s"partition source column $srcName not in schema"))
      val pname = if (iceT == IceTransform.Identity) src.name else s"${src.name}_$nameSuffix"
      PartitionField(src.id, 1000 + i, pname, iceT)
    }
    // ignore provider/options in properties; graft tables are parquet
    val props = properties.asScala.toMap -- Seq("provider", "location", "owner")
    val t = catalog.createTable(toIdent(ident), ice, PartitionSpec(0, fields.toSeq), props)
    new GraftSparkTable(t)
  }

  /** Spark connector transform → graft transform (+ conventional partition
    * field name suffix, mirroring the reference's `parse_transform`,
    * planner.rs:804-850). */
  private def toIceTransform(t: Transform): (String, IceTransform, String) = {
    val ref: String = t.references()(0).fieldNames()(0)
    def intArg: Int = t.arguments().collectFirst { case l: V2Literal[_] => l.value().toString.toInt }
      .getOrElse(throw new IllegalArgumentException(s"transform needs an integer argument: $t"))
    t.name() match {
      case "identity" => (ref, IceTransform.Identity, "")
      case "bucket" => val n = intArg; (ref, IceTransform.Bucket(n), s"bucket_$n")
      case "years" | "year" => (ref, IceTransform.Year, "year")
      case "months" | "month" => (ref, IceTransform.Month, "month")
      case "days" | "day" => (ref, IceTransform.Day, "day")
      case "hours" | "hour" => (ref, IceTransform.Hour, "hour")
      case "truncate" => val w = intArg; (ref, IceTransform.Truncate(w), s"trunc_$w")
      case x => throw new IllegalArgumentException(s"unsupported partition transform: $x")
    }
  }

  /** SQL schema evolution (reference capability: schema.rs evolution rules +
    * id-based resolution). Field ids are PRESERVED across rename — data
    * written before the rename keeps reading correctly because the scan
    * resolves parquet columns by `PARQUET:field_id`, not name. Type changes
    * accept only Iceberg's safe promotions (int→long, float→double, decimal
    * precision widening at fixed scale); Spark 4's parquet readers widen the
    * stored physical type on read.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    import TableChange._
    val t = catalog.loadTable(toIdent(ident)).getOrElse(throw new NoSuchTableException(ident))
    val schema0 = t.schema
    var fields = schema0.fields.toVector
    // never reuse a field id, even one freed by an earlier drop in THIS call
    var nextId = t.metadata.schemas.values.map(_.maxFieldId).max + 1
    var schemaChanged = false
    var setProps = Map.empty[String, String]
    var rmProps = Vector.empty[String]

    def topName(names: Array[String]): String = {
      if (names.length != 1) throw new UnsupportedOperationException(
        s"nested column changes are unsupported: ${names.mkString(".")}")
      names(0)
    }
    def idx(name: String): Int = {
      val i = fields.indexWhere(_.name == name)
      if (i < 0) throw new IllegalArgumentException(s"no such column: $name")
      i
    }

    changes.foreach {
      case a: AddColumn =>
        val name = topName(a.fieldNames)
        require(!fields.exists(_.name == name), s"column already exists: $name")
        val (st, next) = IceType.fromSparkAssignIds(
          StructType(Seq(org.apache.spark.sql.types.StructField(name, a.dataType, a.isNullable))), nextId)
        nextId = next
        // ADD COLUMN ... DEFAULT v (Iceberg V3): the literal becomes BOTH
        // the initial-default (what pre-evolution rows read — frozen) and
        // the write-default (what omitting writers fill — mutable later)
        val dv = Option(a.defaultValue()).map { d =>
          val l = d.getValue
          require(l != null, s"DEFAULT for $name must be a constant literal")
          val lit = org.apache.spark.sql.catalyst.expressions.Literal(l.value(), l.dataType())
          val target = a.dataType
          val value = if (lit.dataType == target) lit.value
            else org.apache.spark.sql.catalyst.expressions.Cast(lit, target, Some("UTC")).eval()
          graft.spec.DefaultValues.fromCatalyst(st.fields.head.fieldType, value)
        }
        fields :+= st.fields.head.copy(doc = Option(a.comment),
          initialDefault = dv, writeDefault = dv)
        schemaChanged = true
      case u: UpdateColumnDefaultValue =>
        // SET DEFAULT mutates only the WRITE default; the initial-default is
        // frozen history (V3 rule). DROP DEFAULT clears the write default.
        val i = idx(topName(u.fieldNames))
        val nd = Option(u.newCurrentDefault()).flatMap(d => Option(d.getSql))
          .map(_.trim).filter(_.nonEmpty)
          .map(sql => defaultLiteral(fields(i).fieldType, sql))
        fields = fields.updated(i, fields(i).copy(writeDefault = nd))
        schemaChanged = true
      case d: DeleteColumn =>
        val name = topName(d.fieldNames)
        val srcOfPartition = t.spec.fields.exists(pf =>
          schema0.fieldById(pf.sourceId).exists(_.name == name))
        require(!srcOfPartition, s"cannot drop partition source column $name")
        if (!d.ifExists) idx(name)
        fields = fields.filterNot(_.name == name)
        schemaChanged = true
      case r: RenameColumn =>
        // name-mapped tables (files imported without field ids via
        // add_files) resolve columns by NAME — a rename would silently
        // null out every imported file's column
        require(!t.metadata.properties.contains(graft.spark.IceScan.NameMappingProp),
          "cannot rename columns on a name-mapped table (files imported by add_files resolve by name)")
        val i = idx(topName(r.fieldNames))
        require(!fields.exists(_.name == r.newName), s"column already exists: ${r.newName}")
        fields = fields.updated(i, fields(i).copy(name = r.newName))
        schemaChanged = true
      case u: UpdateColumnType =>
        val i = idx(topName(u.fieldNames))
        val promoted = (fields(i).fieldType, u.newDataType) match {
          case (IceType.IntT, org.apache.spark.sql.types.LongType) => IceType.LongT
          case (IceType.FloatT, org.apache.spark.sql.types.DoubleType) => IceType.DoubleT
          case (IceType.DecimalT(p, s), d: org.apache.spark.sql.types.DecimalType)
            if d.scale == s && d.precision >= p => IceType.DecimalT(d.precision, s)
          case (cur, target) => throw new UnsupportedOperationException(
            s"illegal type promotion $cur -> $target (allowed: int->long, float->double, decimal widening)")
        }
        fields = fields.updated(i, fields(i).copy(fieldType = promoted))
        schemaChanged = true
      case n: UpdateColumnNullability =>
        val i = idx(topName(n.fieldNames))
        fields = fields.updated(i, fields(i).copy(required = !n.nullable()))
        schemaChanged = true
      case c: UpdateColumnComment =>
        val i = idx(topName(c.fieldNames))
        fields = fields.updated(i, fields(i).copy(doc = Option(c.newComment)))
        schemaChanged = true
      case p: SetProperty => setProps += p.property -> p.value
      case p: RemoveProperty => rmProps :+= p.property
      case other => throw new UnsupportedOperationException(s"unsupported table change: $other")
    }

    var tx = t.newTransaction(None)
    if (schemaChanged) tx = tx.setSchema(IceSchema(schema0.schemaId, fields,
      schema0.identifierFieldIds.filter(id => fields.exists(_.id == id))))
    if (setProps.nonEmpty) tx = tx.updateProperties(setProps)
    if (rmProps.nonEmpty) tx = tx.removeProperties(rmProps)
    new GraftSparkTable(tx.commit())
  }

  override def dropTable(ident: Identifier): Boolean = {
    val exists = catalog.tableExists(toIdent(ident))
    if (exists) catalog.dropTable(toIdent(ident))
    exists
  }

  /** ALTER TABLE … RENAME TO …: a catalog pointer move — metadata documents,
    * manifests and data files stay at the table's `location` (Iceberg rename
    * semantics; REST protocol rename_table). Also serves views, since Spark
    * routes ALTER VIEW … RENAME TO through the same TableCatalog hook. */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = toIdent(oldIdent)
    val to = toIdent(newIdent)
    if (catalog.tableExists(from)) catalog.renameTable(from, to)
    else if (catalog.loadView(from).isDefined) catalog.renameView(from, to)
    else throw new NoSuchTableException(oldIdent)
  }

  // ---- maintenance procedures: CALL graft.system.<proc>(...) ----

  override def loadProcedure(ident: Identifier): org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace.sameElements(Array("system")),
      s"procedures live in the system namespace: CALL $catalogName.system.${ident.name}(...)")
    GraftProcedures.load(this, ident.name)
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.identifiers(namespace)

  // ---- namespaces ----

  override def listNamespaces(): Array[Array[String]] =
    catalog.listNamespaces().map(_.toArray).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else Array.empty

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) Map.empty[String, String].asJava
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    catalog.listNamespaces().contains(namespace.toSeq)

  override def createNamespace(namespace: Array[String], metadata: util.Map[String, String]): Unit =
    catalog.createNamespace(namespace.toSeq)

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit = ()

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    catalog.dropNamespace(namespace.toSeq); true
  }
}

/** DSv2 table handle. Reads are served by the [[GraftExtensions]] analyzer
  * rule (which replaces the relation with a pruned scan plan); the
  * ScanBuilder here only reports the missing-extension misconfiguration.
  * Writes go through the V1 insert bridge: the incoming DataFrame is
  * appended (or, for INSERT OVERWRITE, replaces content) in one ACID
  * transaction.
  */
class GraftSparkTable(@transient val ice: IceTable,
                      val snapshotId: Option[Long] = None,
                      val branch: Option[String] = None,
                      readOnlyPin: Boolean = false) extends Table
    with SupportsRead with SupportsWrite with SupportsPartitionManagement {

  override def name(): String =
    ice.ident.toString + snapshotId.map(id => s"@$id").getOrElse("")
  override def schema(): StructType = ice.schema.toSpark

  /** Live data-file entries at the (possibly pinned) snapshot — driver-side
    * O(manifests) off the manifest LRU cache. */
  private def liveDataEntries: Seq[graft.table.ManifestModel.ManifestEntry] =
    snapshotId.flatMap(ice.snapshotById).orElse(ice.currentSnapshot(None))
      .toSeq.flatMap(ice.dataFiles(_))

  override def partitioning(): Array[Transform] = {
    import org.apache.spark.sql.connector.expressions.Expressions
    ice.spec.fields.map { pf =>
      val src = ice.schema.fieldById(pf.sourceId).map(_.name).getOrElse(pf.name)
      pf.transform match {
        case IceTransform.Identity => Expressions.identity(src)
        case IceTransform.Bucket(n) => Expressions.bucket(n, src)
        case IceTransform.Truncate(w) => Expressions.apply("truncate", Expressions.literal(w), Expressions.column(src))
        case IceTransform.Year => Expressions.years(src)
        case IceTransform.Month => Expressions.months(src)
        case IceTransform.Day => Expressions.days(src)
        case IceTransform.Hour => Expressions.hours(src)
        case IceTransform.Void => Expressions.apply("void", Expressions.column(src))
      }
    }.toArray
  }

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  /** Statistics-only scan: `DESCRIBE EXTENDED` (and anything else asking the
    * DSv2 table for size estimates) gets EXACT row/byte totals from the
    * manifests — no data IO. Actual reads are planned by [[GraftExtensions]],
    * which replaces the relation before physical planning ever asks for a
    * Batch; `toBatch` therefore only fires on a misconfigured session and
    * keeps the actionable error message. Totals are pre-delete-masking (MoR
    * equality/positional deletes are not subtracted), i.e. an upper bound —
    * same contract as the reference's manifest statistics
    * (datafusion_iceberg/src/statistics.rs:20-146).
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): org.apache.spark.sql.connector.read.ScanBuilder =
    () => new org.apache.spark.sql.connector.read.Scan
        with org.apache.spark.sql.connector.read.SupportsReportStatistics {
      override def readSchema(): StructType = GraftSparkTable.this.schema()
      override def description(): String = s"graft stats scan ${name()}"
      override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics = {
        val entries = liveDataEntries
        val rows = entries.iterator.map(_.dataFile.recordCount).sum
        val bytes = entries.iterator.map(_.dataFile.fileSizeInBytes).sum
        new org.apache.spark.sql.connector.read.Statistics {
          override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of(bytes)
          override def numRows(): util.OptionalLong = util.OptionalLong.of(rows)
        }
      }
      override def toBatch: org.apache.spark.sql.connector.read.Batch =
        throw new UnsupportedOperationException(
          "graft reads require GraftExtensions (spark.sql.extensions=graft.spark.sql.GraftExtensions)")
    }

  // ---- SupportsPartitionManagement (read-only: SHOW PARTITIONS) ----
  // Iceberg partitions are DERIVED from data through the spec's transforms;
  // they cannot be added or dropped independently of rows, so the mutation
  // surface rejects loudly while the listing surface serves SHOW PARTITIONS
  // from the manifests (driver-side, no data IO).

  override def partitionSchema(): StructType =
    graft.spec.IceType.toSpark(ice.spec.partitionType(ice.schema))
      .asInstanceOf[StructType]

  /** Canonical manifest partition value → Catalyst internal value. Dates
    * (epoch days, Int) and timestamps (micros, Long) already ARE the internal
    * form; only strings and decimals re-wrap. */
  private def toCatalyst(v: Any): Any = v match {
    case null => null
    case s: String => org.apache.spark.unsafe.types.UTF8String.fromString(s)
    case d: java.math.BigDecimal => org.apache.spark.sql.types.Decimal(d)
    case b: java.nio.ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case x => x
  }

  override def listPartitionIdentifiers(names: Array[String],
                                        ident: org.apache.spark.sql.catalyst.InternalRow): Array[org.apache.spark.sql.catalyst.InternalRow] = {
    val ps = partitionSchema()
    val nameIdx = names.map(ps.fieldIndex)
    // spec evolution: only files written under the CURRENT spec list here
    // (old-spec tuples have different fields; `partitions` metadata table
    // shows every layout)
    val curNames = ps.fieldNames.toSeq
    // binary partition values surface as Array[Byte], whose == is reference
    // equality — compare and dedupe structurally or SHOW PARTITIONS both
    // re-lists duplicates and filters to false negatives
    def structEq(a: Any, b: Any): Boolean = (a, b) match {
      case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
      case _ => a == b
    }
    val tuples = liveDataEntries.map(_.dataFile.partition)
      .filter(_.map(_._1) == curNames)
      .map(_.map(p => toCatalyst(p._2)))
      .distinctBy(_.map { case a: Array[Byte] => a.toSeq; case x => x })
    tuples.filter { vs =>
        nameIdx.iterator.zipWithIndex.forall { case (pi, ii) =>
          structEq(vs(pi), ident.get(ii, ps(pi).dataType))
        }
      }
      .map(vs => org.apache.spark.sql.catalyst.InternalRow.fromSeq(vs))
      .toArray
  }

  override def partitionExists(ident: org.apache.spark.sql.catalyst.InternalRow): Boolean =
    listPartitionIdentifiers(partitionSchema().fieldNames, ident).nonEmpty

  override def createPartition(ident: org.apache.spark.sql.catalyst.InternalRow,
                               properties: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      "graft partitions are derived from data via the partition spec's transforms; INSERT rows instead")

  override def dropPartition(ident: org.apache.spark.sql.catalyst.InternalRow): Boolean =
    throw new UnsupportedOperationException(
      "graft partitions are derived from data; DELETE the partition's rows instead")

  override def replacePartitionMetadata(ident: org.apache.spark.sql.catalyst.InternalRow,
                                        properties: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("graft partitions carry no mutable metadata")

  override def loadPartitionMetadata(ident: org.apache.spark.sql.catalyst.InternalRow): util.Map[String, String] =
    util.Collections.emptyMap()

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    if (readOnlyPin) throw new UnsupportedOperationException(
      s"${name()} is a read-only pin (tag or snapshot); write to the table or a branch")
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): V1Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          (data, overwriteFlag) => {
            val fresh = ice.refresh()
            if (overwrite || overwriteFlag) IceWrite.replaceWith(data.sparkSession, fresh, data, branch)
            else IceWrite.append(data.sparkSession, fresh, data, branch)
            ()
          }
      }
    }
  }
}
