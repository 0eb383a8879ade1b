package graft.spark.sql

import org.apache.spark.sql.{GraftShim, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}

import graft.catalog.TableIdent
import graft.spark.IceMV

/** SQL surface for materialized views (reference capability:
  * datafusion_iceberg/src/materialized_view/mod.rs — the reference drives MV
  * refresh programmatically; graft additionally exposes it as SQL):
  *
  * {{{
  *   CREATE MATERIALIZED VIEW graft.db.mv AS SELECT k, sum(v) AS s FROM db.src GROUP BY k
  *   REFRESH MATERIALIZED VIEW graft.db.mv     -- returns (strategy, rows_written)
  * }}}
  *
  * Injected via [[GraftExtensions]] `injectParser`; everything else delegates
  * to Spark's parser. The first name part must be a registered
  * [[GraftSparkCatalog]]; the MV and its source tables live in that catalog.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface) extends ParserInterface {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
  import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, MergeIntoTable, SubqueryAlias, UpdateTable}

  private val CreateMV =
    """(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+([\w.`]+)\s+AS\s+(.+)""".r
  private val RefreshMV =
    """(?is)\s*REFRESH\s+MATERIALIZED\s+VIEW\s+([\w.`]+)\s*;?\s*""".r
  private val CreateV =
    """(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+([\w.`]+)\s+AS\s+(.+)""".r
  private val DropV =
    """(?is)\s*DROP\s+VIEW\s+(?:IF\s+EXISTS\s+)?([\w.`]+)\s*;?\s*""".r
  private val AddPartField =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+ADD\s+PARTITION\s+FIELD\s+(.+?)\s*;?\s*""".r
  private val DropPartField =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+DROP\s+PARTITION\s+FIELD\s+(.+?)\s*;?\s*""".r
  private val WriteOrdered =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+WRITE\s+ORDERED\s+BY\s+(.+?)\s*;?\s*""".r
  private val WriteUnordered =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+WRITE\s+UNORDERED\s*;?\s*""".r

  /** The first name part names a registered graft catalog? (Statements over
    * other catalogs fall through to Spark untouched.) */
  private def isGraftCatalog(name: String): Boolean =
    try GraftShim.v2Catalog(session, name).isInstanceOf[GraftSparkCatalog]
    catch { case _: Exception => false }

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case CreateMV(ident, query) =>
      val (cat, ti) = splitIdent(ident)
      CreateMaterializedViewCommand(cat, ti, query.trim)
    case RefreshMV(ident) =>
      val (cat, ti) = splitIdent(ident)
      RefreshMaterializedViewCommand(cat, ti)
    case CreateV(orReplace, ident, query)
        if ident.contains(".") && isGraftCatalog(ident.replace("`", "").split('.').head) =>
      val (cat, ti) = splitIdent(ident)
      CreateGraftViewCommand(cat, ti, query.trim, orReplace != null)
    case DropV(ident)
        if ident.contains(".") && isGraftCatalog(ident.replace("`", "").split('.').head) =>
      val (cat, ti) = splitIdent(ident)
      DropGraftViewCommand(cat, ti)
    case AddPartField(ident, field)
        if ident.contains(".") && isGraftCatalog(ident.replace("`", "").split('.').head) =>
      val (cat, ti) = splitIdent(ident)
      AlterPartitionFieldCommand(cat, ti, field.trim, add = true)
    case DropPartField(ident, field)
        if ident.contains(".") && isGraftCatalog(ident.replace("`", "").split('.').head) =>
      val (cat, ti) = splitIdent(ident)
      AlterPartitionFieldCommand(cat, ti, field.trim, add = false)
    case WriteOrdered(ident, order)
        if ident.contains(".") && isGraftCatalog(ident.replace("`", "").split('.').head) =>
      val (cat, ti) = splitIdent(ident)
      SetWriteOrderCommand(cat, ti, order.trim)
    case WriteUnordered(ident)
        if ident.contains(".") && isGraftCatalog(ident.replace("`", "").split('.').head) =>
      val (cat, ti) = splitIdent(ident)
      SetWriteOrderCommand(cat, ti, "")
    case _ => delegate.parsePlan(sqlText) match {
      case m: MergeIntoTable => graftMerge(m).getOrElse(m)
      case d: DeleteFromTable =>
        graftTarget(d.table).map { case (cat, ti, alias) =>
          GraftDeleteCommand(cat, ti, alias, new RowFilterPayload(Some(d.condition)))
        }.getOrElse(d)
      case u: UpdateTable =>
        graftTarget(u.table).map { case (cat, ti, alias) =>
          GraftUpdateCommand(cat, ti, alias, new RowFilterPayload(u.condition, u.assignments))
        }.getOrElse(u)
      case p => p
    }
  }

  /** Rewrites `MERGE INTO <graft table>` into [[GraftMergeCommand]]; leaves
    * merges over non-graft targets to Spark. */
  private def graftMerge(m: MergeIntoTable): Option[LogicalPlan] = {
    graftTarget(m.targetTable).map { case (cat, ti, alias) =>
      GraftMergeCommand(cat, ti, alias,
        new MergePayload(m.sourceTable, m.mergeCondition, m.matchedActions,
          m.notMatchedActions, m.notMatchedBySourceActions))
    }
  }

  /** (catalog, table ident, binding alias) when the statement target is a
    * graft table; None leaves the statement to Spark. */
  private def graftTarget(plan: LogicalPlan): Option[(String, TableIdent, String)] = {
    val (alias, rel) = plan match {
      case SubqueryAlias(id, r: UnresolvedRelation) => (Some(id.name), r)
      case r: UnresolvedRelation => (None, r)
      case _ => return None
    }
    val parts = rel.multipartIdentifier
    if (parts.length < 2) return None
    val isGraft =
      try GraftShim.v2Catalog(session, parts.head).isInstanceOf[GraftSparkCatalog]
      catch { case _: Exception => false }
    if (!isGraft) return None
    Some((parts.head, TableIdent(parts.tail.init, parts.last), alias.getOrElse(parts.last)))
  }

  private def splitIdent(raw: String): (String, TableIdent) = {
    val parts = raw.replace("`", "").split('.').toSeq
    require(parts.length >= 2,
      s"materialized view name must be <catalog>.[<namespace>.]<name>: $raw")
    (parts.head, TableIdent(parts.tail.init, parts.last))
  }

  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier = delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier = delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] = delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType = delegate.parseRoutineParam(sqlText)
}

private[sql] object GraftSqlParser {
  /** The graft catalog backend behind a registered Spark catalog name. */
  def fileCatalog(spark: SparkSession, name: String): graft.catalog.Catalog =
    GraftShim.v2Catalog(spark, name) match {
      case g: GraftSparkCatalog => g.catalog
      case other => throw new IllegalArgumentException(
        s"catalog $name is not a graft catalog: ${other.getClass.getName}")
    }
}

final case class CreateMaterializedViewCommand(catalogName: String, ident: TableIdent,
                                               query: String) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    IceMV.create(spark, GraftSqlParser.fileCatalog(spark, catalogName), ident, query)
    Nil
  }
}

final case class CreateGraftViewCommand(catalogName: String, ident: TableIdent,
                                        query: String, orReplace: Boolean) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftSqlParser.fileCatalog(spark, catalogName)
    if (orReplace && cat.loadView(ident).isDefined)
      IceMV.replaceView(spark, cat, ident, query)
    else
      IceMV.createView(spark, cat, ident, query)
    Nil
  }
}

final case class DropGraftViewCommand(catalogName: String,
                                      ident: TableIdent) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    GraftSqlParser.fileCatalog(spark, catalogName).dropView(ident)
    Nil
  }
}

/** Partition spec evolution (`ALTER TABLE t ADD/DROP PARTITION FIELD ...`):
  * installs a new default spec; existing data keeps its layout (per-spec
  * manifest pruning handles the mix), only new writes use the new one —
  * mirroring the Iceberg evolution contract the reference's metadata model
  * carries (partition_specs + default_spec_id, table_metadata.rs).
  * Accepted field forms: `col`, `bucket(n, col)`, `truncate(w, col)`,
  * `year(col)`/`years(col)` (same for month/day/hour), `void(col)`.
  * DROP accepts the partition field NAME (e.g. `d_day`) or the same
  * transform form.
  */
final case class AlterPartitionFieldCommand(catalogName: String, ident: TableIdent,
                                            fieldSpec: String, add: Boolean) extends LeafRunnableCommand {
  import graft.core.{Transform => IceTransform}
  import graft.spec.PartitionField

  override def output: Seq[Attribute] = Nil

  private val WithArg = """(?i)(\w+)\s*\(\s*(\d+)\s*,\s*`?(\w+)`?\s*\)""".r
  private val NoArg = """(?i)(\w+)\s*\(\s*`?(\w+)`?\s*\)""".r
  private val Bare = """`?(\w+)`?""".r

  /** (source column name, transform, partition-field name suffix). */
  private def parseField(s: String): (String, IceTransform, String) = s match {
    case WithArg(fn, arg, col) => fn.toLowerCase(java.util.Locale.ROOT) match {
      case "bucket" => (col, IceTransform.Bucket(arg.toInt), s"bucket_$arg")
      case "truncate" => (col, IceTransform.Truncate(arg.toInt), s"trunc_$arg")
      case other => throw new IllegalArgumentException(s"unknown transform $other")
    }
    case NoArg(fn, col) => fn.toLowerCase(java.util.Locale.ROOT) match {
      case "year" | "years" => (col, IceTransform.Year, "year")
      case "month" | "months" => (col, IceTransform.Month, "month")
      case "day" | "days" => (col, IceTransform.Day, "day")
      case "hour" | "hours" => (col, IceTransform.Hour, "hour")
      case "void" => (col, IceTransform.Void, "void")
      case "identity" => (col, IceTransform.Identity, "")
      case other => throw new IllegalArgumentException(s"unknown transform $other")
    }
    case Bare(col) => (col, IceTransform.Identity, "")
    case other => throw new IllegalArgumentException(s"cannot parse partition field: $other")
  }

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftSqlParser.fileCatalog(spark, catalogName)
    val t = cat.loadTable(ident).getOrElse(
      throw new IllegalArgumentException(s"no such table: $ident"))
    val cur = t.spec.fields
    val next: Seq[PartitionField] =
      if (add) {
        val (colName, tr, suffix) = parseField(fieldSpec)
        val src = t.schema.fieldByName(colName).getOrElse(
          throw new IllegalArgumentException(s"no such column: $colName"))
        val pname = if (suffix.isEmpty) src.name else s"${src.name}_$suffix"
        require(!cur.exists(f => f.sourceId == src.id && f.transform == tr),
          s"partition field already exists: $fieldSpec")
        require(!cur.exists(_.name == pname), s"partition field name collides: $pname")
        cur :+ PartitionField(src.id, 0, pname, tr) // field id assigned at commit
      } else {
        val byName = cur.filterNot(_.name == fieldSpec.replace("`", ""))
        val remaining =
          if (byName.size < cur.size) byName
          else {
            val (colName, tr, _) = parseField(fieldSpec)
            val src = t.schema.fieldByName(colName).getOrElse(
              throw new IllegalArgumentException(s"no such column: $colName"))
            cur.filterNot(f => f.sourceId == src.id && f.transform == tr)
          }
        require(remaining.size < cur.size, s"no such partition field: $fieldSpec")
        remaining
      }
    t.newTransaction(None).setSpec(next).commit()
    Nil
  }
}

/** Write sort order DDL (`ALTER TABLE t WRITE ORDERED BY a DESC, b` /
  * `WRITE UNORDERED`): installs the default sort order; subsequent appends
  * range-partition + locally sort on it so per-file column bounds tighten
  * and statistics pruning skips more files (T1 sort-order metadata;
  * iceberg-rust-spec/src/spec/sort.rs).
  */
final case class SetWriteOrderCommand(catalogName: String, ident: TableIdent,
                                      orderSpec: String) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil

  private val Field =
    """(?i)`?(\w+)`?(?:\s+(ASC|DESC))?(?:\s+NULLS\s+(FIRST|LAST))?""".r

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftSqlParser.fileCatalog(spark, catalogName)
    val t = cat.loadTable(ident).getOrElse(
      throw new IllegalArgumentException(s"no such table: $ident"))
    val order =
      if (orderSpec.isEmpty) graft.spec.SortOrder.unsorted
      else {
        val fields = orderSpec.split(',').map(_.trim).map {
          case Field(col, dir, nulls) =>
            val src = t.schema.fieldByName(col).getOrElse(
              throw new IllegalArgumentException(s"no such column: $col"))
            val direction = Option(dir).map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("asc")
            val nullOrder = Option(nulls).map(n => s"nulls-${n.toLowerCase(java.util.Locale.ROOT)}")
              .getOrElse(if (direction == "asc") "nulls-first" else "nulls-last")
            graft.spec.SortField(src.id, graft.core.Transform.Identity, direction, nullOrder)
          case other => throw new IllegalArgumentException(s"cannot parse sort field: $other")
        }
        graft.spec.SortOrder(1, fields.toSeq)
      }
    t.newTransaction(None).setSortOrder(order).commit()
    Nil
  }
}

final case class RefreshMaterializedViewCommand(catalogName: String,
                                                ident: TableIdent) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq(
    AttributeReference("strategy", StringType, nullable = false)(),
    AttributeReference("rows_written", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val r = IceMV.refresh(spark, GraftSqlParser.fileCatalog(spark, catalogName), ident)
    Seq(Row(r.strategy.toString, r.rowsWritten))
  }
}
