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
