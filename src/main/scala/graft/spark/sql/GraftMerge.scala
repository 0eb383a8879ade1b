package graft.spark.sql

import org.apache.spark.sql.{Column, DataFrame, GraftShim, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.catalog.TableIdent
import graft.spark.{IceScan, IceWrite}
import graft.table.ManifestModel

/** SQL `MERGE INTO` (upsert) over graft tables — BEYOND the reference, which
  * has no row-level SQL mutation surface. Executed as merge-on-read: the
  * fired matched rows' keys become ONE equality-delete file and the
  * updated+inserted rows ONE set of data files, committed in a single
  * transaction at the same sequence number (the delete masks only strictly
  * older files, so the new generation survives — the invariant
  * [[graft.spark.IceMV]] also builds on).
  *
  * Surface: `WHEN MATCHED [AND cond] THEN UPDATE SET ... | DELETE`,
  * `WHEN NOT MATCHED [AND cond] THEN INSERT ...` (star forms supported by
  * name matching), and `WHEN NOT MATCHED BY SOURCE [AND cond] THEN
  * UPDATE ... | DELETE` (target-anti-join rows; target columns only). The
  * ON condition must be a conjunction of `t.col = s.expr` equalities —
  * those target columns are the upsert key.
  */
/** Opaque (non-TreeNode-typed) holder: the merge pieces stay deliberately
  * UNRESOLVED until run() aliases both sides — exposing them as command
  * fields of Expression/LogicalPlan type would make CheckAnalysis reject
  * the plan before run() ever executes.
  */
final class MergePayload(
    val sourcePlan: LogicalPlan,
    val condition: Expression,
    val matchedActions: Seq[MergeAction],
    val notMatchedActions: Seq[MergeAction],
    val notMatchedBySourceActions: Seq[MergeAction] = Nil) extends Serializable {
  override def toString: String =
    s"ON ${condition.sql} [${matchedActions.size} matched, ${notMatchedActions.size} not-matched, " +
      s"${notMatchedBySourceActions.size} not-matched-by-source]"
}

final case class GraftMergeCommand(
    catalogName: String,
    ident: TableIdent,
    targetAlias: String,
    payload: MergePayload) extends LeafRunnableCommand {

  private def sourcePlan = payload.sourcePlan
  private def condition = payload.condition
  private def matchedActions = payload.matchedActions
  private def notMatchedActions = payload.notMatchedActions
  private def notMatchedBySourceActions = payload.notMatchedBySourceActions

  override def output: Seq[Attribute] = Seq(
    AttributeReference("rows_updated", LongType, nullable = false)(),
    AttributeReference("rows_deleted", LongType, nullable = false)(),
    AttributeReference("rows_inserted", LongType, nullable = false)())

  private def colOf(e: Expression): Column = GraftShim.column(e)

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftSqlParser.fileCatalog(spark, catalogName)
    val table = cat.loadTable(ident)
      .getOrElse(throw new IllegalArgumentException(s"no such table $ident"))
    val schema = table.schema
    val outCols = schema.fields.map(_.name)

    val sDf = GraftShim.ofRows(spark, sourcePlan)

    // target key columns + their source-side expressions from the ON
    // equalities (t.col = s.expr conjuncts)
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    def isTargetAttr(a: UnresolvedAttribute): Boolean =
      a.nameParts.length >= 2 && a.nameParts.init.last.equalsIgnoreCase(targetAlias)
    val keyPairs: Seq[(String, Expression)] = conjuncts(condition).map {
      case EqualTo(a: UnresolvedAttribute, b) if isTargetAttr(a) => a.nameParts.last -> b
      case EqualTo(b, a: UnresolvedAttribute) if isTargetAttr(a) => a.nameParts.last -> b
      case other => throw new UnsupportedOperationException(
        s"MERGE ON must be a conjunction of $targetAlias.<col> = <source expr>: ${other.sql}")
    }
    val keyCols: Seq[String] = keyPairs.map(_._1).distinct

    // MERGE target pruning: without NOT MATCHED BY SOURCE clauses, only
    // target rows whose keys appear in the source can fire a clause or need
    // rewriting as survivors — bound each key column by the source's
    // min/max and let manifest/file-stats pruning skip everything outside.
    // At 100 TB with a small upsert batch this reads O(touched partitions),
    // not the table. One extra aggregation job over the source pays for it;
    // any analysis failure of the bounds falls back to the full scan.
    val pruneFilters: Seq[Column] =
      if (notMatchedBySourceActions.nonEmpty) Nil
      else try {
        val aggs = keyPairs.flatMap { case (_, e) => Seq(min(colOf(e)), max(colOf(e))) }
        val row = sDf.agg(aggs.head, aggs.tail: _*).head()
        keyPairs.zipWithIndex.flatMap { case ((tc, _), i) =>
          val lo = row.get(2 * i); val hi = row.get(2 * i + 1)
          if (lo == null || hi == null) None
          else Some(col(tc) >= lit(lo) && col(tc) <= lit(hi))
        }
      } catch { case scala.util.control.NonFatal(_) => Nil }

    // cached for the whole merge: the target scan feeds the joined frame,
    // the cardinality count, and the NOT MATCHED BY SOURCE anti-join — an
    // uncached tDf re-reads the full target once per consumer
    val tDf = IceScan.scan(spark, table, pruneFilters)
      .withColumn("__t_present", lit(1)).alias(targetAlias).cache()

    val joined = sDf.join(tDf, colOf(condition), "left_outer").cache()
    try {
      val matched = joined.filter(col("__t_present").isNotNull)
      val notMatched = joined.filter(col("__t_present").isNull)

      def tCol(c: String): Column = col(s"$targetAlias.$c")

      // first-matching-clause-wins per row: accumulate negations. A clause
      // condition that is FALSE **or NULL** falls through to the next clause
      // (SQL three-valued logic: `filter(!cond)` alone would drop NULL rows).
      // Also returns the rows that fell through every clause — needed to
      // preserve unfired duplicate-key siblings of fired rows (see below).
      def clauseRows(base: DataFrame, actions: Seq[MergeAction])
          : (Seq[(MergeAction, DataFrame)], DataFrame) = {
        var remaining = base
        val fired = actions.map { a =>
          val cond = actionCondition(a)
          val hit = cond.map(c => remaining.filter(colOf(c))).getOrElse(remaining)
          remaining = cond.map(c => remaining.filter(!coalesce(colOf(c), lit(false))))
            .getOrElse(remaining.limit(0))
          a -> hit
        }
        (fired, remaining)
      }
      def actionCondition(a: MergeAction): Option[Expression] = a match {
        case UpdateAction(c, _, _) => c
        case DeleteAction(c) => c
        case InsertAction(c, _) => c
        case UpdateStarAction(c) => c
        case InsertStarAction(c) => c
        case other => throw new UnsupportedOperationException(s"unsupported MERGE action: $other")
      }

      // SQL cardinality rule: a target row matched by >1 source row is an
      // error, not a silent fan-out. With a key-equality ON, joined rows per
      // key = (#source matches) × (#target rows), so matches-per-key >
      // target-rows-per-key ⟺ some target row has multiple source matches.
      if (matchedActions.nonEmpty) {
        val jCnt = matched.groupBy(keyCols.map(c => tCol(c).as(c)): _*)
          .count().withColumnRenamed("count", "__j")
        val tCnt = tDf.groupBy(keyCols.map(c => tCol(c).as(c)): _*)
          .count().withColumnRenamed("count", "__t")
        val violation = jCnt.join(tCnt, keyCols).filter(col("__j") > col("__t"))
          .limit(1).count() > 0
        if (violation) throw new IllegalStateException(
          "MERGE cardinality violation: a target row matched multiple source rows " +
            s"on key (${keyCols.mkString(", ")})")
      }

      // star actions (`UPDATE SET *` / `INSERT *`) take source columns by
      // name; the joined frame carries BOTH copies of shared names, so
      // resolve through sDf's attribute ids, never a bare col(c)
      def sCol(c: String): Column = sDf(c)

      // matched clauses → updated rows (aligned to schema) + fired keys
      val (matchedClauses, matchedUnfired) = clauseRows(matched, matchedActions)
      val updatedParts: Seq[DataFrame] = matchedClauses.collect {
        case (UpdateAction(_, assignments, fromStar), rows) =>
          if (fromStar || assignments.isEmpty) // UPDATE SET *: source col by name
            rows.select(outCols.map(c => sCol(c).as(c)): _*)
          else {
            val byName: Map[String, Expression] =
              assignments.map(as => nameOf(as.key) -> as.value).toMap
            rows.select(outCols.map(c =>
              byName.get(c).map(colOf).getOrElse(tCol(c)).as(c)): _*)
          }
        case (UpdateStarAction(_), rows) =>
          rows.select(outCols.map(c => sCol(c).as(c)): _*) // source col by name
      }
      val firedMatched: Seq[DataFrame] = matchedClauses.map(_._2)

      // not-matched clauses → inserted rows
      val insertedParts: Seq[DataFrame] = clauseRows(notMatched, notMatchedActions)._1.collect {
        case (InsertAction(_, assignments), rows) =>
          val byName: Map[String, Expression] =
            assignments.map(as => nameOf(as.key) -> as.value).toMap
          rows.select(outCols.map(c =>
            byName.get(c).map(colOf).getOrElse(lit(null)).as(c)): _*)
        case (InsertStarAction(_), rows) =>
          rows.select(outCols.map(c => sCol(c).as(c)): _*)
      }

      // not-matched-by-source clauses act on target rows with no source
      // match (target LEFT ANTI source on the same condition); they may
      // reference only target columns
      val (tOnlyClauses, tOnlyUnfired) =
        if (notMatchedBySourceActions.isEmpty) (Nil, joined.limit(0))
        else clauseRows(tDf.join(sDf, colOf(condition), "left_anti"), notMatchedBySourceActions)
      val nmsUpdatedParts: Seq[DataFrame] = tOnlyClauses.collect {
        case (UpdateAction(_, assignments, _), rows) =>
          val byName: Map[String, Expression] =
            assignments.map(as => nameOf(as.key) -> as.value).toMap
          rows.select(outCols.map(c =>
            byName.get(c).map(colOf).getOrElse(tCol(c)).as(c)): _*)
      }
      val firedTOnly: Seq[DataFrame] = tOnlyClauses.map(_._2)

      val nUpdated = (updatedParts ++ nmsUpdatedParts).map(_.count()).sum
      val nDeleted = (matchedClauses ++ tOnlyClauses)
        .collect { case (DeleteAction(_), rows) => rows.count() }.sum
      val nInserted = insertedParts.map(_.count()).sum

      val delKeys: Option[DataFrame] = (firedMatched ++ firedTOnly)
        .map(_.select(keyCols.map(c => tCol(c).as(c)): _*))
        .reduceOption(_ unionByName _).map(_.distinct())

      // the equality delete is key-WIDE: a target row that fired no clause
      // but shares its key with a fired row would be silently lost — rewrite
      // those survivors unchanged alongside the new generation
      // with no matched clauses at all, matchedUnfired is the ENTIRE matched
      // frame yet provably contributes nothing (matched keys are disjoint
      // from the NMS-fired keys the delete covers) — skip it outright
      val matchedSurvivorSide =
        if (matchedActions.isEmpty) joined.limit(0) else matchedUnfired
      val unfiredSurvivors: Seq[DataFrame] = delKeys.toSeq.map { keys =>
        Seq(matchedSurvivorSide, tOnlyUnfired)
          .map(_.select(outCols.map(c => tCol(c).as(c)): _*))
          .reduce(_ unionByName _)
          .join(keys, keyCols, "left_semi")
      }

      val newData: Option[DataFrame] =
        (updatedParts ++ insertedParts ++ nmsUpdatedParts ++ unfiredSurvivors)
          .reduceOption(_ unionByName _)

      val keyIds = schema.fields.filter(f => keyCols.contains(f.name)).map(_.id)
      // data and delete file sets are independent jobs over the shared
      // caches — overlap them (the tiny-commit job constant dominates);
      // the key-set write sizes from the already-counted fired rows
      // instead of the optimizer's join guess
      val (dataFiles, delFiles) = IceWrite.inParallel(
        newData.map(d => IceWrite.writeDataFiles(spark, table, d, schema)),
        delKeys.map(k => IceWrite.writeDataFiles(spark, table, k,
          schema.project(keyIds), content = ManifestModel.ContentEqualityDeletes,
          equalityIds = keyIds,
          outFiles = IceWrite.fileCountHint(nUpdated + nDeleted))))
      var tx = table.newTransaction(None)
      dataFiles.foreach(f => tx = tx.appendData(f))
      delFiles.foreach(f => tx = tx.appendDeletes(f))
      tx.commit()
      Seq(Row(nUpdated, nDeleted, nInserted))
    } finally {
      joined.unpersist()
      tDf.unpersist()
    }
  }

  private def nameOf(e: Expression): String = e match {
    case a: UnresolvedAttribute => a.nameParts.last
    case other => throw new UnsupportedOperationException(
      s"MERGE assignment target must be a column: ${other.sql}")
  }
}

/** Shared by SQL DELETE/UPDATE: opaque (non-TreeNode-typed) holder so the
  * unresolved condition/assignments dodge CheckAnalysis until run(), same
  * trick as [[MergePayload]]. `targetAlias`-qualified column references are
  * stripped at run time so they bind against the bare table scan.
  */
final class RowFilterPayload(val condition: Option[Expression],
                             val assignments: Seq[Assignment] = Nil) extends Serializable {
  override def toString: String =
    condition.map(c => s"WHERE ${c.sql}").getOrElse("WHERE true") +
      (if (assignments.isEmpty) "" else s" SET ${assignments.size} columns")
}

object RowFilterPayload {
  /** `t.col` → `col` when `t` is the statement's target alias/name. */
  private[sql] def unqualify(e: Expression, targetAlias: String): Expression =
    e.transform {
      case a: UnresolvedAttribute if a.nameParts.length >= 2 &&
        a.nameParts.init.last.equalsIgnoreCase(targetAlias) =>
        UnresolvedAttribute(Seq(a.nameParts.last))
    }
}

/** SQL `DELETE FROM <graft table> [WHERE cond]` — merge-on-read: matching
  * rows become ONE positional-delete file commit (no data rewrite; the scan
  * masks the (file, position) pairs), the row-level mutation surface the
  * reference refuses (table.rs:422-424 panics on content=1).
  */
final case class GraftDeleteCommand(
    catalogName: String,
    ident: TableIdent,
    targetAlias: String,
    payload: RowFilterPayload) extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Seq(
    AttributeReference("rows_deleted", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val table = GraftSqlParser.fileCatalog(spark, catalogName).loadTable(ident)
      .getOrElse(throw new IllegalArgumentException(s"no such table $ident"))
    val cond = payload.condition
      .map(c => GraftShim.column(RowFilterPayload.unqualify(c, targetAlias)))
      .getOrElse(lit(true))
    // count against the MoR-masked scan (rows already dead don't count);
    // the predicate rides into the scan so manifest/file pruning skips
    // never-matching files. The positional delete itself runs over raw
    // files — re-deleting an already-masked position is a harmless no-op
    val n = IceScan.scan(spark, table, Seq(cond)).count()
    // `write.delete.format=puffin` opts the table into V3 deletion vectors
    // (one merged roaring bitmap per data file; filter-based read path)
    // instead of parquet positional-delete files
    if (n > 0) {
      if (table.metadata.properties.get("write.delete.format").contains("puffin"))
        IceWrite.appendDeletionVectors(spark, table, cond)
      else IceWrite.appendPositionDeletes(spark, table, cond)
    }
    Seq(Row(n))
  }
}

/** SQL `UPDATE <graft table> SET col = expr, ... [WHERE cond]` —
  * merge-on-read: ONE transaction commits a positional-delete file masking
  * the matched rows plus data files carrying their updated versions (the
  * delete masks only strictly older files, so the new generation survives —
  * the same invariant MERGE relies on, but keyed by position, needing no
  * unique key).
  */
final case class GraftUpdateCommand(
    catalogName: String,
    ident: TableIdent,
    targetAlias: String,
    payload: RowFilterPayload) extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Seq(
    AttributeReference("rows_updated", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val table = GraftSqlParser.fileCatalog(spark, catalogName).loadTable(ident)
      .getOrElse(throw new IllegalArgumentException(s"no such table $ident"))
    val schema = table.schema
    val outCols = schema.fields.map(_.name)
    def unq(e: Expression): Expression = RowFilterPayload.unqualify(e, targetAlias)
    val cond = payload.condition.map(c => GraftShim.column(unq(c))).getOrElse(lit(true))
    val byName: Map[String, Expression] = payload.assignments.map { as =>
      (unq(as.key) match {
        case a: UnresolvedAttribute => a.nameParts.last
        case other => throw new UnsupportedOperationException(
          s"UPDATE assignment target must be a column: ${other.sql}")
      }) -> unq(as.value)
    }.toMap
    val unknown = byName.keySet -- outCols
    if (unknown.nonEmpty) throw new IllegalArgumentException(
      s"UPDATE SET targets unknown column(s) ${unknown.mkString(", ")} on $ident " +
        s"(columns: ${outCols.mkString(", ")})")
    // predicate into the scan: manifest/file pruning bounds the rewrite
    // read to files that can contain matched rows (exactness preserved —
    // scan re-applies the filter on the surviving files)
    // V3 row lineage: the rewritten generation PRESERVES each row's
    // `_row_id` by materializing it into the new files (the sequence
    // column stays null — the scan coalesces it to the commit's sequence
    // number, which is how `_last_updated_sequence_number` advances on
    // update without baking a pre-commit guess into parquet)
    val lineageOn = table.metadata.properties
      .get("write.row-lineage.enabled").contains("true")
    val outExprs = outCols.map(c =>
      byName.get(c).map(GraftShim.column).getOrElse(col(c)).as(c))
    val updated =
      if (lineageOn)
        IceScan.scan(spark, table, Seq(cond), IceScan.ScanOptions(rowLineage = true))
          .select(outExprs :+ col("_row_id"): _*)
          .cache()
      else IceScan.scan(spark, table, Seq(cond)).select(outExprs: _*).cache()
    try {
      val n = updated.count()
      if (n > 0) {
        val writeSchema =
          if (lineageOn) graft.spec.IceSchema(schema.schemaId, schema.fields :+
            graft.spec.NestedField(graft.table.ManifestModel.RowIdFieldId, "_row_id",
              required = false, graft.spec.IceType.LongT))
          else schema
        val delFiles = IceWrite.positionDeleteFiles(spark, table, cond)
        val dataFiles = IceWrite.writeDataFiles(spark, table, updated, writeSchema)
        table.newTransaction(None).appendDeletes(delFiles).appendData(dataFiles).commit()
      }
      Seq(Row(n))
    } finally updated.unpersist()
  }
}
