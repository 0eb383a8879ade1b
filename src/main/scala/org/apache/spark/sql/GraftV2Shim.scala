package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan, Project, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.spark.IceScan
import graft.spark.sql.GraftSparkTable

/** Analyzer rule backing graft's SQL read path: rewrites every
  * `DataSourceV2Relation` over a [[GraftSparkTable]] (except write targets)
  * into the pruned DataFrame plan produced by [[IceScan]] — manifest/file
  * statistics pruning, merge-on-read equality deletes and snapshot pinning
  * all apply to plain `SELECT ... FROM graft.db.t`. Output attribute ids are
  * preserved via an aliasing projection so parents resolve untouched.
  *
  * Lives in the `org.apache.spark.sql` package to reach `private[sql]` plan
  * nodes; semantically it is an ordinary injected resolution rule, the
  * `SparkSessionExtensions` route SURVEY §2.11 anticipates.
  */
class GraftReadRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = rewrite(plan)

  private def rewrite(p: LogicalPlan): LogicalPlan = p match {
    // never rewrite the TARGET of a write — only the source query
    case w: V2WriteCommand => w.withNewQuery(rewrite(w.query))
    case i: InsertIntoStatement => i.copy(query = rewrite(i.query))
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftSparkTable] =>
      // re-load for snapshot isolation: each analysis pins the table's
      // current snapshot at that moment (or the VERSION/TIMESTAMP AS OF pin)
      val gt = r.table.asInstanceOf[GraftSparkTable]
      val ice = gt.ice.refresh()
      val scanned = IceScan.scan(spark, ice,
        options = IceScan.ScanOptions(snapshotId = gt.snapshotId))
        .queryExecution.analyzed
      Project(r.output.zip(scanned.output).map { case (o, n) =>
        Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier)
      }, scanned)
    case other => other.mapChildren(rewrite)
  }
}
