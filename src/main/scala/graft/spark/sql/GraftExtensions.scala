package graft.spark.sql

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.spark.expressions.{IcebergBucket, LongArrayDot}

/** Session extensions enabling graft's SQL read path. Install via
  * `spark.sql.extensions=graft.spark.sql.GraftExtensions` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // optimizer-time (not resolution-time) so the rule sees the Filter the
    // operator-optimization batch has collapsed onto the relation and can
    // hand its conjuncts to manifest/file pruning — see GraftReadRule docs
    ext.injectOptimizerRule { session =>
      new org.apache.spark.sql.GraftReadRule(
        session.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    }
    // CREATE/REFRESH MATERIALIZED VIEW + MERGE INTO interception; delegates
    // everything else
    ext.injectParser((session, delegate) => new GraftSqlParser(session, delegate))
    // graft's native codegen expressions as SQL functions
    ext.injectFunction((FunctionIdentifier("dotq"),
      new ExpressionInfo(classOf[LongArrayDot].getName, "dotq"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dotq(a, b) takes two array<bigint> arguments")
        LongArrayDot(args.head, args(1))
      }))
    // pipeline operators (dedup / split / quality / URL) as SQL scalar +
    // table-valued functions — the Scala API's own plans, SQL-reachable
    GraftPipelineFunctions.register(ext)
    ext.injectFunction((FunctionIdentifier("iceberg_bucket"),
      new ExpressionInfo(classOf[IcebergBucket].getName, "iceberg_bucket"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "iceberg_bucket(n, col) takes a bucket count and a column")
        val n = args.head match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v.toString.toInt
          case other => throw new IllegalArgumentException(s"bucket count must be a literal: $other")
        }
        IcebergBucket(args(1), n)
      }))
  }
}
