package graft.spark.sql

import org.apache.spark.sql.SparkSessionExtensions

/** Session extensions enabling graft's SQL read path. Install via
  * `spark.sql.extensions=graft.spark.sql.GraftExtensions` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule { session =>
      new org.apache.spark.sql.GraftReadRule(
        session.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    }
    // CREATE/REFRESH MATERIALIZED VIEW statements; delegates everything else
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
  }
}
