package graft.spark.sql

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.{Catalog, TableIdent}
import graft.spec.ViewMetadata

/** Plain (non-materialized) graft view as a SQL relation (D5): the analyzer
  * sees the STORED current-version schema, and [[GraftExtensions]]'s
  * optimizer rule inlines the current version's SQL over current-snapshot
  * sources at planning time — the same pattern metadata tables use. A name
  * that is both a table and a view resolves as the table (tables win).
  */
class GraftViewTable(@transient val catalog: Catalog, val ident: TableIdent,
                     @transient val metadata: ViewMetadata)
    extends Table with SupportsRead {

  override def name(): String = ident.toString

  override def schema(): StructType = metadata.currentSchema.toSpark

  override def capabilities(): util.Set[TableCapability] =
    util.Collections.singleton(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    SchemaOnlyScan.builder(() => schema(), s"graft view scan ${name()}")
}
