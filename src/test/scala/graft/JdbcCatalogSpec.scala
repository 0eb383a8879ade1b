package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._
import graft.spec._
import graft.spark.{IceScan, IceWrite}

/** The SQL-database catalog backend on embedded Derby (reference:
  * `catalogs/iceberg-sql-catalog/src/lib.rs:429-480`): pointer rows in the
  * database, immutable metadata JSON files on storage, commit CAS = the
  * affected-row count of a conditional UPDATE. The full table lifecycle,
  * MoR semantics, commit conflicts, versioned views, and the Spark SQL
  * plugin all run unchanged against this backend — the `Catalog` trait is
  * the seam.
  */
class JdbcCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.spark.sql.GraftExtensions)
    .getOrCreate()

  private lazy val warehouse = Files.createTempDirectory("jdbc-wh").toString
  private lazy val dbDir = Files.createTempDirectory("jdbc-db").toString + "/catalogdb"
  private lazy val cat = new JdbcCatalog(warehouse, s"jdbc:derby:$dbDir;create=true")

  override def afterAll(): Unit = spark.stop()

  private val schema = IceSchema(0, Seq(
    NestedField(1, "id", required = false, IceType.LongT),
    NestedField(2, "v", required = false, IceType.LongT)))

  test("namespace + table lifecycle through Derby pointer rows") {
    cat.createNamespace(Seq("db"))
    assert(cat.listNamespaces().contains(Seq("db")))
    val t = cat.createTable(TableIdent(Seq("db"), "events"), schema,
      PartitionSpec(0, Nil), Map("owner" -> "jdbc-spec"))
    assert(t.metadata.properties("owner") == "jdbc-spec")
    assert(cat.listTables(Seq("db")) == Seq(TableIdent(Seq("db"), "events")))
    assert(cat.loadTable(TableIdent(Seq("db"), "missing")).isEmpty)
    intercept[IllegalArgumentException] {
      cat.createTable(TableIdent(Seq("db"), "events"), schema, PartitionSpec(0, Nil))
    }
  }

  test("appends + MoR equality delete commit through the conditional-UPDATE CAS") {
    import spark.implicits._
    var t = cat.loadTable(TableIdent(Seq("db"), "events")).get
    t = IceWrite.append(spark, t, Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v"))
    t = IceWrite.append(spark, t, Seq((4L, 40L)).toDF("id", "v"))
    assert(IceScan.scan(spark, t).count() == 4)
    t = IceWrite.appendEqualityDeletes(spark, t, Seq(2L).toDF("id"), equalityIds = Seq(1))
    assert(IceScan.scan(spark, t).select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 4L))
    // metadata documents are immutable versioned files; the DB holds one pointer
    val metaFiles = Files.list(java.nio.file.Paths.get(s"$warehouse/db/events/metadata"))
    val versions = try {
      import scala.jdk.CollectionConverters._
      metaFiles.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".metadata.json")).toSeq.sorted
    } finally metaFiles.close()
    assert(versions.size == 4) // create + 2 appends + delete
  }

  test("register_table points a pointer row at an existing metadata document") {
    import spark.implicits._
    // source table owned by a FILE catalog in another warehouse
    val srcWh = Files.createTempDirectory("jdbc-reg-src").toString
    val srcCat = new graft.catalog.FileCatalog(srcWh)
    var src = srcCat.createTable(TableIdent(Seq("ext"), "docs"), schema, PartitionSpec(0, Nil))
    src = IceWrite.append(spark, src, Seq((1L, 10L), (2L, 20L)).toDF("id", "v"))
    val mdPath = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(java.nio.file.Paths.get(s"$srcWh/ext/docs/metadata"))
      try s.iterator().asScala.map(_.toAbsolutePath.toString)
        .filter(_.endsWith(".metadata.json")).toSeq.sorted.last
      finally s.close()
    }
    // zero-copy attach: the Derby pointer row references the source document
    val reg = cat.registerTable(TableIdent(Seq("ext"), "docs"), mdPath)
    assert(IceScan.scan(spark, reg).count() == 2)
    intercept[IllegalArgumentException](cat.registerTable(TableIdent(Seq("ext"), "docs"), mdPath))
    // a commit through the JDBC catalog CAS-swings the pointer; successor
    // metadata stays under the table's OWN location, not this warehouse
    val after = IceWrite.append(spark, reg, Seq((3L, 30L)).toDF("id", "v"))
    assert(IceScan.scan(spark, after).count() == 3)
    assert(after.metadata.location.startsWith(srcWh))
    // the metadata CHAIN is shared (documents live under the table's own
    // location), so a reader of the source directory sees the new commit too
    assert(IceScan.scan(spark,
      srcCat.loadTable(TableIdent(Seq("ext"), "docs")).get).count() == 3)
  }

  test("stale committer loses: requirement check raises CommitConflictException") {
    import spark.implicits._
    val ident = TableIdent(Seq("db"), "conflict")
    val t0 = cat.createTable(ident, schema, PartitionSpec(0, Nil))
    val t1 = IceWrite.append(spark, cat.loadTable(ident).get, Seq((1L, 1L)).toDF("id", "v"))
    // a second writer committing NON-append changes from the PRE-append
    // snapshot must fail (pure data appends auto-retry; property changes
    // carry read-modify-write semantics and must not)
    intercept[CommitConflictException] {
      val files = IceWrite.writeDataFiles(spark, t0, Seq((2L, 2L)).toDF("id", "v"), t0.schema)
      t0.newTransaction().appendData(files).updateProperties(Map("owner" -> "stale")).commit()
    }
    // the stale handle's PURE append retries through the conditional UPDATE
    val t2 = IceWrite.append(spark, t0, Seq((3L, 3L)).toDF("id", "v"))
    assert(IceScan.scan(spark, t2.refresh()).count() == 2)
  }

  test("versioned views store/replace through pointer rows") {
    val ident = TableIdent(Seq("db"), "v_events")
    cat.createView(ident, "SELECT id FROM events",
      IceSchema(1, Seq(NestedField(1, "id", required = false, IceType.LongT))))
    val m = cat.loadView(ident).get
    assert(m.sql == "SELECT id FROM events" && m.currentVersionId == 1L)
    cat.replaceView(ident, m.replaced("SELECT id, v FROM events",
      IceSchema(1, Seq(
        NestedField(1, "id", required = false, IceType.LongT),
        NestedField(2, "v", required = false, IceType.LongT))), 99L))
    val m2 = cat.loadView(ident).get
    assert(m2.currentVersionId == 2L && m2.versionLog.map(_.versionId) == Seq(1L, 2L))
    cat.dropView(ident)
    assert(cat.loadView(ident).isEmpty)
  }

  test("rename updates the pointer row; document chain and commits continue") {
    import spark.implicits._
    val from = TableIdent(Seq("db"), "rn_a")
    val to = TableIdent(Seq("db"), "rn_b")
    var t = cat.createTable(from, schema, PartitionSpec(0, Nil))
    t = IceWrite.append(spark, t, Seq((1L, 10L)).toDF("id", "v"))
    cat.renameTable(from, to)
    assert(cat.loadTable(from).isEmpty)
    assert(cat.listTables(Seq("db")).contains(to))
    val renamed = cat.loadTable(to).get
    assert(IceScan.scan(spark, renamed).count() == 1)
    // the conditional-UPDATE CAS still works against the renamed row
    IceWrite.append(spark, renamed, Seq((2L, 20L)).toDF("id", "v"))
    assert(IceScan.scan(spark, cat.loadTable(to).get).count() == 2)
    // missing source / taken destination both reject
    intercept[IllegalArgumentException](cat.renameTable(from, TableIdent(Seq("db"), "rn_c")))
    cat.createTable(TableIdent(Seq("db"), "rn_taken"), schema, PartitionSpec(0, Nil))
    intercept[IllegalArgumentException](
      cat.renameTable(to, TableIdent(Seq("db"), "rn_taken")))
  }

  test("Spark SQL catalog plugin runs against the Derby backend (jdbc.url option)") {
    spark.conf.set("spark.sql.catalog.graft_j", "graft.spark.sql.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.graft_j.warehouse", warehouse)
    spark.conf.set("spark.sql.catalog.graft_j.jdbc.url", s"jdbc:derby:$dbDir")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_j.sqldb")
    spark.sql("CREATE TABLE graft_j.sqldb.t (k BIGINT, s STRING)")
    spark.sql("INSERT INTO graft_j.sqldb.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft_j.sqldb.t VALUES (3, 'c')")
    assert(spark.sql("SELECT count(*) FROM graft_j.sqldb.t").head().getLong(0) == 3)
    assert(spark.sql("SELECT s FROM graft_j.sqldb.t WHERE k = 2").head().getString(0) == "b")
    spark.sql("DROP TABLE graft_j.sqldb.t")
  }
}
