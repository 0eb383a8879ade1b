package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._
import graft.core.Transform
import graft.spec._
import graft.spark.{IceScan, IceWrite}

/** The REST catalog protocol end to end: a [[RestCatalog]] client talking
  * HTTP to a [[RestCatalogServer]] wrapping a FileCatalog (protocol shape:
  * reference `catalogs/iceberg-rest-catalog/src/` — commit = requirements +
  * updates, conflict = 409). Metadata flows over the wire; data files go
  * straight to storage via the table location, like a real deployment.
  */
class RestCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.spark.sql.GraftExtensions)
    .getOrCreate()

  private lazy val warehouse = Files.createTempDirectory("rest-wh").toString
  private lazy val server = new RestCatalogServer(new FileCatalog(warehouse))
  private lazy val cat: RestCatalog = {
    server.start()
    new RestCatalog(server.uri)
  }

  override def afterAll(): Unit = {
    server.stop()
    spark.stop()
  }

  private val schema = IceSchema(0, Seq(
    NestedField(1, "id", required = false, IceType.LongT),
    NestedField(2, "d", required = false, IceType.DateT),
    NestedField(3, "v", required = false, IceType.LongT)))

  test("namespace + table lifecycle over HTTP") {
    cat.createNamespace(Seq("db"))
    assert(cat.listNamespaces().contains(Seq("db")))
    val spec = PartitionSpec(0, Seq(PartitionField(2, 1000, "d_day", Transform.Day)))
    val t = cat.createTable(TableIdent(Seq("db"), "events"), schema, spec,
      Map("owner" -> "rest-spec"))
    assert(t.metadata.properties("owner") == "rest-spec")
    assert(t.spec.fields.head.transform == Transform.Day)
    assert(cat.listTables(Seq("db")) == Seq(TableIdent(Seq("db"), "events")))
    assert(cat.loadTable(TableIdent(Seq("db"), "missing")).isEmpty)
  }

  test("append commits flow through the REST commit endpoint; scan sees them") {
    import spark.implicits._
    val ident = TableIdent(Seq("db"), "events")
    var t = cat.loadTable(ident).get
    val rows = Seq((1L, "2024-05-01", 10L), (2L, "2024-05-02", 20L))
      .toDF("id", "d", "v").withColumn("d", to_date(col("d")))
    t = IceWrite.append(spark, t, rows)
    assert(t.currentSnapshot().isDefined)
    // a FRESH client (new HTTP connection, no shared state) sees the commit
    val t2 = new RestCatalog(server.uri).loadTable(ident).get
    assert(t2.currentSnapshot().map(_.snapshotId) == t.currentSnapshot().map(_.snapshotId))
    val got = IceScan.scan(spark, t2).orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 10L), (2L, 20L)))
  }

  test("register_table attaches an existing metadata document over REST") {
    import spark.implicits._
    val srcWh = Files.createTempDirectory("rest-reg-src").toString
    val srcCat = new FileCatalog(srcWh)
    var src = srcCat.createTable(TableIdent(Seq("ext"), "regdocs"),
      schema, PartitionSpec(0, Nil))
    src = IceWrite.append(spark, src,
      Seq((1L, "2024-05-01", 10L), (2L, "2024-05-01", 20L))
        .toDF("id", "d", "v").withColumn("d", to_date(col("d"))))
    val mdPath = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(java.nio.file.Paths.get(s"$srcWh/ext/regdocs/metadata"))
      try s.iterator().asScala.map(_.toAbsolutePath.toString)
        .filter(_.endsWith(".metadata.json")).toSeq.sorted.last
      finally s.close()
    }
    cat.createNamespace(Seq("ext"))
    val reg = cat.registerTable(TableIdent(Seq("ext"), "regdocs"), mdPath)
    assert(reg.metadata.location.startsWith(srcWh))
    assert(IceScan.scan(spark, reg).count() == 2)
    // a fresh client resolves the registered table through the server backend
    assert(new RestCatalog(server.uri).loadTable(TableIdent(Seq("ext"), "regdocs")).isDefined)
    intercept[Exception](cat.registerTable(TableIdent(Seq("ext"), "regdocs"), mdPath))
  }

  test("MoR equality delete + second append over REST") {
    import spark.implicits._
    val ident = TableIdent(Seq("db"), "events")
    var t = cat.loadTable(ident).get
    t = IceWrite.appendEqualityDeletes(spark, t, Seq(1L).toDF("id"), equalityIds = Seq(1))
    t = IceWrite.append(spark, t,
      Seq((3L, "2024-05-03", 30L)).toDF("id", "d", "v").withColumn("d", to_date(col("d"))))
    val got = IceScan.scan(spark, t.refresh()).orderBy("id").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(2L, 3L))
  }

  test("stale commit is rejected with 409 -> CommitConflictException") {
    import spark.implicits._
    val ident = TableIdent(Seq("db"), "events")
    val stale = cat.loadTable(ident).get // pins the current snapshot
    // another client moves the table forward
    val other = new RestCatalog(server.uri)
    IceWrite.append(spark, other.loadTable(ident).get,
      Seq((4L, "2024-05-04", 40L)).toDF("id", "d", "v").withColumn("d", to_date(col("d"))))
    // a stale NON-append commit surfaces the server's 409 (no auto-retry)
    intercept[CommitConflictException] {
      val files = IceWrite.writeDataFiles(spark, stale,
        Seq((5L, "2024-05-05", 50L)).toDF("id", "d", "v").withColumn("d", to_date(col("d"))),
        stale.schema)
      stale.newTransaction().appendData(files)
        .updateProperties(Map("owner" -> "stale")).commit()
    }
    // a stale PURE data append retries: refresh over HTTP + re-merge inside commit
    val retried = IceWrite.append(spark, stale,
      Seq((5L, "2024-05-05", 50L)).toDF("id", "d", "v").withColumn("d", to_date(col("d"))))
    assert(IceScan.scan(spark, retried.refresh()).count() == 4) // 2,3,4,5
  }

  test("views round-trip over REST, including REPLACE versioning") {
    val ident = TableIdent(Seq("db"), "v_events")
    cat.createView(ident, "SELECT id FROM events",
      IceSchema(1, Seq(NestedField(1, "id", required = false, IceType.LongT))))
    val m = cat.loadView(ident).get
    assert(m.sql == "SELECT id FROM events")
    assert(m.currentVersionId == 1L)
    assert(m.currentSchema.fields.map(_.name) == Seq("id"))
    // REPLACE over the wire: version appended, uuid stable
    cat.replaceView(ident, m.replaced("SELECT id, v FROM events",
      IceSchema(1, Seq(
        NestedField(1, "id", required = false, IceType.LongT),
        NestedField(2, "v", required = false, IceType.LongT))), 12345L))
    val m2 = cat.loadView(ident).get
    assert(m2.viewUuid == m.viewUuid && m2.currentVersionId == 2L)
    assert(m2.versionLog.map(_.versionId) == Seq(1L, 2L))
    assert(m2.sql == "SELECT id, v FROM events")
    cat.dropView(ident)
    assert(cat.loadView(ident).isEmpty)
  }

  test("Spark SQL catalog plugin runs against the REST backend (uri option)") {
    spark.conf.set("spark.sql.catalog.graft_r", "graft.spark.sql.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.graft_r.uri", server.uri)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_r.sqlns")
    spark.sql("CREATE TABLE graft_r.sqlns.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft_r.sqlns.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    assert(spark.sql("SELECT sum(k) AS s FROM graft_r.sqlns.t").head().getLong(0) == 6)
    spark.sql("DELETE FROM graft_r.sqlns.t WHERE k = 2")
    assert(spark.sql("SELECT sum(k) AS s FROM graft_r.sqlns.t").head().getLong(0) == 4)
    // the commits really went over the wire: a direct REST client sees them
    val t = new RestCatalog(server.uri).loadTable(TableIdent(Seq("sqlns"), "t")).get
    assert(t.metadata.snapshots.size == 2) // insert + delete
  }

  test("rename over REST moves the pointer; data and further commits follow") {
    import spark.implicits._
    cat.createNamespace(Seq("rndb"))
    val from = TableIdent(Seq("rndb"), "a")
    val to = TableIdent(Seq("rndb"), "b")
    var t = cat.createTable(from, schema, PartitionSpec.unpartitioned)
    t = IceWrite.append(spark, t,
      Seq((1L, "2024-05-01", 10L)).toDF("id", "d", "v").withColumn("d", to_date(col("d"))))
    cat.renameTable(from, to)
    assert(cat.loadTable(from).isEmpty)
    val renamed = cat.loadTable(to).get
    assert(IceScan.scan(spark, renamed).count() == 1)
    // commits keep flowing through the renamed identity
    IceWrite.append(spark, renamed,
      Seq((2L, "2024-05-02", 20L)).toDF("id", "d", "v").withColumn("d", to_date(col("d"))))
    assert(IceScan.scan(spark, cat.loadTable(to).get).count() == 2)
    // missing source → 404; taken destination → 409 (both IllegalArgument)
    intercept[IllegalArgumentException](cat.renameTable(from, TableIdent(Seq("rndb"), "c")))
    val other = TableIdent(Seq("rndb"), "taken")
    cat.createTable(other, schema, PartitionSpec.unpartitioned)
    val e = intercept[IllegalArgumentException](cat.renameTable(to, other))
    assert(e.getMessage.contains("already exists"), e.getMessage)
  }

  test("drop table over REST removes it from the listing") {
    val ident = TableIdent(Seq("db"), "tmp")
    cat.createTable(ident, schema, PartitionSpec.unpartitioned)
    assert(cat.tableExists(ident))
    cat.dropTable(ident)
    assert(!cat.tableExists(ident))
    assert(!cat.listTables(Seq("db")).contains(ident))
  }
}
