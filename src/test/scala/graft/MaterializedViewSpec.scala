package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{FileCatalog, TableIdent}
import graft.core.Transform
import graft.spark.{IceMV, IceScan, IceWrite}
import graft.spec._

/** Incremental MV maintenance vs full recompute (mirrors the reference's
  * delta_queries/mod.rs:32,470,893 and the TPC-H Q12-shaped equivalence test
  * at :1199-1480 — incremental refresh must equal recompute-from-scratch).
  */
class MaterializedViewSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("mv-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def newCatalog(): FileCatalog =
    new FileCatalog(java.nio.file.Files.createTempDirectory("mvwh").toString)

  private val ordersSchema = IceSchema(0, Seq(
    NestedField(1, "id", required = false, IceType.LongT),
    NestedField(2, "product_id", required = false, IceType.LongT),
    NestedField(3, "amount", required = false, IceType.LongT)))

  private val productSchema = IceSchema(0, Seq(
    NestedField(1, "product_id", required = false, IceType.LongT),
    NestedField(2, "name", required = false, IceType.StringT)))

  private def ordersDf(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("id", "product_id", "amount")
  }

  test("aggregate MV refreshes incrementally and matches recompute") {
    val cat = newCatalog()
    var orders = cat.createTable(TableIdent(Seq("db"), "orders"), ordersSchema, PartitionSpec(0, Nil))
    orders = IceWrite.append(spark, orders,
      ordersDf(Seq((1L, 1L, 5L), (2L, 1L, 2L), (3L, 2L, 1L), (4L, 3L, 3L))))

    val mv = TableIdent(Seq("db"), "sales_by_product")
    IceMV.create(spark, cat, mv,
      "SELECT product_id, count(*) AS n, sum(amount) AS total, min(amount) AS lo, max(amount) AS hi FROM orders GROUP BY product_id")

    // first refresh = full materialization
    val r1 = IceMV.refresh(spark, cat, mv)
    assert(r1.strategy == IceMV.FullOverwrite)
    val after1 = IceMV.read(spark, cat, mv).collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(after1 == Map(1L -> (2L, 7L, 2L, 5L), 2L -> (1L, 1L, 1L, 1L), 3L -> (1L, 3L, 3L, 3L)))

    // second refresh with no source change is a no-op
    assert(IceMV.refresh(spark, cat, mv).strategy == IceMV.Fresh)

    // append: product 1 changes (merge), product 9 is new (anti-join arm)
    orders = IceWrite.append(spark, orders.refresh(),
      ordersDf(Seq((5L, 1L, 10L), (6L, 9L, 1L), (7L, 1L, 1L))))
    val r2 = IceMV.refresh(spark, cat, mv)
    assert(r2.strategy.isInstanceOf[IceMV.IncrementalAggregate])

    val got = IceMV.read(spark, cat, mv).collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(
      1L -> (4L, 18L, 1L, 10L), 2L -> (1L, 1L, 1L, 1L),
      3L -> (1L, 3L, 3L, 3L), 9L -> (1L, 1L, 1L, 1L)))
  }

  test("incremental refresh merges a NULL group key (null-safe join + delete)") {
    import spark.implicits._
    val cat = newCatalog()
    val schema = IceSchema(0, Seq(
      NestedField(1, "k", required = false, IceType.StringT),
      NestedField(2, "amount", required = false, IceType.LongT)))
    var t = cat.createTable(TableIdent(Seq("db"), "nullg"), schema, PartitionSpec(0, Nil))
    def rows(xs: Seq[(String, Long)]) = xs.toDF("k", "amount")
    t = IceWrite.append(spark, t, rows(Seq(("a", 1L), (null, 2L))))
    val mv = TableIdent(Seq("db"), "null_sums")
    IceMV.create(spark, cat, mv,
      "SELECT k, count(*) AS n, sum(amount) AS total FROM nullg GROUP BY k")
    assert(IceMV.refresh(spark, cat, mv).strategy == IceMV.FullOverwrite)
    // delta touches BOTH the null group (merge arm) and a fresh group:
    // a null-unsafe join would append the null delta unmerged, and a
    // null-unsafe equality delete would leave the old null generation
    // live — two rows for one group, compounding every refresh
    t = IceWrite.append(spark, t.refresh(), rows(Seq((null, 3L), ("b", 10L), ("a", 4L))))
    val r = IceMV.refresh(spark, cat, mv)
    assert(r.strategy.isInstanceOf[IceMV.IncrementalAggregate])
    val got = IceMV.read(spark, cat, mv).collect()
      .map(x => Option(x.getString(0)) -> (x.getLong(1), x.getLong(2))).toMap
    assert(got == Map(Some("a") -> (2L, 5L), None -> (2L, 5L), Some("b") -> (1L, 10L)))
    assert(IceMV.read(spark, cat, mv).count() == 3,
      "exactly one live row per group — a duplicate null-group row means the " +
        "merge join or the equality delete is null-unsafe")
    // and a THIRD refresh keeps converging (the compounding failure mode)
    t = IceWrite.append(spark, t.refresh(), rows(Seq((null, 5L))))
    IceMV.refresh(spark, cat, mv)
    val got2 = IceMV.read(spark, cat, mv).collect()
      .map(x => Option(x.getString(0)) -> (x.getLong(1), x.getLong(2))).toMap
    assert(got2(None) == (3L, 10L) && got2.size == 3)
  }

  test("join MV expands deltas across both sources") {
    val cat = newCatalog()
    var orders = cat.createTable(TableIdent(Seq("db"), "orders"), ordersSchema, PartitionSpec(0, Nil))
    var products = cat.createTable(TableIdent(Seq("db"), "products"), productSchema, PartitionSpec(0, Nil))
    import spark.implicits._
    orders = IceWrite.append(spark, orders, ordersDf(Seq((1L, 1L, 5L), (2L, 2L, 2L))))
    products = IceWrite.append(spark, products, Seq((1L, "apple"), (2L, "pear")).toDF("product_id", "name"))

    val mv = TableIdent(Seq("db"), "order_names")
    IceMV.create(spark, cat, mv,
      "SELECT o.id, p.name, o.amount FROM orders o JOIN products p ON o.product_id = p.product_id")
    IceMV.refresh(spark, cat, mv)

    // change BOTH sides: new order for existing product, new product with
    // a matching pre-existing order inserted now, order+product both new
    orders = IceWrite.append(spark, orders.refresh(), ordersDf(Seq((3L, 1L, 7L), (4L, 3L, 9L))))
    products = IceWrite.append(spark, products.refresh(), Seq((3L, "fig")).toDF("product_id", "name"))
    val r = IceMV.refresh(spark, cat, mv)
    assert(r.strategy == IceMV.IncrementalAppend)

    val got = IceMV.read(spark, cat, mv).collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1L, "apple", 5L), (2L, "pear", 2L), (3L, "apple", 7L), (4L, "fig", 9L)))

    // incremental result == recompute from scratch
    IceScan.scan(spark, orders.refresh()).createOrReplaceTempView("o_full")
    IceScan.scan(spark, products.refresh()).createOrReplaceTempView("p_full")
    val expect = spark.sql(
      "SELECT o.id, p.name, o.amount FROM o_full o JOIN p_full p ON o.product_id = p.product_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expect)
  }

  test("window function MV degrades to full overwrite") {
    val cat = newCatalog()
    var orders = cat.createTable(TableIdent(Seq("db"), "orders"), ordersSchema, PartitionSpec(0, Nil))
    orders = IceWrite.append(spark, orders, ordersDf(Seq((1L, 1L, 5L), (2L, 1L, 2L), (3L, 2L, 9L))))

    val mv = TableIdent(Seq("db"), "ranked")
    IceMV.create(spark, cat, mv,
      "SELECT id, product_id, row_number() OVER (PARTITION BY product_id ORDER BY amount DESC) AS rnk FROM orders")
    IceMV.refresh(spark, cat, mv)
    orders = IceWrite.append(spark, orders.refresh(), ordersDf(Seq((4L, 2L, 11L))))
    val r = IceMV.refresh(spark, cat, mv)
    assert(r.strategy == IceMV.FullOverwrite)
    val got = IceMV.read(spark, cat, mv).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 1L, 1), (2L, 1L, 2), (4L, 2L, 1), (3L, 2L, 2)))
  }

  test("filter-project MV appends only the delta rows") {
    val cat = newCatalog()
    var orders = cat.createTable(TableIdent(Seq("db"), "orders"), ordersSchema, PartitionSpec(0, Nil))
    orders = IceWrite.append(spark, orders, ordersDf(Seq((1L, 1L, 5L), (2L, 1L, 2L))))

    val mv = TableIdent(Seq("db"), "big_orders")
    IceMV.create(spark, cat, mv, "SELECT id, amount FROM orders WHERE amount >= 5")
    IceMV.refresh(spark, cat, mv)

    orders = IceWrite.append(spark, orders.refresh(), ordersDf(Seq((3L, 2L, 8L), (4L, 2L, 1L))))
    val r = IceMV.refresh(spark, cat, mv)
    assert(r.strategy == IceMV.IncrementalAppend)
    assert(r.rowsWritten == 1L) // only id=3 passes the filter from the delta
    val got = IceMV.read(spark, cat, mv).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 5L), (3L, 8L)))
  }

  test("source deletes force full recompute (retractions beat append-only deltas)") {
    val cat = newCatalog()
    var orders = cat.createTable(TableIdent(Seq("db"), "orders"), ordersSchema, PartitionSpec(0, Nil))
    orders = IceWrite.append(spark, orders, ordersDf(Seq((1L, 1L, 5L), (2L, 1L, 2L), (3L, 2L, 9L))))
    val mv = TableIdent(Seq("db"), "totals")
    IceMV.create(spark, cat, mv,
      "SELECT product_id, sum(amount) AS total FROM orders GROUP BY product_id")
    IceMV.refresh(spark, cat, mv)
    // equality-delete id=1 from the source: an incremental append would keep
    // its contribution in the MV — refresh must degrade to full overwrite
    import spark.implicits._
    orders = IceWrite.appendEqualityDeletes(spark, orders.refresh(), Seq(1L).toDF("id"), Seq(1))
    val r = IceMV.refresh(spark, cat, mv)
    assert(r.strategy == IceMV.FullOverwrite)
    val got = IceMV.read(spark, cat, mv).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 9L))
  }

  test("avg MV merges incrementally via exact sum/count decomposition") {
    val cat = newCatalog()
    var orders = cat.createTable(TableIdent(Seq("db"), "orders"), ordersSchema, PartitionSpec(0, Nil))
    orders = IceWrite.append(spark, orders, ordersDf(Seq((1L, 1L, 4L), (2L, 1L, 8L), (3L, 2L, 5L))))
    val mv = TableIdent(Seq("db"), "avg_amount")
    IceMV.create(spark, cat, mv,
      "SELECT product_id, avg(amount) AS avg_amt, count(*) AS n FROM orders GROUP BY product_id")
    IceMV.refresh(spark, cat, mv)
    assert(IceMV.read(spark, cat, mv).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap == Map(1L -> 6.0, 2L -> 5.0))

    orders = IceWrite.append(spark, orders.refresh(), ordersDf(Seq((4L, 1L, 3L), (5L, 3L, 7L))))
    val r = IceMV.refresh(spark, cat, mv)
    assert(r.strategy.isInstanceOf[IceMV.IncrementalAggregate])
    val got = IceMV.read(spark, cat, mv).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got == Map(1L -> (5.0, 3L), 2L -> (5.0, 1L), 3L -> (7.0, 1L)))
    // the visible schema hides the decomposition
    assert(IceMV.read(spark, cat, mv).columns.toSeq == Seq("product_id", "avg_amt", "n"))
  }

  test("DECIMAL avg MV merges incrementally; read is bit-exact with native avg") {
    import spark.implicits._
    val cat = newCatalog()
    val priceSchema = IceSchema(0, Seq(
      NestedField(1, "id", required = false, IceType.LongT),
      NestedField(2, "product_id", required = false, IceType.LongT),
      NestedField(3, "price", required = false, IceType.DecimalT(18, 2))))
    def priceDf(rows: Seq[(Long, Long, String)]) =
      rows.toDF("id", "product_id", "price")
        .withColumn("price", col("price").cast("decimal(18,2)"))
    var sales = cat.createTable(TableIdent(Seq("db"), "sales"), priceSchema, PartitionSpec(0, Nil))
    // sums chosen so the division does NOT terminate (10.00 / 3) — the case
    // double routing gets wrong in the low digits
    sales = IceWrite.append(spark, sales,
      priceDf(Seq((1L, 1L, "4.00"), (2L, 1L, "2.50"), (3L, 2L, "5.25"))))
    val mv = TableIdent(Seq("db"), "avg_price")
    IceMV.create(spark, cat, mv,
      "SELECT product_id, avg(price) AS avg_price, count(*) AS n FROM sales GROUP BY product_id")
    IceMV.refresh(spark, cat, mv)

    sales = IceWrite.append(spark, sales.refresh(),
      priceDf(Seq((4L, 1L, "3.50"), (5L, 3L, "7.77"))))
    val r = IceMV.refresh(spark, cat, mv)
    assert(r.strategy.isInstanceOf[IceMV.IncrementalAggregate],
      s"DECIMAL avg must merge incrementally, got ${r.strategy}")

    val got = IceMV.read(spark, cat, mv)
    // declared type survives: avg(decimal(18,2)) = decimal(22,6)
    assert(got.schema("avg_price").dataType ==
      org.apache.spark.sql.types.DecimalType(22, 6))
    val expect = IceScan.scan(spark, sales.refresh())
      .groupBy("product_id")
      .agg(avg(col("price")).as("avg_price"), count(lit(1)).as("n"))
    val gotM = got.collect().map(x => x.getLong(0) -> (x.getDecimal(1), x.getLong(2))).toMap
    val expM = expect.collect().map(x => x.getLong(0) -> (x.getDecimal(1), x.getLong(2))).toMap
    assert(gotM == expM, "incremental read must be bit-exact with native avg recompute")
    assert(gotM(1L)._1.toString == "3.333333", "10.00/3 at scale 6, HALF_UP")
  }

  test("count(DISTINCT) MV merges incrementally via (groups, key) granularity") {
    val cat = newCatalog()
    var orders = cat.createTable(TableIdent(Seq("db"), "orders"), ordersSchema, PartitionSpec(0, Nil))
    orders = IceWrite.append(spark, orders, ordersDf(Seq((1L, 1L, 4L), (2L, 1L, 4L), (3L, 2L, 5L))))
    val mv = TableIdent(Seq("db"), "dist_amount")
    IceMV.create(spark, cat, mv,
      "SELECT product_id, count(*) AS n, count(DISTINCT amount) AS n_amts, sum(amount) AS total FROM orders GROUP BY product_id")
    IceMV.refresh(spark, cat, mv)
    assert(IceMV.read(spark, cat, mv).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap ==
      Map(1L -> (2L, 1L, 8L), 2L -> (1L, 1L, 5L)))

    // new distinct value for p1, repeated value for p2, brand-new group p3
    orders = IceWrite.append(spark, orders.refresh(), ordersDf(Seq((4L, 1L, 9L), (5L, 2L, 5L), (6L, 3L, 7L))))
    val r = IceMV.refresh(spark, cat, mv)
    assert(r.strategy.isInstanceOf[IceMV.IncrementalAggregate])
    val got = IceMV.read(spark, cat, mv).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(1L -> (3L, 2L, 17L), 2L -> (2L, 1L, 10L), 3L -> (1L, 1L, 7L)))
    // visible schema hides the distinct-key granularity
    assert(IceMV.read(spark, cat, mv).columns.toSeq == Seq("product_id", "n", "n_amts", "total"))
  }

  test("multi-column count(DISTINCT) MV stores (groups, x, y) combos and merges") {
    val cat = newCatalog()
    var orders = cat.createTable(TableIdent(Seq("db"), "orders"), ordersSchema, PartitionSpec(0, Nil))
    // (id, product_id, amount): distinct over BOTH id and amount per product
    orders = IceWrite.append(spark, orders, ordersDf(Seq((1L, 1L, 4L), (2L, 1L, 4L), (3L, 2L, 5L))))
    val mv = TableIdent(Seq("db"), "dist_two")
    IceMV.create(spark, cat, mv,
      "SELECT product_id, count(DISTINCT id) AS n_ids, count(DISTINCT amount) AS n_amts, count(*) AS n FROM orders GROUP BY product_id")
    IceMV.refresh(spark, cat, mv)
    assert(IceMV.read(spark, cat, mv).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap ==
      Map(1L -> (2L, 1L, 2L), 2L -> (1L, 1L, 1L)))

    // repeat (id 1, amount 4) pair for p1 (no NDV change), new amount for p2
    orders = IceWrite.append(spark, orders.refresh(), ordersDf(Seq((1L, 1L, 4L), (4L, 2L, 9L))))
    val r = IceMV.refresh(spark, cat, mv)
    assert(r.strategy.isInstanceOf[IceMV.IncrementalAggregate],
      s"expected incremental refresh, got ${r.strategy}")
    val got = IceMV.read(spark, cat, mv).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(1L -> (2L, 1L, 3L), 2L -> (2L, 2L, 2L)))
    assert(IceMV.read(spark, cat, mv).columns.toSeq == Seq("product_id", "n_ids", "n_amts", "n"))
  }

  test("MV with a subquery source refreshes it and tracks its freshness") {
    val cat = newCatalog()
    var orders = cat.createTable(TableIdent(Seq("db"), "orders"), ordersSchema, PartitionSpec(0, Nil))
    var products = cat.createTable(TableIdent(Seq("db"), "products"), productSchema, PartitionSpec(0, Nil))
    import spark.implicits._
    orders = IceWrite.append(spark, orders,
      ordersDf(Seq((1L, 1L, 5L), (2L, 2L, 2L), (3L, 3L, 9L))))
    products = IceWrite.append(spark, products,
      Seq((1L, "widget"), (3L, "gadget")).toDF("product_id", "name"))

    // `products` appears ONLY inside the IN-subquery: it must still be
    // registered on the full-refresh path and drive freshness
    val mv = TableIdent(Seq("db"), "known_product_sales")
    IceMV.create(spark, cat, mv,
      "SELECT id, amount FROM orders WHERE product_id IN (SELECT product_id FROM products)")
    val r1 = IceMV.refresh(spark, cat, mv)
    assert(r1.strategy == IceMV.FullOverwrite) // subquery ⇒ no delta algebra
    assert(IceMV.read(spark, cat, mv).collect().map(_.getLong(0)).toSet == Set(1L, 3L))

    // changing ONLY the subquery's source must not report Fresh
    products = IceWrite.append(spark, products.refresh(),
      Seq((2L, "gizmo")).toDF("product_id", "name"))
    val r2 = IceMV.refresh(spark, cat, mv)
    assert(r2.strategy != IceMV.Fresh)
    assert(IceMV.read(spark, cat, mv).collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
  }

  test("plain view reads inline current data") {
    val cat = newCatalog()
    var orders = cat.createTable(TableIdent(Seq("db"), "orders"), ordersSchema, PartitionSpec(0, Nil))
    orders = IceWrite.append(spark, orders, ordersDf(Seq((1L, 1L, 5L))))
    val v = TableIdent(Seq("db"), "v_orders")
    cat.createView(v, "SELECT id, amount * 2 AS amount2 FROM orders",
      IceSchema(1, Seq(
        NestedField(1, "id", required = false, IceType.LongT),
        NestedField(2, "amount2", required = false, IceType.LongT))))
    assert(IceMV.readView(spark, cat, v).collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 10L)))
    orders = IceWrite.append(spark, orders.refresh(), ordersDf(Seq((2L, 1L, 3L))))
    assert(IceMV.readView(spark, cat, v).count() == 2)
  }

  test("REPLACE VIEW appends a version; reads run off the current version") {
    val cat = newCatalog()
    var orders = cat.createTable(TableIdent(Seq("db"), "orders"), ordersSchema, PartitionSpec(0, Nil))
    orders = IceWrite.append(spark, orders, ordersDf(Seq((1L, 1L, 5L), (2L, 1L, 7L))))
    val v = TableIdent(Seq("db"), "v_rep")
    cat.createView(v, "SELECT id, amount FROM orders",
      IceSchema(1, Seq(
        NestedField(1, "id", required = false, IceType.LongT),
        NestedField(2, "amount", required = false, IceType.LongT))))
    val m1 = cat.loadView(v).get
    assert(m1.currentVersionId == 1L && m1.versionLog.map(_.versionId) == Seq(1L))
    assert(m1.currentVersion.summary.get("operation").contains("create"))

    IceMV.replaceView(spark, cat, v, "SELECT id, amount * 10 AS amount10 FROM orders")
    val m2 = cat.loadView(v).get
    // new version appended, pointer moved, log extended, uuid stable,
    // prior version retained for audit
    assert(m2.viewUuid == m1.viewUuid)
    assert(m2.currentVersionId == 2L)
    assert(m2.versionLog.map(_.versionId) == Seq(1L, 2L))
    assert(m2.versions.keySet == Set(1L, 2L))
    assert(m2.currentVersion.summary.get("operation").contains("replace"))
    assert(m2.currentSchema.fields.map(_.name) == Seq("id", "amount10"))
    // the read runs the CURRENT version's SQL
    assert(IceMV.readView(spark, cat, v).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 50L), (2L, 70L)))
    // replace with a mismatched uuid is rejected
    val forged = m2.copy(viewUuid = java.util.UUID.randomUUID().toString)
    intercept[IllegalArgumentException] { cat.replaceView(v, forged) }
  }

  test("expandsRows reads the ANALYZED plan: explode/rollup expand, semi/anti joins don't") {
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "tag").createOrReplaceTempView("er_t")
    def analyzed(sql: String) = spark.sql(sql).queryExecution.analyzed
    // SELECT explode(...) is only a Generate AFTER analysis — the parsed
    // plan the old check inspected had no Generate node (ADVICE r14)
    assert(IceMV.expandsRows(analyzed("SELECT explode(sequence(1, 3)) FROM er_t")))
    // grouping sets surface as Expand (output can exceed the input bound)
    assert(IceMV.expandsRows(analyzed(
      "SELECT id, tag, count(*) FROM er_t GROUP BY ROLLUP(id, tag)")))
    assert(IceMV.expandsRows(analyzed(
      "SELECT a.id FROM er_t a JOIN er_t b ON a.id = b.id")))
    // LATERAL correlated subqueries are a LateralJoin node, not a Join
    // subclass — they multiply rows all the same
    assert(IceMV.expandsRows(analyzed(
      "SELECT * FROM er_t a, LATERAL (SELECT id AS lid FROM er_t b WHERE b.id = a.id)")))
    // UNPIVOT is its own analyzed node (Expand only appears in the
    // optimizer) and multiplies rows by the value-column count (ADVICE r15)
    assert(IceMV.expandsRows(analyzed(
      "SELECT * FROM (SELECT id, id AS a, id AS b FROM er_t) UNPIVOT (v FOR c IN (a, b))")))
    // row-bounded shapes stay eligible for the count-skip
    assert(!IceMV.expandsRows(analyzed("SELECT id, count(*) FROM er_t GROUP BY id")))
    assert(!IceMV.expandsRows(analyzed(
      "SELECT id FROM er_t WHERE id IN (SELECT id FROM er_t WHERE tag = 'a')")))
    assert(!IceMV.expandsRows(analyzed(
      "SELECT id FROM er_t WHERE id NOT IN (SELECT id FROM er_t WHERE tag = 'a')")))
  }

  test("boundHint: non-source leaves and loose (filtered) bounds disable/cap the count-skip") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bh_spec").toString
    spark.range(10).select(col("id"), (col("id") % 3).as("k")).write.mode("overwrite").parquet(dir)
    def analyzedOf(df: org.apache.spark.sql.DataFrame) = df.queryExecution.analyzed
    val scan = spark.read.parquet(dir)
    // all-file-leaf plans are eligible...
    assert(IceMV.boundedLeaves(analyzedOf(scan.select(col("id")))))
    // ...Range / VALUES leaves contribute rows the manifest bound never
    // counted — ineligible (ADVICE r15)
    assert(!IceMV.boundedLeaves(analyzedOf(scan.unionByName(
      spark.range(5).select(col("id"), (col("id") % 3).as("k"))))))
    assert(!IceMV.boundedLeaves(analyzedOf(Seq((1L, 1L)).toDF("id", "k"))))
    assert(IceMV.boundHint(analyzedOf(scan.unionByName(
      spark.range(5).select(col("id"), (col("id") % 3).as("k")))), 10L).isEmpty)
    // a Filter makes the row bound loose: the hint survives only when the
    // bound pins a couple of files (5M rows → 2 files OK; 100M → None)
    val filtered = scan.filter(col("k") === 1)
    assert(IceMV.boundHint(analyzedOf(filtered), 5L * 1000 * 1000).isDefined)
    assert(IceMV.boundHint(analyzedOf(filtered), 100L * 1000 * 1000).isEmpty,
      "a selective filter over a wide bound must fall back to the sizing count()")
    // unfiltered row-preserving plans keep the wide cap
    assert(IceMV.boundHint(analyzedOf(scan.select(col("id"))), 100L * 1000 * 1000).isDefined)
  }

  test("standing MV: the second refresh re-parses/re-classifies NOTHING (memoized view SQL)") {
    import spark.implicits._
    val cat = newCatalog()
    val schema = IceSchema(0, Seq(
      NestedField(1, "k", required = false, IceType.LongT),
      NestedField(2, "v", required = false, IceType.LongT)))
    var t = cat.createTable(TableIdent(Seq("db"), "memo_src"), schema, PartitionSpec(0, Nil))
    t = IceWrite.append(spark, t, Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    val mv = TableIdent(Seq("db"), "memo_mv")
    // a UNIQUE SQL string so earlier suites can't have warmed the memo
    IceMV.create(spark, cat, mv,
      "SELECT k, count(*) AS n, sum(v) AS s FROM memo_src WHERE v <> 987654 GROUP BY k")
    assert(IceMV.refresh(spark, cat, mv).strategy == IceMV.FullOverwrite)
    // the standing refresh loop: every subsequent refresh serves the parse,
    // occurrence walk, distinct rewrite and classification from the memo
    val p0 = IceMV.mvParses.get()
    t = IceWrite.append(spark, t.refresh(), Seq((1L, 30L), (3L, 40L)).toDF("k", "v"))
    val r2 = IceMV.refresh(spark, cat, mv)
    assert(r2.strategy.isInstanceOf[IceMV.IncrementalAggregate])
    t = IceWrite.append(spark, t.refresh(), Seq((2L, 50L)).toDF("k", "v"))
    IceMV.refresh(spark, cat, mv)
    assert(IceMV.mvParses.get() == p0,
      s"standing refreshes must not re-parse the view SQL (${IceMV.mvParses.get() - p0} parses)")
    // and the merged state stays exact
    val got = IceMV.read(spark, cat, mv).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 40L), (2L, 2L, 70L), (3L, 1L, 40L)), s"got $got")
  }

  test("mid-size expansion-free refresh skips the sizing count() via the bound-capped hint") {
    import spark.implicits._
    val cat = newCatalog()
    val schema = IceSchema(0, Seq(
      NestedField(1, "k", required = false, IceType.LongT),
      NestedField(2, "v", required = false, IceType.LongT)))
    var t = cat.createTable(TableIdent(Seq("db"), "mid_src"), schema, PartitionSpec(0, Nil))
    def rowsDf(n: Long, off: Long) =
      spark.range(n).select((col("id") % 1000).as("k"), (col("id") + off).as("v"))
    t = IceWrite.append(spark, t, rowsDf(50000, 0))

    val mv = TableIdent(Seq("db"), "mid_mv")
    IceMV.create(spark, cat, mv, "SELECT k, count(*) AS n, sum(v) AS s FROM mid_src GROUP BY k")
    assert(IceMV.refresh(spark, cat, mv).strategy == IceMV.FullOverwrite)

    // the sizing count() surfaces as a job whose stages are named
    // "count at MaterializedView.scala:<line>" — assert none runs
    def countJobsDuring(body: => Unit): Seq[String] = {
      val names = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          j.stageInfos.foreach(s => names.add(s.name))
      }
      spark.sparkContext.addSparkListener(listener)
      try { body; Thread.sleep(700) } // listener bus is async
      finally spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      names.asScala.toSeq.filter(n => n.startsWith("count at") && n.contains("MaterializedView"))
    }

    // mid-size: a 4.5M-row delta exceeds the old 4M single-file pin — the
    // bound-capped hint (fileHint(bound) ≤ BoundHintMaxFiles) must still
    // skip the sizing count()
    t = IceWrite.append(spark, t.refresh(), rowsDf(4500000, 1))
    var strat: IceMV.Strategy = null
    val countJobs = countJobsDuring { strat = IceMV.refresh(spark, cat, mv).strategy }
    assert(strat.isInstanceOf[IceMV.IncrementalAggregate])
    assert(countJobs.isEmpty,
      s"mid-size refresh ran a sizing count(): $countJobs")
    // and the merged result is exact: 1000 groups, counts sum to all appends
    val got = IceMV.read(spark, cat, mv)
      .agg(count(lit(1)), sum("n")).collect()(0)
    assert(got.getLong(0) == 1000L && got.getLong(1) == 4550000L)

    // positive control — the detector must SEE the sizing count() when the
    // plan expands (self-join → no bound): otherwise the assert above is
    // vacuous against a renamed call site
    var ctrl = cat.createTable(TableIdent(Seq("db"), "ctrl_src"), schema, PartitionSpec(0, Nil))
    ctrl = IceWrite.append(spark, ctrl, rowsDf(100, 0))
    val mvJoin = TableIdent(Seq("db"), "mid_mv_join")
    IceMV.create(spark, cat, mvJoin,
      "SELECT a.k AS k, count(*) AS n FROM ctrl_src a JOIN ctrl_src b ON a.v = b.v GROUP BY a.k")
    val controlCounts = countJobsDuring { IceMV.refresh(spark, cat, mvJoin) }
    assert(controlCounts.nonEmpty,
      "detector failed to observe the sizing count() on an expanding refresh")
  }
}
