package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.sql.GraftExtensions

/** Metadata-only global aggregates (GraftReadRule × MetadataAgg): a global
  * count/min/max over a graft SQL table must be answered from manifest
  * statistics — the optimized plan collapses to a LocalRelation, no scan
  * node survives — and must FALL BACK to a real scan whenever exactness
  * can't be proven (filters, deletes, strings, distinct). Values are always
  * checked against a real recompute: the rewrite has to be invisible.
  */
class MetadataAggSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val warehouse = Files.createTempDirectory("mawh").toString

  private lazy val spark = {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", "graft.spark.sql.GraftSparkCatalog")
      .config("spark.sql.catalog.graft.warehouse", warehouse)
      .withExtensions(new GraftExtensions)
      .appName("graft-metadata-agg-spec").getOrCreate()
  }

  override def afterAll(): Unit = spark.stop()

  /** True when the optimized plan is metadata-answered: every leaf is a
    * LocalRelation (no parquet relation, no file index — zero data IO). */
  private def metadataOnly(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.isInstanceOf[LocalRelation])

  private def setup(): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ma")
    spark.sql("DROP TABLE IF EXISTS graft.ma.t")
    spark.sql(
      """CREATE TABLE graft.ma.t (
        |  id BIGINT, v INT, s STRING, d DATE, ts TIMESTAMP_NTZ,
        |  price DECIMAL(18,2), maybe BIGINT
        |) PARTITIONED BY (bucket(4, id))""".stripMargin)
    spark.sql(
      """INSERT INTO graft.ma.t VALUES
        |(1, 10, 'a', DATE'2020-01-05', TIMESTAMP_NTZ'2020-01-05 01:02:03', 1.25, NULL),
        |(2, -3, 'b', DATE'2019-12-31', TIMESTAMP_NTZ'2021-06-01 00:00:00', 99.10, NULL),
        |(3,  7, 'c', DATE'2020-03-01', TIMESTAMP_NTZ'2019-01-01 12:00:00', 0.05, NULL)""".stripMargin)
    spark.sql(
      """INSERT INTO graft.ma.t VALUES
        |(4, 42, 'd', DATE'2022-07-04', TIMESTAMP_NTZ'2022-07-04 07:04:00', 7.77, NULL),
        |(5, NULL, 'e', DATE'2018-01-01', TIMESTAMP_NTZ'2018-01-01 00:00:01', -2.50, NULL)""".stripMargin)
  }

  test("global count/min/max answered from manifests: plan is a LocalRelation") {
    setup()
    val df = spark.sql(
      """SELECT count(*) AS n, count(v) AS nv, min(v) AS mnv, max(v) AS mxv,
        |       min(id) AS mni, max(id) AS mxi, min(d) AS mnd, max(d) AS mxd,
        |       min(ts) AS mnts, max(ts) AS mxts,
        |       min(price) AS mnp, max(price) AS mxp,
        |       min(maybe) AS mnm, max(maybe) AS mxm, count(maybe) AS nm
        |FROM graft.ma.t""".stripMargin)
    assert(metadataOnly(df), df.queryExecution.optimizedPlan.treeString)
    val r = df.head()
    assert(r.getLong(0) == 5 && r.getLong(1) == 4)
    assert(r.getInt(2) == -3 && r.getInt(3) == 42)
    assert(r.getLong(4) == 1 && r.getLong(5) == 5)
    assert(r.getDate(6).toString == "2018-01-01" && r.getDate(7).toString == "2022-07-04")
    assert(r.getAs[java.time.LocalDateTime](8).toString == "2018-01-01T00:00:01")
    assert(r.getAs[java.time.LocalDateTime](9).toString == "2022-07-04T07:04")
    assert(r.getDecimal(10).toPlainString == "-2.50" && r.getDecimal(11).toPlainString == "99.10")
    // all-null column: provably null from null_count == record_count
    assert(r.isNullAt(12) && r.isNullAt(13) && r.getLong(14) == 0)
  }

  test("fallbacks: filter, grouping, distinct, string min, sum all scan — values exact") {
    setup()
    val scans = Seq(
      "SELECT count(*) AS n FROM graft.ma.t WHERE v > 0",
      "SELECT s, count(*) AS n FROM graft.ma.t GROUP BY s",
      "SELECT count(DISTINCT v) AS n FROM graft.ma.t",
      "SELECT min(s) AS mns FROM graft.ma.t",
      "SELECT sum(v) AS sv FROM graft.ma.t",
      "SELECT count(*) + 1 AS n FROM graft.ma.t")
    for (q <- scans) {
      val df = spark.sql(q)
      assert(!metadataOnly(df), s"$q must NOT be metadata-answered")
    }
    assert(spark.sql(scans.head).head().getLong(0) == 3)
    assert(spark.sql(scans(3)).head().getString(0) == "a")
    assert(spark.sql(scans(4)).head().getLong(0) == 56)
  }

  test("a live delete file disables the rewrite; values reflect the delete") {
    setup()
    spark.sql("DELETE FROM graft.ma.t WHERE id = 4")
    val df = spark.sql("SELECT count(*) AS n, max(v) AS mxv FROM graft.ma.t")
    assert(!metadataOnly(df), "deletes make manifest stats inexact — must scan")
    val r = df.head()
    assert(r.getLong(0) == 4 && r.getInt(1) == 10)
  }

  test("time travel pins the snapshot: VERSION AS OF answers old counts metadata-only") {
    setup()
    val snaps = spark.sql("SELECT snapshot_id FROM graft.ma.t.snapshots ORDER BY committed_at")
      .collect().map(_.getLong(0))
    val df = spark.sql(
      s"SELECT count(*) AS n, max(id) AS mx FROM graft.ma.t VERSION AS OF ${snaps.head}")
    assert(metadataOnly(df), df.queryExecution.optimizedPlan.treeString)
    val r = df.head()
    assert(r.getLong(0) == 3 && r.getLong(1) == 3)
  }

  test("GROUP BY an identity partition column answers per-partition stats metadata-only") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ma")
    spark.sql("DROP TABLE IF EXISTS graft.ma.gp")
    spark.sql("CREATE TABLE graft.ma.gp (id BIGINT, lang STRING, v INT) PARTITIONED BY (lang)")
    spark.sql("INSERT INTO graft.ma.gp VALUES (1,'a',5), (2,'b',7), (3,'a',NULL), (4,NULL,9)")
    spark.sql("INSERT INTO graft.ma.gp VALUES (5,'a',1), (6,'b',-2)")
    val df = spark.sql(
      """SELECT lang, count(*) AS n, count(v) AS nv, min(v) AS mn, max(v) AS mx
        |FROM graft.ma.gp GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin)
    assert(metadataOnly(df), df.queryExecution.optimizedPlan.treeString)
    val got = df.collect().map(r => (Option(r.getString(0)),
      r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getInt(3)),
      if (r.isNullAt(4)) None else Some(r.getInt(4)))).toSeq
    assert(got == Seq(
      (None, 1L, 1L, Some(9), Some(9)),
      (Some("a"), 3L, 2L, Some(1), Some(5)),
      (Some("b"), 2L, 2L, Some(-2), Some(7))), got.mkString(", "))

    // SELECT DISTINCT on the identity partition column optimizes to the
    // same grouped form and is metadata-answered too
    val distinctDf = spark.sql("SELECT DISTINCT lang FROM graft.ma.gp")
    assert(metadataOnly(distinctDf), distinctDf.queryExecution.optimizedPlan.treeString)
    assert(distinctDf.collect().map(r => Option(r.getString(0))).toSet
      == Set(None, Some("a"), Some("b")))

    // grouping on a NON-identity-partition column must scan (bucket(4,id)
    // table grouped by its string col; identity table grouped by v)
    setup()
    assert(!metadataOnly(spark.sql("SELECT s, count(*) AS n FROM graft.ma.t GROUP BY s")))
    assert(!metadataOnly(spark.sql("SELECT v, count(*) AS n FROM graft.ma.gp GROUP BY v")))
    // grouped values still exact through the scan path
    val scanned = spark.sql("SELECT v, count(*) AS n FROM graft.ma.gp GROUP BY v")
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0)), r.getLong(1))).toSet
    assert(scanned == Set((None, 1L), (Some(5), 1L), (Some(7), 1L),
      (Some(9), 1L), (Some(1), 1L), (Some(-2), 1L)))
  }

  test("a partition-field name reused across spec history bails the grouped rewrite") {
    // drop the field, rename the column away, re-add both under the SAME
    // name with a DIFFERENT source: old files' tuples say {lang: 'a'} but
    // SQL puts their rows in the NULL group of the NEW lang column —
    // name-keyed grouping would silently misattribute them, so it must scan
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ma")
    spark.sql("DROP TABLE IF EXISTS graft.ma.gh")
    spark.sql("CREATE TABLE graft.ma.gh (id BIGINT, lang STRING) PARTITIONED BY (lang)")
    spark.sql("INSERT INTO graft.ma.gh VALUES (1,'a'), (2,'b')")
    spark.sql("ALTER TABLE graft.ma.gh DROP PARTITION FIELD lang")
    spark.sql("ALTER TABLE graft.ma.gh RENAME COLUMN lang TO locale")
    spark.sql("ALTER TABLE graft.ma.gh ADD COLUMN lang STRING")
    spark.sql("ALTER TABLE graft.ma.gh ADD PARTITION FIELD lang")
    spark.sql("INSERT INTO graft.ma.gh VALUES (3,'a','x'), (4,'b','y')")
    val df = spark.sql("SELECT lang, count(*) AS n FROM graft.ma.gh GROUP BY lang")
    assert(!metadataOnly(df),
      "ambiguous tuple-name history must scan: " + df.queryExecution.optimizedPlan.treeString)
    val got = df.collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(got == Map(None -> 2L, Some("x") -> 1L, Some("y") -> 1L), got)
  }

  test("filter on identity partition columns answers metadata-only with exact 3VL semantics") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ma")
    spark.sql("DROP TABLE IF EXISTS graft.ma.gp")
    spark.sql("CREATE TABLE graft.ma.gp (id BIGINT, lang STRING, v INT) PARTITIONED BY (lang)")
    spark.sql("INSERT INTO graft.ma.gp VALUES (1,'a',5), (2,'b',7), (3,'a',NULL), (4,NULL,9)")
    spark.sql("INSERT INTO graft.ma.gp VALUES (5,'a',1), (6,'b',-2)")

    // answered shapes: eq, IN, range, IS [NOT] NULL, NOT/<>, OR — each
    // checked both for the LocalRelation plan AND the exact value
    def one(q: String): (Boolean, Long) = {
      val df = spark.sql(q)
      (metadataOnly(df), df.head().getLong(0))
    }
    assert(one("SELECT count(*) AS n FROM graft.ma.gp WHERE lang = 'a'") == ((true, 3L)))
    assert(one("SELECT count(*) AS n FROM graft.ma.gp WHERE lang IN ('a','zz')") == ((true, 3L)))
    assert(one("SELECT count(*) AS n FROM graft.ma.gp WHERE lang >= 'b'") == ((true, 2L)))
    assert(one("SELECT count(*) AS n FROM graft.ma.gp WHERE lang < 'b'") == ((true, 3L)))
    assert(one("SELECT count(*) AS n FROM graft.ma.gp WHERE lang IS NULL") == ((true, 1L)))
    assert(one("SELECT count(*) AS n FROM graft.ma.gp WHERE lang IS NOT NULL") == ((true, 5L)))
    // three-valued logic: `<>` drops the NULL-lang file, like SQL does
    assert(one("SELECT count(*) AS n FROM graft.ma.gp WHERE lang <> 'a'") == ((true, 2L)))
    assert(one("SELECT count(*) AS n FROM graft.ma.gp WHERE NOT (lang = 'a' OR lang = 'b')")
      == ((true, 0L)))
    // grouped AND filtered at once (the q120 shape); min/max come from the
    // surviving files only
    val gf = spark.sql(
      """SELECT lang, count(*) AS n, min(v) AS mn
        |FROM graft.ma.gp WHERE lang IN ('a','b') GROUP BY lang ORDER BY lang""".stripMargin)
    assert(metadataOnly(gf), gf.queryExecution.optimizedPlan.treeString)
    assert(gf.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
      == Seq(("a", 3L, 1), ("b", 2L, -2)))

    // compositions ride for free: SELECT DISTINCT over a filtered identity
    // column (Distinct optimizes to the grouped form), and HAVING (a Filter
    // ABOVE the metadata-answered aggregate, evaluated over the
    // LocalRelation)
    val dist = spark.sql("SELECT DISTINCT lang FROM graft.ma.gp WHERE lang >= 'b'")
    assert(metadataOnly(dist), dist.queryExecution.optimizedPlan.treeString)
    assert(dist.collect().map(_.getString(0)).toSeq == Seq("b"))
    val having = spark.sql(
      """SELECT lang, count(*) AS n FROM graft.ma.gp WHERE lang IS NOT NULL
        |GROUP BY lang HAVING count(*) > 2""".stripMargin)
    assert(metadataOnly(having), having.queryExecution.optimizedPlan.treeString)
    assert(having.collect().map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 3L)))

    // NOT answered: non-partition column, non-identity (bucket) source,
    // ambiguous tuple-name history — all scan, values still exact
    assert(!metadataOnly(spark.sql("SELECT count(*) AS n FROM graft.ma.gp WHERE v > 0")))
    setup()
    assert(!metadataOnly(spark.sql("SELECT count(*) AS n FROM graft.ma.t WHERE id = 1")),
      "bucket-partitioned source column is not identity — must scan")
    val amb = spark.sql("SELECT count(*) AS n FROM graft.ma.gh WHERE lang = 'x'")
    assert(!metadataOnly(amb), "ambiguous tuple-name history must scan")
    assert(amb.head().getLong(0) == 1L)
  }

  test("IS [NOT] NULL residuals on any column answer from per-file null counts") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ma")
    spark.sql("DROP TABLE IF EXISTS graft.ma.nn")
    spark.sql("CREATE TABLE graft.ma.nn (id BIGINT, lang STRING, v INT) PARTITIONED BY (lang)")
    // one file per partition dir: file(a) is ALL-null in v, file(b) has NO
    // nulls — both exactly decidable file-wide from null counts alone
    spark.sql("INSERT INTO graft.ma.nn VALUES (1,'a',NULL),(2,'a',NULL),(3,'b',5),(4,'b',7)")
    def one(q: String): (Boolean, Long) = {
      val df = spark.sql(q)
      (metadataOnly(df), df.head().getLong(0))
    }
    assert(one("SELECT count(*) AS n FROM graft.ma.nn WHERE v IS NOT NULL") == ((true, 2L)))
    assert(one("SELECT count(*) AS n FROM graft.ma.nn WHERE v IS NULL") == ((true, 2L)))
    // ... and `count(*) WHERE v IS NOT NULL` agrees with `count(v)` (the
    // identity the null-count stats already answered globally)
    assert(one("SELECT count(v) AS n FROM graft.ma.nn") == ((true, 2L)))
    // composes with identity-column predicates in the same filter
    assert(one("SELECT count(*) AS n FROM graft.ma.nn WHERE lang = 'b' AND v IS NOT NULL")
      == ((true, 2L)))
    assert(one("SELECT count(*) AS n FROM graft.ma.nn WHERE lang = 'a' AND v IS NOT NULL")
      == ((true, 0L)))
    // grouped + filtered: the all-null file's group disappears, like SQL
    val gf = spark.sql(
      """SELECT lang, count(*) AS n FROM graft.ma.nn
        |WHERE v IS NOT NULL GROUP BY lang ORDER BY lang""".stripMargin)
    assert(metadataOnly(gf), gf.queryExecution.optimizedPlan.treeString)
    assert(gf.collect().map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("b", 2L)))

    // a MIXED file (some nulls, not all) is undecidable file-wide: the
    // rewrite bails to a real scan, value still exact
    spark.sql("INSERT INTO graft.ma.nn VALUES (5,'c',9),(6,'c',NULL)")
    val mixed = spark.sql("SELECT count(*) AS n FROM graft.ma.nn WHERE v IS NOT NULL")
    assert(!metadataOnly(mixed), "mixed null counts must scan")
    assert(mixed.head().getLong(0) == 3L)
    // ... but a decided-False identity conjunct short-circuits: the mixed
    // file is excluded by lang before its null count matters
    assert(one("SELECT count(*) AS n FROM graft.ma.nn WHERE lang = 'b' AND v IS NOT NULL")
      == ((true, 2L)))
    // any non-null-test predicate on a non-partition column still scans
    assert(!metadataOnly(spark.sql("SELECT count(*) AS n FROM graft.ma.nn WHERE v > 0")))
  }

  test("empty table answers count 0 / min NULL metadata-only") {
    spark.sql("DROP TABLE IF EXISTS graft.ma.empty")
    spark.sql("CREATE TABLE graft.ma.empty (id BIGINT, v INT)")
    val df = spark.sql("SELECT count(*) AS n, min(v) AS mn FROM graft.ma.empty")
    assert(metadataOnly(df), df.queryExecution.optimizedPlan.treeString)
    val r = df.head()
    assert(r.getLong(0) == 0 && r.isNullAt(1))
  }

  test("bucket residuals decide negatively: missing-key probes and nullness answer exactly, matches bail") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ma")
    spark.sql("DROP TABLE IF EXISTS graft.ma.bk")
    spark.sql(
      "CREATE TABLE graft.ma.bk (id BIGINT, src STRING, v INT) PARTITIONED BY (bucket(8, src))")
    spark.sql(
      "INSERT INTO graft.ma.bk VALUES (1,'a',5), (2,'a',NULL), (3,'b',7), (4,NULL,9)")
    spark.sql("INSERT INTO graft.ma.bk VALUES (5,'b',-1)")

    // deterministic missing-bucket probes: literals whose bucket(8) differs
    // from every occupied bucket — bucket(lit) ≠ tuple proves x ≠ lit for
    // EVERY row of the file, so the all-excluded answer is EXACT, not pruning
    val occupied = Seq("a", "b").map(s => graft.core.Transform.Bucket(8)(s)).toSet
    val missing = Seq("x", "y", "z", "q", "m", "n", "ghost", "probe6")
      .filter(s => !occupied.contains(graft.core.Transform.Bucket(8)(s)))
    assert(missing.size >= 2, s"fixture needs 2 missing-bucket probes: $missing")
    val (p1, p2) = (missing(0), missing(1))

    def one(q: String): (Boolean, Long) = {
      val df = spark.sql(q)
      (metadataOnly(df), df.head().getLong(0))
    }
    // missing-key probe: every file excluded by its bucket → exact 0
    assert(one(s"SELECT count(*) AS n FROM graft.ma.bk WHERE src = '$p1'") == ((true, 0L)))
    assert(one(s"SELECT count(*) AS n FROM graft.ma.bk WHERE src IN ('$p1','$p2')")
      == ((true, 0L)))
    // <> a missing key: mismatch files decide True, the NULL-src file
    // decides Unknown (SQL drops it) — all decided, answer exact
    assert(one(s"SELECT count(*) AS n FROM graft.ma.bk WHERE src <> '$p1'") == ((true, 4L)))
    // nullness is exact through the bucket tuple (bucket(x) NULL iff x NULL)
    assert(one("SELECT count(*) AS n FROM graft.ma.bk WHERE src IS NULL") == ((true, 1L)))
    assert(one("SELECT count(*) AS n FROM graft.ma.bk WHERE src IS NOT NULL") == ((true, 4L)))
    assert(one("SELECT count(*) AS n FROM graft.ma.bk WHERE src <=> NULL") == ((true, 1L)))
    // False ∧ undecidable short-circuits: the mixed-null v column would
    // bail alone, but every file is already excluded by the bucket fact
    assert(one(s"SELECT count(*) AS n FROM graft.ma.bk WHERE src = '$p1' AND v > 100")
      == ((true, 0L)))
    // a constant label column rides along verbatim (the q125 UNION shape)
    val lab = spark.sql(
      s"SELECT 'probe' AS tag, count(*) AS n FROM graft.ma.bk WHERE src = '$p1'")
    assert(metadataOnly(lab), lab.queryExecution.optimizedPlan.treeString)
    assert(lab.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == Seq(("probe", 0L)))
    // a PRESENT key's bucket matches its own file — proves nothing → scan,
    // value still exact
    val present = spark.sql("SELECT count(*) AS n FROM graft.ma.bk WHERE src = 'a'")
    assert(!metadataOnly(present), "bucket match must bail to a scan")
    assert(present.head().getLong(0) == 2L)
    // ranges never decide through a bucket → scan
    assert(!metadataOnly(spark.sql("SELECT count(*) AS n FROM graft.ma.bk WHERE src > 'a'")))
  }
}
