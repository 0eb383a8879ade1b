package graft

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

import graft.spec._

/** V1/V2 metadata read compatibility against the reference's golden fixtures
  * (copies of the `iceberg-rust-spec/testdata/table_metadata` JSON files;
  * the reference's dual serde is table_metadata.rs:390-572). Real users have V1
  * tables — reads must normalize them; broken V2 files must fail loudly,
  * not produce half-parsed metadata.
  */
class MetadataCompatSpec extends AnyFunSuite {

  private def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/table_metadata/$name.json")
    require(in != null, s"missing fixture $name")
    try Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  test("V1 metadata reads: singular schema/partition-spec normalize to the V2 model") {
    val m = TableMetadataJson.fromJson(fixture("TableMetadataV1Valid"))
    assert(m.formatVersion == 1)
    assert(m.tableUuid == "d20125c8-7284-442c-9aea-15fee620737c")
    assert(m.schemas.size == 1)
    assert(m.currentSchema.fields.map(_.name) == Seq("x", "y", "z"))
    assert(m.currentSchema.fields.forall(_.fieldType == IceType.LongT))
    assert(m.currentSchema.fields.find(_.name == "y").flatMap(_.doc).contains("comment"))
    assert(m.defaultSpec.fields.map(f => (f.sourceId, f.fieldId, f.name)) == Seq((1, 1000, "x")))
    assert(m.defaultSpec.fields.head.transform == graft.core.Transform.Identity)
    assert(m.lastSequenceNumber == 0L) // V1 has no sequence numbers
    assert(m.currentSnapshotId.isEmpty) // -1 sentinel means none
    assert(m.snapshots.isEmpty)
    assert(m.sortOrders == Map(0 -> SortOrder.unsorted))
    assert(m.lastPartitionId == 1000)
  }

  test("V1 metadata round-trips through the V2 writer and reads back") {
    val m = TableMetadataJson.fromJson(fixture("TableMetadataV1Valid"))
    // writing always emits the full V2 layout; the round-trip must preserve
    // the normalized model exactly (modulo the version stamp we keep)
    val back = TableMetadataJson.fromJson(TableMetadataJson.toJson(m))
    assert(back == m)
  }

  test("V2 golden fixture reads: snapshots, refs-free log, sort orders") {
    val m = TableMetadataJson.fromJson(fixture("TableMetadataV2Valid"))
    assert(m.formatVersion == 2)
    assert(m.lastSequenceNumber == 34)
    assert(m.snapshots.size == 2)
    assert(m.currentSnapshotId.contains(3055729675574597004L))
    assert(m.snapshots(3055729675574597004L).sequenceNumber == 1)
    val back = TableMetadataJson.fromJson(TableMetadataJson.toJson(m))
    assert(back == m)
  }

  test("V2 minimal fixture reads with empty optional sections") {
    val m = TableMetadataJson.fromJson(fixture("TableMetadataV2ValidMinimal"))
    assert(m.snapshots.isEmpty && m.properties.isEmpty && m.refs.isEmpty)
  }

  test("unsupported format version is rejected") {
    val e = intercept[IllegalArgumentException] {
      TableMetadataJson.fromJson(fixture("TableMetadataUnsupportedVersion"))
    }
    assert(e.getMessage.contains("unsupported"))
  }

  test("V1 metadata WRITE: format-version=1 emits the V1 wire shape and round-trips") {
    val schema = IceSchema(0, Seq(
      NestedField(1, "id", required = false, IceType.LongT),
      NestedField(2, "d", required = false, IceType.DateT)))
    val m = TableMetadata(
      formatVersion = 1,
      tableUuid = "11111111-2222-3333-4444-555555555555",
      location = "/tmp/v1t",
      lastSequenceNumber = 0L,
      lastUpdatedMs = 1700000000000L,
      lastColumnId = 2,
      schemas = Map(0 -> schema),
      currentSchemaId = 0,
      partitionSpecs = Map(0 -> PartitionSpec(0, Seq(
        PartitionField(2, 1000, "d_day", graft.core.Transform.Day)))),
      defaultSpecId = 0,
      lastPartitionId = 1000,
      properties = Map("format-version" -> "1"),
      currentSnapshotId = Some(77L),
      snapshots = Map(77L -> Snapshot(77L, None, 0L, 1700000000001L, "/tmp/v1t/metadata/ml.avro",
        Map("operation" -> "append"), Some(0))),
      snapshotLog = Seq(SnapshotLogEntry(77L, 1700000000001L)),
      metadataLog = Nil,
      sortOrders = Map(0 -> SortOrder.unsorted),
      defaultSortOrderId = 0,
      refs = Map.empty)
    val json = TableMetadataJson.toJson(m)
    val tree = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    // V1-required singular forms present
    assert(tree.get("format-version").asInt() == 1)
    assert(tree.get("schema").get("fields").size() == 2)
    assert(tree.get("partition-spec").get(0).get("transform").asText() == "day")
    // V2-only fields absent
    assert(tree.get("last-sequence-number") == null)
    assert(tree.get("refs") == null)
    assert(tree.get("snapshots").get(0).get("sequence-number") == null)
    // round-trips through our own reader (V1 normalization path)
    val back = TableMetadataJson.fromJson(json)
    assert(back.formatVersion == 1)
    assert(back.currentSnapshotId.contains(77L))
    assert(back.snapshots(77L).sequenceNumber == 0L)
    assert(back.defaultSpec.fields.head.transform == graft.core.Transform.Day)
    assert(back.currentSchema == schema)
  }

  test("V1 tables: full write/read lifecycle through the catalog; row-level deletes rejected") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val cat = new graft.catalog.FileCatalog(
      java.nio.file.Files.createTempDirectory("v1-wh").toString)
    val schema = IceSchema(0, Seq(
      NestedField(1, "id", required = false, IceType.LongT),
      NestedField(2, "v", required = false, IceType.LongT)))
    val ident = graft.catalog.TableIdent(Seq("db"), "v1t")
    var t = cat.createTable(ident, schema, PartitionSpec(0, Nil),
      Map("format-version" -> "1"))
    t = graft.spark.IceWrite.append(spark, t, Seq((1L, 10L), (2L, 20L)).toDF("id", "v"))
    t = graft.spark.IceWrite.append(spark, t.refresh(), Seq((3L, 30L)).toDF("id", "v"))
    // the stored metadata FILE is V1-shaped
    val metaDir = java.nio.file.Paths.get(t.location, "metadata")
    val latest = {
      val s = java.nio.file.Files.list(metaDir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".metadata.json")).toSeq.sorted.last
      } finally s.close()
    }
    val tree = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readAllBytes(metaDir.resolve(latest)))
    assert(tree.get("format-version").asInt() == 1)
    assert(tree.get("schema") != null && tree.get("partition-spec") != null)
    assert(tree.get("last-sequence-number") == null)
    // re-read through the catalog: content intact, still V1
    val reread = cat.loadTable(ident).get
    assert(reread.metadata.formatVersion == 1)
    assert(graft.spark.IceScan.scan(spark, reread).count() == 3)
    // V1 = copy-on-write only: row-level deletes must be rejected loudly
    val e = intercept[IllegalStateException] {
      graft.spark.IceWrite.appendEqualityDeletes(spark, reread, Seq(1L).toDF("id"),
        equalityIds = Seq(1))
    }
    assert(e.getMessage.contains("format-version 2"))
  }

  test("view metadata fixture round-trips (view_metadata.rs:476-522 shape)") {
    // the reference's own V1 view-metadata deserialization fixture
    val data = """
      {
      "view-uuid": "fa6506c3-7681-40c8-86dc-e36561f83385",
      "format-version" : 1,
      "location" : "s3://bucket/warehouse/default.db/event_agg",
      "current-version-id" : 1,
      "properties" : { "comment" : "Daily event counts" },
      "versions" : [ {
        "version-id" : 1,
        "timestamp-ms" : 1573518431292,
        "schema-id" : 1,
        "default-catalog" : "prod",
        "default-namespace" : [ "default" ],
        "summary" : {
          "operation" : "create", "engine-name" : "Spark", "engineVersion" : "3.3.2"
        },
        "representations" : [ {
          "type" : "sql",
          "sql" : "SELECT\n    COUNT(1), CAST(event_ts AS DATE)\nFROM events\nGROUP BY 2",
          "dialect" : "spark"
        } ]
      } ],
      "schemas": [ {
        "schema-id": 1,
        "type" : "struct",
        "fields" : [ {
          "id" : 1, "name" : "event_count", "required" : false,
          "type" : "int", "doc" : "Count of events"
        }, {
          "id" : 2, "name" : "event_date", "required" : false, "type" : "date"
        } ]
      } ],
      "version-log" : [ { "timestamp-ms" : 1573518431292, "version-id" : 1 } ]
      }"""
    val m = ViewMetadataJson.fromJson(data)
    assert(m.viewUuid == "fa6506c3-7681-40c8-86dc-e36561f83385")
    assert(m.currentVersionId == 1L)
    assert(m.currentVersion.defaultCatalog.contains("prod"))
    assert(m.currentVersion.defaultNamespace == Seq("default"))
    assert(m.currentVersion.summary("engine-name") == "Spark")
    assert(m.sql.startsWith("SELECT"))
    assert(m.currentSchema.fields.map(_.name) == Seq("event_count", "event_date"))
    assert(m.versionLog == Seq(ViewHistoryEntry(1573518431292L, 1L)))
    // serialize → parse → identical model (the reference's round-trip check)
    assert(ViewMetadataJson.fromJson(ViewMetadataJson.toJson(m)) == m)
  }

  test("view version history is capped by version.history.num-entries") {
    val schema = IceSchema(1, Seq(NestedField(1, "x", required = false, IceType.LongT)))
    var m = ViewMetadata.create("u-1", "/tmp/v", "SELECT 1 AS x", schema, 1000L,
      properties = Map("version.history.num-entries" -> "2"))
    for (i <- 2 to 5)
      m = m.replaced(s"SELECT $i AS x", schema, 1000L + i)
    assert(m.currentVersionId == 5L)
    // only the 2 most recent versions retained; full log kept for audit
    assert(m.versions.keySet == Set(4L, 5L))
    assert(m.versionLog.map(_.versionId) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(m.sql == "SELECT 5 AS x")
  }

  test("broken V2 fixtures fail loudly on their missing required field") {
    for ((name, needle) <- Seq(
      "TableMetadataV2MissingSchemas" -> "schemas",
      "TableMetadataV2MissingPartitionSpecs" -> "partition-specs",
      "TableMetadataV2MissingLastPartitionId" -> "last-partition-id",
      "TableMetadataV2MissingSortOrder" -> "sort-orders",
      "TableMetadataV2CurrentSchemaNotFound" -> "current schema")) {
      val e = intercept[IllegalArgumentException](TableMetadataJson.fromJson(fixture(name)))
      assert(e.getMessage.toLowerCase.contains(needle.toLowerCase),
        s"$name raised '${e.getMessage}', expected mention of '$needle'")
    }
  }
}
