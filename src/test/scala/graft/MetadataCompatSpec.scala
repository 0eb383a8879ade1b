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
