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
