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

  // ---- manifest Avro interop (manifest.rs:199-275 entry schema,
  // :1087-1381 DataFileV2, :374-406 partition_value_schema;
  // manifest_list.rs:536-663 V2 list schema) ------------------------------
  //
  // The reference reads manifests through Avro schema RESOLUTION against
  // these golden schema strings. We replay that exact read offline: our
  // manifest bytes decoded with the upstream schema as the Avro reader
  // schema, and upstream-shaped bytes decoded by our reader. The vector is
  // an EQUALITY-DELETE file — content, equality_ids, sequence-number
  // inheritance and bounds all cross the boundary.

  /** Verbatim transcription of ManifestEntry::schema(V2) over a single
    * ["null","int"] day partition field (manifest.rs:231-275 wrapping
    * DataFileV2::schema, manifest.rs:1087-1381). field-id props are
    * attributes Avro Java carries opaquely; names/order/unions are the
    * resolution-relevant parts. Upstream V2 has NO file_sequence_number
    * field — ours does (it defaults to null), which resolution must skip.
    */
  private val upstreamPartitionSchema =
    """{"type": "record","name": "r102","fields": [
      |  {"name": "day", "type": ["null","int"], "field-id": 1000, "default": null}
      |]}""".stripMargin

  private def upstreamIntMap(name: String, keyId: Int, valueType: String, valueId: Int): String =
    s"""["null",{"type":"array","logicalType":"map","items":{"type":"record","name":"$name",
       |"fields":[{"name":"key","type":"int","field-id":$keyId},
       |{"name":"value","type":"$valueType","field-id":$valueId}]}}]""".stripMargin

  private val upstreamManifestEntryV2: String =
    s"""{"type":"record","name":"manifest_entry","fields":[
       |{"name":"status","type":"int","field-id":0},
       |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
       |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
       |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
       |  {"name":"content","type":"int","field-id":134},
       |  {"name":"file_path","type":"string","field-id":100},
       |  {"name":"file_format","type":"string","field-id":101},
       |  {"name":"partition","type":$upstreamPartitionSchema,"field-id":102},
       |  {"name":"record_count","type":"long","field-id":103},
       |  {"name":"file_size_in_bytes","type":"long","field-id":104},
       |  {"name":"column_sizes","type":${upstreamIntMap("k117_v118", 117, "long", 118)},"default":null,"field-id":108},
       |  {"name":"value_counts","type":${upstreamIntMap("k119_v120", 119, "long", 120)},"default":null,"field-id":109},
       |  {"name":"null_value_counts","type":${upstreamIntMap("k121_v122", 121, "long", 122)},"default":null,"field-id":110},
       |  {"name":"nan_value_counts","type":${upstreamIntMap("k138_v139", 138, "long", 139)},"default":null,"field-id":137},
       |  {"name":"distinct_counts","type":${upstreamIntMap("k123_v124", 123, "long", 124)},"default":null,"field-id":111},
       |  {"name":"lower_bounds","type":${upstreamIntMap("k126_v127", 126, "bytes", 127)},"default":null,"field-id":125},
       |  {"name":"upper_bounds","type":${upstreamIntMap("k129_v130", 129, "bytes", 130)},"default":null,"field-id":128},
       |  {"name":"key_metadata","type":["null","bytes"],"default":null,"field-id":131},
       |  {"name":"split_offsets","type":["null",{"type":"array","items":"long","element-id":133}],"default":null,"field-id":132},
       |  {"name":"equality_ids","type":["null",{"type":"array","items":"int","element-id":136}],"default":null,"field-id":135},
       |  {"name":"sort_order_id","type":["null","int"],"default":null,"field-id":140}
       |]},"field-id":2}]}""".stripMargin

  /** manifest_list.rs:536-663 (V2), verbatim field set and order. */
  private val upstreamManifestListV2: String =
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"content","type":"int","field-id":517},
      |{"name":"sequence_number","type":"long","field-id":515},
      |{"name":"min_sequence_number","type":"long","field-id":516},
      |{"name":"added_snapshot_id","type":"long","field-id":503},
      |{"name":"added_files_count","type":"int","field-id":504},
      |{"name":"existing_files_count","type":"int","field-id":505},
      |{"name":"deleted_files_count","type":"int","field-id":506},
      |{"name":"added_rows_count","type":"long","field-id":512},
      |{"name":"existing_rows_count","type":"long","field-id":513},
      |{"name":"deleted_rows_count","type":"long","field-id":514},
      |{"name":"partitions","type":["null",{"type":"array","items":
      |  {"type":"record","name":"r508","fields":[
      |    {"name":"contains_null","type":"boolean","field-id":509},
      |    {"name":"contains_nan","type":["null","boolean"],"field-id":518},
      |    {"name":"lower_bound","type":["null","bytes"],"field-id":510},
      |    {"name":"upper_bound","type":["null","bytes"],"field-id":511}
      |  ]},"element-id":508}],"default":null,"field-id":507},
      |{"name":"key_metadata","type":["null","bytes"],"field-id":519}
      |]}""".stripMargin

  private val interopSchema = IceSchema(0, Seq(
    NestedField(1, "d", required = false, IceType.DateT),
    NestedField(2, "id", required = false, IceType.LongT)))
  private val interopSpec = PartitionSpec(0, Seq(
    PartitionField(1, 1000, "day", graft.core.Transform.Day)))

  // the vector: one data entry (the reference's own manifest.rs:1412-1436
  // test values) + one equality-delete entry exercising content,
  // equality_ids, explicit sequence numbers and both bounds maps
  private val leIntZero = Array[Byte](0, 0, 0, 0)
  private val leLongSeven = Array[Byte](7, 0, 0, 0, 0, 0, 0, 0)
  private def interopEntries = {
    import graft.table.ManifestModel._
    Seq(
      ManifestEntry(StatusAdded, Some(638933773299822130L), Some(1L), Some(1L),
        DataFile(ContentData, "/", "PARQUET", Seq("day" -> Int.box(1)),
          recordCount = 4, fileSizeInBytes = 1200,
          lowerBounds = Map(1 -> leIntZero))),
      ManifestEntry(StatusAdded, Some(638933773299822131L), Some(5L), Some(5L),
        DataFile(ContentEqualityDeletes, "/del-1.parquet", "PARQUET",
          Seq("day" -> Int.box(1)),
          recordCount = 2, fileSizeInBytes = 300,
          valueCounts = Map(2 -> 2L),
          lowerBounds = Map(2 -> leLongSeven),
          upperBounds = Map(2 -> leLongSeven),
          equalityIds = Seq(2))))
  }

  private def avroBytes(v: Any): Array[Byte] = {
    val b = v.asInstanceOf[java.nio.ByteBuffer].duplicate()
    val a = new Array[Byte](b.remaining()); b.get(a); a
  }

  test("our equality-delete manifest bytes decode under the upstream golden V2 entry schema") {
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileReader
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    import scala.jdk.CollectionConverters._

    val path = java.nio.file.Files.createTempDirectory("interop").resolve("m1.avro").toString
    graft.table.ManifestIO.writeManifest(path, interopSpec, interopSchema, interopEntries)

    val upstream = new Schema.Parser().parse(upstreamManifestEntryV2)
    // reader schema = upstream golden; writer schema from our file — this is
    // exactly the resolved read the reference's apache_avro::Reader performs
    val rdr = new DataFileReader[GenericRecord](new java.io.File(path),
      new GenericDatumReader[GenericRecord](null, upstream))
    val rows = try rdr.iterator().asScala.toList finally rdr.close()
    assert(rows.size == 2)

    val del = rows(1)
    assert(del.get("status") == 1)
    assert(del.get("snapshot_id") == 638933773299822131L)
    assert(del.get("sequence_number") == 5L)
    val df = del.get("data_file").asInstanceOf[GenericRecord]
    assert(df.get("content") == 2) // EQUALITY DELETES (manifest.rs:305-309)
    assert(df.get("file_path").toString == "/del-1.parquet")
    assert(df.get("file_format").toString == "PARQUET")
    assert(df.get("partition").asInstanceOf[GenericRecord].get("day") == 1)
    assert(df.get("record_count") == 2L)
    assert(df.get("equality_ids").asInstanceOf[java.util.Collection[Int]].asScala.toSeq == Seq(2))
    val lb = df.get("lower_bounds").asInstanceOf[java.util.Collection[_]].asScala.map { e =>
      val r = e.asInstanceOf[GenericRecord]
      r.get("key").asInstanceOf[Int] -> avroBytes(r.get("value")).toSeq
    }.toMap
    assert(lb == Map(2 -> leLongSeven.toSeq))

    val data = rows.head
    val ddf = data.get("data_file").asInstanceOf[GenericRecord]
    assert(data.get("sequence_number") == 1L && ddf.get("content") == 0)
    assert(ddf.get("record_count") == 4L && ddf.get("file_size_in_bytes") == 1200L)
    assert(avroBytes(ddf.get("lower_bounds").asInstanceOf[java.util.Collection[_]]
      .asScala.head.asInstanceOf[GenericRecord].get("value")).toSeq == leIntZero.toSeq)
  }

  test("an upstream-written equality-delete manifest (no file_sequence_number) reads into our model") {
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

    val upstream = new Schema.Parser().parse(upstreamManifestEntryV2)
    val dfs = upstream.getField("data_file").schema()
    val ps = dfs.getField("partition").schema()
    val rec = new GenericData.Record(upstream)
    rec.put("status", 1)
    rec.put("snapshot_id", 99L)
    rec.put("sequence_number", 7L)
    val d = new GenericData.Record(dfs)
    d.put("content", 2)
    d.put("file_path", "/up-del.parquet")
    d.put("file_format", "PARQUET")
    val pr = new GenericData.Record(ps)
    pr.put("day", Int.box(3))
    d.put("partition", pr)
    d.put("record_count", 9L)
    d.put("file_size_in_bytes", 400L)
    val eqSchema = dfs.getField("equality_ids").schema().getTypes.get(1)
    val eq = new GenericData.Array[java.lang.Integer](1, eqSchema)
    eq.add(Int.box(2))
    d.put("equality_ids", eq)
    val lbSchema = dfs.getField("lower_bounds").schema().getTypes.get(1)
    val lbe = new GenericData.Record(lbSchema.getElementType)
    lbe.put("key", 2); lbe.put("value", java.nio.ByteBuffer.wrap(leLongSeven))
    val lb = new GenericData.Array[GenericRecord](1, lbSchema)
    lb.add(lbe)
    d.put("lower_bounds", lb)
    rec.put("data_file", d)

    val path = java.nio.file.Files.createTempDirectory("interop").resolve("m2.avro").toString
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](upstream))
    val f = new java.io.File(path); f.getParentFile.mkdirs()
    w.create(upstream, f)
    try w.append(rec) finally w.close()

    val entries = graft.table.ManifestIO.readManifest(path)
    assert(entries.size == 1)
    val e = entries.head
    assert(e.status == graft.table.ManifestModel.StatusAdded)
    assert(e.snapshotId.contains(99L) && e.sequenceNumber.contains(7L))
    assert(e.fileSequenceNumber.isEmpty) // upstream V2 carries no such field
    val x = e.dataFile
    assert(x.content == graft.table.ManifestModel.ContentEqualityDeletes)
    assert(x.filePath == "/up-del.parquet" && x.fileFormat == "PARQUET")
    assert(x.partition == Seq("day" -> 3))
    assert(x.recordCount == 9L && x.fileSizeInBytes == 400L)
    assert(x.equalityIds == Seq(2))
    assert(x.lowerBounds.view.mapValues(_.toSeq).toMap == Map(2 -> leLongSeven.toSeq))
    assert(x.upperBounds.isEmpty && x.splitOffsets.isEmpty && x.sortOrderId.isEmpty)
  }

  test("deletes manifest-list entries cross the upstream golden V2 list schema both ways") {
    import org.apache.avro.Schema
    import org.apache.avro.file.{DataFileReader, DataFileWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
    import scala.jdk.CollectionConverters._
    import graft.table.ManifestModel._

    val upstream = new Schema.Parser().parse(upstreamManifestListV2)
    val ours = ManifestListEntry(
      manifestPath = "/m1.avro", manifestLength = 1234, partitionSpecId = 0,
      content = 1, sequenceNumber = 5, minSequenceNumber = 5,
      addedSnapshotId = 638933773299822131L,
      addedFilesCount = 1, existingFilesCount = 0, deletedFilesCount = 0,
      addedRowsCount = 2, existingRowsCount = 0, deletedRowsCount = 0,
      partitions = Seq(FieldSummary(containsNull = false, containsNan = Some(false),
        lowerBound = Some(leIntZero), upperBound = Some(leIntZero))))

    // ours → upstream reader schema
    val dir = java.nio.file.Files.createTempDirectory("interop")
    val p1 = dir.resolve("ml1.avro").toString
    graft.table.ManifestIO.writeManifestList(p1, Seq(ours))
    val rdr = new DataFileReader[GenericRecord](new java.io.File(p1),
      new GenericDatumReader[GenericRecord](null, upstream))
    val row = try rdr.iterator().asScala.toList.head finally rdr.close()
    assert(row.get("content") == 1) // deletes manifest
    assert(row.get("sequence_number") == 5L && row.get("min_sequence_number") == 5L)
    assert(row.get("added_snapshot_id") == 638933773299822131L)
    val part = row.get("partitions").asInstanceOf[java.util.Collection[_]]
      .asScala.head.asInstanceOf[GenericRecord]
    assert(part.get("contains_null") == false)
    assert(avroBytes(part.get("lower_bound")).toSeq == leIntZero.toSeq)

    // upstream writer → our reader
    val rec = new GenericData.Record(upstream)
    rec.put("manifest_path", "/m2.avro"); rec.put("manifest_length", 99L)
    rec.put("partition_spec_id", 0); rec.put("content", 1)
    rec.put("sequence_number", 8L); rec.put("min_sequence_number", 8L)
    rec.put("added_snapshot_id", 42L)
    rec.put("added_files_count", 1); rec.put("existing_files_count", 0)
    rec.put("deleted_files_count", 0)
    rec.put("added_rows_count", 3L); rec.put("existing_rows_count", 0L)
    rec.put("deleted_rows_count", 0L)
    val p2 = dir.resolve("ml2.avro").toString
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](upstream))
    w.create(upstream, new java.io.File(p2))
    try w.append(rec) finally w.close()
    val back = graft.table.ManifestIO.readManifestList(p2)
    assert(back == Seq(ManifestListEntry("/m2.avro", 99L, 0, 1, 8L, 8L, 42L,
      1, 0, 0, 3L, 0L, 0L, Nil)))
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
