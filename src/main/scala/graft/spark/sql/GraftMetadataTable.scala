package graft.spark.sql

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.table.IceTable

/** Iceberg-style metadata tables: `SELECT * FROM graft.db.t.snapshots`
  * (also `history`, `files`, `manifests`, `refs`) — the inspection surface
  * every Iceberg deployment leans on for debugging and ops. Driver-side and
  * O(manifests): rows come from the already-loaded metadata / manifest
  * caches, never from data files. Reads are served by [[GraftExtensions]]'s
  * optimizer rule, which inlines the rows as a local relation.
  */
class GraftMetadataTable(@transient val ice: IceTable, val kind: String)
    extends Table with SupportsRead {

  override def name(): String = s"${ice.ident}.$kind"

  override def schema(): StructType = GraftMetadataTable.schemaOf(kind)

  override def capabilities(): util.Set[TableCapability] =
    util.Collections.singleton(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    SchemaOnlyScan.builder(() => schema(), s"graft metadata scan ${name()}")
}

/** DESCRIBE (DescribeTableExec.addTableStats) probes the scan builder on
  * every SupportsRead table — this serves a schema-only scan; actual reads
  * are planned by GraftExtensions, so toBatch only fires on a misconfigured
  * session and keeps the actionable error.
  */
private[sql] object SchemaOnlyScan {
  def builder(schemaThunk: () => StructType, desc: String): ScanBuilder =
    () => new org.apache.spark.sql.connector.read.Scan {
      override def readSchema(): StructType = schemaThunk()
      override def description(): String = desc
      override def toBatch: org.apache.spark.sql.connector.read.Batch =
        throw new UnsupportedOperationException(
          "graft reads require GraftExtensions (spark.sql.extensions=graft.spark.sql.GraftExtensions)")
    }
}

object GraftMetadataTable {
  val Kinds: Set[String] =
    Set("snapshots", "history", "files", "manifests", "refs", "partitions", "entries",
      "all_data_files", "all_delete_files", "all_files", "all_manifests",
      "metadata_log_entries")

  def schemaOf(kind: String): StructType = kind match {
    case "snapshots" => StructType(Seq(
      StructField("committed_at", TimestampType),
      StructField("snapshot_id", LongType, nullable = false),
      StructField("parent_id", LongType),
      StructField("sequence_number", LongType, nullable = false),
      StructField("operation", StringType),
      StructField("manifest_list", StringType),
      StructField("total_records", LongType),
      StructField("total_data_files", LongType)))
    case "history" => StructType(Seq(
      StructField("made_current_at", TimestampType),
      StructField("snapshot_id", LongType, nullable = false),
      StructField("is_current_ancestor", BooleanType, nullable = false)))
    case "files" => StructType(Seq(
      StructField("content", IntegerType, nullable = false),
      StructField("file_path", StringType),
      StructField("file_format", StringType),
      StructField("partition", StringType),
      StructField("record_count", LongType, nullable = false),
      StructField("file_size_in_bytes", LongType, nullable = false),
      StructField("sequence_number", LongType),
      StructField("null_value_counts", StringType),
      StructField("lower_bounds", StringType),
      StructField("upper_bounds", StringType)))
    case "manifests" => StructType(Seq(
      StructField("path", StringType),
      StructField("length", LongType, nullable = false),
      StructField("partition_spec_id", IntegerType, nullable = false),
      StructField("content", IntegerType, nullable = false),
      StructField("added_snapshot_id", LongType, nullable = false),
      StructField("added_data_files_count", IntegerType, nullable = false),
      StructField("existing_data_files_count", IntegerType, nullable = false),
      StructField("deleted_data_files_count", IntegerType, nullable = false)))
    case "refs" => StructType(Seq(
      StructField("name", StringType),
      StructField("type", StringType),
      StructField("snapshot_id", LongType, nullable = false),
      StructField("max_ref_age_ms", LongType),
      StructField("min_snapshots_to_keep", IntegerType)))
    case "entries" => StructType(Seq(
      StructField("status", IntegerType, nullable = false),
      StructField("snapshot_id", LongType),
      StructField("sequence_number", LongType),
      StructField("file_sequence_number", LongType),
      StructField("content", IntegerType, nullable = false),
      StructField("file_path", StringType),
      StructField("partition", StringType),
      StructField("record_count", LongType, nullable = false),
      StructField("equality_ids", StringType)))
    case "all_data_files" | "all_delete_files" | "all_files" => StructType(Seq(
      StructField("reference_snapshot_id", LongType, nullable = false),
      StructField("content", IntegerType, nullable = false),
      StructField("file_path", StringType),
      StructField("file_format", StringType),
      StructField("partition", StringType),
      StructField("record_count", LongType, nullable = false),
      StructField("file_size_in_bytes", LongType, nullable = false),
      StructField("sequence_number", LongType)))
    case "all_manifests" => StructType(Seq(
      StructField("reference_snapshot_id", LongType, nullable = false),
      StructField("path", StringType),
      StructField("length", LongType, nullable = false),
      StructField("partition_spec_id", IntegerType, nullable = false),
      StructField("content", IntegerType, nullable = false),
      StructField("added_snapshot_id", LongType, nullable = false)))
    case "metadata_log_entries" => StructType(Seq(
      StructField("timestamp", TimestampType),
      StructField("file", StringType),
      StructField("latest_snapshot_id", LongType)))
    case "partitions" => StructType(Seq(
      StructField("partition", StringType),
      StructField("spec_id", IntegerType, nullable = false),
      StructField("record_count", LongType, nullable = false),
      StructField("file_count", IntegerType, nullable = false),
      StructField("total_data_file_size_in_bytes", LongType, nullable = false),
      StructField("position_delete_file_count", IntegerType, nullable = false),
      StructField("equality_delete_file_count", IntegerType, nullable = false),
      StructField("last_sequence_number", LongType)))
    case other => throw new IllegalArgumentException(s"unknown metadata table $other")
  }

  /** Canonical partition-tuple rendering shared by files/entries/partitions. */
  private def renderPartition(d: graft.table.ManifestModel.DataFile): String =
    d.partition.map { case (k, v) => s"$k=$v" }.mkString("{", ", ", "}")

  /** Materializes the metadata rows — driver-side, O(manifests). */
  def rows(spark: SparkSession, ice: IceTable, kind: String): DataFrame = {
    val m = ice.metadata
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val data: Seq[Row] = kind match {
      case "snapshots" =>
        m.snapshots.values.toSeq.sortBy(_.sequenceNumber).map { s =>
          Row(ts(s.timestampMs), s.snapshotId, s.parentSnapshotId.orNull,
            s.sequenceNumber, s.summary.get("operation").orNull, s.manifestList,
            s.summary.get("total-records").map(_.toLong).orNull,
            s.summary.get("total-data-files").map(_.toLong).orNull)
        }
      case "history" =>
        // ancestry of the CURRENT snapshot via the parent chain
        val ancestors = m.currentSnapshot(None)
          .map(s => m.ancestorsOf(s.snapshotId).toSet).getOrElse(Set.empty[Long])
        m.snapshotLog.map { e =>
          Row(ts(e.timestampMs), e.snapshotId, ancestors.contains(e.snapshotId))
        }
      case "files" =>
        // per-column metrics render as {name=value} maps decoded from the
        // Iceberg single-value byte encodings — the human-readable form of
        // what statistics pruning consumes
        val schema = ice.metadata.currentSchema
        def renderById[A](kv: Map[Int, A])(show: (graft.spec.NestedField, A) => String): String =
          if (kv.isEmpty) null
          else kv.toSeq.flatMap { case (id, v) =>
            schema.fieldById(id).map(f => s"${f.name}=${show(f, v)}")
          }.sorted.mkString("{", ", ", "}")
        ice.currentSnapshot(None).toSeq.flatMap(ice.entries(_)).map { e =>
          val d = e.dataFile
          val part = renderPartition(d)
          Row(d.content, d.filePath, d.fileFormat, part, d.recordCount,
            d.fileSizeInBytes, e.sequenceNumber.orNull,
            renderById(d.nullValueCounts)((_, n) => n.toString),
            renderById(d.lowerBounds)((f, b) =>
              String.valueOf(graft.core.ValueCodec.fromBytes(f.fieldType, b))),
            renderById(d.upperBounds)((f, b) =>
              String.valueOf(graft.core.ValueCodec.fromBytes(f.fieldType, b))))
        }
      case "manifests" =>
        ice.currentSnapshot(None).toSeq.flatMap(ice.manifests(_)).map { ml =>
          Row(ml.manifestPath, ml.manifestLength, ml.partitionSpecId, ml.content,
            ml.addedSnapshotId, ml.addedFilesCount, ml.existingFilesCount,
            ml.deletedFilesCount)
        }
      case "refs" =>
        m.refs.toSeq.sortBy(_._1).map { case (name, r) =>
          Row(name, r.refType, r.snapshotId, r.maxRefAgeMs.orNull,
            r.minSnapshotsToKeep.orNull)
        }
      case "entries" =>
        // raw manifest entries at the current snapshot (inheritance applied,
        // deletes included) — the merge-on-read debugging surface: which
        // delete file masks which sequence range
        ice.currentSnapshot(None).toSeq.flatMap(ice.entries(_)).map { e =>
          val d = e.dataFile
          Row(e.status, e.snapshotId.orNull, e.sequenceNumber.orNull,
            e.fileSequenceNumber.orNull, d.content, d.filePath,
            renderPartition(d),
            d.recordCount,
            if (d.equalityIds.isEmpty) null else d.equalityIds.mkString(","))
        }
      case "all_data_files" | "all_delete_files" | "all_files" =>
        // files across EVERY valid snapshot (time-travel surface): one row
        // per (snapshot, file) reference, so a file alive in k snapshots
        // appears k times — matching the upstream contract ("may contain
        // duplicates"); dedupe with DISTINCT file_path when needed.
        // Upstream semantics: all_data_files excludes delete files,
        // all_delete_files is only them, all_files is both.
        val want: Int => Boolean = kind match {
          case "all_data_files" => _ == 0
          case "all_delete_files" => _ != 0
          case _ => _ => true
        }
        m.snapshots.values.toSeq.sortBy(_.sequenceNumber).flatMap { s =>
          ice.entries(s).filter(e => want(e.dataFile.content)).map { e =>
            val d = e.dataFile
            Row(s.snapshotId, d.content, d.filePath, d.fileFormat,
              renderPartition(d), d.recordCount, d.fileSizeInBytes,
              e.sequenceNumber.orNull)
          }
        }
      case "all_manifests" =>
        m.snapshots.values.toSeq.sortBy(_.sequenceNumber).flatMap { s =>
          ice.manifests(s).map { ml =>
            Row(s.snapshotId, ml.manifestPath, ml.manifestLength,
              ml.partitionSpecId, ml.content, ml.addedSnapshotId)
          }
        }
      case "metadata_log_entries" =>
        // latest_snapshot_id = the newest snapshot committed at or before
        // the metadata write (the snapshot that metadata version made
        // current), from the snapshot log
        m.metadataLog.map { e =>
          val latest = m.snapshotLog.filter(_.timestampMs <= e.timestampMs)
            .lastOption.map(_.snapshotId)
          Row(ts(e.timestampMs), e.metadataFile, latest.orNull)
        }
      case "partitions" =>
        // per-partition rollup of the live entries (data + delete files),
        // grouped on (spec id, rendered partition tuple) — after spec
        // evolution the spec_id column is what tells layouts apart, so each
        // entry carries its own MANIFEST's spec id, not the default;
        // record counts are pre-delete-masking
        val tagged: Seq[(Int, graft.table.ManifestModel.ManifestEntry)] =
          ice.currentSnapshot(None).toSeq.flatMap { s =>
            ice.manifests(s).flatMap { ml =>
              ice.entries(s, manifestFilter = _.manifestPath == ml.manifestPath)
                .map(ml.partitionSpecId -> _)
            }
          }
        tagged.groupBy { case (sid, e) =>
            (sid, renderPartition(e.dataFile))
          }
          .toSeq.sortBy { case ((sid, p), _) => (p, sid) }
          .map { case ((sid, part), tes) =>
            val es = tes.map(_._2)
            val data = es.filter(_.dataFile.content == 0)
            Row(part, sid, data.map(_.dataFile.recordCount).sum,
              data.size, data.map(_.dataFile.fileSizeInBytes).sum,
              es.count(_.dataFile.content == 1), es.count(_.dataFile.content == 2),
              es.flatMap(_.sequenceNumber).maxOption.orNull)
          }
      case other => throw new IllegalArgumentException(s"unknown metadata table $other")
    }
    spark.createDataFrame(data.asJava, schemaOf(kind))
  }
}
