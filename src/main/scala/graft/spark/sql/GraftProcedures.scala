package graft.spark.sql

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

import graft.catalog.{CommitTable, TableIdent, TableRequirement, TableUpdate}
import graft.table.{IceTable, Maintenance}

/** SQL maintenance procedures (DSv2 `ProcedureCatalog`): the ops surface a
  * table format needs day-2 —
  *
  * {{{
  *   CALL graft.system.expire_snapshots(`table` => 'db.t', retain_last => 3)
  *   CALL graft.system.compact(`table` => 'db.t')
  *   CALL graft.system.compact_zorder(`table` => 'db.t', columns => 'a,b')
  *   CALL graft.system.rollback_to_snapshot(`table` => 'db.t', snapshot_id => 42)
  * }}}
  *
  * Each wraps the programmatic [[graft.table.Maintenance]] /
  * commit-protocol entry points (reference: the transaction surface of
  * iceberg-rust/src/table/mod.rs:359-411 — the reference exposes these only
  * as library calls; the SQL surface is Spark-side value-add) and returns a
  * one-row summary relation. Work is driver-orchestrated but data movement
  * (compaction rewrite) runs as ordinary distributed Spark jobs.
  */
object GraftProcedures {

  def names: Seq[String] =
    Seq("expire_snapshots", "compact", "compact_zorder", "rollback_to_snapshot",
      "create_tag", "create_branch", "drop_ref", "add_files", "remove_orphan_files",
      "fast_forward", "rewrite_manifests", "compute_stats", "ancestors_of",
      "create_changelog_view", "rewrite_data_files", "rollback_to_timestamp",
      "rewrite_position_delete_files", "convert_equality_deletes",
      "register_table", "cherrypick_snapshot")

  def load(cat: GraftSparkCatalog, name: String): UnboundProcedure = name match {
    case "expire_snapshots" => new ExpireSnapshots(cat)
    case "compact" => new Compact(cat)
    case "compact_zorder" => new CompactZOrder(cat)
    case "rollback_to_snapshot" => new RollbackToSnapshot(cat)
    case "create_tag" => new CreateRef(cat, "create_tag", "tag")
    case "create_branch" => new CreateRef(cat, "create_branch", "branch")
    case "drop_ref" => new DropRef(cat)
    case "add_files" => new AddFiles(cat)
    case "remove_orphan_files" => new RemoveOrphanFiles(cat)
    case "fast_forward" => new FastForward(cat)
    case "rewrite_manifests" => new RewriteManifests(cat)
    case "compute_stats" => new ComputeStats(cat)
    case "ancestors_of" => new AncestorsOf(cat)
    case "create_changelog_view" => new CreateChangelogView(cat)
    case "rewrite_data_files" => new RewriteDataFiles(cat)
    case "rollback_to_timestamp" => new RollbackToTimestamp(cat)
    case "rewrite_position_delete_files" => new RewritePositionDeleteFiles(cat)
    case "convert_equality_deletes" => new ConvertEqualityDeletes(cat)
    case "register_table" => new RegisterTable(cat)
    case "cherrypick_snapshot" => new CherrypickSnapshot(cat)
    case other => throw new IllegalArgumentException(
      s"unknown procedure $other (available: ${names.mkString(", ")})")
  }

  def identifiers(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      names.map(Identifier.of(Array("system"), _)).toArray
    else Array.empty

  private abstract class GraftProcedure(cat: GraftSparkCatalog,
                                        procName: String,
                                        params: Seq[ProcedureParameter],
                                        resultSchema: StructType)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false

    /** Args arrive in `parameters()` order, defaults already applied. */
    protected def run(spark: SparkSession, args: InternalRow): InternalRow =
      throw new UnsupportedOperationException(s"$procName must override run or runRows")

    /** Multi-row results (e.g. lineage listings) override this instead. */
    protected def runRows(spark: SparkSession, args: InternalRow): Array[InternalRow] =
      Array(run(spark, args))

    override def call(input: InternalRow): util.Iterator[Scan] = {
      val out = runRows(SparkSession.active, input)
      util.Collections.singletonList[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = out
        override def readSchema(): StructType = resultSchema
        override def description(): String = s"graft procedure $procName result"
      }).iterator()
    }

    protected def table(args: InternalRow): IceTable = {
      val ident = TableIdent.parse(args.getUTF8String(0).toString)
      cat.catalog.loadTable(ident).getOrElse(
        throw new IllegalArgumentException(s"no such table: $ident"))
    }
  }

  private final class ExpireSnapshots(cat: GraftSparkCatalog)
      extends GraftProcedure(cat, "expire_snapshots",
        Seq(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("retain_last", IntegerType).defaultValue("1").build()),
        StructType(Seq(
          StructField("expired_snapshots", LongType, nullable = false),
          StructField("remaining_snapshots", LongType, nullable = false)))) {
    override def description(): String =
      "Expire all but the newest N snapshots (branch/tag retention honored) and delete unreachable files"
    override protected def run(spark: SparkSession, args: InternalRow): InternalRow = {
      val t = table(args)
      val before = t.metadata.snapshots.size
      Maintenance.expireSnapshots(spark, t, keepLast = args.getInt(1))
      val after = t.metadata.snapshots.size
      InternalRow((before - after).toLong, after.toLong)
    }
  }

  private final class Compact(cat: GraftSparkCatalog)
      extends GraftProcedure(cat, "compact",
        Seq(ProcedureParameter.in("table", StringType).build()),
        StructType(Seq(
          StructField("files_before", LongType, nullable = false),
          StructField("files_after", LongType, nullable = false)))) {
    override def description(): String =
      "Rewrite current content as one balanced file set and drop superseded files"
    override protected def run(spark: SparkSession, args: InternalRow): InternalRow = {
      val t = table(args)
      val before = t.currentSnapshot(None).map(t.dataFiles(_).size).getOrElse(0)
      val after = Maintenance.compact(spark, t)
      InternalRow(before.toLong,
        after.currentSnapshot(None).map(after.dataFiles(_).size).getOrElse(0).toLong)
    }
  }

  private final class CompactZOrder(cat: GraftSparkCatalog)
      extends GraftProcedure(cat, "compact_zorder",
        Seq(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("columns", StringType).build()),
        StructType(Seq(
          StructField("files_before", LongType, nullable = false),
          StructField("files_after", LongType, nullable = false)))) {
    override def description(): String =
      "Rewrite current content z-order-clustered on the given comma-separated columns"
    override protected def run(spark: SparkSession, args: InternalRow): InternalRow = {
      val t = table(args)
      val cols = args.getUTF8String(1).toString.split(',').map(_.trim).filter(_.nonEmpty)
      require(cols.nonEmpty, "compact_zorder requires at least one column")
      val before = t.currentSnapshot(None).map(t.dataFiles(_).size).getOrElse(0)
      val after = Maintenance.compactZOrder(spark, t, cols.toSeq)
      InternalRow(before.toLong,
        after.currentSnapshot(None).map(after.dataFiles(_).size).getOrElse(0).toLong)
    }
  }

  private final class RollbackToSnapshot(cat: GraftSparkCatalog)
      extends GraftProcedure(cat, "rollback_to_snapshot",
        Seq(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("snapshot_id", LongType).build()),
        StructType(Seq(
          StructField("previous_snapshot_id", LongType),
          StructField("current_snapshot_id", LongType, nullable = false)))) {
    override def description(): String =
      "Point the main branch back at an existing snapshot (time-travel state becomes current)"
    override protected def run(spark: SparkSession, args: InternalRow): InternalRow = {
      val t = table(args)
      val target = args.getLong(1)
      require(t.snapshotById(target).isDefined,
        s"table ${t.ident} has no snapshot $target")
      val m = t.metadata
      val prev = m.currentSnapshotId
      // CAS on the main ref: a concurrent commit between load and rollback
      // fails the requirement instead of silently clobbering it
      t.metadata = t.catalog.updateTable(CommitTable(t.ident,
        Seq(TableRequirement.AssertRefSnapshotId(m.MainBranch, prev)),
        Seq(TableUpdate.SetSnapshotRef(m.MainBranch, target, "branch",
          m.refs.get(m.MainBranch).flatMap(_.maxRefAgeMs),
          m.refs.get(m.MainBranch).flatMap(_.minSnapshotsToKeep)))))
      InternalRow(prev.map(Long.box).orNull, target)
    }
  }

  /** Tag or branch creation: `CALL graft.system.create_tag(table => 'db.t',
    * name => 'v1', snapshot_id => 42)` (snapshot_id defaults to current).
    * Refs protect their snapshots from expiration (T7 retention rules). */
  private final class CreateRef(cat: GraftSparkCatalog, procName: String, refType: String)
      extends GraftProcedure(cat, procName,
        Seq(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("name", StringType).build(),
          ProcedureParameter.in("snapshot_id", LongType).defaultValue("-1").build()),
        StructType(Seq(
          StructField("ref_name", StringType, nullable = false),
          StructField("snapshot_id", LongType, nullable = false)))) {
    override def description(): String = s"Create a $refType pointing at a snapshot (default: current)"
    override protected def run(spark: SparkSession, args: InternalRow): InternalRow = {
      val t = table(args)
      val refName = args.getUTF8String(1).toString
      val m = t.metadata
      val target = args.getLong(2) match {
        case -1L => m.currentSnapshotId.getOrElse(
          throw new IllegalStateException(s"table ${t.ident} has no current snapshot"))
        case id => id
      }
      require(t.snapshotById(target).isDefined, s"table ${t.ident} has no snapshot $target")
      require(!m.refs.contains(refName), s"ref $refName already exists")
      // the requirement asserts the REF is still absent at commit time (not
      // just in the locally loaded metadata): two concurrent create_tag('v1')
      // calls race the CAS and the loser fails instead of silently
      // overwriting the winner's snapshot pointer
      t.metadata = t.catalog.updateTable(CommitTable(t.ident,
        Seq(TableRequirement.AssertRefSnapshotId(refName, None)),
        Seq(TableUpdate.SetSnapshotRef(refName, target, refType))))
      InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(refName), target)
    }
  }

  private final class DropRef(cat: GraftSparkCatalog)
      extends GraftProcedure(cat, "drop_ref",
        Seq(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("name", StringType).build()),
        StructType(Seq(StructField("dropped", StringType, nullable = false)))) {
    override def description(): String = "Drop a tag or branch (its snapshots lose expiration protection)"
    override protected def run(spark: SparkSession, args: InternalRow): InternalRow = {
      val t = table(args)
      val refName = args.getUTF8String(1).toString
      val m = t.metadata
      require(m.refs.contains(refName), s"no such ref: $refName")
      require(refName != m.MainBranch, "cannot drop the main branch")
      // assert the ref still points where we saw it: a concurrent move of
      // the same ref (e.g. fast_forward) surfaces as a conflict, not a drop
      // of a snapshot pointer we never observed
      t.metadata = t.catalog.updateTable(CommitTable(t.ident,
        Seq(TableRequirement.AssertRefSnapshotId(refName, Some(m.refs(refName).snapshotId))),
        Seq(TableUpdate.RemoveSnapshotRef(refName))))
      InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(refName))
    }
  }

  /** Time-based rollback: `CALL graft.system.rollback_to_timestamp(table =>
    * 'db.t', timestamp_ms => 1700000000000)` points main at the newest
    * snapshot made current at or before the timestamp (same CAS guard as
    * rollback_to_snapshot). */
  private final class RollbackToTimestamp(cat: GraftSparkCatalog)
      extends GraftProcedure(cat, "rollback_to_timestamp",
        Seq(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("timestamp_ms", LongType).build()),
        StructType(Seq(
          StructField("previous_snapshot_id", LongType),
          StructField("current_snapshot_id", LongType, nullable = false)))) {
    override def description(): String =
      "Point the main branch at the newest snapshot at or before a timestamp (ms)"
    override protected def run(spark: SparkSession, args: InternalRow): InternalRow = {
      val t = table(args)
      val tsMs = args.getLong(1)
      val m = t.metadata
      val target = m.snapshotLog.filter(_.timestampMs <= tsMs).lastOption
        .map(_.snapshotId)
        .filter(id => t.snapshotById(id).isDefined)
        .getOrElse(throw new IllegalArgumentException(
          s"table ${t.ident} has no live snapshot at or before $tsMs ms"))
      val prev = m.currentSnapshotId
      t.metadata = t.catalog.updateTable(CommitTable(t.ident,
        Seq(TableRequirement.AssertRefSnapshotId(m.MainBranch, prev)),
        Seq(TableUpdate.SetSnapshotRef(m.MainBranch, target, "branch",
          m.refs.get(m.MainBranch).flatMap(_.maxRefAgeMs),
          m.refs.get(m.MainBranch).flatMap(_.minSnapshotsToKeep)))))
      InternalRow(prev.map(Long.box).orNull, target)
    }
  }

  /** Selective binpack compaction: `CALL graft.system.rewrite_data_files(
    * table => 'db.t' [, target_size_bytes => N, min_input_files => K])`
    * rewrites only each partition's small-file residue; well-sized files
    * are untouched (the 100 TB-safe alternative to full `compact`). */
  private final class RewriteDataFiles(cat: GraftSparkCatalog)
      extends GraftProcedure(cat, "rewrite_data_files",
        Seq(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("target_size_bytes", LongType).defaultValue("134217728").build(),
          ProcedureParameter.in("min_input_files", IntegerType).defaultValue("2").build()),
        StructType(Seq(
          StructField("files_before", LongType, nullable = false),
          StructField("files_after", LongType, nullable = false)))) {
    override def description(): String =
      "Binpack-compact small files per partition (full files untouched; run compact for MoR tables)"
    override protected def run(spark: SparkSession, args: InternalRow): InternalRow = {
      val (before, after) = Maintenance.rewriteDataFiles(spark, table(args),
        targetSizeBytes = args.getLong(1), minInputFiles = args.getInt(2))
      InternalRow(before.toLong, after.toLong)
    }
  }

  /** Positional-delete compaction: `CALL graft.system.
    * rewrite_position_delete_files(table => 'db.t')` consolidates the
    * per-DELETE positional delete files into one balanced set and drops
    * rows referencing no-longer-live data files — MoR read cost returns to
    * O(1) anti-join inputs. */
  private final class RewritePositionDeleteFiles(cat: GraftSparkCatalog)
      extends GraftProcedure(cat, "rewrite_position_delete_files",
        Seq(ProcedureParameter.in("table", StringType).build()),
        StructType(Seq(
          StructField("files_before", LongType, nullable = false),
          StructField("files_after", LongType, nullable = false),
          StructField("dangling_rows_dropped", LongType, nullable = false)))) {
    override def description(): String =
      "Consolidate positional delete files and drop masks for dead data files"
    override protected def run(spark: SparkSession, args: InternalRow): InternalRow = {
      val (before, after, dropped) = Maintenance.rewritePositionDeleteFiles(spark, table(args))
      InternalRow(before.toLong, after.toLong, dropped)
    }
  }

  private final class ConvertEqualityDeletes(cat: GraftSparkCatalog)
      extends GraftProcedure(cat, "convert_equality_deletes",
        Seq(ProcedureParameter.in("table", StringType).build()),
        StructType(Seq(
          StructField("equality_files_before", LongType, nullable = false),
          StructField("position_files_after", LongType, nullable = false),
          StructField("positions_written", LongType, nullable = false)))) {
    override def description(): String =
      "Convert equality deletes to positional deletes (collapses the MoR " +
        "scan's per-sequence-point anti-join fold to one positional mask)"
    override protected def run(spark: SparkSession, args: InternalRow): InternalRow = {
      val (eq, pos, n) = Maintenance.convertEqualityDeletes(spark, table(args))
      InternalRow(eq.toLong, pos.toLong, n)
    }
  }

  /** Snapshot lineage listing: `CALL graft.system.ancestors_of(table =>
    * 'db.t' [, snapshot_id => 42])` — the parent chain newest-first from the
    * given (default current) snapshot. */
  private final class AncestorsOf(cat: GraftSparkCatalog)
      extends GraftProcedure(cat, "ancestors_of",
        Seq(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("snapshot_id", LongType).defaultValue("-1").build()),
        StructType(Seq(
          StructField("snapshot_id", LongType, nullable = false),
          StructField("committed_at", TimestampType)))) {
    override def description(): String =
      "List the parent-chain ancestors of a snapshot (default: current), newest first"
    override protected def runRows(spark: SparkSession, args: InternalRow): Array[InternalRow] = {
      val t = table(args)
      val m = t.metadata
      val start = args.getLong(1) match {
        case -1L => m.currentSnapshotId.getOrElse(return Array.empty)
        case id => id
      }
      require(t.snapshotById(start).isDefined, s"table ${t.ident} has no snapshot $start")
      m.ancestorsOf(start).map { id =>
        InternalRow(id, m.snapshots.get(id).map(_.timestampMs * 1000L).map(Long.box).orNull)
      }.toArray
    }
  }

  /** CDC as SQL: `CALL graft.system.create_changelog_view(table => 'db.t',
    * after_snapshot_id => 42 [, until_snapshot_id => 43]
    * [, view_name => 'v'] [, with_updates => true])` registers a temp view
    * of the row changes in (after, until] with a `_change_type` column —
    * net insert/delete by value diff, or, with `with_updates` on a
    * row-lineage table, `update_before`/`update_after` pairs keyed by
    * `_row_id` ([[graft.spark.IceScan.changelogWithUpdates]]); append-only
    * windows stream straight off the new files with no diff. */
  private final class CreateChangelogView(cat: GraftSparkCatalog)
      extends GraftProcedure(cat, "create_changelog_view",
        Seq(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("after_snapshot_id", LongType).build(),
          ProcedureParameter.in("until_snapshot_id", LongType).defaultValue("-1").build(),
          ProcedureParameter.in("view_name", StringType).defaultValue("''").build(),
          ProcedureParameter.in("with_updates", BooleanType).defaultValue("false").build()),
        StructType(Seq(StructField("view_name", StringType, nullable = false)))) {
    override def description(): String =
      "Register a temp view of row changes between two snapshots (_change_type; " +
        "with_updates pairs rewrites by _row_id on row-lineage tables)"
    override protected def run(spark: SparkSession, args: InternalRow): InternalRow = {
      val t = table(args)
      val until = args.getLong(2) match { case -1L => None; case id => Some(id) }
      val requested = if (args.isNullAt(3)) "" else args.getUTF8String(3).toString
      val viewName = if (requested.isEmpty) s"${t.ident.name}_changes" else requested
      val withUpdates = !args.isNullAt(4) && args.getBoolean(4)
      val changes =
        if (withUpdates) graft.spark.IceScan.changelogWithUpdates(spark, t, args.getLong(1), until)
        else graft.spark.IceScan.changelog(spark, t, args.getLong(1), until)
      changes.createOrReplaceTempView(viewName)
      InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(viewName))
    }
  }

  /** In-place import of existing parquet: `CALL graft.system.add_files(
    * table => 'db.t', source_dir => '/data/legacy')` — no copy, no rewrite;
    * the table becomes name-mapped for reads (see [[graft.spark.IceWrite.addFiles]]). */
  private final class AddFiles(cat: GraftSparkCatalog)
      extends GraftProcedure(cat, "add_files",
        Seq(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("source_dir", StringType).build()),
        StructType(Seq(
          StructField("added_files", LongType, nullable = false),
          StructField("added_records", LongType, nullable = false)))) {
    override def description(): String =
      "Register existing parquet files as table data in place (footer stats, one transaction, no rewrite)"
    override protected def run(spark: SparkSession, args: InternalRow): InternalRow = {
      val t = table(args)
      val (_, files) = graft.spark.IceWrite.addFiles(spark, t,
        args.getUTF8String(1).toString)
      InternalRow(files.size.toLong, files.map(_.recordCount).sum)
    }
  }

  private final class RewriteManifests(cat: GraftSparkCatalog)
      extends GraftProcedure(cat, "rewrite_manifests",
        Seq(ProcedureParameter.in("table", StringType).build()),
        StructType(Seq(
          StructField("manifests_before", LongType, nullable = false),
          StructField("manifests_after", LongType, nullable = false)))) {
    override def description(): String =
      "Rebalance the data manifest tree (metadata-only snapshot; data untouched)"
    override protected def run(spark: SparkSession, args: InternalRow): InternalRow = {
      val (before, after) = Maintenance.rewriteManifests(table(args))
      InternalRow(before.toLong, after.toLong)
    }
  }

  private final class ComputeStats(cat: GraftSparkCatalog)
      extends GraftProcedure(cat, "compute_stats",
        Seq(ProcedureParameter.in("table", StringType).build()),
        StructType(Seq(StructField("files_updated", LongType, nullable = false)))) {
    override def description(): String =
      "Backfill per-file NDV statistics into the manifests (one data pass, metadata-only commit)"
    override protected def run(spark: SparkSession, args: InternalRow): InternalRow =
      InternalRow(Maintenance.computeStats(spark, table(args)).toLong)
  }

  /** Write-audit-publish's publish step: fast-forwards `branch` to another
    * ref's head, REQUIRING the branch's current head to be an ancestor of
    * the target (a true fast-forward — diverged branches need an explicit
    * rollback or merge, never a silent clobber). `branch => 'main'`
    * publishes audited branch work atomically.
    */
  private final class FastForward(cat: GraftSparkCatalog)
      extends GraftProcedure(cat, "fast_forward",
        Seq(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("branch", StringType).build(),
          ProcedureParameter.in("to", StringType).build()),
        StructType(Seq(
          StructField("branch", StringType, nullable = false),
          StructField("previous_snapshot_id", LongType),
          StructField("current_snapshot_id", LongType, nullable = false)))) {
    override def description(): String =
      "Fast-forward a branch to another ref's head (its current head must be an ancestor)"
    override protected def run(spark: SparkSession, args: InternalRow): InternalRow = {
      val t = table(args)
      val m = t.metadata
      val branchName = args.getUTF8String(1).toString
      val toName = args.getUTF8String(2).toString
      val target = m.refs.getOrElse(toName,
        throw new IllegalArgumentException(s"no such ref: $toName")).snapshotId
      val cur: Option[Long] =
        if (branchName == m.MainBranch) m.currentSnapshotId
        else m.refs.get(branchName).map { r =>
          require(r.refType == "branch", s"'$branchName' is a ${r.refType}, not a branch")
          r.snapshotId
        }
      val ancestors = m.ancestorsOf(target).toSet
      require(cur.forall(ancestors.contains),
        s"$branchName (at ${cur.orNull}) is not an ancestor of $toName ($target): not a fast-forward")
      val keep = m.refs.get(branchName)
      t.metadata = t.catalog.updateTable(CommitTable(t.ident,
        Seq(TableRequirement.AssertRefSnapshotId(branchName, cur)),
        Seq(TableUpdate.SetSnapshotRef(branchName, target, "branch",
          keep.flatMap(_.maxRefAgeMs), keep.flatMap(_.minSnapshotsToKeep)))))
      InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(branchName),
        cur.map(Long.box).orNull, target)
    }
  }

  /** Catalog attach of an existing table: `CALL graft.system.register_table(
    * `table` => 'db.t', metadata_location => '/wh/db/t/metadata/00003-….metadata.json')`
    * — no data movement, no rewrite; the catalog pointer is created and the
    * metadata's own location keeps owning data and future writes. The
    * cross-catalog migration primitive (e.g. file → JDBC/REST). */
  private final class RegisterTable(cat: GraftSparkCatalog)
      extends GraftProcedure(cat, "register_table",
        Seq(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("metadata_location", StringType).build()),
        StructType(Seq(
          StructField("current_snapshot_id", LongType),
          StructField("total_data_files", LongType, nullable = false)))) {
    override def description(): String =
      "Attach an existing table's metadata document to this catalog (no data movement)"
    override protected def run(spark: SparkSession, args: InternalRow): InternalRow = {
      val ident = TableIdent.parse(args.getUTF8String(0).toString)
      val t = cat.catalog.registerTable(ident, args.getUTF8String(1).toString)
      InternalRow(t.metadata.currentSnapshotId.map(Long.box).orNull,
        t.currentSnapshot(None).map(t.dataFiles(_).size.toLong).getOrElse(0L))
    }
  }

  /** Cherry-pick of a staged snapshot onto the main head: `CALL graft.system.
    * cherrypick_snapshot(table => 'db.t', snapshot_id => N)`. If the target's
    * parent IS the current head the publish is a pointer move (the audit-
    * branch WAP case); otherwise the target must be a pure append and its
    * added files are re-appended as a NEW snapshot on main — existing history
    * is never rewritten. Non-append snapshots on a diverged head are
    * rejected (their row-level effects cannot be replayed safely). */
  private final class CherrypickSnapshot(cat: GraftSparkCatalog)
      extends GraftProcedure(cat, "cherrypick_snapshot",
        Seq(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("snapshot_id", LongType).build()),
        StructType(Seq(
          StructField("source_snapshot_id", LongType, nullable = false),
          StructField("current_snapshot_id", LongType, nullable = false)))) {
    override def description(): String =
      "Apply a staged append snapshot onto the main head (pointer move when parent matches, else re-append)"
    override protected def run(spark: SparkSession, args: InternalRow): InternalRow = {
      val t = table(args)
      val target = args.getLong(1)
      val snap = t.snapshotById(target).getOrElse(
        throw new IllegalArgumentException(s"table ${t.ident} has no snapshot $target"))
      val m = t.metadata
      if (m.currentSnapshotId.contains(target)) return InternalRow(target, target)
      // double-apply guard: a retried or repeated cherry-pick must fail, not
      // silently duplicate rows — the target may already sit in main's
      // ancestry (pointer-move path) or have been re-applied as a new
      // snapshot carrying its id in source-snapshot-id (re-append path)
      val ancestry = m.currentSnapshotId.map(c => m.ancestorsOf(c).toSeq).getOrElse(Nil)
      require(!ancestry.contains(target) && !ancestry.exists(a =>
        m.snapshots.get(a).exists(
          _.summary.get("source-snapshot-id").contains(target.toString))),
        s"snapshot $target has already been applied to main")
      if (snap.parentSnapshotId == m.currentSnapshotId) {
        // based on the current head already: publish = CAS pointer move
        val keep = m.refs.get(m.MainBranch)
        t.metadata = t.catalog.updateTable(CommitTable(t.ident,
          Seq(TableRequirement.AssertRefSnapshotId(m.MainBranch, m.currentSnapshotId)),
          Seq(TableUpdate.SetSnapshotRef(m.MainBranch, target, "branch",
            keep.flatMap(_.maxRefAgeMs), keep.flatMap(_.minSnapshotsToKeep)))))
        InternalRow(target, target)
      } else {
        require(snap.summary.get("operation").contains("append"),
          s"snapshot $target is '${snap.summary.getOrElse("operation", "?")}' — only " +
            "pure append snapshots can be cherry-picked onto a diverged head")
        val added = t.entries(snap).filter(e =>
          e.snapshotId.contains(target) && e.status == graft.table.ManifestModel.StatusAdded)
        require(added.nonEmpty, s"snapshot $target added no live files to cherry-pick")
        val after = t.newTransaction().appendData(added.map(_.dataFile))
          .summaryExtra("source-snapshot-id" -> target.toString).commit()
        InternalRow(target, after.metadata.currentSnapshotId.get)
      }
    }
  }

  private final class RemoveOrphanFiles(cat: GraftSparkCatalog)
      extends GraftProcedure(cat, "remove_orphan_files",
        Seq(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("older_than_ms", LongType)
            .defaultValue((24L * 3600 * 1000).toString).build()),
        StructType(Seq(
          StructField("deleted_files", LongType, nullable = false),
          StructField("reclaimed_bytes", LongType, nullable = false)))) {
    override def description(): String =
      "Delete unreferenced files under the table location (failed-write leftovers) older than the horizon"
    override protected def run(spark: SparkSession, args: InternalRow): InternalRow = {
      val (n, bytes) = Maintenance.removeOrphanFiles(spark, table(args), args.getLong(1))
      InternalRow(n.toLong, bytes)
    }
  }
}
