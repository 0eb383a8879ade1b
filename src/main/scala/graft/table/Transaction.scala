package graft.table

import java.util.UUID

import graft.catalog._
import graft.core.ValueCodec
import graft.spec.{IceSchema, PartitionField, PartitionSpec, Snapshot}
import graft.table.ManifestModel._

/** ACID table transaction (reference: iceberg-rust/src/table/transaction/
  * mod.rs:56-384, operation.rs:96-547, append.rs, util/mod.rs).
  *
  * All work is driver-side metadata manipulation: select/merge/split
  * manifests, write Avro, emit a CommitTable with optimistic-concurrency
  * requirements. Executors are never involved — at 100 TB this stays
  * O(manifests), and the manifest tree is kept balanced by the reference's
  * sqrt law so scan planning stays fast as file count grows.
  */
class Transaction(table: IceTable, branch: Option[String]) {
  import Transaction._

  private var appendedData: Seq[DataFile] = Nil
  private var appendedDeletes: Seq[DataFile] = Nil
  private var replaceFiles: Option[Seq[DataFile]] = None
  private var rewriteEntries: Option[Seq[ManifestEntry]] = None
  private var rewriteAdded: Seq[DataFile] = Nil
  private var rewriteDeleteEntries: Option[Seq[ManifestEntry]] = None
  private var rewriteDeleteAdded: Seq[DataFile] = Nil
  private var propertyUpdates: Map[String, String] = Map.empty
  private var propsRetrySafe = true // vacuous while no property updates
  private var propertyRemovals: Seq[String] = Nil
  private var newSchema: Option[IceSchema] = None
  private var newSpecFields: Option[Seq[PartitionField]] = None
  private var newSortOrder: Option[graft.spec.SortOrder] = None
  private var resetSortOrder: Boolean = false
  // tag name -> (snapshot id, max-ref-age-ms, min-snapshots-to-keep)
  private var refUpdates: Map[String, (Long, Option[Long], Option[Int])] = Map.empty
  private var extraSummary: Map[String, String] = Map.empty

  /** Extra key-values merged into the new snapshot's summary — provenance
    * the commit should carry (e.g. cherry-pick source ids, streaming batch
    * ids for exactly-once; the reference's additional-summary hook carries
    * MV refresh state the same way). Applied on EVERY snapshot-producing
    * op — append, replace, manifest rewrites — a streaming replace sink's
    * batch ledger rides replace commits (streamSketch). */
  def summaryExtra(kv: (String, String)*): Transaction = {
    extraSummary ++= kv; this
  }

  def appendData(files: Seq[DataFile]): Transaction = {
    require(rewriteEntries.isEmpty && rewriteDeleteEntries.isEmpty,
      "manifest rewrites cannot combine with appends or replace in one transaction")
    appendedData ++= files; this
  }
  def appendDeletes(files: Seq[DataFile]): Transaction = {
    require(rewriteEntries.isEmpty && rewriteDeleteEntries.isEmpty,
      "manifest rewrites cannot combine with appends or replace in one transaction")
    // row-level (merge-on-read) deletes are a format V2 feature; a V1 table
    // has no sequence numbers to order them against (Iceberg spec, and
    // table_metadata.rs V1 serde omits sequence numbers entirely)
    if (table.metadata.formatVersion < 2)
      throw new IllegalStateException(
        "row-level deletes require format-version 2 (V1 tables are copy-on-write only)")
    appendedDeletes ++= files; this
  }
  /** Replace all table content with `files` (compaction / full rewrite, T3). */
  def replace(files: Seq[DataFile]): Transaction = {
    require(rewriteEntries.isEmpty && rewriteDeleteEntries.isEmpty,
      "manifest rewrites cannot combine with appends or replace in one transaction")
    replaceFiles = Some(files); this
  }
  /** Rewrite the DATA manifest tree only: a new snapshot referencing the
    * SAME data files through freshly balanced manifests — entries keep their
    * sequence/snapshot numbers (MoR delete ordering depends on them), delete
    * manifests carry over untouched, and history is preserved (unlike
    * `replace`, no snapshots are removed). Zero data IO. */
  def rewriteManifests(entries: Seq[ManifestEntry]): Transaction = {
    require(entries.forall(e => e.sequenceNumber.isDefined && e.dataFile.content == ContentData),
      "rewriteManifests takes inherited DATA entries (explicit sequence numbers)")
    require(appendedData.isEmpty && appendedDeletes.isEmpty && replaceFiles.isEmpty &&
      rewriteDeleteEntries.isEmpty,
      "rewriteManifests cannot combine with appends or replace in one transaction")
    rewriteEntries = Some(entries); this
  }
  /** Partial data-file rewrite (binpack compaction): a new snapshot where
    * `keep` entries survive with their ORIGINAL sequence numbers (MoR
    * ordering preserved) and `added` files replace the rewritten originals
    * at the new snapshot's sequence number. Unlike `replace`, history is
    * untouched — superseded files stay reachable through older snapshots
    * until expiration; unlike `rewriteManifests`, the data file set
    * changes. */
  def rewriteFiles(keep: Seq[ManifestEntry], added: Seq[DataFile]): Transaction = {
    rewriteManifests(keep)
    rewriteAdded = added; this
  }
  /** Rewrite the DELETE manifest tree only (positional-delete compaction):
    * a new snapshot where `keep` delete entries survive with their ORIGINAL
    * sequence numbers (equality deletes mask strictly-OLDER data files, so
    * renumbering them would silently widen their scope) and `added`
    * consolidated files enter at the new snapshot's sequence number — safe
    * for POSITIONAL deletes only, whose masking set is an explicit
    * (path, pos) list independent of sequencing. Data manifests carry over
    * untouched. Kept entries are RE-ENCODED under the table's CURRENT
    * default spec (Manifest.writeManifest puts partition tuple values by
    * field NAME): global delete files round-trip safely (empty tuple), and
    * so do partition-SCOPED entries whose tuple field names all exist in
    * the default spec's partition type — but a scoped entry carrying a
    * foreign-named tuple (written before a later setSpec evolution) cannot
    * be re-encoded without silently nulling its scope, so it is rejected
    * loudly here instead. */
  def rewriteDeletes(keep: Seq[ManifestEntry], added: Seq[DataFile]): Transaction = {
    require(keep.forall(e => e.sequenceNumber.isDefined && e.dataFile.content != ContentData),
      "rewriteDeletes takes inherited DELETE entries (explicit sequence numbers)")
    val currentPartNames = table.metadata.partitionSpecs
      .get(table.metadata.defaultSpecId)
      .map(_.partitionType(table.metadata.currentSchema).fields.map(_.name).toSet)
      .getOrElse(Set.empty[String])
    // a tuple field NAME only identifies a meaning when every spec in
    // history that defines it agrees on (source column, transform): a
    // re-used name (e.g. bucket width widened under the same field name)
    // would re-encode a scoped value under a DIFFERENT partitioning and
    // silently mask the wrong partition — reject those too (entries do
    // not carry their origin spec id, so attribution is impossible)
    val defCount: Map[String, Int] = table.metadata.partitionSpecs.values
      .flatMap(_.fields.map(pf => pf.name -> ((pf.sourceId, pf.transform))))
      .toSeq.distinct.groupBy(_._1).map { case (n, ds) => n -> ds.size }
    keep.foreach { e =>
      val foreign = e.dataFile.partition.map(_._1).filterNot(currentPartNames.contains)
      require(foreign.isEmpty,
        s"rewriteDeletes cannot re-encode kept entry ${e.dataFile.filePath}: partition " +
          s"tuple fields ${foreign.mkString(", ")} do not exist in the current default " +
          "spec's partition type (spec evolved since the delete was written) — compact " +
          "or convert the foreign-spec deletes first")
      val ambiguous = e.dataFile.partition.collect {
        case (n, v) if v != null && defCount.getOrElse(n, 1) > 1 => n
      }
      require(ambiguous.isEmpty,
        s"rewriteDeletes cannot re-encode kept entry ${e.dataFile.filePath}: partition " +
          s"tuple fields ${ambiguous.mkString(", ")} are defined with different " +
          "(source, transform) pairs across the table's spec history — the scoped " +
          "value's meaning cannot be attributed; compact or convert first")
    }
    require(added.forall(_.content == ContentPositionDeletes),
      "only positional delete files may enter at a fresh sequence number")
    require(appendedData.isEmpty && appendedDeletes.isEmpty && replaceFiles.isEmpty &&
      rewriteEntries.isEmpty,
      "rewriteDeletes cannot combine with other content operations in one transaction")
    rewriteDeleteEntries = Some(keep); rewriteDeleteAdded = added; this
  }
  /** Property updates carried by this commit. `ownedExclusively` declares
    * that the CALLER is the only writer of these keys (e.g. a streaming
    * sink's per-checkpoint ledger namespace — Structured Streaming holds
    * one active query per checkpoint), making re-application after a CAS
    * retry last-writer-wins-safe; the default keeps read-modify-write
    * semantics, surfacing any conflict to the caller. */
  def updateProperties(p: Map[String, String],
                       ownedExclusively: Boolean = false): Transaction = {
    propertyUpdates ++= p
    if (p.nonEmpty && !ownedExclusively) propsRetrySafe = false
    this
  }
  def removeProperties(keys: Seq[String]): Transaction = { propertyRemovals ++= keys; this }
  /** Schema evolution: install a new current schema (add-column etc.). */
  def setSchema(s: IceSchema): Transaction = { newSchema = Some(s); this }
  /** Partition spec evolution: install a new DEFAULT spec. Existing data
    * keeps its old layout (manifests remember their spec id; the scan prunes
    * each against its own spec); only new writes use the new spec. Compact
    * to migrate old files. */
  def setSpec(fields: Seq[PartitionField]): Transaction = { newSpecFields = Some(fields); this }
  /** Installs a write sort order (clustering): subsequent data writes
    * range-partition + locally sort on it, tightening per-file column
    * bounds so statistics pruning skips more files. Passing the unsorted
    * order resets the default to the built-in order 0 instead of minting a
    * duplicate empty order per toggle. */
  def setSortOrder(o: graft.spec.SortOrder): Transaction = {
    if (o.fields.isEmpty) resetSortOrder = true else newSortOrder = Some(o)
    this
  }
  def setRef(name: String, snapshotId: Long, maxRefAgeMs: Option[Long] = None,
             minSnapshotsToKeep: Option[Int] = None): Transaction = {
    refUpdates += name -> ((snapshotId, maxRefAgeMs, minSnapshotsToKeep)); this
  }

  /** Commits with bounded optimistic retry for PURE DATA APPENDS: two
    * writers appending concurrently do not semantically conflict — the
    * loser's CAS failure just means its manifest merge was built on a stale
    * base, so it refreshes and re-merges (the written data files themselves
    * stay valid; only driver-side manifest work repeats). Everything else —
    * replace (a concurrent append would be silently clobbered), row-level
    * deletes (re-basing raises their sequence number, widening what they
    * mask), schema/property/ref changes (read-modify-write semantics) —
    * surfaces the conflict to the caller, matching the reference's
    * no-auto-retry commit (commit.rs:417-490).
    *
    * One adverse commit can cost a retrier TWO failures (the winner claims
    * the version lock before its metadata is visible: first a version-claim
    * race, then a ref-moved failure once the metadata lands), so the budget
    * is 2× a small contention fan-in plus slack, with linear backoff to let
    * in-flight metadata writes surface before the re-read.
    */
  def commit(): IceTable = {
    // retryable shapes: a pure data append (two concurrent appenders don't
    // semantically conflict — the loser re-merges manifests on a fresh
    // base), optionally carrying caller-OWNED property updates (a streaming
    // sink's ledger keys: re-application is last-writer-wins on keys nobody
    // else writes), and the degenerate owned-properties-ONLY commit (an
    // empty micro-batch's ledger stamp) — everything else surfaces the
    // conflict (read-modify-write semantics)
    val pureDataAppend = replaceFiles.isEmpty && rewriteEntries.isEmpty &&
      rewriteDeleteEntries.isEmpty &&
      newSchema.isEmpty && newSpecFields.isEmpty && newSortOrder.isEmpty &&
      !resetSortOrder && propsRetrySafe && propertyRemovals.isEmpty &&
      refUpdates.isEmpty && appendedDeletes.isEmpty &&
      (appendedData.nonEmpty || propertyUpdates.nonEmpty)
    val maxAttempts = if (pureDataAppend) 10 else 1
    // captured BEFORE the commit mutates table.metadata: the pre-commit
    // metadata is what knows which snapshots a replace supersedes
    val oldMeta = if (replaceFiles.isDefined) Some(table.metadata) else None
    var attempt = 1
    while (true) {
      try {
        val committed = commitOnce()
        oldMeta.foreach(old => deleteReplacedFiles(old, committed.metadata))
        return committed
      }
      catch {
        case e: CommitConflictException =>
          if (attempt >= maxAttempts) throw e
          Thread.sleep(attempt * 2L)
          attempt += 1
          table.refresh()
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Physical cleanup after a REPLACE commit (T3 reference parity: the
    * reference deletes the superseded data/manifest/list files once the
    * commit lands, transaction/mod.rs:339-353 → table/mod.rs:359-411).
    * Deletes only files of snapshots the commit actually REMOVED, minus
    * anything a surviving snapshot (the new head, or a branch/tag lineage
    * the replace guard kept) still references — a file shared across refs
    * survives. Runs strictly AFTER the metadata commit and best-effort
    * per file: a failed delete leaks a re-runnable orphan (see
    * Maintenance.removeOrphanFiles), never a corrupt live snapshot.
    */
  private def deleteReplacedFiles(oldMeta: graft.spec.TableMetadata,
                                  newMeta: graft.spec.TableMetadata): Unit =
    // the COMMIT has already landed: nothing in this cleanup may propagate —
    // a read hiccup on an old manifest would otherwise make the caller
    // believe a committed replace failed (and e.g. re-run a compaction).
    // Any skipped deletion is a re-runnable orphan, not a correctness loss —
    // but never a SILENT one: Cleanup.rm WARNs per path and counts failures
    // so a chronically failing cleanup is visible before remove_orphan_files
    // is ever run by hand.
    try {
      val removedIds = oldMeta.snapshots.keySet -- newMeta.snapshots.keySet
      if (removedIds.isEmpty) return
      def filesOf(meta: graft.spec.TableMetadata, ids: Set[Long]): (Set[String], Set[String], Set[String]) = {
        val snaps = ids.flatMap(meta.snapshotById)
        val lists = snaps.map(_.manifestList)
        val mans = snaps.flatMap(s => table.manifests(s)).map(_.manifestPath)
        val data = snaps.flatMap(s => table.entries(s)).map(_.dataFile.filePath)
        (lists, mans, data)
      }
      val (expLists, expMans, expData) = filesOf(oldMeta, removedIds)
      val (keepLists, keepMans, keepData) = filesOf(newMeta, newMeta.snapshots.keySet)
      // the active session's Hadoop conf carries filesystem credentials /
      // endpoints (s3a, custom defaultFS) a bare Configuration would lack
      val conf = org.apache.spark.sql.SparkSession.getActiveSession
        .map(_.sparkContext.hadoopConfiguration)
        .getOrElse(new org.apache.hadoop.conf.Configuration())
      val ctx = s"replace cleanup of ${table.ident}"
      Cleanup.rm(conf, expData -- keepData, ctx)
      Cleanup.rm(conf, expMans -- keepMans, ctx)
      Cleanup.rm(conf, expLists -- keepLists, ctx)
    } catch {
      case scala.util.control.NonFatal(e) =>
        Cleanup.failedDeletes.incrementAndGet()
        org.slf4j.LoggerFactory.getLogger("graft.table.Cleanup").warn(
          s"replace cleanup of ${table.ident} aborted before deleting " +
            s"(${e.getClass.getSimpleName}: ${e.getMessage}) — superseded files " +
            "remain as re-collectable orphans (see remove_orphan_files)")
    }

  /** Iceberg V3 row lineage (`write.row-lineage.enabled=true`): assigns
    * `first_row_id` sequentially from the table's next-row-id to DATA files
    * that carry neither an assignment nor a MATERIALIZED `_row_id` column
    * (detected via the reserved field id in the file's stats — rewrites
    * that preserve ids write the column and skip assignment). Returns the
    * stamped files and the number of row ids consumed; the snapshot carries
    * `first-row-id` plus an `assigned-row-ids` summary so every catalog
    * backend replays the same next-row-id bump. */
  private def assignRowIds(m: graft.spec.TableMetadata,
                           files: Seq[DataFile]): (Seq[DataFile], Long) =
    if (!m.properties.get("write.row-lineage.enabled").contains("true")) (files, 0L)
    else {
      var next = m.nextRowId
      val out = files.map { f =>
        if (f.content != ContentData || f.firstRowId.isDefined ||
            f.valueCounts.contains(RowIdFieldId)) f
        else {
          val stamped = f.copy(firstRowId = Some(next))
          next += f.recordCount
          stamped
        }
      }
      (out, next - m.nextRowId)
    }

  private def lineageSummary(assigned: Long): Map[String, String] =
    if (assigned > 0L) Map("assigned-row-ids" -> assigned.toString) else Map.empty

  private def commitOnce(): IceTable = {
    val m = table.metadata
    val branchName = branch.getOrElse(m.MainBranch)
    // parent falls back to main when the branch is new (branch forks from
    // main, T7) — but the CAS requirement must assert the ref's actual
    // stored state, which is None for a not-yet-created branch
    val parent = m.currentSnapshot(branch)
    val expectedRef: Option[Long] =
      if (branchName == m.MainBranch) m.currentSnapshotId
      else m.refs.get(branchName).map(_.snapshotId)
    var updates = Vector.empty[TableUpdate]
    var requirements = Vector.empty[TableRequirement]

    newSchema.foreach { s =>
      val id = if (m.schemas.contains(s.schemaId)) m.schemas.keys.max + 1 else s.schemaId
      val sch = s.copy(schemaId = id)
      updates :+= TableUpdate.AddSchema(sch, sch.maxFieldId)
      updates :+= TableUpdate.SetCurrentSchema(id)
    }
    newSpecFields.foreach { fields =>
      // field ids: reuse the id of an identical (source, transform) field
      // from ANY prior spec (Iceberg's evolution rule — the field means the
      // same thing), else continue from last-partition-id
      var nextFieldId = m.lastPartitionId
      val existing: Map[(Int, graft.core.Transform), Int] =
        m.partitionSpecs.values.flatMap(_.fields.map(f => (f.sourceId, f.transform) -> f.fieldId)).toMap
      val assigned = fields.map { f =>
        existing.get((f.sourceId, f.transform)) match {
          case Some(id) => f.copy(fieldId = id)
          case None => nextFieldId += 1; f.copy(fieldId = nextFieldId)
        }
      }
      val specId = m.partitionSpecs.keys.max + 1
      requirements :+= TableRequirement.AssertDefaultSpecId(m.defaultSpecId)
      updates :+= TableUpdate.AddPartitionSpec(PartitionSpec(specId, assigned))
      updates :+= TableUpdate.SetDefaultSpec(specId)
    }
    if (propertyUpdates.nonEmpty) updates :+= TableUpdate.SetProperties(propertyUpdates)
    if (propertyRemovals.nonEmpty) updates :+= TableUpdate.RemoveProperties(propertyRemovals)
    newSortOrder.foreach { o =>
      val id = if (m.sortOrders.contains(o.orderId)) m.sortOrders.keys.max + 1 else o.orderId
      updates :+= TableUpdate.AddSortOrder(o.copy(orderId = id))
      updates :+= TableUpdate.SetDefaultSortOrder(id)
    }
    if (resetSortOrder) updates :+= TableUpdate.SetDefaultSortOrder(0)
    refUpdates.foreach { case (name, (id, maxAge, minKeep)) =>
      updates :+= TableUpdate.SetSnapshotRef(name, id, "tag", maxAge, minKeep)
    }

    val schemaForWrite = newSchema.getOrElse(m.currentSchema)

    if (replaceFiles.isDefined) {
      val (files, assignedRows) = assignRowIds(m, replaceFiles.get)
      val snapshotId = newSnapshotId()
      val seq = m.lastSequenceNumber + 1
      val entries = files.map(f =>
        ManifestEntry(StatusAdded, Some(snapshotId), Some(seq), Some(seq), f))
      val manifests = writeSplitManifests(table, schemaForWrite, entries, snapshotId, seq, files.size)
      val listPath = s"${m.location}/metadata/snap-$snapshotId-$seq-${UUID.randomUUID()}.avro"
      ManifestIO.writeManifestList(listPath, manifests)
      val snap = Snapshot(snapshotId, parent.map(_.snapshotId), seq,
        System.currentTimeMillis(), listPath,
        Map("operation" -> "replace",
          "added-data-files" -> files.size.toString,
          "added-records" -> files.map(_.recordCount).sum.toString,
          "total-records" -> files.map(_.recordCount).sum.toString,
          "total-data-files" -> files.size.toString) ++ lineageSummary(assignedRows) ++ extraSummary,
        Some(m.currentSchemaId),
        firstRowId = if (assignedRows > 0L) Some(m.nextRowId) else None)
      requirements :+= TableRequirement.AssertRefSnapshotId(branchName, expectedRef)
      // a bare replace supersedes the table's history (reference semantics:
      // transaction/mod.rs:339-353 captures old metadata and deletes its
      // files post-commit) — but only the history no OTHER ref still
      // reaches: a branch or tag pointing into the old lineage keeps its
      // snapshots (and, downstream, their files) alive. Without this guard
      // RemoveSnapshots would also silently drop those refs.
      val refProtected: Set[Long] = m.refs.collect {
        case (name, r) if name != branchName => m.ancestorsOf(r.snapshotId)
      }.flatten.toSet
      updates :+= TableUpdate.RemoveSnapshots(
        m.snapshots.keys.filterNot(refProtected).toSeq)
      updates :+= TableUpdate.AddSnapshot(snap)
      updates :+= TableUpdate.SetSnapshotRef(branchName, snapshotId, "branch")
    } else if (rewriteEntries.isDefined) {
      val entries = rewriteEntries.get
      val snapshotId = newSnapshotId()
      val seq = m.lastSequenceNumber + 1
      // binpack additions enter at THIS snapshot's sequence number; kept
      // entries keep their inherited numbers (both written explicitly)
      val (rewriteStamped, assignedRows) = assignRowIds(m, rewriteAdded)
      val addedEntries = rewriteStamped.map(f =>
        ManifestEntry(StatusAdded, Some(snapshotId), Some(seq), Some(seq), f))
      val dataManifests = writeSplitManifests(table, schemaForWrite,
        entries.map(_.copy(status = StatusExisting)) ++ addedEntries,
        snapshotId, seq, entries.size + addedEntries.size)
      // carry over untouched: delete manifests AND data manifests under a
      // FOREIGN spec — their partition records cannot be re-encoded under
      // the current spec's Avro schema (spec evolution; compaction migrates)
      val carried = parent.map(p => table.manifests(p)).getOrElse(Nil)
        .filter(ml => ml.content != 0 ||
          (ml.content == 0 && ml.partitionSpecId != m.defaultSpecId))
      val listPath = s"${m.location}/metadata/snap-$snapshotId-$seq-${UUID.randomUUID()}.avro"
      ManifestIO.writeManifestList(listPath, dataManifests ++ carried)
      // totals include CARRIED data manifests (foreign-spec layouts), not
      // just the rewritten current-spec entries — same contract as append
      val allData = dataManifests ++ carried.filter(_.content == 0)
      val snap = Snapshot(snapshotId, parent.map(_.snapshotId), seq,
        System.currentTimeMillis(), listPath,
        Map("operation" -> "replace",
          "rewritten-data-manifests" -> dataManifests.size.toString,
          "added-data-files" -> rewriteAdded.size.toString,
          "added-records" -> rewriteAdded.map(_.recordCount).sum.toString,
          "total-records" -> allData.map(ml => ml.addedRowsCount + ml.existingRowsCount).sum.toString,
          "total-data-files" -> allData.map(ml => ml.addedFilesCount + ml.existingFilesCount).sum.toString) ++ lineageSummary(assignedRows) ++ extraSummary,
        Some(m.currentSchemaId),
        firstRowId = if (assignedRows > 0L) Some(m.nextRowId) else None)
      requirements :+= TableRequirement.AssertRefSnapshotId(branchName, expectedRef)
      updates :+= TableUpdate.AddSnapshot(snap)
      updates :+= TableUpdate.SetSnapshotRef(branchName, snapshotId, "branch")
    } else if (rewriteDeleteEntries.isDefined) {
      val keep = rewriteDeleteEntries.get
      val snapshotId = newSnapshotId()
      val seq = m.lastSequenceNumber + 1
      val addedEntries = rewriteDeleteAdded.map(f =>
        ManifestEntry(StatusAdded, Some(snapshotId), Some(seq), Some(seq), f))
      val allDel = keep.map(_.copy(status = StatusExisting)) ++ addedEntries
      val deleteManifests: Seq[ManifestListEntry] =
        if (allDel.isEmpty) Nil
        else Seq(writeManifest(table, schemaForWrite, allDel, snapshotId, seq, content = 1))
      // data manifests carry over untouched (any spec) — this op never
      // changes what data exists, only how its delete masks are stored
      val carried = parent.map(p => table.manifests(p)).getOrElse(Nil).filter(_.content == 0)
      val listPath = s"${m.location}/metadata/snap-$snapshotId-$seq-${UUID.randomUUID()}.avro"
      ManifestIO.writeManifestList(listPath, carried ++ deleteManifests)
      val snap = Snapshot(snapshotId, parent.map(_.snapshotId), seq,
        System.currentTimeMillis(), listPath,
        Map("operation" -> "delete",
          "rewritten-delete-files" -> rewriteDeleteAdded.size.toString,
          "total-records" -> carried.map(ml => ml.addedRowsCount + ml.existingRowsCount).sum.toString,
          "total-data-files" -> carried.map(ml => ml.addedFilesCount + ml.existingFilesCount).sum.toString) ++ extraSummary,
        Some(m.currentSchemaId))
      requirements :+= TableRequirement.AssertRefSnapshotId(branchName, expectedRef)
      updates :+= TableUpdate.AddSnapshot(snap)
      updates :+= TableUpdate.SetSnapshotRef(branchName, snapshotId, "branch")
    } else if (appendedData.nonEmpty || appendedDeletes.nonEmpty) {
      val snapshotId = newSnapshotId()
      val seq = m.lastSequenceNumber + 1
      // carry over existing manifests; merge new data files into the best one
      val existing: Seq[ManifestListEntry] =
        parent.map(p => table.manifests(p)).getOrElse(Nil)
      val (dataManifests, deleteManifests) = existing.partition(_.content == 0)

      val (appendStamped, assignedRows) = assignRowIds(m, appendedData.toSeq)
      val mergedData: Seq[ManifestListEntry] =
        if (appendStamped.isEmpty) dataManifests
        else mergeAppend(table, schemaForWrite, dataManifests, appendStamped, snapshotId, seq)

      val newDeleteManifests: Seq[ManifestListEntry] =
        if (appendedDeletes.isEmpty) Nil
        else {
          val entries = appendedDeletes.map(f =>
            ManifestEntry(StatusAdded, Some(snapshotId), Some(seq), Some(seq), f))
          Seq(writeManifest(table, schemaForWrite, entries, snapshotId, seq, content = 1))
        }

      val allManifests = mergedData ++ deleteManifests ++ newDeleteManifests
      val listPath = s"${m.location}/metadata/snap-$snapshotId-$seq-${UUID.randomUUID()}.avro"
      ManifestIO.writeManifestList(listPath, allManifests)
      // operation by file mix (operation.rs:108-115)
      val op =
        if (appendedDeletes.nonEmpty && appendedData.nonEmpty) "overwrite"
        else if (appendedDeletes.nonEmpty) "delete"
        else "append"
      // running totals from the DATA manifest list entries (added + existing
      // counts are already aggregated per manifest — no file-level scan)
      val totalRecords = mergedData.map(ml => ml.addedRowsCount + ml.existingRowsCount).sum
      val totalFiles = mergedData.map(ml => ml.addedFilesCount + ml.existingFilesCount).sum
      val snap = Snapshot(snapshotId, parent.map(_.snapshotId), seq,
        System.currentTimeMillis(), listPath,
        Map("operation" -> op,
          "added-data-files" -> appendedData.size.toString,
          "added-delete-files" -> appendedDeletes.size.toString,
          "added-records" -> appendedData.map(_.recordCount).sum.toString,
          "total-records" -> totalRecords.toString,
          "total-data-files" -> totalFiles.toString) ++ lineageSummary(assignedRows) ++ extraSummary,
        Some(m.currentSchemaId),
        firstRowId = if (assignedRows > 0L) Some(m.nextRowId) else None)
      requirements :+= TableRequirement.AssertRefSnapshotId(branchName, expectedRef)
      updates :+= TableUpdate.AddSnapshot(snap)
      updates :+= TableUpdate.SetSnapshotRef(branchName, snapshotId, "branch")
    }

    if (updates.isEmpty) return table
    val committed = table.catalog.updateTable(CommitTable(table.ident, requirements, updates))
    table.metadata = committed
    // replace-op physical file cleanup happens in commit(), strictly after
    // this method returns the landed metadata (deleteReplacedFiles)
    table
  }
}

object Transaction {
  /** MIN_DATAFILES_PER_MANIFEST (operation.rs:39). */
  val MinDatafilesPerManifest = 4

  def newSnapshotId(): Long = math.abs(UUID.randomUUID().getLeastSignificantBits)

  /** limit = 4 + ceil(sqrt(total)) (operation.rs:645-666). */
  def manifestLimit(totalFiles: Int): Int =
    MinDatafilesPerManifest + math.ceil(math.sqrt(totalFiles.toDouble)).toInt

  /** Number of split pieces: 2^(ilog2(n/limit)+1) (compute_n_splits). */
  def nSplits(n: Int, limit: Int): Int = {
    if (n <= limit) 1
    else {
      val ratio = n / limit
      var p = 1
      while ((1 << p) <= ratio) p += 1
      1 << p
    }
  }

  private[table] def compareVals(a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (null, _) => -1
    case (_, null) => 1
    case (x: Int, y: Int) => java.lang.Integer.compare(x, y)
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Number, y: Number) => java.lang.Double.compare(x.doubleValue(), y.doubleValue())
    case (x: String, y: String) => x.compareTo(y)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case _ => 0
  }

  private def numeric(v: Any): Option[Double] = v match {
    case n: Number => Some(n.doubleValue())
    case _ => None
  }

  /** Bounding rectangle over partition tuples (util/mod.rs:14-141). */
  private[table] final case class Rect(min: Vector[Any], max: Vector[Any]) {
    def union(other: Rect): Rect = Rect(
      min.zip(other.min).map { case (a, b) => if (compareVals(a, b) <= 0) a else b },
      max.zip(other.max).map { case (a, b) => if (compareVals(a, b) >= 0) a else b })
    /** Total numeric extent — the priority used for manifest selection. */
    def extent: Double = min.zip(max).map { case (a, b) =>
      (numeric(a), numeric(b)) match {
        case (Some(x), Some(y)) => y - x
        case _ => 0.0
      }
    }.sum
  }

  private[table] def rectOf(files: Seq[DataFile]): Option[Rect] = {
    val tuples = files.map(_.partition.map(_._2).toVector).filter(_.nonEmpty)
    if (tuples.isEmpty) None
    else Some(tuples.map(t => Rect(t, t)).reduce(_ union _))
  }

  /** Appends new files into the manifest tree: pick the target manifest
    * (partitioned: smallest bounding-rectangle enlargement, append.rs:107-150;
    * unpartitioned: fewest rows, append.rs:153-191), merge, split if over the
    * sqrt-law limit (operation.rs:645-666 + geometric bisection
    * append.rs:14-98).
    */
  private[table] def mergeAppend(table: IceTable, schema: IceSchema,
                                 dataManifests: Seq[ManifestListEntry], newFiles: Seq[DataFile],
                                 snapshotId: Long, seq: Long): Seq[ManifestListEntry] = {
    val newEntries = newFiles.map(f =>
      ManifestEntry(StatusAdded, Some(snapshotId), Some(seq), Some(seq), f))
    // merge candidates: ONLY manifests written under the CURRENT default
    // spec — merging would re-encode a foreign spec's partition records
    // under this spec's Avro schema (spec evolution keeps old manifests
    // intact; compaction migrates them)
    val specId = table.metadata.defaultSpecId
    val mergeable = dataManifests.filter(_.partitionSpecId == specId)
    if (mergeable.isEmpty)
      return dataManifests ++ writeSplitManifests(table, schema, newEntries, snapshotId, seq, 0)

    val partitioned = table.metadata.defaultSpec.fields.nonEmpty
    val newRect = rectOf(newFiles)
    val target: ManifestListEntry =
      if (partitioned && newRect.isDefined) {
        // smallest extent of union(manifest bounds, new files bounds)
        mergeable.minBy { ml =>
          val entries = ManifestIO.readManifest(ml.manifestPath)
          rectOf(entries.map(_.dataFile)) match {
            case Some(r) => r.union(newRect.get).extent
            case None => Double.MaxValue
          }
        }
      } else mergeable.minBy(ml => ml.addedRowsCount + ml.existingRowsCount)

    val targetEntries = ManifestIO.readManifest(target.manifestPath).map { e =>
      e.copy(status = StatusExisting,
        sequenceNumber = e.sequenceNumber.orElse(Some(target.sequenceNumber)),
        snapshotId = e.snapshotId.orElse(Some(target.addedSnapshotId)))
    }
    val merged = targetEntries ++ newEntries
    val untouched = dataManifests.filterNot(_ eq target)
    val totalFiles = dataManifests.map(ml =>
      ml.addedFilesCount + ml.existingFilesCount).sum + newFiles.size
    untouched ++ writeSplitManifests(table, schema, merged, snapshotId, seq, totalFiles)
  }

  /** Splits `entries` into balanced manifests when over the limit, bisecting
    * the widest numeric partition dimension (append.rs:14-98).
    */
  private[table] def writeSplitManifests(table: IceTable, schema: IceSchema,
                                         entries: Seq[ManifestEntry], snapshotId: Long, seq: Long,
                                         totalTableFiles: Int): Seq[ManifestListEntry] = {
    val limit = manifestLimit(math.max(totalTableFiles, entries.size))
    val pieces = nSplits(entries.size, limit)
    val groups: Seq[Seq[ManifestEntry]] =
      if (pieces <= 1) Seq(entries) else bisect(entries, pieces)
    groups.filter(_.nonEmpty)
      .map(g => writeManifest(table, schema, g, snapshotId, seq, content = 0))
  }

  private def bisect(entries: Seq[ManifestEntry], pieces: Int): Seq[Seq[ManifestEntry]] = {
    if (pieces <= 1 || entries.size <= 1) return Seq(entries)
    val dims = entries.head.dataFile.partition.size
    // widest numeric dimension
    val widths = (0 until dims).map { i =>
      val vals = entries.flatMap(e => numeric(e.dataFile.partition(i)._2))
      if (vals.isEmpty) -1.0 else vals.max - vals.min
    }
    val dim = if (widths.nonEmpty && widths.max > 0) widths.indexOf(widths.max) else -1
    val sorted =
      if (dim >= 0) entries.sortBy(e => numeric(e.dataFile.partition(dim)._2).getOrElse(0.0))
      else entries
    val (left, right) = sorted.splitAt(sorted.size / 2)
    bisect(left, pieces / 2) ++ bisect(right, pieces / 2)
  }

  /** Writes one manifest + its list entry with per-partition-field summaries
    * (update_partitions, manifest.rs:527-636).
    */
  private[table] def writeManifest(table: IceTable, schema: IceSchema,
                                   entries: Seq[ManifestEntry], snapshotId: Long, seq: Long,
                                   content: Int): ManifestListEntry = {
    val m = table.metadata
    val spec = m.defaultSpec
    val path = s"${m.location}/metadata/${UUID.randomUUID()}-m$content.avro"
    val len = ManifestIO.writeManifest(path, spec, schema, entries)
    val partTypes = spec.partitionType(schema).fields
    val summaries = partTypes.zipWithIndex.map { case (pf, i) =>
      // delete files may be unpartitioned even when the table is partitioned
      // (global deletes) — they contribute "unknown" to the summary
      val vals = entries.map(e => e.dataFile.partition.lift(i).map(_._2).orNull)
      val nonNull = vals.filter(_ != null)
      FieldSummary(
        containsNull = vals.exists(_ == null),
        containsNan = Some(nonNull.exists {
          case d: Double => d.isNaN; case f: Float => f.isNaN; case _ => false
        }),
        lowerBound = nonNull.reduceOption((a, b) => if (compareVals(a, b) <= 0) a else b)
          .map(ValueCodec.toBytes),
        upperBound = nonNull.reduceOption((a, b) => if (compareVals(a, b) >= 0) a else b)
          .map(ValueCodec.toBytes))
    }
    val added = entries.filter(_.status == StatusAdded)
    val existing = entries.filter(_.status == StatusExisting)
    ManifestListEntry(
      manifestPath = path,
      manifestLength = len,
      partitionSpecId = spec.specId,
      content = content,
      sequenceNumber = seq,
      minSequenceNumber = entries.flatMap(_.sequenceNumber).foldLeft(seq)(math.min),
      addedSnapshotId = snapshotId,
      addedFilesCount = added.size,
      existingFilesCount = existing.size,
      deletedFilesCount = 0,
      addedRowsCount = added.map(_.dataFile.recordCount).sum,
      existingRowsCount = existing.map(_.dataFile.recordCount).sum,
      deletedRowsCount = 0L,
      partitions = summaries)
  }
}
