package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.catalog.{CommitTable, TableRequirement, TableUpdate}
import graft.table.ManifestModel._

/** Table maintenance: snapshot expiration with physical file cleanup and
  * compaction (reference: `delete_all_table_files`,
  * iceberg-rust/src/table/mod.rs:359-411 + the replace op's cleanup,
  * transaction/mod.rs:339-353).
  *
  * All driver-side and O(manifests): the referenced-file set is computed
  * from manifest metadata, never by listing data directories (which at
  * 100 TB may hold millions of objects — directory listings are the thing
  * to avoid).
  */
object Maintenance {

  /** Expires all snapshots except the `keepLast` most recent (by sequence
    * number) and any snapshot protected by a branch/tag, then physically
    * deletes every data file, manifest, and manifest list only reachable
    * from the expired snapshots. Time travel to expired snapshots becomes
    * unavailable (that is the point — bounded metadata + storage).
    *
    * Per-ref retention policies (snapshot.rs:258-307) are honored first:
    * a ref older than its `maxRefAgeMs` (age measured from its snapshot's
    * commit timestamp against `nowMs`) is REMOVED in the same commit, so
    * its snapshots lose protection; a surviving branch ref protects its
    * head plus `minSnapshotsToKeep - 1` most recent ancestors along the
    * parent chain.
    */
  def expireSnapshots(spark: SparkSession, table: IceTable, keepLast: Int,
                      nowMs: Long = System.currentTimeMillis()): IceTable = {
    val m = table.metadata
    val bySeq = m.snapshots.values.toSeq.sortBy(_.sequenceNumber)

    // 1. refs past their max age die with this commit (main never expires)
    val staleRefs: Seq[String] = m.refs.toSeq.collect {
      case (name, r) if name != m.MainBranch && r.maxRefAgeMs.exists(age =>
        m.snapshotById(r.snapshotId).exists(s => nowMs - s.timestampMs > age)) => name
    }
    val liveRefs = m.refs -- staleRefs

    // 2. surviving branch refs protect min-snapshots-to-keep of ancestry
    val refProtected: Set[Long] = liveRefs.values.flatMap { r =>
      m.ancestorsOf(r.snapshotId).take(math.max(1, r.minSnapshotsToKeep.getOrElse(1)))
    }.toSet

    val keepIds: Set[Long] =
      (bySeq.takeRight(keepLast).map(_.snapshotId) ++ refProtected ++ m.currentSnapshotId).toSet
    val expire = bySeq.filterNot(s => keepIds.contains(s.snapshotId))
    if (expire.isEmpty && staleRefs.isEmpty) return table

    def filesOf(snapIds: Set[Long]): (Set[String], Set[String], Set[String]) = {
      val snaps = snapIds.flatMap(m.snapshotById)
      val lists = snaps.map(_.manifestList)
      val manifests = snaps.flatMap(s => table.manifests(s)).map(_.manifestPath)
      val data = snaps.flatMap(s => table.entries(s)).map(_.dataFile.filePath)
      (lists, manifests, data)
    }
    val (keepLists, keepManifests, keepData) = filesOf(keepIds.intersect(m.snapshots.keySet))
    val (expLists, expManifests, expData) = filesOf(expire.map(_.snapshotId).toSet)

    val committed = table.catalog.updateTable(CommitTable(table.ident,
      Seq(TableRequirement.AssertRefSnapshotId(m.MainBranch, m.currentSnapshotId)),
      staleRefs.map(TableUpdate.RemoveSnapshotRef) :+
        TableUpdate.RemoveSnapshots(expire.map(_.snapshotId))))
    table.metadata = committed

    // physical deletes AFTER the metadata commit: a failure here leaks
    // orphans (re-runnable) instead of corrupting a live snapshot — and is
    // logged + counted (Cleanup.rm), never thrown: the expiration COMMIT
    // has landed, so an IO hiccup here must not look like a failed expire
    val conf = spark.sparkContext.hadoopConfiguration
    val ctx = s"snapshot expiration of ${table.ident}"
    Cleanup.rm(conf, expData -- keepData, ctx)
    Cleanup.rm(conf, expManifests -- keepManifests, ctx)
    Cleanup.rm(conf, expLists -- keepLists, ctx)
    table
  }

  /** Deletes files under the table location that NO snapshot references —
    * leftovers of failed writes (staged data files whose commit lost or
    * crashed) and of interrupted maintenance. `olderThanMs` protects
    * in-flight writes: a staged file younger than the horizon may belong to
    * a commit that has not happened yet, so it is never touched (Iceberg's
    * remove_orphan_files has the same contract for the same reason).
    *
    * The referenced set comes from manifest metadata (including DELETED
    * entries — their files may still serve time travel); the table location
    * walk is the one inherently O(files) listing in maintenance, which is
    * why this is a deliberate, explicitly-invoked op rather than part of any
    * commit path. Metadata JSONs and the version hint are always kept (the
    * catalog owns their lifecycle).
    *
    * Returns (files deleted, bytes reclaimed).
    */
  def removeOrphanFiles(spark: SparkSession, table: IceTable,
                        olderThanMs: Long = 24L * 3600 * 1000,
                        nowMs: Long = System.currentTimeMillis()): (Int, Long) = {
    val m = table.metadata
    val snaps = m.snapshots.values.toSet
    val manifestPaths = snaps.flatMap(s => table.manifests(s)).map(_.manifestPath)
    val referenced: Set[String] =
      snaps.map(_.manifestList) ++
        manifestPaths ++
        manifestPaths.flatMap(p => ManifestIO.readManifest(p).map(_.dataFile.filePath))
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(m.location)
    val fs = root.getFileSystem(conf)
    val cutoff = nowMs - olderThanMs
    var count = 0
    var bytes = 0L
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      val p = f.getPath
      val raw = p.toUri.getPath
      // catalog-internal files under metadata/ are never orphans: version
      // locks are the FileCatalog's CAS claim markers (deleting an old one
      // would let a committer holding a stale listing re-claim an already-
      // committed version number → two metadata files for one version), and
      // .tmp files are staged writes owned by an in-flight commit
      val name = p.getName
      val keep = referenced.contains(raw) || referenced.contains(p.toString) ||
        raw.endsWith(".metadata.json") || name.startsWith("version-hint") ||
        name.endsWith(".version.lock") || name.endsWith(".tmp") ||
        f.getModificationTime >= cutoff
      if (!keep) {
        bytes += f.getLen
        fs.delete(p, false)
        count += 1
      }
    }
    (count, bytes)
  }

  /** Selective binpack compaction: rewrites ONLY partitions' small-file
    * residue (files under `targetSizeBytes`, at least `minInputFiles` of
    * them per partition) into merged files; everything already well-sized
    * is untouched — at 100 TB a full rewrite (`compact`) over a mostly-
    * healthy table is exactly the job you cannot afford, while the
    * append-heavy small-file tail is small and cheap. Commits via
    * [[Transaction.rewriteFiles]]: kept entries preserve their sequence
    * numbers, history stays reachable (superseded originals are cleaned by
    * `expireSnapshots`, not here).
    *
    * Tables carrying row-level delete files must `compact` first (a
    * partial rewrite under equality/positional deletes would need
    * delete-aware sequencing per group): this op refuses rather than
    * silently corrupting MoR semantics. Foreign-spec files are skipped
    * (compaction migrates layouts, binpack does not).
    *
    * Returns (data files before, after).
    */
  def rewriteDataFiles(spark: SparkSession, table: IceTable,
                       targetSizeBytes: Long = 134217728L,
                       minInputFiles: Int = 2): (Int, Int) = {
    val snap = table.currentSnapshot(None).getOrElse(return (0, 0))
    val all = table.entries(snap)
    val before = all.count(_.dataFile.content == ContentData)
    if (all.exists(_.dataFile.content != ContentData))
      throw new IllegalStateException(
        "rewriteDataFiles on a table with row-level deletes: run compact() to fold them first")
    val m = table.metadata
    val current = table.entries(snap,
        manifestFilter = ml => ml.content == 0 && ml.partitionSpecId == m.defaultSpecId)
      .filter(_.dataFile.content == ContentData)
    // group key normalizes binary partition values: Array[Byte] compares by
    // reference, which would split equal partitions into singleton groups
    // and silently binpack nothing
    def partKey(e: ManifestEntry): Seq[(String, Any)] =
      e.dataFile.partition.map {
        case (k, v: Array[Byte]) => (k, v.toSeq)
        case kv => kv
      }
    val toRewrite: Seq[ManifestEntry] = current.groupBy(partKey).values
      .flatMap { es =>
        val small = es.filter(_.dataFile.fileSizeInBytes < targetSizeBytes)
        if (small.size >= minInputFiles) small else Nil
      }.toSeq
    if (toRewrite.isEmpty) return (before, before)
    val rewritePaths = toRewrite.map(_.dataFile.filePath).toSet
    val df = graft.spark.IceScan.scan(spark, table,
      options = graft.spark.IceScan.ScanOptions(dataFileFilter = Some(rewritePaths.contains)))
    val newFiles = graft.spark.IceWrite.writeDataFiles(spark, table, df, table.schema)
    val kept = current.filterNot(e => rewritePaths(e.dataFile.filePath))
    val committed = table.newTransaction(None).rewriteFiles(kept, newFiles).commit()
    val after = committed.currentSnapshot(None)
      .map(committed.entries(_).count(_.dataFile.content == ContentData)).getOrElse(0)
    (before, after)
  }

  /** Positional-delete compaction: every DELETE/UPDATE leaves another small
    * (file_path, pos) delete file, and each one is a separate anti-join
    * input for every subsequent read — MoR read cost grows with DELETE
    * count, not delete volume. This consolidates all positional delete
    * files into one balanced set, dropping entries that reference data
    * files no longer live in the current snapshot (dangling masks from
    * compacted/rewritten files). Equality delete entries keep their
    * original manifests' sequence numbers untouched (their masking is
    * order-sensitive); positional rows are sequence-independent — they name
    * explicit unique paths — so the consolidated file can safely enter at
    * the new snapshot's sequence number. Superseded delete files stay
    * reachable through older snapshots until expiration.
    *
    * Returns (positional delete files before, after, dangling rows
    * dropped). */
  def rewritePositionDeleteFiles(spark: SparkSession, table: IceTable): (Int, Int, Long) = {
    import org.apache.spark.sql.functions.col
    val snap = table.currentSnapshot(None).getOrElse(return (0, 0, 0L))
    val all = table.entries(snap)
    // parquet positional files only: deletion vectors are already one
    // compact blob per data file — they carry over untouched in `keep`
    val (dvs, pos) = all.filter(_.dataFile.content == ContentPositionDeletes)
      .partition(_.dataFile.fileFormat == FormatPuffin)
    if (pos.isEmpty) return (0, 0, 0L)
    val eq = all.filter(_.dataFile.content == ContentEqualityDeletes)
    // live-path filter joins against the manifest-derived path list (driver
    // metadata already in hand — never a storage listing). Delete rows store
    // `_metadata.file_path` verbatim (FileSystem-qualified, any scheme), so
    // the manifest paths qualify driver-side through the SAME Hadoop
    // resolution the MoR scan uses — exact string equality on any
    // filesystem, local or remote
    import spark.implicits._
    val hconf = spark.sparkContext.hadoopConfiguration
    val live = all.filter(_.dataFile.content == ContentData)
      .map(e => graft.spark.IceScan.qualifiedPath(hconf, e.dataFile.filePath))
      .toDF("live_path")
    val total = pos.map(_.dataFile.recordCount).sum
    val kept = spark.read.parquet(pos.map(_.dataFile.filePath): _*)
      .join(live, col("file_path") === col("live_path"), "left_semi")
      .cache() // read twice: the dangling count + the consolidated write
    val keptCount = kept.count()
    val dropped = total - keptCount
    if (pos.size <= 1 && dropped == 0L) { kept.unpersist(); return (pos.size, pos.size, 0L) }
    val files =
      if (keptCount == 0L) Nil
      else graft.spark.IceWrite.writeDataFiles(spark, table, kept,
        graft.spark.IceWrite.PosDeleteSchema, content = ContentPositionDeletes,
        outFiles = graft.spark.IceWrite.fileCountHint(keptCount))
    kept.unpersist()
    val committed = table.newTransaction(None).rewriteDeletes(eq ++ dvs, files).commit()
    val after = committed.currentSnapshot(None)
      .map(committed.entries(_).count(e => e.dataFile.content == ContentPositionDeletes &&
        e.dataFile.fileFormat != FormatPuffin)).getOrElse(0)
    (pos.size, after, dropped)
  }

  /** Converts every PARQUET positional-delete file into V3 DELETION VECTORS
    * — the upgrade-maintenance op the Iceberg V3 spec requires before a
    * table adds new DVs (a data file must never be masked by both carriers
    * with neither superseding the other; here the conversion FOLDS parquet
    * positions into the per-file vectors, so post-conversion each data file
    * has at most one DV and zero parquet positional files). Dangling
    * positions (referencing data files no longer live) drop, as in
    * [[rewritePositionDeleteFiles]]. Existing DVs merge with the converted
    * positions for the same data file. The read side then applies ONE
    * broadcast bitmap filter instead of an anti-join against every
    * accumulated delete row — the 100 TB payoff.
    *
    * Returns (parquet positional files before, DV entries after, positions
    * vectorized). */
  def convertPositionDeletesToDVs(spark: SparkSession, table: IceTable): (Int, Int, Long) = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val snap = table.currentSnapshot(None).getOrElse(return (0, 0, 0L))
    val all = table.entries(snap)
    val (dvs, pos) = all.filter(_.dataFile.content == ContentPositionDeletes)
      .partition(_.dataFile.fileFormat == FormatPuffin)
    if (pos.isEmpty) return (0, dvs.size, 0L)
    val hconf = spark.sparkContext.hadoopConfiguration
    val live = all.filter(_.dataFile.content == ContentData)
      .map(e => graft.spark.IceScan.qualifiedPath(hconf, e.dataFile.filePath))
      .toDF("live_path")
    // distributed per-file bitmap build over the surviving delete rows; only
    // the serialized vectors come to the driver
    val perFile: Seq[(String, Array[Byte])] =
      spark.read.schema(graft.spark.IceWrite.PosDeleteSchema.toSpark)
        .parquet(pos.map(_.dataFile.filePath): _*)
        .join(live, col("file_path") === col("live_path"), "left_semi")
        .select(col("file_path"), col("pos"))
        .toDF("_1", "_2").as[(String, Long)]
        .groupByKey(_._1)
        .mapGroups { (path, it) =>
          val arr = it.map(_._2).toArray
          java.util.Arrays.sort(arr)
          (path, Roaring.Bitmap64.fromSorted(arr).serialize)
        }
        .collect().toSeq
    val existing: Map[String, ManifestEntry] = dvs.iterator
      .flatMap(e => e.dataFile.referencedDataFile.map(_ -> e)).toMap
    var vectorized = 0L
    val merged: Seq[(String, Roaring.Bitmap64, Option[ManifestEntry])] =
      perFile.sortBy(_._1).map { case (p, bytes) =>
        val fresh = Roaring.Bitmap64.deserialize(bytes)
        vectorized += fresh.cardinality
        existing.get(p) match {
          case Some(e) =>
            (p, fresh.union(graft.spark.IceWrite.readDvBitmap(hconf, e.dataFile)), Some(e))
          case None => (p, fresh, None)
        }
      }
    if (merged.isEmpty) {
      // every parquet position was dangling: drop the files, keep eq + DVs
      val keepAll = all.filter(e => e.dataFile.content != ContentData &&
        !pos.exists(_ eq e))
      table.newTransaction(None).rewriteDeletes(keepAll, Nil).commit()
      return (pos.size, dvs.size, 0L)
    }
    val committed = graft.spark.IceWrite.commitDeletionVectors(spark, table, None, all,
      merged.map(m => (m._1, m._2)), drop = pos ++ merged.flatMap(_._3))
    val after = committed.currentSnapshot(None)
      .map(committed.entries(_).count(e => e.dataFile.content == ContentPositionDeletes &&
        e.dataFile.fileFormat == FormatPuffin)).getOrElse(0)
    (pos.size, after, vectorized)
  }

  /** Converts every EQUALITY delete into POSITIONAL deletes — the MoR
    * read-cost maintenance op. An equality delete's masked-row set is
    * FROZEN the moment it commits (it masks only strictly-older rows, and
    * a committed row's sequence number never changes), so materializing
    * those rows' (file path, position) pairs now is exact for every future
    * read: the scan drops its per-sequence-point anti-join fold entirely
    * and keeps the one global positional mask, while rows inserted after
    * the original delete stay live (positions identify exact rows, keys
    * do not). Existing positional deletes consolidate into the same fresh
    * file set; matching honors the scan's scoping rules (a
    * partition-scoped delete file only masks its own partition, keyed on
    * the [[graft.spark.IceScan.pkTag]] tag; null keys match null — the
    * `<=>` Iceberg equality-delete semantics).
    *
    * Cost: ONE read per eq-id key set over that set's CANDIDATE data files
    * (files at least one delete of the set applies to), projecting just
    * the equality columns plus row metadata — sequence ordering and
    * partition scoping ride the JOIN PREDICATE (`data_seq < del_seq`,
    * null-safe tag match) instead of grouping reads per delete wave, so a
    * data file older than k delete waves is still scanned once, not k
    * times (the r14 read-amplification finding; IceTableSpec pins it with
    * a listener-counted records-read gate). At 100 TB this reads the
    * delete-affected region once — the price the per-scan fold otherwise
    * pays forever.
    *
    * A group whose equality-column ids no longer resolve in the current
    * schema (a setSchema evolution dropped a keyed column) ABORTS the
    * conversion: silently skipping it while rewriteDeletes drops every
    * equality file would permanently resurface that group's deleted rows.
    *
    * Returns (equality files before, positional files after, positions
    * written). */
  def convertEqualityDeletes(spark: SparkSession, table: IceTable): (Int, Int, Long) = {
    import org.apache.spark.sql.functions.{broadcast, col}
    import spark.implicits._
    import graft.spark.{IceScan, IceWrite}
    val snap = table.currentSnapshot(None).getOrElse(return (0, 0, 0L))
    val all = table.entries(snap)
    val eq = all.filter(_.dataFile.content == ContentEqualityDeletes)
    // parquet positional files consolidate into the fresh set; deletion
    // vectors carry over untouched in `keep` (dropping them would resurface
    // their masked rows)
    val (dvKeep, oldPos) = all.filter(_.dataFile.content == ContentPositionDeletes)
      .partition(_.dataFile.fileFormat == FormatPuffin)
    if (eq.isEmpty) return (0, oldPos.size, 0L)
    val data = all.filter(_.dataFile.content == ContentData)
    val schema = table.metadata.currentSchema
    val hconf = spark.sparkContext.hadoopConfiguration

    // the scan's scoping rule (IceSpark.buildDataFrame): a delete with a
    // real partition tuple of the data arity is partition-scoped
    val arity = data.headOption.map(_.dataFile.partition.size).getOrElse(0)
    def scopedOf(d: ManifestEntry): Boolean = {
      val p = d.dataFile.partition
      arity > 0 && p.size == arity && p.exists(_._2 != null)
    }

    // field-id column resolution for every read below (restored: all
    // actions complete inside this call — the positionDeleteFiles pattern)
    val fieldIdConfs = Seq("spark.sql.parquet.fieldId.read.enabled",
      "spark.sql.parquet.fieldId.read.ignoreMissing")
    val prev = fieldIdConfs.map(k => k -> spark.conf.getOption(k))
    fieldIdConfs.foreach(spark.conf.set(_, "true"))
    try {
      // ONE group per eq-id KEY SET (not per delete wave): sequence points
      // and partition scopes become per-row join predicates, so each
      // candidate data file is read once however many waves key on it
      val groups = eq.groupBy(_.dataFile.equalityIds)
        .toSeq.sortBy(_._1.mkString(","))
      val parts = groups.flatMap { case (eqIds, files) =>
        val eqCols = eqIds.flatMap(id => schema.fieldById(id)).map(_.name)
        // an unconvertible group must ABORT the op: rewriteDeletes below
        // drops ALL equality files, so skipping this group would silently
        // resurface its deleted rows forever
        require(eqCols.size == eqIds.size,
          s"cannot convert equality-delete group keyed on field ids " +
            s"${eqIds.mkString(", ")}: ${eqIds.count(id => schema.fieldById(id).isEmpty)} " +
            "id(s) no longer resolve in the current schema (a schema evolution dropped " +
            "a keyed column) — the conversion is aborted; no deletes were rewritten")
        // per delete file: (qualified path, sequence point, scope tag | null)
        val delMeta = files.map { f =>
          (IceScan.qualifiedPath(hconf, f.dataFile.filePath),
            f.sequenceNumber.getOrElse(0L),
            if (scopedOf(f)) IceScan.pkTag(f.dataFile.partition) else null)
        }
        // a data file is a candidate iff at least one delete of the set
        // applies to it (strictly older; tag-matched for scoped deletes)
        val candidates = data.filter { e =>
          val dseq = e.sequenceNumber.getOrElse(0L)
          lazy val dtag = IceScan.pkTag(e.dataFile.partition)
          delMeta.exists { case (_, ds, tag) =>
            dseq < ds && (tag == null || tag == dtag) }
        }
        if (candidates.isEmpty) None
        else {
          val candMeta = candidates.map(e =>
            (IceScan.qualifiedPath(hconf, e.dataFile.filePath),
              e.sequenceNumber.getOrElse(0L),
              IceScan.pkTag(e.dataFile.partition)))
          val rows = spark.read
            .schema(IceScan.readSparkSchema(table, schema.project(eqIds)))
            .parquet(candidates.map(_.dataFile.filePath): _*)
            .select(eqCols.map(col) ++ Seq(
              col("_metadata.file_path").as("file_path"),
              col("_metadata.row_index").as("pos")): _*)
          val lhs = rows.join(
            broadcast(candMeta.toDF("__gp_dp", "__gp_dseq", "__gp_dtag")),
            rows("file_path") === col("__gp_dp")).drop("__gp_dp")
          val rhs = spark.read
            .schema(IceScan.readSparkSchema(table, schema.project(eqIds)))
            .parquet(files.map(_.dataFile.filePath): _*)
            .withColumn("__gp_dfp", col("_metadata.file_path"))
            .join(broadcast(delMeta.toDF("__gp_ddp", "__gp_delseq", "__gp_deltag")),
              col("__gp_dfp") === col("__gp_ddp"))
            .select(eqCols.map(col) ++ Seq(col("__gp_delseq"), col("__gp_deltag")): _*)
          // delete-side broadcast is SIZE-GATED like the MoR read fold
          // (VERDICT r15 #5): months of accumulated MERGE residue in one
          // key-set group can exceed the broadcast ceiling — above the
          // gate, drop the hint and let the null-safe eq-column equi-keys
          // carry a shuffled hash/sort-merge join (seq + tag stay as join
          // predicates either way)
          val l = lhs.as("d")
          val rhsAliased = rhs.as("x")
          val r = if (IceScan.deleteFitsBroadcast(spark,
              files.map(_.dataFile.fileSizeInBytes).sum)) broadcast(rhsAliased)
            else rhsAliased
          val cond = (eqCols.map(c => col(s"d.$c") <=> col(s"x.$c")) :+
            (col("d.__gp_dseq") < col("x.__gp_delseq")) :+
            (col("x.__gp_deltag").isNull || col("x.__gp_deltag") === col("d.__gp_dtag")))
            .reduce(_ && _)
          Some(l.join(r, cond, "left_semi").select(col("file_path"), col("pos")))
        }
      }
      val carried =
        if (oldPos.isEmpty) Nil
        else Seq(spark.read.schema(IceWrite.PosDeleteSchema.toSpark)
          .parquet(oldPos.map(_.dataFile.filePath): _*)
          .select(col("file_path"), col("pos")))
      val masked = (parts ++ carried) match {
        case Nil => None
        case xs => Some(xs.reduce(_ unionByName _).distinct().cache())
      }
      val n = masked.map(_.count()).getOrElse(0L)
      val newFiles =
        if (n == 0L) Nil
        else IceWrite.writeDataFiles(spark, table, masked.get, IceWrite.PosDeleteSchema,
          content = ContentPositionDeletes, outFiles = IceWrite.fileCountHint(n))
      masked.foreach(_.unpersist())
      val committed = table.newTransaction(None).rewriteDeletes(dvKeep, newFiles).commit()
      val after = committed.currentSnapshot(None)
        .map(committed.entries(_).count(e => e.dataFile.content == ContentPositionDeletes &&
          e.dataFile.fileFormat != FormatPuffin))
        .getOrElse(0)
      (eq.size, after, n)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Rebalances the data manifest tree without touching data: many small
    * manifests (the residue of many small commits) slow O(manifests) scan
    * planning; this rewrites them as a fresh sqrt-law-balanced set in one
    * metadata-only snapshot. Returns (manifests before, after). */
  def rewriteManifests(table: IceTable): (Int, Int) = {
    val snap = table.currentSnapshot(None).getOrElse(return (0, 0))
    val before = table.manifests(snap).count(_.content == 0)
    // only manifests under the CURRENT spec rebalance; foreign-spec
    // manifests carry over (their partition records cannot be re-encoded)
    val entries = table.entries(snap,
        manifestFilter = ml => ml.content == 0 &&
          ml.partitionSpecId == table.metadata.defaultSpecId)
      .filter(_.dataFile.content == ContentData)
    if (entries.isEmpty) return (before, before)
    val committed = table.newTransaction(None).rewriteManifests(entries).commit()
    val after = committed.currentSnapshot(None)
      .map(committed.manifests(_).count(_.content == 0)).getOrElse(0)
    (before, after)
  }

  /** Backfills per-file NDV statistics (`distinct_counts`) for tables that
    * did not opt in at write time: ONE distributed aggregation over the
    * current data files, then a metadata-only manifest rewrite attaches the
    * counts — the optimizer's CBO join-cardinality estimates pick them up on
    * the next scan. Data is read once; no data file is rewritten. */
  def computeStats(spark: SparkSession, table: IceTable): Int = {
    import org.apache.spark.sql.functions.{approx_count_distinct, col}
    val snap = table.currentSnapshot(None).getOrElse(return 0)
    // current-spec files only — the stats rewrite rides rewriteManifests,
    // which cannot re-encode foreign-spec partition records
    val entries = table.entries(snap,
        manifestFilter = ml => ml.content == 0 &&
          ml.partitionSpecId == table.metadata.defaultSpecId)
      .filter(_.dataFile.content == ContentData)
    if (entries.isEmpty) return 0
    val primFields = table.schema.fields.filter(_.fieldType match {
      case _: graft.spec.IceType.StructT | _: graft.spec.IceType.ListT |
           _: graft.spec.IceType.MapT => false
      case _ => true
    })
    if (primFields.isEmpty) return 0
    val aggs = primFields.map(f => approx_count_distinct(col(f.name)).as(f.name))
    val ndvByFile: Map[String, Map[Int, Long]] =
      spark.read.schema(graft.spark.IceScan.readSparkSchema(table, table.schema))
        .parquet(entries.map(_.dataFile.filePath): _*)
        .groupBy(col("_metadata.file_path").as("__p"))
        .agg(aggs.head, aggs.tail: _*)
        .collect() // one row per data file — metadata scale
        .map(r => new Path(r.getString(0)).toUri.getPath ->
          primFields.zipWithIndex.map { case (f, i) => f.id -> r.getLong(i + 1) }.toMap)
        .toMap
    val enriched = entries.map { e =>
      val ndv = ndvByFile.getOrElse(new Path(e.dataFile.filePath).toUri.getPath, Map.empty)
      e.copy(dataFile = e.dataFile.copy(distinctCounts = ndv))
    }
    table.newTransaction(None).rewriteManifests(enriched).commit()
    enriched.count(_.dataFile.distinctCounts.nonEmpty)
  }

  /** Compaction: rewrites current content as one balanced file set via a
    * replace transaction. The replace commit drops the superseded snapshots
    * from metadata AND physically deletes the files only they referenced
    * (Transaction.deleteReplacedFiles — ref-shared files survive), so
    * compaction is metadata-clean and disk-clean in one step. */
  def compact(spark: SparkSession, table: IceTable): IceTable =
    compactWith(spark, table, identity)

  /** Z-order compaction (beyond the reference): rewrites current content
    * clustered by the Morton key over `cols` — every rewritten file carries
    * tight min/max bounds on ALL clustered columns, so statistics pruning
    * skips files for filters on any of them (not just a single leading sort
    * column). Unpartitioned tables range-partition on the key (disjoint
    * global ranges); PARTITIONED tables z-cluster locally inside each
    * partition directory (the partition layout itself is preserved — the
    * key sorts rows within each dir, so file rolling yields z-contiguous
    * files per partition).
    */
  def compactZOrder(spark: SparkSession, table: IceTable, cols: Seq[String],
                    outFiles: Int = 0): IceTable = {
    import graft.spark.expressions.ZOrderFunctions.zorder
    import org.apache.spark.sql.functions.col
    val key = zorder(cols.map(col): _*)
    if (table.spec.fields.nonEmpty)
      compactWith(spark, table, identity, localSort = Seq(key))
    else
      compactWith(spark, table, { df =>
        val n = if (outFiles > 0) outFiles
          else math.max(1, spark.sparkContext.defaultParallelism / 4)
        df.repartitionByRange(n, key).sortWithinPartitions(key)
      })
  }

  private def compactWith(spark: SparkSession, table: IceTable,
                          layout: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                          localSort: Seq[org.apache.spark.sql.Column] = Nil): IceTable = {
    if (table.currentSnapshot(None).isEmpty) return table
    val lineage = table.metadata.properties
      .get("write.row-lineage.enabled").contains("true")
    // V3 row lineage must SURVIVE compaction: scan with the lineage columns
    // and write them MATERIALIZED (reserved field ids) into the rewritten
    // files — every row keeps the id it was assigned at first commit, and
    // the read path prefers the stored column over position arithmetic
    val scanned =
      if (lineage) graft.spark.IceScan.scan(spark, table,
        options = graft.spark.IceScan.ScanOptions(rowLineage = true))
      else graft.spark.IceScan.scan(spark, table)
    val laidOut = layout(scanned)
    // the replace COMMIT itself deletes the superseded files (T3 — with the
    // branch/tag guard), so compaction needs no cleanup pass of its own
    if (lineage) {
      val writeSchema = graft.spec.IceSchema(table.schema.schemaId,
        table.schema.fields ++ Seq(
          graft.spec.NestedField(RowIdFieldId, "_row_id",
            required = false, graft.spec.IceType.LongT),
          graft.spec.NestedField(LastUpdatedSeqFieldId, "_last_updated_sequence_number",
            required = false, graft.spec.IceType.LongT)))
      val files = graft.spark.IceWrite.writeDataFiles(spark, table, laidOut, writeSchema,
        keepLayout = laidOut ne scanned, localSort = localSort)
      table.newTransaction(None).replace(files).commit()
    } else graft.spark.IceWrite.replaceWith(spark, table, laidOut,
      keepLayout = laidOut ne scanned, localSort = localSort)
  }
}
