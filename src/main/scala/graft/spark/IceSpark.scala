package graft.spark

import java.net.URLDecoder
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Pruning, Transform}
import graft.spec.{IceSchema, IceType, Snapshot}
import graft.table.ManifestModel._
import graft.table.{IceTable, ParquetStats}

/** Spark-native write path (reference: S7/S8 — datafusion_iceberg/src/
  * table.rs:740-792 + iceberg-rust/src/arrow/write.rs:89-266).
  *
  * The reference's per-partition fan-out stream becomes
  * `repartition(partitionExprs)` + `partitionBy` parquet tasks — Spark's
  * shuffle is the cluster-scale analogue of the reference's in-process
  * channel split (SURVEY §3.2). File rolling uses maxRecordsPerFile derived
  * from the 512 MB target (write.rs:66); compression matches the reference
  * default zstd level 1 (table/mod.rs:75-85).
  */
object IceWrite {

  /** Reserved prefix for physical partition-directory column names. */
  private[graft] val PartColPrefix = "__gp_"

  /** `-Dgraft.write.profile=true` prints per-stage write-path timings to
    * stderr (dev observability for the per-ACID-write constant; build.sbt
    * forwards graft.* sysprops into forked JVMs). */
  private[graft] val ProfileWrites = java.lang.Boolean.getBoolean("graft.write.profile")
  private[graft] def ptime[A](label: String)(f: => A): A =
    if (!ProfileWrites) f
    else {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(
        f"[iceprof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3fs")
      r
    }

  // One standing write child per parent session (weak keys: a stopped and
  // dereferenced parent must not pin its child). The child's conf set is
  // CONSTANT, so every write can share it — and a concurrent write on the
  // same parent shares it safely for the same reason.
  private val writeSessions =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, SparkSession]())

  // Parent confs that change the BYTES we write — re-synced from the parent
  // on every write so the memoized child does not freeze the parent's conf
  // state as of the first write (newSession() clones confs only once).
  private val ResyncedConfs = Seq(
    "spark.sql.session.timeZone",
    "spark.sql.parquet.compression.codec",
    "spark.sql.datetime.java8API.enabled")

  private[graft] def writeSessionFor(spark: SparkSession): SparkSession =
    writeSessions.synchronized {
      val cur = writeSessions.get(spark)
      val ws =
        if (cur != null) cur
        else {
          val fresh = spark.newSession()
          fresh.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
          fresh.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
          // AQE OFF for write plans: their shapes are explicit
          // (repartition(partCols) / repartitionByRange / coalesce(nOut)),
          // so AQE has nothing to improve — but its stage-materialization
          // makes the pre-write partition-count probe EXECUTE the producing
          // query (measured 0.44 s of a 0.95 s three-row MV write), and its
          // per-stage scheduling adds a constant to every tiny ACID write
          // (the q14/q97/q39-q41 latency class). Broadcast decisions in
          // write plans still fire statically off IceScan's manifest-exact
          // stats and the explicit MoR broadcast hints.
          fresh.conf.set("spark.sql.adaptive.enabled", "false")
          fresh.sessionState.newHadoopConf() // ensure defaults materialized
          writeSessions.put(spark, fresh)
          fresh
        }
      ResyncedConfs.foreach { k =>
        spark.conf.getOption(k) match {
          case Some(v) if !ws.conf.getOption(k).contains(v) => ws.conf.set(k, v)
          case _ => ()
        }
      }
      ws
    }

  /** Known-cardinality write sizing: rows → `writeDataFiles(outFiles)` hint
    * at ~4M rows per file — callers that can bound their output (MV merges,
    * MERGE key sets) use this instead of the optimizer's join estimates. */
  private[graft] def fileCountHint(rows: Long): Option[Int] =
    Some(math.max(1L, rows / 4000000L).min(Int.MaxValue).toInt)

  /** Runs two INDEPENDENT file-writing computations concurrently — an
    * atomic commit of data + delete files otherwise pays two sequential
    * per-job constants (the dominant cost of a tiny ACID write; Spark's
    * scheduler interleaves the jobs across the shared core pool). Callers
    * must not pass work that mutates shared session state (the
    * positionDeleteFiles conf dance stays sequential for this reason).
    * If `a` throws, the pending `b` job finishes into its own orphaned
    * staging dir and is never committed — the same abandonment any failed
    * write leaves. */
  private[graft] def inParallel[A, B](a: => A, b: => B): (A, B) = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fb = Future(b)
    val ra = a
    (ra, Await.result(fb, Duration.Inf))
  }

  /** Appends `df` to the table; returns the updated table. `summary` rides
    * the snapshot summary in the SAME commit — provenance that must be
    * atomic with the data (e.g. streaming batch ids for exactly-once).
    * `props` are table-property updates carried by the same commit (the
    * durable streaming ledger — state that must OUTLIVE snapshot
    * expiration rides properties, not summaries). The caller must own
    * these keys exclusively: they are declared retry-safe, so a CAS-retry
    * re-applies them last-writer-wins. */
  def append(spark: SparkSession, table: IceTable, df: DataFrame,
             branch: Option[String] = None,
             summary: Map[String, String] = Map.empty,
             props: Map[String, String] = Map.empty): IceTable = {
    val files = writeDataFiles(spark, table, df, table.schema)
    ptime("commit")(table.newTransaction(branch).appendData(files)
      .summaryExtra(summary.toSeq: _*)
      .updateProperties(props, ownedExclusively = true).commit())
  }

  /** Writes equality-delete files for the rows of `df` projected onto
    * `equalityIds` (S9, write.rs:119-126): any table row matching a delete
    * row on those columns — and older than the delete — is masked at read.
    */
  def appendEqualityDeletes(spark: SparkSession, table: IceTable, df: DataFrame,
                            equalityIds: Seq[Int], branch: Option[String] = None): IceTable = {
    val schema = table.schema
    val eqCols = equalityIds.map(id => schema.fieldById(id)
      .getOrElse(throw new IllegalArgumentException(s"unknown equality field id $id")).name)
    val projected = df.select(eqCols.map(col): _*).distinct()
    val deleteSchema = schema.project(equalityIds)
    val files = writeDataFiles(spark, table, projected, deleteSchema,
      content = ContentEqualityDeletes, equalityIds = equalityIds, branch = branch)
    table.newTransaction(branch).appendDeletes(files).commit()
  }

  /** Iceberg-spec field ids of the positional-delete file columns. */
  private[graft] val PosDeletePathId = 2147483546
  private[graft] val PosDeletePosId = 2147483545
  private[graft] val PosDeleteSchema = graft.spec.IceSchema(0, Seq(
    graft.spec.NestedField(PosDeletePathId, "file_path", required = true, graft.spec.IceType.StringT),
    graft.spec.NestedField(PosDeletePosId, "pos", required = true, graft.spec.IceType.LongT)))

  /** Writes POSITIONAL delete files for the current-snapshot rows matching
    * `predicate` (BEYOND the reference, which panics on content=1 files,
    * table.rs:422-424): each matching row is identified by its
    * (file path, row position) via Spark's `_metadata` columns — no data
    * rewrite, the scan masks the positions at read (merge-on-read).
    */
  def appendPositionDeletes(spark: SparkSession, table: IceTable, predicate: org.apache.spark.sql.Column,
                            branch: Option[String] = None): IceTable = {
    val files = positionDeleteFiles(spark, table, predicate, branch)
    if (files.isEmpty) table
    else table.newTransaction(branch).appendDeletes(files).commit()
  }

  /** The uncommitted half of [[appendPositionDeletes]]: writes the delete
    * files and returns them so a caller (e.g. SQL UPDATE) can commit them
    * TOGETHER with replacement data files in one atomic transaction.
    */
  private[graft] def positionDeleteFiles(spark: SparkSession, table: IceTable,
                                         predicate: org.apache.spark.sql.Column,
                                         branch: Option[String] = None): Seq[DataFile] =
    matchedPositions(spark, table, predicate, branch) { matches =>
      writeDataFiles(spark, table, matches, PosDeleteSchema,
        content = ContentPositionDeletes)
    }.getOrElse(Nil)

  /** Runs `use` over the (file_path, pos) DataFrame of current-snapshot rows
    * matching `predicate` — the shared front half of BOTH positional-delete
    * writers (parquet files and deletion vectors). `use` must consume the
    * frame EAGERLY (an action): the field-id read confs are restored when
    * this returns. None ⇔ pruning proved no file can match.
    */
  private def matchedPositions[T](spark: SparkSession, table: IceTable,
                                  predicate: org.apache.spark.sql.Column,
                                  branch: Option[String])(use: DataFrame => T): Option[T] = {
    val snap = table.currentSnapshot(branch)
      .getOrElse(throw new IllegalStateException("cannot delete from an empty table"))
    // manifest/file pruning on the DELETE predicate: a file whose stats
    // prove it cannot contain matching rows need not be read at all — a
    // partition-scoped DELETE at 100 TB touches O(partition) files, not
    // O(table). Pruning is inexact-safe (only removes never-matching files).
    val paths = IceScan.prunedDataFilePaths(spark, table, Seq(predicate), snap)
    if (paths.isEmpty) return None
    // resolve parquet columns by PARQUET:field_id like the scan path: files
    // written before a RENAME COLUMN must still bind the predicate to the
    // renamed column, not evaluate it against nulls. Restored in finally —
    // unlike scan, every action completes inside this call.
    val fieldIdConfs = Seq("spark.sql.parquet.fieldId.read.enabled",
      "spark.sql.parquet.fieldId.read.ignoreMissing")
    val prev = fieldIdConfs.map(k => k -> spark.conf.getOption(k))
    fieldIdConfs.foreach(spark.conf.set(_, "true"))
    try {
      val matches = spark.read.schema(IceScan.readSparkSchema(table, table.schema)).parquet(paths: _*)
        .filter(predicate)
        .select(col("_metadata.file_path").as("file_path"),
          col("_metadata.row_index").as("pos"))
      Some(use(matches))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Reads one deletion-vector blob back into its bitmap. */
  private[graft] def readDvBitmap(conf: org.apache.hadoop.conf.Configuration,
                                  d: DataFile): graft.table.Roaring.Bitmap64 =
    graft.table.Puffin.dvFromBlob(graft.table.Puffin.readBlobRange(conf, d.filePath,
      d.contentOffset.getOrElse(sys.error(s"DV entry ${d.filePath} lacks content_offset")),
      d.contentSizeInBytes.getOrElse(sys.error(s"DV entry ${d.filePath} lacks content_size"))))

  /** Deletes the current-snapshot rows matching `predicate` as Iceberg-V3
    * DELETION VECTORS (beyond the reference, which panics on ALL content=1
    * files, table.rs:422-424): one Puffin file per commit holding one
    * roaring-bitmap blob per referenced data file, replacing the
    * (file_path, pos) delete ROWS a parquet positional delete stores. The
    * read side applies them as a broadcast bitmap FILTER instead of an
    * anti-join — at 100 TB the delete side of the MoR plan drops from a
    * shuffled join against millions of delete rows to a compressed-bitmap
    * membership probe inside the scan's own filter.
    *
    * V3 invariant maintained here: at most ONE deletion vector per data
    * file. A file that already carries a DV gets a MERGED (old ∪ new)
    * replacement vector, committed via [[graft.table.Transaction.rewriteDeletes]]
    * so the superseded entry leaves the live snapshot in the same commit.
    *
    * The per-file bitmaps are built DISTRIBUTED (groupByKey over the matched
    * positions — each group is one data file's positions); only the
    * serialized vectors come to the driver, which writes the single puffin
    * artifact — byte volume proportional to the compressed vectors, never
    * to the table. Blob-level snapshot/sequence stamps inside the puffin
    * footer are informational (-1 until commit assigns them); the MANIFEST
    * carries the authoritative numbers, and readers locate blobs by the
    * manifest's content_offset/content_size without touching the footer.
    */
  def appendDeletionVectors(spark: SparkSession, table: IceTable,
                            predicate: org.apache.spark.sql.Column,
                            branch: Option[String] = None): IceTable = {
    import graft.table.{Puffin, Roaring}
    val snap = table.currentSnapshot(branch)
      .getOrElse(throw new IllegalStateException("cannot delete from an empty table"))
    val perFile: Seq[(String, Array[Byte])] =
      matchedPositions(spark, table, predicate, branch) { matches =>
        import spark.implicits._
        matches.toDF("_1", "_2").as[(String, Long)]
          .groupByKey(_._1)
          .mapGroups { (path, it) =>
            val arr = it.map(_._2).toArray
            java.util.Arrays.sort(arr)
            (path, Roaring.Bitmap64.fromSorted(arr).serialize)
          }
          .collect().toSeq
      }.getOrElse(Nil)
    if (perFile.isEmpty) return table

    val hconf = spark.sparkContext.hadoopConfiguration
    val all = table.entries(snap)
    val existing: Map[String, ManifestEntry] = all.iterator
      .filter(e => e.dataFile.content == ContentPositionDeletes &&
        e.dataFile.fileFormat == FormatPuffin)
      .flatMap(e => e.dataFile.referencedDataFile.map(_ -> e)).toMap
    val merged: Seq[(String, Roaring.Bitmap64, Option[ManifestEntry])] =
      perFile.sortBy(_._1).map { case (p, bytes) =>
        val fresh = Roaring.Bitmap64.deserialize(bytes)
        existing.get(p) match {
          case Some(e) => (p, fresh.union(readDvBitmap(hconf, e.dataFile)), Some(e))
          case None => (p, fresh, None)
        }
      }
    commitDeletionVectors(spark, table, branch, all,
      merged.map(m => (m._1, m._2)), merged.flatMap(_._3))
  }

  /** Writes one puffin file holding `vectors` (referenced path → bitmap) and
    * commits the DV entries: a pure append when `drop` is empty, otherwise a
    * delete-tree rewrite that keeps every live delete entry of `all` EXCEPT
    * the superseded `drop` set. Shared by [[appendDeletionVectors]] and
    * [[graft.table.Maintenance.convertPositionDeletesToDVs]]. */
  private[graft] def commitDeletionVectors(spark: SparkSession, table: IceTable,
                                           branch: Option[String],
                                           all: Seq[ManifestEntry],
                                           vectors: Seq[(String, graft.table.Roaring.Bitmap64)],
                                           drop: Seq[ManifestEntry]): IceTable = {
    import graft.table.Puffin
    val hconf = spark.sparkContext.hadoopConfiguration
    val puffinPath = s"${table.location}/data/${UUID.randomUUID()}-deletes.puffin"
    val blobs = vectors.map { case (p, bm) =>
      Puffin.BlobSpec(Puffin.dvBlobBytes(bm), Puffin.DeletionVectorV1,
        properties = Map("referenced-data-file" -> p,
          "cardinality" -> bm.cardinality.toString))
    }
    val (fileLen, metas) = Puffin.write(hconf, puffinPath, blobs,
      snapshotId = -1L, sequenceNumber = -1L)
    val dvFiles = vectors.zip(metas).map { case ((p, bm), meta) =>
      DataFile(
        content = ContentPositionDeletes,
        filePath = puffinPath,
        fileFormat = FormatPuffin,
        partition = Seq.empty,
        recordCount = bm.cardinality,
        fileSizeInBytes = fileLen,
        referencedDataFile = Some(p),
        contentOffset = Some(meta.offset),
        contentSizeInBytes = Some(meta.length))
    }
    if (drop.isEmpty)
      table.newTransaction(branch).appendDeletes(dvFiles).commit()
    else {
      val keep = all.filter(e => e.dataFile.content != ContentData &&
        !drop.exists(_ eq e))
      table.newTransaction(branch).rewriteDeletes(keep, dvFiles).commit()
    }
  }

  /** Compaction / full rewrite (T3): reads current content, rewrites it as
    * one balanced file set, commits a replace snapshot. `keepLayout` writes
    * the DataFrame's existing partitioning verbatim (the caller already
    * arranged a clustering layout, e.g. z-order ranges).
    *
    * Reference semantics: the replace commit REMOVES the superseded
    * snapshots (branch/tag-reachable lineage excepted) and physically
    * deletes their unshared files — a DataFrame planned over the
    * pre-replace snapshot must be acted on before the replace lands, and
    * time travel across a bare replace requires a protecting ref.
    */
  def replaceWith(spark: SparkSession, table: IceTable, df: DataFrame,
                  branch: Option[String] = None, keepLayout: Boolean = false,
                  localSort: Seq[Column] = Nil): IceTable = {
    val files = writeDataFiles(spark, table, df, table.schema, keepLayout = keepLayout,
      localSort = localSort)
    table.newTransaction(branch).replace(files).commit()
  }

  private[graft] def writeDataFiles(spark: SparkSession, table: IceTable, df: DataFrame,
                                    writeSchema: IceSchema, content: Int = ContentData,
                                    equalityIds: Seq[Int] = Nil,
                                    keepLayout: Boolean = false,
                                    localSort: Seq[Column] = Nil,
                                    outFiles: Option[Int] = None,
                                    branch: Option[String] = None): Seq[DataFile] = {
    val spec = table.spec
    val props = table.metadata.properties
    // ISOLATED write session (shared SparkContext / catalog / cache
    // manager, fresh SQLConf): the iceberg write settings live and die
    // with the child, so a CONCURRENT query on the caller's session — a
    // streaming micro-batch, another thread's scan — can never be planned
    // under them. Nothing to restore, even on throw. (The zstd level on
    // the context-global hadoopConfiguration is kept: it only applies
    // where the codec is zstd, which non-graft writes don't set.)
    // The child is MEMOIZED per parent: its confs are constant across
    // calls, and building a SessionState per write (analyzer, optimizer,
    // catalog wrappers) showed up as a 30-60% tax on every write-path
    // query in the round-10 bench.
    val writeSession = IceWrite.writeSessionFor(spark)
    val dfw = org.apache.spark.sql.GraftShim.ofRows(writeSession,
      df.queryExecution.analyzed)
    spark.sparkContext.hadoopConfiguration.set("parquet.compression.codec.zstd.level",
      props.getOrElse("write.parquet.compression-level", "1"))

    val stagingDir = s"${table.location}/data/${UUID.randomUUID()}"
    // align to schema order/names/types and attach field-id metadata so the
    // parquet writer emits PARQUET:field_id (id-based column resolution —
    // the rename-safe read path, SURVEY §7 hard-part 1)
    val targetSchema = writeSchema.toSpark
    val dfCols = dfw.columns.toSet
    val aligned = dfw.select(writeSchema.fields.map { f =>
      // a column the writer omitted fills from its WRITE default (V3
      // semantics; SQL INSERT fills via Spark's CURRENT_DEFAULT metadata,
      // this covers programmatic appends)
      val src =
        if (dfCols.contains(f.name)) col(f.name)
        else f.writeDefault match {
          case Some(v) => graft.spec.DefaultValues.toColumn(f.fieldType, v)
          case None => col(f.name) // unresolvable → the analyzer errors loudly
        }
      src.cast(IceType.toSpark(f.fieldType)).as(f.name, targetSchema(f.name).metadata)
    }: _*)

    // Equality-delete files are PARTITION-SCOPED when every partition
    // source column is among the delete columns: each delete row lands in
    // the dir its own values derive (the same transform the data rows
    // used), so a scoped file masks exactly what the global file would —
    // while the read fold's affected-tag map and per-partition maintenance
    // see O(affected partitions) of delete metadata instead of one opaque
    // global blob (the Iceberg spec's partition-scoped delete contract).
    // Position deletes and eq deletes missing a partition source stay
    // global: their rows cannot be scoped safely. Neither can a scoped
    // delete while any LIVE file predates the current spec: data files
    // written under an older spec carry a foreign partition tuple, read
    // with a null tag, and a scoped file's tag-keyed anti-join would
    // silently skip them — deleted rows would resurface. The gate is
    // "every live manifest (data AND delete) carries the current specId"
    // (one never-evolved spec passes trivially without reading the
    // manifest list): an evolved table that has since compact()ed — which
    // rewrites all data under the default spec and materializes/drops all
    // delete files — resumes scoped writes. Checked driver-side from the
    // manifest list only, O(manifests) — of the snapshot the delete will
    // COMMIT against (`branch`): a branch pinned before the compaction
    // still reaches old-spec data files even when main is clean, and a
    // scoped file committed there would silently skip them.
    def allLiveManifestsCurrentSpec: Boolean =
      table.metadata.partitionSpecs.size == 1 ||
        table.currentSnapshot(branch).forall(snap =>
          table.manifests(snap).forall(_.partitionSpecId == table.metadata.defaultSpecId))
    val partFields =
      if (content == ContentData) spec.fields
      else if (content == ContentEqualityDeletes && spec.fields.nonEmpty &&
               spec.fields.forall(pf => writeSchema.fieldById(pf.sourceId).isDefined) &&
               allLiveManifestsCurrentSpec)
        spec.fields
      else Nil
    // default write sort order (clustering): range-partition + local sort on
    // unpartitioned tables (disjoint per-file bounds → max statistics
    // pruning); local sort inside each partition dir on partitioned tables
    val sortCols: Seq[Column] =
      if (content != ContentData) Nil
      else table.metadata.sortOrders.getOrElse(table.metadata.defaultSortOrderId,
        graft.spec.SortOrder.unsorted).fields.flatMap { sf =>
        writeSchema.fieldById(sf.sourceId).map { src =>
          val base = sf.transform.column(col(src.name), IceType.toSpark(src.fieldType))
          (sf.direction, sf.nullOrder) match {
            case ("desc", "nulls-last") => base.desc_nulls_last
            case ("desc", _) => base.desc_nulls_first
            case (_, "nulls-last") => base.asc_nulls_last
            case _ => base.asc_nulls_first
          }
        }
      }
    // physical partition-dir columns carry a reserved prefix: partitionBy
    // REMOVES its columns from the file contents, and an identity-transform
    // partition field shares its source column's name — without the prefix
    // the source column itself would vanish from the data files
    def physName(pf: graft.spec.PartitionField): String = PartColPrefix + pf.name
    val writer = if (partFields.nonEmpty) {
      val sparkSchema = aligned.schema
      val withParts = partFields.foldLeft(aligned) { (acc, pf) =>
        val srcName = writeSchema.fieldById(pf.sourceId).get.name
        acc.withColumn(physName(pf), pf.transform.column(col(srcName), sparkSchema(srcName).dataType))
      }
      val repart = withParts.repartition(partFields.map(pf => col(physName(pf))): _*)
      // local sort prefixed by the partition-dir columns: one shuffle task
      // may hold SEVERAL dirs, and each dir's files only get tight bounds /
      // clustering (e.g. partitioned z-order) if its rows arrive contiguous
      // and ordered
      val effSort = localSort ++ sortCols
      (if (effSort.nonEmpty)
        repart.sortWithinPartitions(partFields.map(pf => col(physName(pf))) ++ effSort: _*)
      else repart)
        .write.partitionBy(partFields.map(physName): _*)
    } else if (keepLayout) {
      aligned.write
    } else {
      // write fan-in gated on the optimizer's output-size estimate: small
      // writes coalesce (fewer, larger files keep driver-side footer
      // scraping and the manifest tree small), but a write whose estimated
      // bytes already justify ≥inParts target-size files keeps FULL
      // parallelism — unconditional /4 would quarter cluster-scale writes
      // an explicit outFiles hint wins: callers that KNOW the output
      // cardinality (MV merges bounded by group count + manifest-exact
      // stored rows) skip the optimizer's join-size guesses — which
      // over-estimate badly and fan tiny outputs across the cluster — AND
      // the physical-planning pass that .rdd forces just to count partitions
      val nOut = outFiles.getOrElse {
        val inParts = ptime("plan: rdd partition count")(aligned.rdd.getNumPartitions)
        val targetFileBytes = props.getOrElse("write.target-file-size-bytes",
          (512L << 20).toString).toLong
        val estBytes = aligned.queryExecution.optimizedPlan.stats.sizeInBytes
        val idealFiles = ((estBytes + targetFileBytes - 1) / targetFileBytes)
          .min(BigInt(inParts)).max(BigInt(1)).toInt
        math.min(inParts, math.max(idealFiles, math.max(1, inParts / 4)))
      }
      (if (sortCols.nonEmpty)
        aligned.repartitionByRange(nOut, sortCols: _*).sortWithinPartitions(sortCols: _*)
      else aligned.coalesce(nOut)).write // coalesce above inParts is a no-op
    }

    // parquet bloom filters (point-lookup row-group skipping): table property
    // write.parquet.bloom-filter-enabled.column.<col>=true feeds the writer's
    // per-column option; parquet-mr then skips row groups on = predicates
    val BloomProp = "write.parquet.bloom-filter-enabled.column."
    val withBlooms = props.collect {
      case (k, v) if k.startsWith(BloomProp) =>
        s"parquet.bloom.filter.enabled#${k.stripPrefix(BloomProp)}" -> v
    }.foldLeft(writer) { case (w, (k, v)) => w.option(k, v) }

    ptime("write job")(withBlooms
      .option("compression", props.getOrElse("write.parquet.compression-codec", "zstd"))
      .option("maxRecordsPerFile",
        props.getOrElse("write.max-records-per-file", "10000000"))
      .parquet(stagingDir))

    ptime("footer scrape")(
      collectDataFiles(spark, table, stagingDir, writeSchema, partFields.map(_.name), content, equalityIds))
  }

  /** Walks the staging dir, parses hive-style partition dirs back to
    * canonical values, scrapes footers → DataFile stats (S10).
    */
  private def collectDataFiles(spark: SparkSession, table: IceTable, stagingDir: String,
                               writeSchema: IceSchema, partNames: Seq[String],
                               content: Int, equalityIds: Seq[Int]): Seq[DataFile] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new java.net.URI(stagingDir), conf)
    val partTypes: Map[String, IceType] = if (partNames.nonEmpty) {
      table.spec.partitionType(table.schema).fields.map(f => f.name -> f.fieldType).toMap
    } else Map.empty

    val paths = sortedPathsOf(fs, stagingDir)

    // distinct_counts population (A4; reference leaves the manifest field
    // empty, parquet.rs:85-90): one extra per-file approx_count_distinct
    // aggregation over the just-written files, opt-in via table property —
    // unlike footer scraping it reads data pages, so it is priced as a
    // deliberate write-time trade for optimizer NDV stats
    val distinctByFile: Map[String, Map[Int, Long]] =
      if (content != ContentData || paths.isEmpty ||
          !table.metadata.properties.get("write.metadata.distinct-counts.enabled").contains("true"))
        Map.empty
      else {
        val primFields = writeSchema.fields.filter(_.fieldType match {
          case _: IceType.StructT | _: IceType.ListT | _: IceType.MapT => false
          case _ => true
        })
        if (primFields.isEmpty) Map.empty
        else {
          val aggs = primFields.map(f => approx_count_distinct(col(f.name)).as(f.name))
          spark.read.schema(writeSchema.toSpark).parquet(paths: _*)
            .groupBy(col("_metadata.file_path").as("__p"))
            .agg(aggs.head, aggs.tail: _*)
            .collect() // one row per written file — metadata scale
            .map(r => new Path(r.getString(0)).getName ->
              primFields.zipWithIndex.map { case (f, i) => f.id -> r.getLong(i + 1) }.toMap)
            .toMap
        }
      }

    statsFiles(paths, stagingDir, conf, writeSchema,
      partTypes, content, equalityIds, distinctByFile)
  }

  /** Imports EXISTING parquet files into the table IN PLACE (no copy, no
    * rewrite): footer-scrapes each file under `sourceDir` (hive-style
    * `name=value` dirs map to identity partition values), appends them in
    * one transaction, and marks the table name-mapped
    * ([[IceScan.NameMappingProp]]) so reads resolve the id-less files by
    * column name. The migration path for data born outside the table format
    * — at 100 TB, rewriting is the thing to avoid.
    */
  def addFiles(spark: SparkSession, table: IceTable, sourceDir: String,
               branch: Option[String] = None): (IceTable, Seq[DataFile]) = {
    val m = table.metadata
    // name resolution requires stable names: a past RENAME means old files
    // carry old names — importing would silently mis-resolve them
    val renamed = m.schemas.values.flatMap(_.fields.map(f => f.id -> f.name))
      .groupBy(_._1).exists(_._2.map(_._2).toSet.size > 1)
    require(!renamed,
      "add_files requires a rename-free schema history: imported files resolve by column name")
    require(table.spec.fields.forall(_.transform == Transform.Identity),
      "add_files supports identity-partitioned or unpartitioned tables " +
        "(transform values cannot be derived from directory names)")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new java.net.URI(sourceDir), conf)
    val partTypes: Map[String, IceType] =
      table.spec.partitionType(table.schema).fields.map(f => f.name -> f.fieldType).toMap
    val paths = sortedPathsOf(fs, sourceDir)
    require(paths.nonEmpty, s"no parquet files under $sourceDir")
    val specOrder = table.spec.fields.map(_.name)
    val files0 = statsFiles(paths, sourceDir.stripSuffix("/"), conf, table.schema,
      partTypes, ContentData, Nil, Map.empty)
    // every required column AND every partition source column must exist in
    // every imported file: a missing optional column reads as null (fine),
    // a missing required one is corruption waiting for a scan — and unlike
    // Iceberg readers, this scan does NOT constant-fill identity partition
    // columns from partition metadata, so hive layouts that strip the
    // partition column from file contents are rejected rather than read as
    // nulls
    val requiredIds = (table.schema.fields.filter(_.required).map(_.id) ++
      table.spec.fields.map(_.sourceId)).toSet
    files0.foreach { f =>
      val present = f.valueCounts.keySet
      val missing = requiredIds -- present
      require(missing.isEmpty,
        s"${f.filePath} lacks required column(s) ${missing.flatMap(table.schema.fieldById).map(_.name).mkString(", ")} " +
          "(imported files must physically contain partition source columns)")
      // identity-partitioned: the dir-derived partition tuple must be complete
      require(f.partition.map(_._1).toSet == partTypes.keySet,
        s"${f.filePath}: partition dirs ${f.partition.map(_._1).mkString(",")} do not match spec ${partTypes.keySet.mkString(",")}")
    }
    // normalize each (validated-complete) partition tuple to SPEC FIELD
    // ORDER: external layouts may nest dirs in any order, but FieldSummary
    // bounds are positional against the spec — an out-of-order tuple would
    // attribute one field's bounds to another and silently mis-prune
    val files = files0.map(f =>
      f.copy(partition = specOrder.flatMap(n => f.partition.find(_._1 == n))))
    val committed = table.newTransaction(branch).appendData(files)
      .updateProperties(Map(IceScan.NameMappingProp -> "identity")).commit()
    (committed, files)
  }

  /** Hive partition-dir string → canonical JVM value. Transform outputs are
    * ints/longs/strings, but identity partitions keep the SOURCE type:
    * Spark renders a DateType dir as ISO "2020-01-01", which must parse back
    * to Iceberg's canonical epoch days. */
  private[graft] def parsePartitionValue(t: Option[IceType], raw: String): Any = t match {
    case Some(IceType.IntT) => raw.toInt
    case Some(IceType.DateT) =>
      if (raw.forall(c => c.isDigit || c == '-') && !raw.contains("--") && raw.count(_ == '-') == 2)
        java.time.LocalDate.parse(raw).toEpochDay.toInt
      else raw.toInt // transform outputs (year/month/day ordinals) are plain ints
    case Some(IceType.LongT) => raw.toLong
    case _ => raw
  }

  private def sortedPathsOf(fs: FileSystem, dir: String): Seq[String] = {
    val it = fs.listFiles(new Path(dir), true)
    val paths = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) paths += f.getPath.toUri.getPath
    }
    paths.toSeq.sorted
  }

  private def statsFiles(sortedPaths: Seq[String], baseDir: String,
                         conf: org.apache.hadoop.conf.Configuration,
                         writeSchema: IceSchema, partTypes: Map[String, IceType],
                         content: Int, equalityIds: Seq[Int],
                         distinctByFile: Map[String, Map[Int, Long]]): Seq[DataFile] = {
    // footer scraping is per-file independent driver IO — a partitioned
    // write emits one file per (task, dir) and a serial scrape of hundreds
    // of footers dominates small-table commit latency (measured: ~60% of a
    // month-partitioned append). Bounded thread pool; result order stays
    // the sorted path order, so manifests are deterministic.
    def statsOf(p: String): DataFile = {
      val rel = p.stripPrefix(baseDir).split('/').filter(_.nonEmpty)
      val partition: Seq[(String, Any)] = rel.init.flatMap { seg =>
        val i = seg.indexOf('=')
        if (i < 0) None
        else {
          val name = seg.take(i).stripPrefix(PartColPrefix)
          val raw = URLDecoder.decode(seg.drop(i + 1), "UTF-8")
          val v: Any =
            if (raw == "__HIVE_DEFAULT_PARTITION__") null
            else parsePartitionValue(partTypes.get(name), raw)
          Some(name -> v)
        }
      }.toSeq
      ParquetStats.dataFile(p, conf, writeSchema, partition, content, equalityIds,
        distinctCounts = distinctByFile.getOrElse(new Path(p).getName, Map.empty))
    }
    if (sortedPaths.size <= 1) sortedPaths.map(statsOf)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(16, sortedPaths.size))
      try {
        sortedPaths
          .map(p => pool.submit(new java.util.concurrent.Callable[DataFile] {
            override def call(): DataFile = statsOf(p)
          }))
          .map(_.get())
      } finally pool.shutdown()
    }
  }
}

/** Snapshot-aware scan → DataFrame (reference: S1 — datafusion_iceberg/src/
  * table.rs:162-728). Planning is driver-side and O(manifests): manifest
  * pruning via partition summaries (P3), file pruning via column min/max,
  * then a DataFrame over exactly the surviving parquet paths. Catalyst
  * re-applies filters (Inexact semantics) and handles projection pruning,
  * so pruning here only ever removes IO, never correctness.
  */
object IceScan {

  final case class ScanOptions(
      snapshotId: Option[Long] = None,
      branch: Option[String] = None,
      /** Incremental: only files with sequence number in (after, until]. */
      afterSequence: Option[Long] = None,
      /** Restrict the scan to specific DATA files (delete files still
        * apply) — maintenance rewrites read exactly their input set. */
      dataFileFilter: Option[String => Boolean] = None,
      /** Iceberg V3 row lineage: expose `_row_id` and
        * `_last_updated_sequence_number` columns — virtual
        * (first_row_id + position) for files with assigned lineage,
        * read directly where a rewrite MATERIALIZED them. */
      rowLineage: Boolean = false)

  /** Iceberg name-mapping property: set (to "identity") when the table
    * holds files WITHOUT parquet field ids — e.g. imported in place by
    * `CALL system.add_files` — so reads must resolve columns by NAME.
    * (Reference models the property on table metadata;
    * iceberg-rust-spec/src/spec/table_metadata.rs properties.)
    */
  val NameMappingProp = "schema.name-mapping.default"

  /** Renders a manifest-stored path exactly like `_metadata.file_path`
    * (FileSystem-qualified, any scheme) — the ONE definition of path
    * equality between manifest entries and rows derived from scans. Both
    * the MoR delete tag-map and the positional-delete rewrite compare
    * through this; a second inline copy drifting (e.g. on URI encoding)
    * would make them silently disagree. */
  /** Canonical partition tag: the manifest's raw Avro partition values
    * rendered to one stable string. Byte arrays hex-encode
    * (Object.toString is identity-based and would give the SAME partition
    * different tags per manifest entry); null renders as a reserved
    * sentinel. Shared by the MoR fold's scoped-delete anti-join keys and
    * Maintenance's eq->pos delete conversion. */
  private[graft] def pkTag(p: Seq[(String, Any)]): String = p.map {
    case (_, null) => "\u0000"
    case (_, b: Array[Byte]) => b.map("%02x".format(_)).mkString
    case (_, b: java.nio.ByteBuffer) =>
      val d = b.duplicate; val a = new Array[Byte](d.remaining); d.get(a)
      a.map("%02x".format(_)).mkString
    case (_, v) => v.toString
  }.mkString("\u0001")

  private[graft] def qualifiedPath(hconf: org.apache.hadoop.conf.Configuration,
                                   p: String): String = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(hconf).makeQualified(hp).toString
  }

  /** The Spark schema a scan should read with: field-id metadata drives
    * id-based (rename-safe) resolution, EXCEPT on name-mapped tables, where
    * id-less imported files would resolve every column to null — there the
    * ids are stripped so Spark falls back to name resolution for ALL files
    * (rename is rejected on such tables, so names are stable).
    */
  private[graft] def readSparkSchema(table: IceTable, schema: IceSchema): org.apache.spark.sql.types.StructType =
    if (!table.metadata.properties.contains(NameMappingProp)) schema.toSpark
    else stripFieldIds(schema.toSpark).asInstanceOf[org.apache.spark.sql.types.StructType]

  private def stripFieldIds(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case s: StructType => StructType(s.fields.map { f =>
        val md = new MetadataBuilder().withMetadata(f.metadata).remove("parquet.field.id").build()
        f.copy(dataType = stripFieldIds(f.dataType), metadata = md)
      })
      case a: ArrayType => a.copy(elementType = stripFieldIds(a.elementType))
      case m: MapType => m.copy(keyType = stripFieldIds(m.keyType),
        valueType = stripFieldIds(m.valueType))
      case other => other
    }
  }

  def scan(spark: SparkSession, table: IceTable, filters: Seq[Column] = Nil,
           options: ScanOptions = ScanOptions()): DataFrame = {
    val df = scanInternal(spark, table, options,
      sch => resolveFilters(spark, sch, filters))
    // re-apply (Inexact pruning semantics): stats pruning only removes IO
    filters.foldLeft(df)(_ filter _)
  }

  /** SQL read-path entry ([[org.apache.spark.sql.GraftReadRule]]): prunes
    * manifests and files with ALREADY-RESOLVED Catalyst predicates (the
    * optimizer's conjuncts over the relation output) and does NOT re-apply
    * them — the caller keeps its own `Filter` node on top, so graft's
    * inexact stats pruning stays IO-only while Spark preserves exactness.
    */
  def scanResolved(spark: SparkSession, table: IceTable,
                   exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
                   options: ScanOptions = ScanOptions()): DataFrame =
    scanInternal(spark, table, options, _ => exprs)

  private def scanInternal(spark: SparkSession, table: IceTable, options: ScanOptions,
                           exprsFor: org.apache.spark.sql.types.StructType =>
                             Seq[org.apache.spark.sql.catalyst.expressions.Expression]): DataFrame = {
    // id-based column resolution (rename-safe); tolerate id-less files.
    // Deliberately NOT restored: the returned DataFrame plans lazily, and
    // Spark reads these flags from the SESSION conf at physical-planning
    // time — restoring here would silently revert the caller's later action
    // to name-based resolution. A per-relation option map is NOT an
    // alternative in stock Spark: ParquetFileFormat overwrites these keys
    // from the session conf when it builds the reader, so
    // `.option("spark.sql.parquet.fieldId.read.enabled", ...)` is silently
    // ignored (verified empirically; ConfHygieneSpec pins the behavioral
    // consequence instead). Both flags are no-ops for schemas without
    // field-id metadata, so leaving them set is safe for non-graft reads.
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    spark.conf.set("spark.sql.parquet.fieldId.read.ignoreMissing", "true")
    val snapshot: Option[Snapshot] = options.snapshotId
      .flatMap(table.snapshotById)
      .orElse(table.currentSnapshot(options.branch))
    // current reads use the current schema; explicit time travel pins the
    // schema-at-snapshot (T6, table.rs:275-296)
    val schema =
      if (options.snapshotId.isDefined) table.metadata.schemaAt(snapshot)
      else table.metadata.currentSchema
    val sparkSchema = readSparkSchema(table, schema)

    snapshot match {
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sparkSchema)
      case Some(snap) =>
        val exprs = exprsFor(sparkSchema)
        val entries = prunedEntries(table, schema, snap, exprs, options.afterSequence)
        val (data0, deletes) = entries.partition(_.dataFile.content == ContentData)
        val data = options.dataFileFilter
          .map(f => data0.filter(e => f(e.dataFile.filePath))).getOrElse(data0)
        buildDataFrame(spark, table, schema, sparkSchema, data, deletes,
          rowLineage = options.rowLineage)
    }
  }

  /** Data-file paths surviving manifest + file-stats pruning for `filters`
    * at `snap` — the write paths (positional DELETE/UPDATE target reads)
    * share the scan's pruning instead of reading every file. */
  private[graft] def prunedDataFilePaths(spark: SparkSession, table: IceTable,
                                         filters: Seq[Column], snap: Snapshot): Seq[String] = {
    val schema = table.metadata.currentSchema
    val exprs = resolveFilters(spark, schema.toSpark, filters)
    prunedEntries(table, schema, snap, exprs, None)
      .filter(_.dataFile.content == ContentData)
      .map(_.dataFile.filePath)
  }

  /** CDC changelog read (natural S4 extension of the incremental scan;
    * snapshot-diff semantics): every row visible at `until` but not at
    * `after` carries `_change_type = 'insert'`, every row visible at `after`
    * but not at `until` carries `'delete'` — net changes, like diffing the
    * two snapshots. An append-only window never pays a diff: inserts stream
    * straight off the window's new data files via the incremental scan (at
    * 100 TB this is the common path — O(window), not O(table)); only a
    * window containing delete commits falls back to the EXCEPT ALL diff of
    * the two pinned scans.
    */
  def changelog(spark: SparkSession, table: IceTable, afterSnapshotId: Long,
                untilSnapshotId: Option[Long] = None): DataFrame = {
    val ChangeCol = "_change_type"
    val from = table.snapshotById(afterSnapshotId).getOrElse(
      throw new IllegalArgumentException(s"unknown snapshot $afterSnapshotId"))
    // an EXPLICIT until id must resolve — silently widening a mistyped or
    // expired id to the current snapshot would misattribute changes
    val to = untilSnapshotId match {
      case Some(id) => table.snapshotById(id).getOrElse(
        throw new IllegalArgumentException(s"unknown snapshot $id"))
      case None => table.currentSnapshot(None)
        .getOrElse(throw new IllegalStateException("table has no current snapshot"))
    }
    val windowEntries = table.entries(to, Some(from.sequenceNumber), _ => true)
    // the fast path requires every commit in the window to be a pure
    // APPEND: a rewrite (binpack rewrite_data_files, rewrite_manifests)
    // introduces files at a NEW sequence number that carry only OLD rows —
    // sequence-keyed streaming would re-emit them as inserts. The snapshot
    // chain's operation summaries are the authority, not just file content.
    val windowOps = table.metadata.ancestorsOf(to.snapshotId)
      .takeWhile(_ != from.snapshotId)
      .flatMap(table.snapshotById).flatMap(_.summary.get("operation"))
    val appendOnly = windowEntries.forall(_.dataFile.content == ContentData) &&
      windowOps.forall(_ == "append")
    if (appendOnly)
      scanResolved(spark, table, Nil, ScanOptions(
        snapshotId = Some(to.snapshotId), afterSequence = Some(from.sequenceNumber)))
        .withColumn(ChangeCol, lit("insert"))
    else {
      val before = scanResolved(spark, table, Nil, ScanOptions(snapshotId = Some(from.snapshotId)))
      val after = scanResolved(spark, table, Nil, ScanOptions(snapshotId = Some(to.snapshotId)))
      after.exceptAll(before).withColumn(ChangeCol, lit("insert"))
        .unionByName(before.exceptAll(after).withColumn(ChangeCol, lit("delete")))
    }
  }

  /** CDC with UPDATE IMAGES (the V3 row-lineage payoff): diffs two
    * snapshots keyed by `_row_id`, so a row REWRITTEN by UPDATE surfaces as
    * an `update_before`/`update_after` pair instead of the delete+insert
    * the value-diff [[changelog]] degrades to. Output: `_row_id`,
    * `_change_type` ∈ insert | delete | update_before | update_after, then
    * the data columns. One shuffle join on the long row-id key + a single
    * projection pass (the per-row change set rides an exploded array —
    * unchanged rows explode to nothing), never a per-branch re-scan.
    *
    * Requires `write.row-lineage.enabled` (ids must exist and UPDATEs must
    * preserve them — [[graft.spark.sql.GraftUpdateCommand]] materializes
    * `_row_id` into the rewritten generation).
    */
  def changelogWithUpdates(spark: SparkSession, table: IceTable, afterSnapshotId: Long,
                           untilSnapshotId: Option[Long] = None): DataFrame = {
    require(table.metadata.properties.get("write.row-lineage.enabled").contains("true"),
      "changelogWithUpdates needs write.row-lineage.enabled=true (update pairs are keyed by _row_id)")
    val from = table.snapshotById(afterSnapshotId).getOrElse(
      throw new IllegalArgumentException(s"unknown snapshot $afterSnapshotId"))
    val to = untilSnapshotId match {
      case Some(id) => table.snapshotById(id).getOrElse(
        throw new IllegalArgumentException(s"unknown snapshot $id"))
      case None => table.currentSnapshot(None)
        .getOrElse(throw new IllegalStateException("table has no current snapshot"))
    }
    val dataCols = table.metadata.schemaAt(Some(to)).fields.map(_.name)
    def imaged(snapId: Long, alias: String): DataFrame =
      scanResolved(spark, table, Nil,
        ScanOptions(snapshotId = Some(snapId), rowLineage = true))
        .select(col("_row_id"), struct(dataCols.map(col): _*).as(alias))
    val b = imaged(from.snapshotId, "__cdc_b")
    val a = imaged(to.snapshotId, "__cdc_a")
    val joined = b.join(a, Seq("_row_id"), "full_outer")
    def tagged(tag: String, img: Column) = struct(lit(tag).as("_change_type"), img.as("__img"))
    val changes = joined.select(col("_row_id"),
      explode(
        when(col("__cdc_b").isNull, array(tagged("insert", col("__cdc_a"))))
          .when(col("__cdc_a").isNull, array(tagged("delete", col("__cdc_b"))))
          .when(!(col("__cdc_a") <=> col("__cdc_b")),
            array(tagged("update_before", col("__cdc_b")),
              tagged("update_after", col("__cdc_a"))))
          .otherwise(lit(null))).as("__c"))
    changes.select(col("_row_id") +: col("__c._change_type") +:
      dataCols.map(c => col(s"__c.__img.$c")): _*)
  }

  /** Resolves user filter Columns against the table schema by running the
    * analyzer over a scratch plan, yielding typed Catalyst predicates
    * (AttributeReference vs Cast(Literal)) the pruning evaluator can match.
    */
  private def resolveFilters(spark: SparkSession,
                             sparkSchema: org.apache.spark.sql.types.StructType,
                             filters: Seq[Column]): Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    if (filters.isEmpty) return Nil
    import org.apache.spark.sql.catalyst.expressions.{And, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case x => Seq(x)
    }
    val empty = spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), sparkSchema)
    val analyzed = filters.foldLeft(empty)(_ filter _).queryExecution.analyzed
    // constant-fold so foldable scalar calls (to_date('…'), 1+2, …) become
    // literals the pruning evaluator can compare against stats — the SQL
    // route gets this for free from the optimizer; the programmatic route
    // must fold here or silently read every file. RuntimeReplaceable calls
    // (to_date et al.) only fold after ReplaceExpressions swaps in their
    // runtime form, same order the real optimizer uses.
    val folded = org.apache.spark.sql.catalyst.optimizer.ConstantFolding(
      org.apache.spark.sql.catalyst.optimizer.ReplaceExpressions(analyzed))
    folded.collect { case f: Filter => split(f.condition) }.flatten
  }

  /** Manifest pruning (partition space) + file pruning (column stats). */
  private def prunedEntries(table: IceTable, schema: IceSchema, snap: Snapshot,
                            exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
                            afterSequence: Option[Long]): Seq[ManifestEntry] = {
    // ---- manifest-level pruning against FieldSummary bounds ----
    // each manifest's FieldSummary order follows the spec it was WRITTEN
    // under (spec evolution leaves old manifests intact), so predicate
    // rewrite + summary decoding resolve per manifest spec id; a manifest
    // under an unknown spec is kept (pruning may only remove IO)
    case class SpecCtx(partType: Seq[graft.spec.NestedField],
                       partTypeByName: Map[String, IceType],
                       partExprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
    val ctxBySpec = scala.collection.mutable.Map.empty[Int, Option[SpecCtx]]
    // Try: an OLD spec may reference a column since dropped from the
    // current schema — its manifests are then simply not pruned
    def ctxOf(specId: Int): Option[SpecCtx] = ctxBySpec.getOrElseUpdate(specId, {
      table.metadata.partitionSpecs.get(specId).flatMap { spec => scala.util.Try {
        val partType = spec.partitionType(schema).fields
        val partBySource: Map[String, (Transform, String, IceType)] =
          spec.fields.flatMap { pf =>
            schema.fieldById(pf.sourceId).map(src => src.name -> (pf.transform, pf.name, src.fieldType))
          }.toMap
        SpecCtx(partType, partType.map(f => f.name -> f.fieldType).toMap,
          exprs.map(e => Pruning.transformPredicate(e, partBySource)))
      }.toOption }
    })
    val manifestFilter: ManifestListEntry => Boolean = ml => {
      if (ml.partitions.isEmpty || exprs.isEmpty) true
      else ctxOf(ml.partitionSpecId) match {
        case None => true
        case Some(ctx) =>
          val statsByName: Map[String, Pruning.ColStats] =
            ctx.partType.zipWithIndex.flatMap { case (f, i) =>
              ml.partitions.lift(i).map { s =>
                f.name -> Pruning.ColStats(
                  s.lowerBound.map(graft.core.ValueCodec.fromBytes(f.fieldType, _)),
                  s.upperBound.map(graft.core.ValueCodec.fromBytes(f.fieldType, _)),
                  if (s.containsNull) None else Some(0L), None)
              }
            }.toMap
          Pruning.mayMatch(ctx.partExprs, statsByName.get, ctx.partTypeByName.get)
      }
    }

    val all = table.entries(snap, afterSequence, manifestFilter)

    // ---- file-level pruning against per-column min/max/null counts ----
    if (exprs.isEmpty) all
    else {
      val typeByName: String => Option[IceType] = n => schema.fieldByName(n).map(_.fieldType)
      all.filter { e =>
        if (e.dataFile.content != ContentData) {
          // Scoped DELETE files prune on their exact partition TUPLE: if
          // the partition-space predicate excludes the tuple, every row
          // the file could mask is itself outside the scan's (re-applied,
          // inexact-pruning contract) predicate — planning the file would
          // widen the MoR fold for nothing. At 100 TB this is what keeps a
          // partition-pruned scan's delete side O(affected partitions),
          // not O(table's delete history). Global deletes (no real
          // tuple), foreign-name tuples, and anything the evaluator can't
          // type are kept conservatively — pruning may only remove IO.
          val f = e.dataFile
          if (f.partition.isEmpty || f.partition.forall(_._2 == null)) true
          else ctxOf(table.metadata.defaultSpecId) match {
            case Some(ctx) if f.partition.map(_._1).forall(ctx.partTypeByName.contains) =>
              val statsFor: String => Option[Pruning.ColStats] = name =>
                f.partition.collectFirst {
                  case (n, v) if n == name && v != null =>
                    Pruning.ColStats(Some(v), Some(v), Some(0L), None)
                }
              scala.util.Try(
                Pruning.mayMatch(ctx.partExprs, statsFor, ctx.partTypeByName.get))
                .getOrElse(true)
            case _ => true
          }
        } else {
          val f = e.dataFile
          val statsFor: String => Option[Pruning.ColStats] = name =>
            schema.fieldByName(name).map { fld =>
              Pruning.ColStats(
                f.lowerBounds.get(fld.id).map(graft.core.ValueCodec.fromBytes(fld.fieldType, _)),
                f.upperBounds.get(fld.id).map(graft.core.ValueCodec.fromBytes(fld.fieldType, _)),
                f.nullValueCounts.get(fld.id),
                f.valueCounts.get(fld.id))
            }
          Pruning.mayMatch(exprs, statsFor, typeByName)
        }
      }
    }
  }

  /** The delete-side broadcast size gate, shared by the MoR read fold and
    * the eq→pos conversion in [[graft.table.Maintenance]]. The reference
    * always CollectLeft-broadcasts the delete side (table.rs:484-692); at
    * 100 TB a large delete generation belongs in a shuffled join instead.
    * Compares the IN-MEMORY estimate: manifest `file_size_in_bytes`
    * (compressed) × an expansion factor — zstd delete files deserialize to
    * several times their footprint, so a file just under the raw threshold
    * can't still blow the executors up. */
  private[graft] def deleteFitsBroadcast(spark: SparkSession, manifestBytes: Long): Boolean = {
    val broadcastThreshold: Long = spark.conf
      .getOption("spark.graft.delete.broadcast-threshold")
      .map(_.toLong).getOrElse(64L << 20)
    val expansionFactor: Long = spark.conf
      .getOption("spark.graft.delete.broadcast-expansion")
      .map(_.toLong).getOrElse(4L)
    manifestBytes * expansionFactor <= broadcastThreshold
  }

  /** Assembles the (possibly merge-on-read) DataFrame. Equality deletes are
    * compiled to anti-join chains in sequence-number order (J1,
    * table.rs:484-692): a delete file masks exactly the data files with
    * strictly smaller sequence numbers in its partition. The delete side is
    * broadcast — the Spark analogue of the reference's CollectLeft hash join.
    *
    * Partition scoping lives in the JOIN KEY, not the plan shape: one global
    * sequence-ordered fold covers every partition, with partition-scoped
    * delete files anti-joining on (equality cols, partition tag) — the tag
    * is a canonical rendering of the manifest's partition tuple, attached to
    * both sides by broadcast (file path → tag) maps. Union width is
    * therefore O(distinct delete sequence points), not O(delete-affected
    * partitions): thousands of affected partitions at 100 TB no longer
    * explode the logical plan.
    */
  private def buildDataFrame(spark: SparkSession, table: IceTable, schema: IceSchema,
                             sparkSchema: org.apache.spark.sql.types.StructType,
                             data: Seq[ManifestEntry], allDeletes: Seq[ManifestEntry],
                             rowLineage: Boolean = false): DataFrame = {
    import spark.implicits._
    // positional deletes reference explicit (file path, row position) pairs;
    // since paths are unique, one global application at the end is exact — a
    // path added after the delete can never appear in it. Two physical
    // carriers share that contract: parquet delete-row files (anti-join) and
    // V3 deletion vectors (bitmap filter).
    val (posAll, deletes) = allDeletes.partition(_.dataFile.content == ContentPositionDeletes)
    val (dvDeletes, posDeletes) = posAll.partition(_.dataFile.fileFormat == FormatPuffin)
    // row lineage derives ids from (file, position), so a lineage scan needs
    // the same metadata columns the positional masks do
    val withPos = posAll.nonEmpty || rowLineage

    val arity = data.headOption.map(_.dataFile.partition.size).getOrElse(0)
    // a delete file written unpartitioned (global equality delete) round-trips
    // through the manifest's partition struct as all-null values — only a
    // delete with a real partition tuple is scoped to that partition
    val (scoped, global) = deletes.partition { d =>
      val p = d.dataFile.partition
      arity > 0 && p.size == arity && p.exists(_._2 != null)
    }
    val needPath = withPos || scoped.nonEmpty

    // delete-side broadcast size gate on the manifest's file_size_in_bytes,
    // which the driver already holds ([[deleteFitsBroadcast]])
    def maybeBroadcast(df: DataFrame, manifestBytes: Long): DataFrame =
      if (deleteFitsBroadcast(spark, manifestBytes)) broadcast(df) else df

    // Iceberg V3 initial-defaults: a file written BEFORE a defaulted column
    // existed reads that column as the default, not null. Per-file decision
    // from manifest stats (a written column always carries value_counts /
    // column_sizes entries): files missing the field id group together and
    // get a typed literal fill — plan width grows with DISTINCT evolution
    // states (bounded by schema history), never with file count. A file
    // with no stats at all (foreign import) conservatively reads as-is.
    val defaultedFields = schema.fields.filter(_.initialDefault.isDefined)
    def missingDefaulted(e: ManifestEntry): Seq[Int] = {
      val d = e.dataFile
      if (defaultedFields.isEmpty || (d.valueCounts.isEmpty && d.columnSizes.isEmpty)) Nil
      else defaultedFields.map(_.id).filterNot(id =>
        d.valueCounts.contains(id) || d.columnSizes.contains(id))
    }

    // V3 row lineage: a rewrite that preserved ids MATERIALIZED the lineage
    // columns (reserved field ids in the file's stats); everything else
    // derives them virtually as first_row_id + row position
    def hasMatLineage(e: ManifestEntry): Boolean =
      e.dataFile.valueCounts.contains(RowIdFieldId) ||
        e.dataFile.columnSizes.contains(RowIdFieldId)
    def lineageStructFields: Seq[org.apache.spark.sql.types.StructField] = {
      import org.apache.spark.sql.types._
      def md(id: Int) = new MetadataBuilder().putLong("parquet.field.id", id.toLong).build()
      Seq(StructField("_row_id", LongType, nullable = true, md(RowIdFieldId)),
        StructField("_last_updated_sequence_number", LongType, nullable = true,
          md(LastUpdatedSeqFieldId)))
    }
    /** Attaches/completes the lineage columns for one file group.
      * Virtual files derive both from the broadcast (path → first_row_id,
      * seq) map; MATERIALIZED files keep their stored `_row_id` and
      * COALESCE a null `_last_updated_sequence_number` to the file's
      * sequence number — an UPDATE writes replacement rows with their
      * preserved ids but leaves the sequence column null, because the
      * commit's sequence number is only final at commit time (CAS retries
      * re-stamp manifests, never parquet). */
    def attachLineage(df: DataFrame, es: Seq[ManifestEntry],
                      materialized: Boolean): DataFrame = {
      val hc = spark.sparkContext.hadoopConfiguration
      val rows = es.map { e =>
        val first: java.lang.Long =
          if (materialized) e.dataFile.firstRowId.map(Long.box).orNull
          else Long.box(e.dataFile.firstRowId.getOrElse(throw new IllegalStateException(
            s"row-lineage scan: data file ${e.dataFile.filePath} has neither an " +
              "assigned first_row_id nor a materialized _row_id column (it predates " +
              "write.row-lineage.enabled) — compact() the table to backfill lineage")))
        (IceScan.qualifiedPath(hc, e.dataFile.filePath), first,
          e.sequenceNumber.getOrElse(0L))
      }
      val joined = df.join(broadcast(rows.toDF("__lin_path", "__lin_first", "__lin_seq")),
        df("__graft_path") === col("__lin_path"), "left")
      val completed =
        if (materialized) joined
          .withColumn("_row_id", col("_row_id"))
          .withColumn("_last_updated_sequence_number",
            coalesce(col("_last_updated_sequence_number"), col("__lin_seq")))
        else joined
          .withColumn("_row_id", col("__lin_first") + col("__graft_pos"))
          .withColumn("_last_updated_sequence_number", col("__lin_seq"))
      completed.drop("__lin_path", "__lin_first", "__lin_seq")
    }

    def readFiles(entries: Seq[ManifestEntry]): DataFrame =
      if (entries.isEmpty) {
        var fields = sparkSchema.fields
        if (needPath) fields = fields :+
          org.apache.spark.sql.types.StructField("__graft_path", org.apache.spark.sql.types.StringType)
        if (withPos) fields = fields :+
          org.apache.spark.sql.types.StructField("__graft_pos", org.apache.spark.sql.types.LongType)
        if (rowLineage) fields = fields ++ lineageStructFields
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(fields))
      } else if (defaultedFields.nonEmpty || rowLineage) {
        entries.groupBy(e => (missingDefaulted(e), rowLineage && hasMatLineage(e)))
          .toSeq.sortBy { case ((miss, mat), _) => (miss.mkString(","), mat) }
          .map { case ((miss, mat), es) =>
            val base = readFileGroup(es, materializedLineage = mat)
            val filled = miss.foldLeft(base) { (df, id) =>
              val f = schema.fieldById(id).get
              df.withColumn(f.name,
                graft.spec.DefaultValues.toColumn(f.fieldType, f.initialDefault.get))
            }
            if (rowLineage) attachLineage(filled, es, materialized = mat) else filled
          }.reduce(_ unionByName _)
      } else readFileGroup(entries)

    def readFileGroup(entries: Seq[ManifestEntry],
                      materializedLineage: Boolean = false): DataFrame = {
        val readSchema =
          if (materializedLineage)
            org.apache.spark.sql.types.StructType(sparkSchema.fields ++ lineageStructFields)
          else sparkSchema
        val df = spark.read.schema(readSchema).parquet(entries.map(_.dataFile.filePath): _*)
        val withMeta0 =
          if (needPath) df.withColumn("__graft_path", col("_metadata.file_path")) else df
        val withMeta =
          if (withPos) withMeta0.withColumn("__graft_pos", col("_metadata.row_index"))
          else withMeta0
        // exact row/byte totals from the surviving manifest entries → the
        // optimizer (SupportsReportStatistics analogue; rows × width sizing
        // under CBO/planStats instead of compressed-bytes underestimates).
        // Per-column NDVs (summed across files — a safe overestimate) ride
        // along when the table populates distinct_counts at write.
        val ndv: Map[String, Long] = entries.iterator
          .flatMap(_.dataFile.distinctCounts).toSeq
          .groupBy(_._1).flatMap { case (id, xs) =>
            schema.fieldById(id).map(_.name -> xs.map(_._2).sum)
          }
        org.apache.spark.sql.GraftShim.withScanStats(spark, withMeta,
          entries.iterator.map(e => BigInt(e.dataFile.recordCount)).sum,
          entries.iterator.map(e => BigInt(e.dataFile.fileSizeInBytes)).sum,
          ndv)
      }

    def maskParquetPositions(df: DataFrame): DataFrame =
      if (posDeletes.isEmpty) df
      else {
        val delDf = spark.read.schema(IceWrite.PosDeleteSchema.toSpark)
          .parquet(posDeletes.map(_.dataFile.filePath): _*)
          .select(col("file_path").as("__graft_path"), col("pos").as("__graft_pos"))
        df.join(maybeBroadcast(delDf, posDeletes.map(_.dataFile.fileSizeInBytes).sum),
          Seq("__graft_path", "__graft_pos"), "left_anti")
      }

    /** Deletion vectors: the scale path. When the vectors fit the broadcast
      * gate, the delete side is a per-executor Map[path → bitmap] probed by a
      * FILTER — no join, no shuffle, plan width constant in the number of
      * vectors. Past the gate, vectors decode DISTRIBUTED (one task per
      * blob, positioned range reads) into (path, pos) rows and fall back to
      * the same anti-join shape as parquet positional deletes.
      */
    def maskDvPositions(df: DataFrame): DataFrame =
      if (dvDeletes.isEmpty) df
      else {
        val hconf = spark.sparkContext.hadoopConfiguration
        val dvBytes = dvDeletes.map(e =>
          e.dataFile.contentSizeInBytes.getOrElse(e.dataFile.fileSizeInBytes)).sum
        if (deleteFitsBroadcast(spark, dvBytes)) {
          val blobs: Map[String, Array[Byte]] = dvDeletes.iterator.map { e =>
            val d = e.dataFile
            d.referencedDataFile.getOrElse(
              sys.error(s"puffin delete entry ${d.filePath} lacks referenced_data_file")) ->
              graft.table.Puffin.readBlobRange(hconf, d.filePath,
                d.contentOffset.get, d.contentSizeInBytes.get)
          }.toMap
          val bc = spark.sparkContext.broadcast(new graft.spark.expressions.DvIndex(blobs))
          df.filter(!org.apache.spark.sql.GraftShim.column(
            graft.spark.expressions.DvDeleted(
              org.apache.spark.sql.GraftShim.expression(col("__graft_path")),
              org.apache.spark.sql.GraftShim.expression(col("__graft_pos")), bc)))
        } else {
          val descs = dvDeletes.map { e =>
            val d = e.dataFile
            (d.filePath, d.referencedDataFile.get, d.contentOffset.get, d.contentSizeInBytes.get)
          }
          val sconf = org.apache.spark.sql.GraftShim.serializableHadoopConf(spark)
          val pairs = spark.createDataset(descs)
            .repartition(math.min(descs.size,
              spark.sparkContext.defaultParallelism))
            .flatMap { case (pf, ref, off, len) =>
              val bm = graft.table.Puffin.dvFromBlob(
                graft.table.Puffin.readBlobRange(sconf(), pf, off, len))
              val out = Array.newBuilder[(String, Long)]
              bm.foreach(pos => out += ((ref, pos)))
              out.result()
            }
            .toDF("__graft_path", "__graft_pos")
          df.join(pairs, Seq("__graft_path", "__graft_pos"), "left_anti")
        }
      }

    def maskPositions(df: DataFrame): DataFrame =
      if (!withPos) df
      else maskDvPositions(maskParquetPositions(df)).drop("__graft_path", "__graft_pos")

    if (deletes.isEmpty) return maskPositions(readFiles(data))

    // canonical partition tag ([[IceScan.pkTag]], shared with the
    // eq→pos delete conversion in Maintenance)
    val TagCol = "__graft_pk"
    def pkTag(p: Seq[(String, Any)]): String = IceScan.pkTag(p)

    // tag-map keys must render exactly like `_metadata.file_path` (which is
    // FileSystem-qualified, e.g. "file:/tmp/…"), while manifests may store
    // raw paths — qualify driver-side with the same Hadoop resolution
    val hconf = spark.sparkContext.hadoopConfiguration
    def qualified(p: String): String = IceScan.qualifiedPath(hconf, p)

    // (data file path → tag) for files in delete-affected partitions ONLY:
    // clean partitions keep a null tag and can never match a scoped delete
    // (equi-join null semantics), so the broadcast map stays proportional to
    // the affected region, not the table
    val affectedTags: Set[String] = scoped.map(d => pkTag(d.dataFile.partition)).toSet
    val dataTags: Seq[(String, String)] = data.flatMap { e =>
      val t = pkTag(e.dataFile.partition)
      if (affectedTags.contains(t)) Some(qualified(e.dataFile.filePath) -> t) else None
    }
    lazy val dataTagDf = broadcast(dataTags.toDF("__graft_tpath", TagCol))
    def tagged(df: DataFrame): DataFrame =
      if (scoped.isEmpty) df
      else if (dataTags.isEmpty) df.withColumn(TagCol, lit(null).cast("string"))
      else df.join(dataTagDf, df("__graft_path") === col("__graft_tpath"), "left")
        .drop("__graft_tpath")

    /** ONE sequence-ordered fold across all partitions (table.rs:498-679):
      * ascending sequence order, deletes before data at equal sequence (a
      * delete masks only STRICTLY older files); data files between two
      * delete sequence points are read as one multi-file scan — partition
      * scoping is enforced by the tag column in the anti-join key, so the
      * plan never fans out per partition.
      */
    def fold(): DataFrame = {
      val allDels = scoped ++ global
      val delSeqs = allDels.map(_.sequenceNumber.getOrElse(0L)).distinct.sorted
      var acc: DataFrame = null
      var remaining = data.sortBy(_.sequenceNumber.getOrElse(0L))
      for (ds <- delSeqs) {
        val (older, newer) = remaining.partition(_.sequenceNumber.getOrElse(0L) < ds)
        if (older.nonEmpty) {
          val df = tagged(readFiles(older))
          acc = if (acc == null) df else acc.unionByName(df)
        }
        remaining = newer
        if (acc != null) {
          // delete files at this sequence, one anti-join per distinct
          // (equality ids, scoped?) group — same-shaped files share a scan
          def eqSchemaOf(eqCols: Seq[String]) = org.apache.spark.sql.types.StructType(
            sparkSchema.fields.filter(f => eqCols.contains(f.name)))
          val (scopedAt, globalAt) = allDels.filter(_.sequenceNumber.getOrElse(0L) == ds)
            .partition(scoped.contains)
          for ((eqIds, files) <- scopedAt.groupBy(_.dataFile.equalityIds).toSeq.sortBy(_._1.mkString(","))) {
            val eqCols = eqIds.flatMap(id => schema.fieldById(id)).map(_.name)
            val delTagDf = broadcast(
              files.map(f => (qualified(f.dataFile.filePath), pkTag(f.dataFile.partition)))
                .toDF("__graft_dpath", TagCol))
            val delDf = spark.read.schema(eqSchemaOf(eqCols))
              .parquet(files.map(_.dataFile.filePath): _*)
              .withColumn("__graft_dfp", col("_metadata.file_path"))
              .join(delTagDf, col("__graft_dfp") === col("__graft_dpath"))
              .select((eqCols.map(col) :+ col(TagCol)): _*)
            // NULL-SAFE key equality (<=>): the Iceberg spec's equality
            // deletes match null to null — a USING join would silently
            // never mask a null-keyed row (it then survives forever next
            // to every replacement generation)
            val bd = maybeBroadcast(delDf, files.map(_.dataFile.fileSizeInBytes).sum)
            val cond = (eqCols.map(c => acc(c) <=> bd(c)) :+
              (acc(TagCol) === bd(TagCol))).reduce(_ && _)
            acc = acc.join(bd, cond, "left_anti")
          }
          for ((eqIds, files) <- globalAt.groupBy(_.dataFile.equalityIds).toSeq.sortBy(_._1.mkString(","))) {
            val eqCols = eqIds.flatMap(id => schema.fieldById(id)).map(_.name)
            val delDf = spark.read.schema(eqSchemaOf(eqCols))
              .parquet(files.map(_.dataFile.filePath): _*)
            val bd = maybeBroadcast(delDf, files.map(_.dataFile.fileSizeInBytes).sum)
            acc = acc.join(bd,
              eqCols.map(c => acc(c) <=> bd(c)).reduce(_ && _), "left_anti")
          }
        }
      }
      val newerDf = if (remaining.nonEmpty) Some(tagged(readFiles(remaining))) else None
      (Option(acc), newerDf) match {
        case (Some(a), Some(n)) => a.unionByName(n)
        case (Some(a), None) => a
        case (None, Some(n)) => n
        case (None, None) => tagged(readFiles(Nil))
      }
    }

    val folded = fold()
    val untagged = if (scoped.nonEmpty) folded.drop(TagCol) else folded
    val result = maskPositions(untagged)
    if (needPath && !withPos) result.drop("__graft_path") else result
  }
}
