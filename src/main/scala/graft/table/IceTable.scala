package graft.table

import graft.catalog.{Catalog, TableIdent}
import graft.spec.{IceSchema, PartitionSpec, Snapshot, TableMetadata}
import graft.table.ManifestModel._

/** Table handle (reference: iceberg-rust/src/table/mod.rs:49-53). All methods
  * here are driver-side metadata operations — O(manifests), never O(rows).
  */
class IceTable(val ident: TableIdent, val catalog: Catalog,
               @volatile var metadata: TableMetadata) {

  def location: String = metadata.location
  def schema: IceSchema = metadata.currentSchema
  def spec: PartitionSpec = metadata.defaultSpec

  def currentSnapshot(branch: Option[String] = None): Option[Snapshot] =
    metadata.currentSnapshot(branch)

  def snapshotById(id: Long): Option[Snapshot] = metadata.snapshotById(id)

  /** Manifest-list entries of a snapshot, optionally restricted to manifests
    * that can contain files in the sequence range (start, end]
    * (reference: table/mod.rs:200-234 `manifests(start, end)`).
    */
  def manifests(snapshot: Snapshot, afterSequence: Option[Long] = None): Seq[ManifestListEntry] = {
    val all = ManifestIO.readManifestList(snapshot.manifestList)
    afterSequence match {
      case Some(start) => all.filter(_.sequenceNumber > start)
      case None => all
    }
  }

  /** Manifest entries with sequence-number/snapshot-id inheritance applied
    * (table/mod.rs:331-347) and DELETED entries dropped; optionally keeps
    * only entries in the sequence range (start, end] — the incremental-scan
    * path powering MV delta sources (S4, table/mod.rs:293-356).
    */
  def entries(snapshot: Snapshot, afterSequence: Option[Long] = None,
              manifestFilter: ManifestListEntry => Boolean = _ => true): Seq[ManifestEntry] = {
    val mls = manifests(snapshot, afterSequence).filter(manifestFilter)
    // Fetch all manifests concurrently on ManifestIO's bounded pool (the
    // reference's concurrent manifest stream, table/mod.rs:327); results come
    // back in manifest-list order so entry order is deterministic.
    val perManifest = ManifestIO.readManifests(mls.map(_.manifestPath))
    mls.lazyZip(perManifest).flatMap { (ml, read) =>
      read.flatMap { e =>
        val seq = e.sequenceNumber.getOrElse(ml.sequenceNumber)
        val inherited = e.copy(
          sequenceNumber = Some(seq),
          snapshotId = e.snapshotId.orElse(Some(ml.addedSnapshotId)))
        if (e.status == StatusDeleted) None
        else afterSequence match {
          case Some(start) if seq <= start => None
          case _ => Some(inherited)
        }
      }
    }
  }

  /** All live data files at a snapshot (content == data). */
  def dataFiles(snapshot: Snapshot, afterSequence: Option[Long] = None): Seq[ManifestEntry] =
    entries(snapshot, afterSequence).filter(_.dataFile.content == ContentData)

  /** All live delete files (equality OR positional) at a snapshot. */
  def deleteFiles(snapshot: Snapshot): Seq[ManifestEntry] =
    entries(snapshot).filter(_.dataFile.content != ContentData)

  def newTransaction(branch: Option[String] = None): Transaction =
    new Transaction(this, branch)

  /** Refreshes the in-memory metadata from the catalog. */
  def refresh(): IceTable = {
    catalog.loadTable(ident).foreach(t => this.metadata = t.metadata)
    this
  }
}
