package graft.table

import java.util.concurrent.atomic.AtomicLong

import scala.util.control.NonFatal

/** Best-effort post-commit file deletion, shared by the replace cleanup
  * ([[Transaction]]) and snapshot expiration ([[Maintenance]]).
  *
  * The commit has already landed when these run, so failures must NOT
  * propagate — a read hiccup would make the caller believe a committed
  * operation failed — but they must not be silent either: a chronically
  * failing cleanup (revoked credentials, permission drift) would otherwise
  * leak orphans on every commit with zero signal until someone hand-runs
  * `remove_orphan_files`. Every skipped path gets a WARN, and the
  * process-lifetime [[failedDeletes]] counter gives ops (and the spec) a
  * number to alert on.
  */
private[graft] object Cleanup {
  private val log = org.slf4j.LoggerFactory.getLogger("graft.table.Cleanup")

  /** Process-lifetime count of post-commit deletions that failed (files
    * left behind as re-collectable orphans). */
  val failedDeletes = new AtomicLong(0L)

  /** Deletes each path, swallowing (but logging + counting) per-file
    * failures. Returns the number of failed deletions. */
  def rm(conf: org.apache.hadoop.conf.Configuration, paths: Iterable[String],
         context: String): Int = {
    var failed = 0
    paths.foreach { p =>
      try {
        val path = new org.apache.hadoop.fs.Path(p)
        path.getFileSystem(conf).delete(path, false): Unit
      } catch {
        case NonFatal(e) =>
          failed += 1
          failedDeletes.incrementAndGet()
          log.warn(s"$context: failed to delete $p " +
            s"(${e.getClass.getSimpleName}: ${e.getMessage}) — " +
            "left as a re-collectable orphan (see remove_orphan_files)")
      }
    }
    if (failed > 0)
      log.warn(s"$context: $failed deletion(s) failed; files remain as orphans")
    failed
  }
}
