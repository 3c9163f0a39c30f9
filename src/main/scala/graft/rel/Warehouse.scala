package graft.rel

import org.apache.spark.sql.SparkSession

/** Cross-process-safe persistence of derived warehouse tables (the
  * bucketed fact copies, the co-order edge set, the coreness labels)
  * — artifacts keyed by a source-dir fingerprint whose FILES must
  * outlive any one JVM so a cold Verify/bench process stops re-paying
  * the prep (the band-store `_built_from` rationale applied to
  * catalog tables).
  *
  * Two hazards this helper exists to close (r14 ADVICE low #3):
  *
  *   - An in-memory catalog forgets its tables at JVM exit but the
  *     warehouse directories survive, so a later session writing the
  *     same name hit LOCATION_ALREADY_EXISTS; r14 deleted the orphan
  *     — which, with TWO live JVMs sharing `spark.sql.warehouse.dir`
  *     (a test suite and a backgrounded bench), could delete files
  *     another process was actively reading. Now a COMPLETE location
  *     (its `_SUCCESS` commit marker present) is never deleted: the
  *     session ADOPTS it — `CREATE TABLE ... LOCATION` over the dead
  *     session's files — which is also what makes the artifacts
  *     reusable across JVMs at all. Only an INCOMPLETE location (no
  *     `_SUCCESS`: a crashed write no reader can be consuming) is
  *     cleaned before rewriting.
  *   - Two processes racing the create: an exclusive [[java.nio
  *     .channels.FileLock]] on `<warehouse>/.graft_tables.lock`
  *     serializes check-adopt-or-write across processes; the loser
  *     finds the winner's complete table and adopts it. FileLocks are
  *     held per PROCESS (a second lock attempt from the same JVM
  *     throws), so a JVM-global gate serializes in-process callers
  *     first.
  *
  * Every write goes through `.option("path", ...)`, so the catalog
  * entries are EXTERNAL: a `DROP TABLE` (or a dead catalog) never
  * deletes the files. The one deletion of complete data is the
  * stale-SIBLING sweep ([[sweepStaleSiblings]]): same family, a
  * DIFFERENT fingerprint (its source dir was regenerated — the only
  * possible reader predates the rewrite), hours old, unregistered —
  * the unbounded-growth guard for fingerprint-keyed artifacts. */
object Warehouse {

  /** FileLock is per-process: serialize in-JVM callers before
    * touching the channel (OverlappingFileLockException otherwise). */
  private val jvmGate = new Object

  private[graft] def dir(s: SparkSession): java.io.File =
    new java.io.File(
      s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))

  /** Run `body` holding the cross-process warehouse lock. */
  private def withLock[T](s: SparkSession)(body: => T): T =
    jvmGate.synchronized {
      val wh = dir(s)
      wh.mkdirs()
      val ch = java.nio.channels.FileChannel.open(
        new java.io.File(wh, ".graft_tables.lock").toPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lk = ch.lock()
        try body finally lk.release()
      } finally ch.close()
    }

  /** A committed write: Spark's parquet committer drops `_SUCCESS`
    * only after every task's output is in place. */
  private def complete(loc: java.io.File): Boolean =
    loc.isDirectory && new java.io.File(loc, "_SUCCESS").exists()

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete(); ()
  }

  /** Count of locations adopted from a dead/foreign JVM — spec hook
    * (WarehouseSpec asserts the zero-rebuild reuse path actually ran). */
  private[graft] val adopted = new java.util.concurrent.atomic.AtomicLong

  /** Stale-sibling sweep age: a same-family location with a DIFFERENT
    * fingerprint is data for a source dir that no longer exists in
    * that form (the fingerprint hashes the source listing), so its
    * only possible reader is a process started before the rewrite;
    * six hours is far past any driver round. Spec-tunable. */
  @volatile private[graft] var staleAfterMs: Long = 6L * 3600 * 1000

  /** Under the lock, delete same-FAMILY locations with a different
    * fingerprint that are old and unregistered — the unbounded-growth
    * guard for fingerprint-keyed artifacts (every regenerated testdata
    * dir mints a new name and would otherwise strand the old files
    * forever). Never touches the current fingerprint, never touches a
    * location the catalog still references, never touches anything
    * younger than [[staleAfterMs]]. */
  private def sweepStaleSiblings(s: SparkSession, name: String): Unit = {
    val fam = name.replaceAll("_[0-9a-f]{8}$", "")
    if (fam == name) return // not fingerprint-keyed: nothing to sweep
    val cutoff = System.currentTimeMillis() - staleAfterMs
    val pat = s"\\Q${fam}\\E_[0-9a-f]{8}".r
    Option(dir(s).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName != name &&
        pat.pattern.matcher(f.getName).matches() &&
        f.lastModified() < cutoff &&
        !s.catalog.tableExists(f.getName))
      .foreach(rmTree)
  }

  /** Ensure `name` exists in this session's catalog: reuse the entry,
    * adopt a complete on-disk location, or clean an incomplete one and
    * `write` fresh. `adoptDdl(loc)` must be the CREATE TABLE matching
    * what `write(loc)` produces (same schema/bucket spec, external at
    * `loc`). */
  private[graft] def ensureTable(s: SparkSession, name: String)
                                (adoptDdl: String => String)
                                (write: String => Unit): Unit =
    if (!s.catalog.tableExists(name)) withLock(s) {
      if (!s.catalog.tableExists(name)) {
        sweepStaleSiblings(s, name)
        val loc = new java.io.File(dir(s), name)
        if (complete(loc)) {
          s.sql(adoptDdl(loc.getAbsolutePath))
          adopted.incrementAndGet()
          ()
        } else {
          rmTree(loc)
          write(loc.getAbsolutePath)
        }
      }
    }
}
