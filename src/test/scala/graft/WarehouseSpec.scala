package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.rel.Warehouse]]'s stale-sibling sweep — the unbounded-growth
  * guard for fingerprint-keyed artifacts: every regenerated testdata
  * dir mints a new table name, and without the sweep the old files
  * strand forever. The sweep must be SURGICAL: same family + different
  * fingerprint + hours old + unregistered, nothing else. (The adopt /
  * never-delete-complete-locations contract itself is pinned by
  * BucketedJoinSpec and the coreness persistence spec.) */
class WarehouseSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("r15: creating a family member sweeps an OLD different-" +
       "fingerprint sibling, keeps a YOUNG one, keeps other families") {
    val s = spark
    val wh = graft.rel.Warehouse.dir(s)
    wh.mkdirs()
    def mk(name: String, ageMs: Long): java.io.File = {
      val d = new java.io.File(wh, name)
      d.mkdirs()
      new java.io.File(d, "_SUCCESS").createNewFile()
      d.setLastModified(System.currentTimeMillis() - ageMs)
      d
    }
    val stale = mk("graft_whspec_tbl_aaaaaaaa", 10L * 3600 * 1000)
    val young = mk("graft_whspec_tbl_bbbbbbbb", 0L)
    val other = mk("graft_whspec_other_dddddddd", 10L * 3600 * 1000)
    val name = "graft_whspec_tbl_cccccccc"
    graft.rel.Warehouse.ensureTable(s, name)(loc =>
      s"CREATE TABLE $name (x BIGINT) USING PARQUET LOCATION '$loc'") {
      loc =>
        import s.implicits._
        Seq(1L).toDF("x").write.option("path", loc)
          .format("parquet").saveAsTable(name)
    }
    assert(!stale.exists(),
      "old different-fingerprint sibling survived the sweep")
    assert(young.exists(), "young sibling was deleted")
    assert(other.exists(), "a DIFFERENT family's location was deleted")
    assert(s.table(name).count() === 1L)
  }
}
