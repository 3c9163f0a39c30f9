package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** BUCKETED CO-LOCATED JOIN (`bucketed_join`) — the physical-layout
  * tier of the join family: lineitem and orders are materialized ONCE
  * as tables bucketed (and sorted) by the join key into the same
  * bucket count, so the fact-fact join plans as a sort-merge join with
  * ZERO Exchange — each task reads bucket i of both sides. This is the
  * layout a 100 TB deployment keeps its fact tables in so repeated
  * key-joins never re-shuffle; the graded row proves the engine
  * produces it and that it answers exactly like the shuffled form (the
  * twin joins the raw parquet).
  *
  * The bucketed copies are session-catalog tables under the session's
  * warehouse dir, keyed by the source dir's fingerprint — regenerated
  * testdata gets fresh tables, re-invocations reuse them (the
  * graphCache discipline; the write is prep, not the operator). The
  * plan shape (SortMergeJoin, no Exchange on either side) is
  * machine-checked by BucketedJoinSpec with auto-broadcast disabled. */
object Bucketed {

  private val Buckets = 8

  /** (name, size, mtime) fingerprint of the two source tables — the
    * staleness token in the bucketed tables' names. */
  private def fp(d: String): String = {
    def walk(f: java.io.File): Iterator[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).iterator.flatMap(_.iterator).flatMap(walk)
      else Iterator.single(f)
    val h = Seq("lineitem.parquet", "orders.parquet")
      .flatMap(t => walk(new java.io.File(d, t)))
      .map(f => (f.getName, f.length, f.lastModified).hashCode()).sum
    // abs: a table identifier must not contain '-'
    java.lang.Long.toHexString(h.toLong & 0xffffffffL)
  }

  /** Ensure the bucketed copies exist for `d`; returns (lineitem,
    * orders) read FROM the bucketed tables (their scans carry the
    * bucket distribution). */
  /** An in-memory catalog forgets its tables at JVM exit but the
    * warehouse directories survive — a later session writing the same
    * table name hits LOCATION_ALREADY_EXISTS. A location with no
    * catalog entry is an orphan of a dead session: remove it. */
  private def dropOrphanLocation(s: SparkSession, table: String): Unit = {
    val wh = s.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val loc = new java.io.File(wh, table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(loc)
    }
  }

  private[graft] def ensure(s: SparkSession, d: String): (DataFrame, DataFrame) =
    synchronized {
      val tag = fp(d)
      val liName = s"graft_bkt_lineitem_$tag"
      val ordName = s"graft_bkt_orders_$tag"
      if (!s.catalog.tableExists(liName)) {
        dropOrphanLocation(s, liName)
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
          .write.mode("overwrite")
          .bucketBy(Buckets, "l_orderkey").sortBy("l_orderkey")
          .format("parquet").saveAsTable(liName)
      }
      if (!s.catalog.tableExists(ordName)) {
        dropOrphanLocation(s, ordName)
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority"))
          .write.mode("overwrite")
          .bucketBy(Buckets, "o_orderkey").sortBy("o_orderkey")
          .format("parquet").saveAsTable(ordName)
      }
      (s.table(liName), s.table(ordName))
    }

  /** Revenue per order priority over the bucketed fact-fact join. */
  def bucketedJoin(s: SparkSession, d: String): DataFrame = {
    val (li, ord) = ensure(s, d)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("l_extendedprice") * (lit(1d) - col("l_discount"))), 2)
             .as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bucketed_join" -> (bucketedJoin _))

  val oracle: Map[String, String] = Map(
    // the same join/aggregate from the RAW parquet: bucketing is a
    // physical layout, never a semantic change
    "bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin)
}
