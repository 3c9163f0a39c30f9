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
  * The bucketed copies are EXTERNAL catalog tables under the session's
  * warehouse dir, keyed by the source dir's fingerprint — regenerated
  * testdata gets fresh tables, re-invocations reuse them (the
  * graphCache discipline; the write is prep, not the operator), and a
  * NEW JVM adopts a previous process's complete tables instead of
  * rewriting ([[Warehouse.ensureTable]] — cross-process lock, adopt
  * on `_SUCCESS`, never delete a complete location). The
  * plan shape (SortMergeJoin, no Exchange on either side) is
  * machine-checked by BucketedJoinSpec with auto-broadcast disabled. */
object Bucketed {

  private val Buckets = 8

  /** Fixed-width md5 fingerprint of the two source tables — the
    * staleness token in the bucketed tables' names
    * ([[graft.Fingerprint]]; the r14 `hashCode().sum` form was both
    * collidable and, unpadded, broke ScanAudit's suffix strip). */
  private def fp(d: String): String =
    graft.Fingerprint.ofTables(d, "lineitem.parquet", "orders.parquet")

  /** Ensure one bucketed copy exists: reuse the catalog entry, ADOPT a
    * complete location a previous JVM left (zero-rebuild cold start;
    * never deletes what another process may read — [[Warehouse]]'s
    * contract closes the r14 cross-JVM orphan-delete hazard), or write
    * fresh under the cross-process lock. */
  private def ensureBucketed(s: SparkSession, name: String, key: String,
                             d: String, frame: => DataFrame): Unit = {
    lazy val df = frame // schema read is a parquet-footer fetch, plan-only
    Warehouse.ensureTable(s, name, d)(loc =>
      s"""CREATE TABLE $name (${df.schema.toDDL})
         |USING PARQUET
         |CLUSTERED BY ($key) SORTED BY ($key) INTO $Buckets BUCKETS
         |LOCATION '$loc'""".stripMargin)(loc =>
      df.write.option("path", loc)
        .bucketBy(Buckets, key).sortBy(key)
        .format("parquet").saveAsTable(name))
  }

  /** Ensure the bucketed copies exist for `d`; returns (lineitem,
    * orders) read FROM the bucketed tables (their scans carry the
    * bucket distribution). */
  private[graft] def ensure(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val tag = fp(d)
    val liName = s"graft_bkt_lineitem_$tag"
    val ordName = s"graft_bkt_orders_$tag"
    ensureBucketed(s, liName, "l_orderkey", d,
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")))
    ensureBucketed(s, ordName, "o_orderkey", d,
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority")))
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

  /** Revenue-per-order histogram over the bucketed AGGREGATION
    * (`bucketed_agg`, r14 VERDICT Next #7) — the other half of the
    * 100 TB layout story: `groupBy(l_orderkey)` over the bucketed
    * lineitem plans with ZERO Exchange below it, because the scan's
    * bucket distribution already satisfies the aggregation's
    * clustering — each task aggregates its own bucket. The histogram
    * roll-up above it is a ≤-dozens-row shuffle of the per-order
    * results (allowed, like the join row's post-aggregation; the
    * fact-sized shuffle is the one the layout deletes). Twin: the
    * same aggregate from the raw parquet — bucketing is a physical
    * layout, never a semantic change. BucketedJoinSpec pins the
    * exchange-free agg plan against a raw-parquet shuffles control. */
  def bucketedAgg(s: SparkSession, d: String): DataFrame = {
    val (li, _) = ensure(s, d)
    li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice") * (lit(1d) - col("l_discount")))
        .as("rev"))
      .groupBy(floor(col("rev") / 10000d).cast("long").as("rev_bucket"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("rev_bucket"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bucketed_join" -> (bucketedJoin _),
    "bucketed_agg" -> (bucketedAgg _))

  val oracle: Map[String, String] = Map(
    // the same join/aggregate from the RAW parquet: bucketing is a
    // physical layout, never a semantic change
    "bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    "bucketed_agg" ->
      """SELECT CAST(floor(rev / 10000) AS BIGINT) AS rev_bucket,
        |       count(*) AS n_orders
        |FROM (SELECT l_orderkey,
        |             sum(l_extendedprice * (1 - l_discount)) AS rev
        |      FROM lineitem GROUP BY 1)
        |GROUP BY 1 ORDER BY rev_bucket""".stripMargin)
}
