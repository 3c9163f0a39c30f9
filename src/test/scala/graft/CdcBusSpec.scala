package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.CdcBus

/** Reference-semantics checks of the CDC-bus operators on a hand-built
  * bus (FIXTURES.md §B.3/§B.4): take(n) delivers exactly min(n, matches);
  * RPC first-wins picks the earliest response across response patterns;
  * counters count only matching deliveries. */
class CdcBusSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 10 events: 6 signup (match for take-n), interleaved error/purchase
    * for rpc ordering, one view. Mirrors events.parquet's schema. */
  private lazy val dir: String = {
    val tmp = Files.createTempDirectory("graft_bus2").toString
    val s = spark; import s.implicits._
    def t(min: Int) = new Timestamp(1704067200000L + min * 60000L)
    val rows = Seq(
      (1L, t(0), 1L, "signup", 1.0, "{\"k\": 1}"),
      (2L, t(1), 2L, "signup", 1.0, "{\"k\": 2}"),
      (3L, t(2), 1L, "error", 5.0, "{\"k\": 3}"),
      (4L, t(3), 3L, "signup", 1.0, "{\"k\": 4}"),
      (5L, t(1), 2L, "purchase", 9.0, "{\"k\": 5}"),  // earliest ts among rpc matches is event 3? no: t(1) < t(2)
      (6L, t(4), 4L, "signup", 1.0, "{\"k\": 6}"),
      (7L, t(5), 5L, "signup", 1.0, "{\"k\": 7}"),
      (8L, t(6), 6L, "signup", 1.0, "{\"k\": 8}"),
      (9L, t(7), 1L, "view", 2.0, "{\"k\": 9}"),
      (10L, t(8), 2L, "error", 5.0, "{\"k\": 10}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("take(5) delivers exactly the first 5 of 6 matches, in arrival order") {
    val got = CdcBus.takeN(spark, dir).collect().map(_.getLong(0))
    assert(got === Array(1L, 2L, 4L, 6L, 7L))
  }

  test("rpc first-wins = earliest (ts, event_id) across both response patterns") {
    val row = CdcBus.rpcFirst(spark, dir).collect().head
    // purchase event 5 at t(1) beats error event 3 at t(2)
    assert(row.getLong(0) === 5L)
    assert(row.getInt(3) === 200)
  }

  test("counters: only matching deliveries increment, zero-match sub stays 0") {
    val m = CdcBus.subCounters(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("s_all") === 10L)
    assert(m("s_err") === 2L)
    assert(m("s_click") === 0L)
    assert(m("s_none") === 0L)
    assert(m("s_user1") === 3L) // events 1, 3, 9 are user 1
  }

  test("json payload extraction reads $.k per event_type") {
    val m = CdcBus.jsonPayload(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap // sum_k
    assert(m("signup") === 1L + 2 + 4 + 6 + 7 + 8)
    assert(m("error") === 3L + 10)
  }

  test("NULL event_type: channel synthesis skips the segment on every path") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Option("click"), 7L), (2L, Option.empty[String], 7L))
      .toDF("event_id", "event_type", "user_id")
      .withColumn("channel",
        Tables.channelCol(org.apache.spark.sql.functions.col("event_type"),
          org.apache.spark.sql.functions.col("user_id")))
    val chans = df.collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    // concat_ws skips the NULL segment (both engines) — never "cdc/null/7",
    // never NULL: the row stays routable
    assert(chans(1L) === "cdc/click/7")
    assert(chans(2L) === "cdc/7")
    assert(chans(2L) === Tables.channelString(null, 7L))
    // the 2-level channel still routes under the bus-wide '#' but not
    // under 3-level patterns
    import graft.cdc.MqttPattern.matches
    assert(matches("cdc/#", chans(2L)) && !matches("cdc/+/7", chans(2L)))
  }
}
