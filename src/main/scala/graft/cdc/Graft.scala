package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions.mqtt_matches

/** User-facing facade mirroring the reference client's API shape
  * (`connect` / `subscribe` / `take` / `publish` / `rpc` / counters —
  * reference lib/nats.js), so a user of node-cdc-nats maps their program
  * 1:1 onto the Spark engine:
  *
  * {{{
  * val bus = Graft.connect(spark, "/data/bus")            // new Nats(opts)
  * val errs = bus.subscribe("cdc/error/#")                // subscribe(subject, cb)
  * val first3 = bus.take("cdc/signup/#", 3)               // subscribe(subject, {max:3}, cb)
  * val reply = bus.rpc(Seq("cdc/purchase/#", "cdc/error/#"))   // rpc(req, resSubs, …)
  * val recvd = bus.counters(Map("errs" -> "cdc/error/#")) // sub.received
  * bus.publish(df, "/data/bus-out")                       // publish(subject, msg)
  * }}}
  *
  * Each method returns a lazy DataFrame view over the one shared bus scan
  * (decode-once fan-out, lib/nats.js:88-92). Works identically on a
  * batch capture or a streaming DataFrame (pass one via [[Graft.over]]).
  */
object Graft {

  /** Open the bus from a captured events directory. */
  def connect(spark: SparkSession, dir: String): Bus =
    new Bus(Tables.bus(spark, dir))

  /** Connect LIVE — the reference's `new NATS({url})` (lib/nats.js:49):
    * a streaming bus fed by the DataSourceV2 micro-batch source over the
    * real TCP transport (default [[graft.nats.TcpBroker]]; `url` is
    * `host:port`, defaulting like the reference client to the canonical
    * local NATS address). The returned views are streaming DataFrames:
    * `subscribe`/`counters` compose with `writeStream` exactly as the
    * batch forms compose with actions (`take` needs the stateful gate,
    * [[graft.stream.Streams.takeNPerKey]] — sort-limit is a batch
    * shape). */
  def live(spark: SparkSession,
           url: String = graft.nats.TcpBroker.target): Bus = {
    sys.props(graft.nats.TcpBroker.TargetProperty) = url
    over(spark.readStream.format("graft-nats").load())
  }

  /** Wrap an arbitrary bus DataFrame (e.g. a readStream) that already has
    * a `channel` column — or synthesizes one if the events schema is raw. */
  def over(df: DataFrame): Bus =
    new Bus(if (df.columns.contains("channel")) df
            else graft.stream.Streams.withChannel(df))

  final class Bus private[cdc] (val frame: DataFrame) {

    /** A logical subscription: the pattern-filtered view. */
    def subscribe(pattern: String): DataFrame =
      frame.filter(mqtt_matches(lit(pattern), col("channel")))

    /** `subscribe(subject, {max:n})` — the first n matching messages in
      * arrival order, then auto-unsubscribe (lib/nats.js:98-107). Plans
      * TakeOrderedAndProject (per-partition top-n + 1-partition reduce),
      * never a global single-partition sort. */
    def take(pattern: String, n: Int): DataFrame =
      subscribe(pattern).orderBy(col("event_id")).limit(n)

    /** Per-subscription delivery counters (lib/nats.js:97), zero-delivery
      * subscriptions included. The bus never moves: each bus row
      * evaluates the k patterns in place (the reference's dispatch loop,
      * lib/nats.js:92-95), aggregates to a ≤k-row count table, and that
      * tiny table joins back onto the subscription dimension — the naive
      * pattern⋈bus theta-join would broadcast the BUS (BNLJ build side)
      * and die at scale. */
    def counters(subs: Map[String, String]): DataFrame = {
      val spark = frame.sparkSession
      import spark.implicits._
      // no subscriptions → no dispatch: an untyped empty array() would not
      // type-check inside the filter lambda, so answer directly
      if (subs.isEmpty)
        return spark.emptyDataset[(String, Long)].toDF("sub", "received")
      val ordered = subs.toSeq.sortBy(_._1)
      val counts = CdcBus.matchCounts(frame, ordered.map(_._2))
      ordered.toDF("sub", "pattern")
        .join(broadcast(counts), Seq("pattern"), "left")
        .select(col("sub"), coalesce(col("hits"), lit(0L)).as("received"))
    }

    /** First-response-wins over k response patterns with a 408 timeout
      * sentinel when nothing matches (lib/nats.js:196-256). Always returns
      * exactly one row. */
    def rpc(resPatterns: Seq[String]): DataFrame = {
      val spark = frame.sparkSession
      // k response subscriptions = one disjunctive predicate, one scan
      val hits = frame
        .filter(resPatterns.map(p => mqtt_matches(lit(p), col("channel"))).reduce(_ || _))
        .select(col("event_id"), col("channel"), lit(200).as("code"))
      val fallback = spark.range(1)
        .select(lit(-1L).as("event_id"), lit(null.asInstanceOf[String]).as("channel"),
                lit(408).as("code"))
      hits.unionByName(fallback)
        .orderBy(col("code"), col("event_id"))
        .limit(1)
    }

    /** mqtt-pattern `exec` as a view (reference dep yarn.lock:77-81):
      * rows matching `pattern`, with one extra column per named wildcard
      * (`+name` = that level, `#name` = the joined tail) — extraction and
      * match share one compiled regex. */
    def extract(pattern: String): DataFrame = {
      val (erx, names) = MqttPattern.toExtractRegex(pattern)
      names.zipWithIndex.foldLeft(subscribe(pattern)) { case (df, (n, i)) =>
        df.withColumn(n, regexp_extract(col("channel"), erx, i + 1))
      }
    }

    /** [[rpc]] with the reference's optional `resProcess` mapper
      * (lib/nats.js:218-222): a row-wise transform applied to the
      * response view before the race (a projection cannot change which
      * response arrives first; it must preserve `event_id`, the arrival
      * order). The 408 timeout row is appended UNtransformed — mapped
      * columns are NULL on it — mirroring the reference's unprocessed
      * timeout object. */
    def rpc(resPatterns: Seq[String], resProcess: DataFrame => DataFrame): DataFrame = {
      val spark = frame.sparkSession
      val hits = resProcess(
          frame.filter(resPatterns.map(p => mqtt_matches(lit(p), col("channel"))).reduce(_ || _)))
        .withColumn("code", lit(200))
      val fallbackCols = hits.schema.fields.map { f =>
        f.name match {
          case "event_id" => lit(-1L).as("event_id")
          case "code"     => lit(408).as("code")
          case c          => lit(null).cast(f.dataType).as(c)
        }
      }
      hits.unionByName(spark.range(1).select(fallbackCols.toSeq: _*))
        .orderBy(col("code"), col("event_id"))
        .limit(1)
    }

    /** The retained-message cache a new subscriber receives: the last
      * message per channel (the envelope `retain` flag semantics). */
    def retained(): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("channel"))
        .orderBy(col("ts").desc, col("event_id").desc)
      frame.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
    }

    /** Point-in-time replay: the per-channel state as of `cutoff` —
      * [[retained]] over the history ≤ cutoff. For a pushdown-pruned
      * scan over stored history, build the bus from
      * [[graft.Tables.eventsUpTo]] instead of filtering here. */
    def replay(cutoff: java.time.Instant): Bus =
      new Bus(frame.filter(col("ts") <= lit(java.sql.Timestamp.from(cutoff))))

    /** SCD2 materialization: every message becomes a version row with a
      * [valid_from, valid_to) interval closed by the channel's next
      * message; the open interval is the current version. */
    def scd2(): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("channel")).orderBy(col("ts"), col("event_id"))
      frame
        .withColumn("valid_from", col("ts"))
        .withColumn("valid_to",
          org.apache.spark.sql.functions.lead(col("ts"), 1).over(w))
        .withColumn("is_current", col("valid_to").isNull)
    }

    /** Publish = write to the constant physical address; routing stays in
      * the data (the reference's quirk at lib/nats.js:175), partitioned by
      * the leading routing level for pruned re-reads. */
    def publish(df: DataFrame, path: String): Unit =
      graft.sources.BusLayout.writePartitioned(df, path)
  }
}
