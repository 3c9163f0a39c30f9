package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared table loaders. All graded inputs are the driver-generated parquet
  * tables (TESTDATA.md): one `spark.read.parquet` per table — Catalyst owns
  * pushdown/pruning from there. */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS), which Spark's vectorized
    // parquet reader rejects; read it as long and convert (see [[events]]).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String)    = load(s, d, "region")
  def nation(s: SparkSession, d: String)    = load(s, d, "nation")
  def customer(s: SparkSession, d: String)  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String)  = load(s, d, "supplier")
  def part(s: SparkSession, d: String)      = load(s, d, "part")
  def orders(s: SparkSession, d: String)    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String)  = load(s, d, "lineitem")
  /** `events` with `ts` restored to session-zoned TIMESTAMP, whatever
    * precision/annotation the generator wrote:
    *  - TIMESTAMP(NANOS) reads as epoch-nanos BIGINT under `nanosAsLong`;
    *    all residues below the microsecond are zero in the testdata, so
    *    `ts div 1000` micros is lossless. Integer division on LONG — a
    *    double intermediate would lose precision above 2^53 ns.
    *  - timestamp[us] without a timezone annotation reads as
    *    TIMESTAMP_NTZ; the cast to TIMESTAMP interprets the wall-clock in
    *    the session timezone (pinned UTC by every entry point), exactly
    *    how DuckDB's naive TIMESTAMP treats the same bytes — lossless and
    *    oracle-identical. */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
  /** Time-pruned events scan: the cutoff applies to the RAW stored
    * column (epoch-nanos BIGINT), so it reaches `PushedFilters` and
    * parquet row-group min/max stats skip everything after T — the
    * predicate a point-in-time replay over a 100 TB bus lives or dies
    * by. A cutoff on the DERIVED timestamp (see [[events]]) cannot push
    * through `timestamp_micros(ts div 1000)`; this helper filters
    * before the conversion. Equivalent because the conversion is
    * monotone and the cutoff sits on a microsecond boundary. */
  def eventsUpTo(s: SparkSession, d: String, cutoffUtc: java.time.Instant): DataFrame = {
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // full instant precision: a sub-second cutoff must not silently
        // truncate to the whole second (the Timestamp branch keeps it)
        val ns = Math.addExact(
          Math.multiplyExact(cutoffUtc.getEpochSecond, 1000000000L),
          cutoffUtc.getNano.toLong)
        df.filter(col("ts") <= ns)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // compare on the STORED NTZ column (pushes to parquet stats),
        // with the cutoff rendered as the same UTC wall-clock
        df.filter(col("ts") <= lit(java.time.LocalDateTime.ofInstant(
            cutoffUtc, java.time.ZoneOffset.UTC)))
          .withColumn("ts", col("ts").cast("timestamp"))
      case _ =>
        df.filter(col("ts") <= lit(java.sql.Timestamp.from(cutoffUtc)))
    }
  }

  /** [[eventsUpTo]]'s two-sided sibling: events in `(after, upTo]` —
    * the CDC DELTA BATCH an incremental-maintenance pass applies. Both
    * bounds compare on the RAW stored column for the same row-group-
    * pruning reason; either bound may be open (None). */
  def eventsBetween(s: SparkSession, d: String,
                    afterUtc: Option[java.time.Instant],
                    upToUtc: Option[java.time.Instant]): DataFrame = {
    val df = load(s, d, "events")
    def bounds(loExcl: Option[Any], hiIncl: Option[Any]): org.apache.spark.sql.Column =
      Seq(loExcl.map(col("ts") > lit(_)), hiIncl.map(col("ts") <= lit(_)))
        .flatten.reduceOption(_ && _).getOrElse(lit(true))
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        def ns(i: java.time.Instant): Long = Math.addExact(
          Math.multiplyExact(i.getEpochSecond, 1000000000L), i.getNano.toLong)
        df.filter(bounds(afterUtc.map(ns), upToUtc.map(ns)))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        def wall(i: java.time.Instant): java.time.LocalDateTime =
          java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC)
        df.filter(bounds(afterUtc.map(wall), upToUtc.map(wall)))
          .withColumn("ts", col("ts").cast("timestamp"))
      case _ =>
        df.filter(bounds(afterUtc.map(java.sql.Timestamp.from),
          upToUtc.map(java.sql.Timestamp.from)))
    }
  }

  def documents(s: SparkSession, d: String) = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = load(s, d, "embeddings")

  /** THE canonical channel layout `cdc/<event_type>/<user_id>` (SURVEY
    * §1.5 role mapping — routing is data, the physical address is
    * constant, mirroring the reference's publish quirk at
    * lib/nats.js:175). Every channel synthesis in the engine goes
    * through one of these two builders — never inline the layout. */
  def channelCol(eventType: org.apache.spark.sql.Column,
                 userId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat_ws("/", lit("cdc"), eventType, userId.cast("string"))

  /** String twin of [[channelCol]] for row-level code paths — including
    * concat_ws's null handling (a NULL segment is skipped, not rendered
    * as the literal "null"). */
  def channelString(eventType: String, userId: Long): String =
    if (eventType == null) s"cdc/$userId" else s"cdc/$eventType/$userId"

  /** The captured CDC bus: `events` with the routed `channel` synthesized. */
  def bus(s: SparkSession, d: String): DataFrame =
    events(s, d).withColumn("channel", channelCol(col("event_type"), col("user_id")))

  /** DuckDB-side twin of [[bus]] as a CTE named `ev`. `ts` is cast from
    * DuckDB's TIMESTAMP_NS down to microsecond TIMESTAMP to mirror the
    * Spark side (lossless on this data — see [[events]]). `concat_ws`
    * (NULL segments skipped) mirrors [[channelCol]] exactly — the `||`
    * form would yield a NULL channel on a NULL event_type where the Spark
    * side yields "cdc/<uid>". */
  val BusCte: String =
    "WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts), " +
      "concat_ws('/', 'cdc', event_type, CAST(user_id AS VARCHAR)) AS channel FROM events)"
}
