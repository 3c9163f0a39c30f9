package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage layout for the captured bus at scale.
  *
  * Routing is data (the reference's publish quirk, lib/nats.js:175), so
  * the dominant predicate on a 100 TB bus is the channel's leading
  * levels. Hive-partitioning the capture by the first routing level
  * (event_type here) turns every constant-prefix subscription into
  * partition pruning — the scan never opens non-matching directories —
  * and the MqttPrefixPushdown StartsWith handles the finer levels via
  * row-group stats inside each partition.
  */
object BusLayout {

  /** Write the bus partitioned by its first routing level. */
  def writePartitioned(bus: DataFrame, path: String): Unit =
    bus.write.partitionBy("event_type").mode("overwrite").parquet(path)

  /** Read it back; subscription filters on event_type prune partitions. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
