package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}

/** Column-level API + SQL registration for graft's custom expressions. */
object GraftFunctions {

  /** `mqtt_matches(pattern, channel)` as a `Column` predicate. */
  def mqtt_matches(pattern: Column, channel: Column): Column =
    GraftBridge.column(MqttMatchesExpr(
      GraftBridge.expression(pattern),
      GraftBridge.expression(channel)))

  /** Register `mqtt_matches` for SQL usage in the given session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "mqtt_matches", exprs => MqttMatchesExpr(exprs(0), exprs(1)), "built-in")
}
