package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{DecodeCdcMsgExpr, DotProductExpr, GraftFunctions, MqttMatchesExpr}
import graft.plans.MqttPrefixPushdown

/** Session extensions wiring for the graft engine:
  *   - SQL functions `mqtt_matches(pattern, channel)`, `dot_product(a, b)`
  *     (codegen'd Catalyst expressions) and `bottomk_by_hash(v, k)` (the
  *     deterministic KMV sample aggregate);
  *   - the [[MqttPrefixPushdown]] optimizer rule that turns constant
  *     routing patterns into parquet-pushdown-able prefix predicates.
  *
  * Use: `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("mqtt_matches"),
      new ExpressionInfo(classOf[MqttMatchesExpr].getName, "mqtt_matches"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MqttMatchesExpr(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "dot_product"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProductExpr(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("bottomk_by_hash"),
      new ExpressionInfo(classOf[graft.functions.BottomKByHashAgg].getName, "bottomk_by_hash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftFunctions.bottomkBuilder(exprs)))
    e.injectFunction((
      FunctionIdentifier("decode_cdc_msg"),
      new ExpressionInfo(classOf[DecodeCdcMsgExpr].getName, "decode_cdc_msg"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DecodeCdcMsgExpr(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("mqtt_dispatch"),
      new ExpressionInfo(classOf[graft.functions.MqttDispatchExpr].getName, "mqtt_dispatch"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftFunctions.dispatchBuilder(exprs)))
    e.injectFunction((
      FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[graft.functions.WinnowFpsExpr].getName, "winnow_fps"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.WinnowFpsExpr(exprs(0), graft.llm.HashDedup.shingleKernel)))
    e.injectFunction((
      FunctionIdentifier("band_hashes"),
      new ExpressionInfo(classOf[graft.functions.BandHashesExpr].getName, "band_hashes"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.BandHashesExpr(exprs(0), graft.llm.HashDedup.shingleKernel)))
    e.injectOptimizerRule(_ => MqttPrefixPushdown)
    e.injectOptimizerRule(_ => graft.plans.BusPartitionPruning)
  }
}
