package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.cdc.MqttTrie

/** `mqtt_dispatch(channel)` against a plan-time pattern set: returns the
  * ARRAY<INT> of subscription indices whose pattern matches the channel —
  * the reference's whole dispatch loop (`lib/nats.js:92-95`) as ONE
  * codegen'd expression over a compiled [[MqttTrie]]. One topic walk per
  * row regardless of the subscription count; the trie lives in the
  * codegen references array, built once at plan time. */
case class MqttDispatchExpr(channel: Expression, patterns: Seq[String])
    extends UnaryExpression {

  override def child: Expression = channel
  override def prettyName: String = "mqtt_dispatch"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val trie = MqttTrie(patterns)

  override def checkInputDataTypes(): TypeCheckResult =
    if (channel.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mqtt_dispatch requires STRING, got ${channel.dataType.sql}")

  override def nullSafeEval(c: Any): Any =
    ArrayData.toArrayData(trie.dispatch(c.asInstanceOf[UTF8String].toString))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mqttTrie", trie, classOf[MqttTrie].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($ref.dispatch($c.toString()))")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(channel = newChild)
}
