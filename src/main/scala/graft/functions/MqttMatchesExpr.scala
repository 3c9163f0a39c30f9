package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.cdc.MqttPattern

/** `mqtt_matches(pattern, channel)` as a native Catalyst predicate — the
  * Spark-first re-expression of the reference's per-message routing match
  * (reference `lib/nats.js:92-95`: MQTTPattern.matches(sub.subject, msg.channel)).
  *
  * Codegen strategy:
  *   - constant (foldable) pattern — the overwhelmingly common case: the
  *     pattern is compiled ONCE at plan time to a `java.util.regex.Pattern`
  *     held in the codegen references array; per row we only run the
  *     precompiled matcher. Stays inside WholeStageCodegen.
  *   - dynamic pattern (pattern is a column): falls back to the shared
  *     level-wise matcher, still codegen'd (static call, no reflection).
  */
case class MqttMatchesExpr(pattern: Expression, channel: Expression)
    extends BinaryExpression with Predicate {

  override def left: Expression = pattern
  override def right: Expression = channel
  override def prettyName: String = "mqtt_matches"

  override def checkInputDataTypes(): TypeCheckResult =
    if (pattern.dataType.isInstanceOf[StringType] &&
        channel.dataType.isInstanceOf[StringType]) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"mqtt_matches requires (STRING, STRING), got " +
          s"(${pattern.dataType.sql}, ${channel.dataType.sql})")
    }

  override def nullSafeEval(p: Any, c: Any): Any =
    MqttPattern.matchesCached(p.asInstanceOf[UTF8String].toString,
                              c.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (pattern.foldable && pattern.eval(null) != null) {
      val compiled = MqttPattern.compileJava(
        pattern.eval(null).asInstanceOf[UTF8String].toString)
      val ref = ctx.addReferenceObj("mqttPattern", compiled,
        classOf[java.util.regex.Pattern].getName)
      defineCodeGen(ctx, ev, (_, c) => s"$ref.matcher($c.toString()).matches()")
    } else {
      defineCodeGen(ctx, ev,
        (p, c) => s"graft.cdc.MqttPattern.matchesCached($p.toString(), $c.toString())")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(pattern = newLeft, channel = newRight)
}
