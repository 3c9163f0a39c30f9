package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

import graft.nats.CdcProto

/** `decode_cdc_msg(bytes)` — the reference's envelope decode
  * (`proto.CDCMsg.decode`, reference lib/nats.js:88-90) as a codegen'd
  * Catalyst expression: BINARY → STRUCT<publisher, channel, contentType,
  * protocol, reply, qos, retain, payload>. The wire walk lives once in
  * [[CdcProto.decodeToRow]]; codegen emits a static call, so the decode
  * stays inside WholeStageCodegen exactly like the reference decodes once
  * per message before fan-out. */
case class DecodeCdcMsgExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "decode_cdc_msg"
  override def dataType: DataType = CdcProto.MsgStructType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"decode_cdc_msg requires BINARY, got ${child.dataType.sql}")

  override def nullSafeEval(bytes: Any): Any =
    CdcProto.decodeToRow(bytes.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.nats.CdcProto.decodeToRow($b)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
