package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Compiled H-INDEX of an ARRAY<LONG>: the largest h such that at least
  * h elements are ≥ h — equivalently max_i min(v_i, i) over the values
  * sorted descending (1-based i). The per-round kernel of the coreness
  * fixpoint ([[graft.rel.RelQueries.corenessOf]]): the SQL-composable
  * form (sort + row_number window + least/max) re-shuffles and re-sorts
  * the gathered neighbor values every round; this evaluates one
  * gathered array per node in a single JVM call (the
  * [[ShingleSetExpr]]/[[ShingleKernel]] interpreted-HOF lesson). Null
  * input → null; empty array → 0. */
case class HIndexExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "h_index"

  override def dataType: DataType = LongType

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"h_index requires ARRAY<BIGINT>, got ${other.sql}")
  }

  override def nullSafeEval(arr: Any): Any =
    HIndexExpr.hIndex(arr.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.HIndexExpr.hIndex($c);
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HIndexExpr {
  def hIndex(arr: ArrayData): Long = {
    val a = arr.toLongArray()
    java.util.Arrays.sort(a)
    val n = a.length
    var h = 0L
    var i = 0
    while (i < n) {
      val v = a(n - 1 - i) // descending order
      val rank = i + 1L
      val m = if (v < rank) v else rank
      if (m > h) h = m
      i += 1
    }
    h
  }
}
