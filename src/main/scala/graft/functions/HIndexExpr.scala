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

/** Compiled H-INDEX of a HISTOGRAM — ARRAY<STRUCT<v: LONG, c: LONG>>
  * of (value, count) pairs: the largest h such that at least h
  * underlying elements are ≥ h, i.e. max over distinct values of
  * min(value, cumulative count from the largest value down). The
  * histogram form is what the hardened coreness gather produces
  * ([[graft.rel.RelQueries.corenessOf]], r14 VERDICT Next #1): after
  * clamping gathered neighbor labels at the gatherer's own label,
  * a node's state is ≤ label-many (value, count) rows instead of a
  * degree-sized value array — the 10⁷-neighbor hub folds here in
  * O(label log label), not O(degree). Pairs arrive in arbitrary
  * order (sorted here); values need not be distinct (duplicate rows
  * just split a count). Null input → null; null/empty entries never
  * occur by construction (counts come from a grouped COUNT) but a
  * null struct row is skipped defensively. Empty array → 0. */
case class HIndexHistExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "h_index_hist"

  override def dataType: DataType = LongType

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(a, b)), _)
        if a.dataType == LongType && b.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"h_index_hist requires ARRAY<STRUCT<BIGINT, BIGINT>>, got ${other.sql}")
  }

  override def nullSafeEval(arr: Any): Any =
    HIndexExpr.hIndexHist(arr.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.HIndexExpr.hIndexHist($c);
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HIndexExpr {
  /** Histogram h-index: sort (value, count) rows by value descending,
    * walk the cumulative count, take max(min(value, cum)). Equivalent
    * to [[hIndex]] over the expanded multiset — the candidate between
    * two distinct values v₁ > h > v₂ can never win because f(h) is
    * flat there and min(v₁, cum₁) already covers it. */
  def hIndexHist(arr: ArrayData): Long = {
    val n = arr.numElements()
    // pack (value, count) rows for a primitive sort; values and counts
    // are both non-negative longs in every producer (labels, COUNTs)
    val vs = new Array[Long](n)
    val cs = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, 2)
        vs(m) = row.getLong(0)
        cs(m) = row.getLong(1)
        m += 1
      }
      i += 1
    }
    // indirect sort by value descending (m is ≤ the node's label after
    // clamping — tiny; an insertion sort avoids boxing)
    var a = 1
    while (a < m) {
      val v = vs(a); val c = cs(a)
      var b = a - 1
      while (b >= 0 && vs(b) < v) {
        vs(b + 1) = vs(b); cs(b + 1) = cs(b); b -= 1
      }
      vs(b + 1) = v; cs(b + 1) = c
      a += 1
    }
    var cum = 0L
    var h = 0L
    i = 0
    while (i < m) {
      cum += cs(i)
      val cand = if (vs(i) < cum) vs(i) else cum
      if (cand > h) h = cand
      i += 1
    }
    h
  }

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
