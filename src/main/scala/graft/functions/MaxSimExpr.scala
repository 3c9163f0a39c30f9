package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Late-interaction (MaxSim / ColBERT) score over two `ARRAY<DOUBLE>`
  * columns read as `tokens` slices of `dim` dims each:
  * Σᵢ maxⱼ floor(10⁶·⟨qᵢ, dⱼ⟩) — every pairwise token dot quantizes to
  * an integer BEFORE the max/sum reductions, so the result is an exact
  * BIGINT both engines (and the unrolled SQL twin) reproduce
  * bit-for-bit.
  *
  * Arithmetic parity: each slice dot folds left-to-right in DOUBLE
  * (the [[DotProductExpr]] discipline, identical to the
  * `qv[a]*v[b] + …` left-associative chains of the DuckDB twin), then
  * `floor(dot * 1e6)` truncates to long. The reason the expression
  * exists: the equivalent static expression tree is tokens² `greatest`
  * arms of `dim` `element_at` products — hundreds of generated
  * sub-expressions per row — where this compiles to one fused pair of
  * primitive loops inside WholeStageCodegen.
  *
  * Null semantics: a NULL array, a NULL element, or a length other than
  * `tokens·dim` on either side → NULL (the poisoning fold contract of
  * the other vector kernels). */
case class MaxSimExpr(left: Expression, right: Expression,
                      tokens: Int, dim: Int)
    extends BinaryExpression {

  require(tokens > 0 && dim > 0, "max_sim needs positive tokens/dim")

  override def dataType: DataType = LongType
  override def prettyName: String = "max_sim"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"max_sim requires (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got (${l.sql}, ${r.sql})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = tokens * dim
    if (x.numElements() != n || y.numElements() != n) return null
    var p = 0
    while (p < n) {
      if (x.isNullAt(p) || y.isNullAt(p)) return null
      p += 1
    }
    var total = 0L
    var ti = 0
    while (ti < tokens) {
      var best = Long.MinValue
      var tj = 0
      while (tj < tokens) {
        var acc = 0.0d
        var k = 0
        while (k < dim) {
          acc += x.getDouble(ti * dim + k) * y.getDouble(tj * dim + k)
          k += 1
        }
        val q = math.floor(acc * 1e6d).toLong
        if (q > best) best = q
        tj += 1
      }
      total += best
      ti += 1
    }
    total
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = tokens * dim
      val p = ctx.freshName("p")
      val ti = ctx.freshName("ti")
      val tj = ctx.freshName("tj")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      val best = ctx.freshName("best")
      val total = ctx.freshName("total")
      val q = ctx.freshName("q")
      s"""
         |if ($a.numElements() != $n || $b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $p = 0; $p < $n; $p++) {
         |    if ($a.isNullAt($p) || $b.isNullAt($p)) { ${ev.isNull} = true; break; }
         |  }
         |  if (!${ev.isNull}) {
         |    long $total = 0L;
         |    for (int $ti = 0; $ti < $tokens; $ti++) {
         |      long $best = Long.MIN_VALUE;
         |      for (int $tj = 0; $tj < $tokens; $tj++) {
         |        double $acc = 0.0d;
         |        for (int $k = 0; $k < $dim; $k++) {
         |          $acc += $a.getDouble($ti * $dim + $k) * $b.getDouble($tj * $dim + $k);
         |        }
         |        long $q = (long) Math.floor($acc * 1.0E6d);
         |        if ($q > $best) $best = $q;
         |      }
         |      $total += $best;
         |    }
         |    ${ev.value} = $total;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
