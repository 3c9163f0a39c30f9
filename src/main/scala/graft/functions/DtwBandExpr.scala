package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Sakoe-Chiba BANDED DTW distance between two length-`n` `ARRAY<BIGINT>`
  * integer series: the minimum over monotone alignment paths within
  * |i − j| ≤ `band` of Σ |xᵢ − yⱼ| — the time-series similarity the
  * lockstep L2 of `ts_user_similarity` cannot express (a series shifted
  * by one hour is FAR in lockstep, near under warping). L1 cell cost on
  * already-quantized integer series keeps the whole DP in exact BIGINTs,
  * so the result is reduction-order-free and an unrolled SQL twin
  * reproduces it bit-for-bit (the [[MaxSimExpr]] discipline applied to
  * dynamic programming); `band = 0` degenerates to exactly Σ |xᵢ − yᵢ|.
  *
  * Shape: two rolling (2·band+1)-cell rows — O(n·band) time, O(band)
  * space, one fused codegen kernel per pair (the equivalent static
  * expression tree would be n·(2band+1) nested `least` arms). Cells
  * outside the band hold an INF sentinel (2⁶²) and additions SATURATE
  * at it, so unreachable paths can neither overflow nor undercut a real
  * one; a real path whose cost approached 2⁶² would be the caller
  * violating the family's integer-scale contract (quantized hour series
  * sit ≤ ~2⁴⁰ per cell, paths ≤ 2n cells).
  *
  * Null semantics: a NULL array, a NULL element, or a length other than
  * `n` on either side → NULL (the poisoning-fold contract of the other
  * vector kernels). */
case class DtwBandExpr(left: Expression, right: Expression,
                       n: Int, band: Int)
    extends BinaryExpression {

  require(n > 0 && band >= 0 && band <= n,
    "dtw_band needs n > 0 and 0 <= band <= n")

  override def dataType: DataType = LongType
  override def prettyName: String = "dtw_band"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dtw_band requires (ARRAY<BIGINT>, ARRAY<BIGINT>), got (${l.sql}, ${r.sql})")
  }

  /** Unreachable-path sentinel; additions saturate at it. */
  private val Inf = 1L << 62

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != n || y.numElements() != n) return null
    var p = 0
    while (p < n) {
      if (x.isNullAt(p) || y.isNullAt(p)) return null
      p += 1
    }
    val w = 2 * band + 1
    val prev = Array.fill(w)(Inf)
    val cur = Array.fill(w)(Inf)
    var i = 0
    while (i < n) {
      var o = 0
      while (o < w) {
        val j = i + o - band
        if (j < 0 || j >= n) cur(o) = Inf
        else {
          var best = Inf
          if (i == 0 && j == 0) best = 0L
          else {
            if (o + 1 < w && prev(o + 1) < best) best = prev(o + 1) // d[i-1][j]
            if (o - 1 >= 0 && cur(o - 1) < best) best = cur(o - 1)  // d[i][j-1]
            if (prev(o) < best) best = prev(o)                      // d[i-1][j-1]
          }
          cur(o) = if (best >= Inf) Inf
                   else best + math.abs(x.getLong(i) - y.getLong(j))
        }
        o += 1
      }
      System.arraycopy(cur, 0, prev, 0, w)
      i += 1
    }
    prev(band) // d[n-1][n-1]
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val w = 2 * band + 1
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val o = ctx.freshName("o")
      val j = ctx.freshName("j")
      val best = ctx.freshName("best")
      val prev = ctx.freshName("prev")
      val cur = ctx.freshName("cur")
      s"""
         |if ($a.numElements() != $n || $b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $p = 0; $p < $n; $p++) {
         |    if ($a.isNullAt($p) || $b.isNullAt($p)) { ${ev.isNull} = true; break; }
         |  }
         |  if (!${ev.isNull}) {
         |    long[] $prev = new long[$w];
         |    long[] $cur = new long[$w];
         |    java.util.Arrays.fill($prev, ${Inf}L);
         |    for (int $i = 0; $i < $n; $i++) {
         |      for (int $o = 0; $o < $w; $o++) {
         |        int $j = $i + $o - $band;
         |        if ($j < 0 || $j >= $n) { $cur[$o] = ${Inf}L; continue; }
         |        long $best = ${Inf}L;
         |        if ($i == 0 && $j == 0) {
         |          $best = 0L;
         |        } else {
         |          if ($o + 1 < $w && $prev[$o + 1] < $best) $best = $prev[$o + 1];
         |          if ($o - 1 >= 0 && $cur[$o - 1] < $best) $best = $cur[$o - 1];
         |          if ($prev[$o] < $best) $best = $prev[$o];
         |        }
         |        $cur[$o] = $best >= ${Inf}L ? ${Inf}L
         |          : $best + Math.abs($a.getLong($i) - $b.getLong($j));
         |      }
         |      System.arraycopy($cur, 0, $prev, 0, $w);
         |    }
         |    ${ev.value} = $prev[$band];
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
