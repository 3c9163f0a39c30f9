package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass marker-word counter for language ID.
  *
  * Semantically identical to one `regexp_count(lower(text),
  * '\b(w1|w2|…)\b')` per marker set PLUS a CJK-block `rlike` — but in a
  * single scan of the string instead of sets+1 regex passes (the
  * dominant cost of the lang_id query). The equivalence argument: with
  * Java's ASCII `\w`, a `\b`-anchored all-letter alternation matches
  * exactly where a maximal run of `[a-z0-9_]` in the lowercased text
  * equals a marker word, and alternation hits can never overlap a token —
  * so counting token-equality hits per set reproduces every regex count
  * bit-for-bit (the unchanged DuckDB oracle twin proves it).
  *
  * Output: STRUCT<h_<name> INT per set, cjk BOOLEAN>.
  */
case class MarkerCountsExpr(child: Expression,
                            markerSets: Seq[(String, Seq[String])])
    extends UnaryExpression {

  override def prettyName: String = "marker_counts"

  override def dataType: DataType = StructType(
    markerSets.map { case (n, _) => StructField(s"h_$n", IntegerType, nullable = false) } :+
      StructField("cjk", BooleanType, nullable = false))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"marker_counts requires STRING, got ${child.dataType.sql}")

  @transient private lazy val scorer = new MarkerScorer(markerSets.map(_._2))

  override def nullSafeEval(text: Any): Any =
    scorer.score(text.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markerScorer", scorer, classOf[MarkerScorer].getName)
    defineCodeGen(ctx, ev, c => s"$ref.score($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The scan itself — shared by eval and codegen via a reference object. */
final class MarkerScorer(markerSets: Seq[Seq[String]]) extends Serializable {

  private val nSets = markerSets.length
  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    markerSets.map { ws =>
      val s = new java.util.HashSet[String]()
      ws.foreach(w => s.add(w.toLowerCase(java.util.Locale.ROOT)))
      s
    }.toArray

  def score(text: UTF8String): InternalRow = {
    // UTF8String.toLowerCase is locale-independent — the same lowering
    // lower(text) applies, so marker comparison matches the regex form
    val s = text.toLowerCase.toString
    val counts = new Array[Int](nSets)
    var cjk = false
    var tokStart = -1
    var i = 0
    val n = s.length
    while (i <= n) {
      val c = if (i < n) s.charAt(i) else ' '
      if (c >= 0x4e00 && c <= 0x9fff) cjk = true
      val isWord = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_'
      if (isWord) { if (tokStart < 0) tokStart = i }
      else if (tokStart >= 0) {
        val tok = s.substring(tokStart, i)
        var j = 0
        while (j < nSets) { if (sets(j).contains(tok)) counts(j) += 1; j += 1 }
        tokStart = -1
      }
      i += 1
    }
    val out = new Array[Any](nSets + 1)
    var j = 0
    while (j < nSets) { out(j) = counts(j); j += 1 }
    out(nSets) = cjk
    InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
  }
}
