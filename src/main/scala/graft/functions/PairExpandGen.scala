package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Compiled bucket-local ordered-pair enumeration — the generator form
  * of [[graft.llm.HashDedup.pairExpand]]'s
  * `explode(flatten(transform(arr, (x, i) -> transform(slice(arr, i+2,
  * ...), y -> struct(x, y)))))`.
  *
  * Semantically identical (one `struct(l, r)` row per i<j position
  * pair, in the same (i, j) order, zero rows for null/short arrays —
  * pinned by the parity spec), but the nested higher-order-function
  * chain is CodegenFallback and EAGER: for an n-element bucket it
  * allocates n slice copies plus a flattened n²/2-struct array before
  * explode ever sees a row — Σ O(n²) intermediate allocations per
  * bucket with two levels of interpreted lambda dispatch per element
  * (the [[ShingleKernel]] lesson: measured 235 s → ~2 s on the
  * winnowing projection). This generator walks the index pairs
  * directly off ONE materialized element array and emits each pair
  * row lazily — no slices, no flatten buffer, no per-element closure
  * dispatch.
  *
  * Shared by every LSH/blocked pair path (minhash/simhash/winnow/
  * n-gram/pHash/source-overlap): per-task pair volume stays bounded by
  * the callers' bucket caps exactly as before — this changes only the
  * constant factor of the expansion, not its size.
  */
case class PairExpandGen(child: Expression, lName: String, rName: String)
    extends UnaryExpression with Generator with CodegenFallback {

  private def arrayType: ArrayType = child.dataType.asInstanceOf[ArrayType]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pair_expand needs an array input, got ${other.catalogString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pair", StructType(Seq(
      StructField(lName, arrayType.elementType, arrayType.containsNull),
      StructField(rName, arrayType.elementType, arrayType.containsNull))),
      nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val n = arr.numElements()
    if (n < 2) return Iterator.empty
    val et = arrayType.elementType
    val elems = new Array[Any](n)
    var i = 0
    while (i < n) {
      elems(i) = if (arr.isNullAt(i)) null else arr.get(i, et)
      i += 1
    }
    new Iterator[InternalRow] {
      private var a = 0
      private var b = 1
      override def hasNext: Boolean = a < n - 1
      override def next(): InternalRow = {
        // fresh rows per pair: downstream operators may buffer references
        val pair = new GenericInternalRow(Array[Any](elems(a), elems(b)))
        b += 1
        if (b >= n) { a += 1; b = a + 1 }
        new GenericInternalRow(Array[Any](pair))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): PairExpandGen =
    copy(child = newChild)

  override def prettyName: String = "pair_expand"
}
