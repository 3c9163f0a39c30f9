package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-group top-k by score as a `TypedImperativeAggregate`: keeps the k
  * highest-scoring (term, score) pairs, ties broken toward the smaller
  * term — the same total order as `row_number() OVER (ORDER BY score
  * DESC, term)`, so the result is deterministic and row-identical to the
  * window-rank form it replaces. The difference is the physical shape:
  * partial top-k per partition + an O(k) merge in a hash aggregate,
  * never a per-group sort — so a group holding 90 % of the rows costs
  * one bounded buffer, not one serialized sort task (the window form's
  * 100 TB failure mode).
  *
  * Tie-break comparisons stay on [[UTF8String]] (binary / UTF-8 byte
  * order, identical to code-point order) rather than JVM `String` `<`
  * (UTF-16 code-unit order): the two diverge exactly when a
  * supplementary-plane term (surrogate pair, bytes F0..F4) ties with a
  * high-BMP term (bytes EE/EF) — JVM order ranks the surrogate pair
  * FIRST (0xD800 < 0xE000) while UTF-8 order ranks it LAST. Both the
  * window form this aggregate replaces and the shared DuckDB oracle
  * compare binary, so the buffer must too.
  *
  * Buffer: O(k) sorted array, one-comparison reject once full (the
  * [[BottomKByHashAgg]] discipline). Output: ARRAY<STRUCT<w, score>> in
  * rank order, ready for posexplode.
  */
case class TopKByScoreAgg(
    term: Expression,
    score: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(UTF8String, Double)]] {

  override def children: Seq[Expression] = Seq(term, score)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("w", StringType, nullable = false),
                   StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_by_score"

  override def checkInputDataTypes(): TypeCheckResult =
    if (term.dataType == StringType && score.dataType == DoubleType && k > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_by_score requires (STRING, DOUBLE, k > 0), got " +
        s"(${term.dataType.sql}, ${score.dataType.sql}, k=$k)")

  /** Rank order: higher score first, then term ascending in UTF-8
    * binary (= code-point) order — NOT JVM String order, which differs
    * for supplementary-plane vs high-BMP ties. */
  private def better(a: (UTF8String, Double), b: (UTF8String, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1.compareTo(b._1) < 0)

  private def insert(buf: mutable.ArrayBuffer[(UTF8String, Double)],
                     e: (UTF8String, Double)): mutable.ArrayBuffer[(UTF8String, Double)] = {
    if (buf.length == k && !better(e, buf.last)) return buf
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (better(buf(mid), e)) lo = mid + 1 else hi = mid
    }
    buf.insert(lo, e)
    if (buf.length > k) buf.remove(buf.length - 1)
    buf
  }

  override def createAggregationBuffer(): mutable.ArrayBuffer[(UTF8String, Double)] =
    mutable.ArrayBuffer.empty

  override def update(buf: mutable.ArrayBuffer[(UTF8String, Double)],
                      input: InternalRow): mutable.ArrayBuffer[(UTF8String, Double)] = {
    val t = term.eval(input)
    val v = score.eval(input)
    if (t != null && v != null)
      // clone(): the incoming UTF8String may be a pointer into a reused
      // row buffer; the agg buffer outlives the row.
      insert(buf, (t.asInstanceOf[UTF8String].clone(), v.asInstanceOf[Double]))
    else buf
  }

  override def merge(a: mutable.ArrayBuffer[(UTF8String, Double)],
                     b: mutable.ArrayBuffer[(UTF8String, Double)]): mutable.ArrayBuffer[(UTF8String, Double)] = {
    b.foreach(insert(a, _))
    a
  }

  override def eval(buf: mutable.ArrayBuffer[(UTF8String, Double)]): Any =
    new GenericArrayData(buf.map { case (w, sc) =>
      new GenericInternalRow(Array[Any](w, sc))
    }.toArray[Any]) // buffer is maintained in rank order

  override def serialize(buf: mutable.ArrayBuffer[(UTF8String, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (w, sc) =>
      val bytes = w.getBytes
      out.writeInt(bytes.length)
      out.write(bytes) // raw UTF-8, not writeUTF's modified-UTF-8 (which mangles supplementary planes and NUL)
      out.writeDouble(sc)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(UTF8String, Double)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[(UTF8String, Double)]
    (1 to n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf += ((UTF8String.fromBytes(b), in.readDouble()))
    }
    buf // serialized in rank order; re-inserting is unnecessary
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScoreAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScoreAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(term = newChildren(0), score = newChildren(1))
}
