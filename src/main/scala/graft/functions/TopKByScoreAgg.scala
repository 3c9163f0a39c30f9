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
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(String, Double)]] {

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

  /** Rank order: higher score first, then term ascending. */
  private def better(a: (String, Double), b: (String, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  private def insert(buf: mutable.ArrayBuffer[(String, Double)],
                     e: (String, Double)): mutable.ArrayBuffer[(String, Double)] = {
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

  override def createAggregationBuffer(): mutable.ArrayBuffer[(String, Double)] =
    mutable.ArrayBuffer.empty

  override def update(buf: mutable.ArrayBuffer[(String, Double)],
                      input: InternalRow): mutable.ArrayBuffer[(String, Double)] = {
    val t = term.eval(input)
    val v = score.eval(input)
    if (t != null && v != null)
      insert(buf, (t.asInstanceOf[UTF8String].toString, v.asInstanceOf[Double]))
    else buf
  }

  override def merge(a: mutable.ArrayBuffer[(String, Double)],
                     b: mutable.ArrayBuffer[(String, Double)]): mutable.ArrayBuffer[(String, Double)] = {
    b.foreach(insert(a, _))
    a
  }

  override def eval(buf: mutable.ArrayBuffer[(String, Double)]): Any =
    new GenericArrayData(buf.map { case (w, sc) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(w), sc))
    }.toArray[Any]) // buffer is maintained in rank order

  override def serialize(buf: mutable.ArrayBuffer[(String, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (w, sc) => out.writeUTF(w); out.writeDouble(sc) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(String, Double)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[(String, Double)]
    (1 to n).foreach(_ => buf += ((in.readUTF(), in.readDouble())))
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
