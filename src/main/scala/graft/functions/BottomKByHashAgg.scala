package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Deterministic per-group sampling as a `TypedImperativeAggregate`:
  * keep the k values whose md5(value) hex digests are smallest — a KMV
  * ("bottom-k by hash") sketch. Properties that matter at 100 TB:
  *
  *   - order- and partitioning-independent (the sample is a pure function
  *     of the value set, unlike reservoir sampling or `collect_list` +
  *     limit), so retries/speculation/shuffle layout never change it;
  *   - bounded buffer (k entries) per group with bounded merges —
  *     partial aggregation works, memory is O(k) regardless of group
  *     size;
  *   - cross-engine reproducible: the DuckDB twin is
  *     `row_number() OVER (ORDER BY md5(CAST(v AS VARCHAR)), v) <= k`.
  *
  * Spark has no bounded deterministic sample aggregate (count_min/HLL
  * sketch counts, but can't sample), hence the custom aggregate. Input:
  * LONG; output: ARRAY<LONG> sorted by digest — stable sample order.
  */
case class BottomKByHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(String, Long)]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bottomk_by_hash"

  private def digest(v: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(v.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private def trim(buf: mutable.ArrayBuffer[(String, Long)]): mutable.ArrayBuffer[(String, Long)] = {
    if (buf.length > k) {
      val kept = buf.distinct.sorted.take(k)
      buf.clear()
      buf ++= kept
    }
    buf
  }

  override def createAggregationBuffer(): mutable.ArrayBuffer[(String, Long)] =
    mutable.ArrayBuffer.empty

  override def update(buf: mutable.ArrayBuffer[(String, Long)],
                      input: InternalRow): mutable.ArrayBuffer[(String, Long)] = {
    val v = child.eval(input)
    if (v != null) trim(buf += ((digest(v.asInstanceOf[Long]), v.asInstanceOf[Long])))
    else buf
  }

  override def merge(a: mutable.ArrayBuffer[(String, Long)],
                     b: mutable.ArrayBuffer[(String, Long)]): mutable.ArrayBuffer[(String, Long)] =
    trim(a ++= b)

  override def eval(buf: mutable.ArrayBuffer[(String, Long)]): Any =
    new GenericArrayData(buf.distinct.sorted.take(k).map(_._2).toArray)

  override def serialize(buf: mutable.ArrayBuffer[(String, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val kept = buf.distinct.sorted.take(k)
    out.writeInt(kept.length)
    kept.foreach { case (_, v) => out.writeLong(v) } // digest is recomputable
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(String, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[(String, Long)]
    (1 to n).foreach { _ =>
      val v = in.readLong()
      buf += ((digest(v), v))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKByHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKByHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
