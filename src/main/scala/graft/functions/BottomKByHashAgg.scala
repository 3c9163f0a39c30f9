package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Deterministic per-group sampling as a `TypedImperativeAggregate`:
  * keep the k DISTINCT values whose md5(value) hex digests are smallest —
  * a KMV ("bottom-k by hash") sketch over the value SET (duplicate input
  * rows collapse; the SQL twin is `row_number() OVER (ORDER BY
  * md5(CAST(v AS VARCHAR)), v) <= k` over `SELECT DISTINCT v`).
  * Properties that matter at 100 TB:
  *
  *   - order- and partitioning-independent (the sample is a pure function
  *     of the value set, unlike reservoir sampling or `collect_list` +
  *     limit), so retries/speculation/shuffle layout never change it;
  *   - bounded O(k) buffer per group, bounded merges, and an O(1)
  *     common-path update: once the buffer holds k digests, rows hashing
  *     above the current kth digest are rejected with one comparison;
  *   - cross-engine reproducible (md5 + lowercase hex on both engines).
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

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && k > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bottomk_by_hash requires (BIGINT, k > 0), got (${child.dataType.sql}, k=$k)")

  override def createAggregationBuffer(): mutable.ArrayBuffer[(String, Long)] =
    mutable.ArrayBuffer.empty

  /** Insert keeping the buffer sorted ascending by (digest, value) and
    * bounded at k: one comparison rejects the common above-kth case. */
  private def insert(buf: mutable.ArrayBuffer[(String, Long)],
                     e: (String, Long)): mutable.ArrayBuffer[(String, Long)] = {
    if (buf.length == k && BottomKByHashAgg.ord.compare(e, buf.last) >= 0) return buf
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val c = BottomKByHashAgg.ord.compare(buf(mid), e)
      if (c < 0) lo = mid + 1 else hi = mid
    }
    if (lo < buf.length && buf(lo) == e) return buf // distinct-set semantics
    buf.insert(lo, e)
    if (buf.length > k) buf.remove(buf.length - 1)
    buf
  }

  override def update(buf: mutable.ArrayBuffer[(String, Long)],
                      input: InternalRow): mutable.ArrayBuffer[(String, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val l = v.asInstanceOf[Long]
      insert(buf, (BottomKByHashAgg.digest(l), l))
    } else buf
  }

  override def merge(a: mutable.ArrayBuffer[(String, Long)],
                     b: mutable.ArrayBuffer[(String, Long)]): mutable.ArrayBuffer[(String, Long)] = {
    b.foreach(insert(a, _))
    a
  }

  override def eval(buf: mutable.ArrayBuffer[(String, Long)]): Any =
    new GenericArrayData(buf.map(_._2).toArray) // already sorted by digest

  override def serialize(buf: mutable.ArrayBuffer[(String, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (_, v) => out.writeLong(v) } // digest is recomputable
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(String, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[(String, Long)]
    (1 to n).foreach { _ =>
      val v = in.readLong()
      insert(buf, (BottomKByHashAgg.digest(v), v))
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

object BottomKByHashAgg {
  private val ord = Ordering.Tuple2[String, Long]

  private val md5Local = ThreadLocal.withInitial(
    () => java.security.MessageDigest.getInstance("MD5"))
  private val hex = "0123456789abcdef".toCharArray

  /** Lowercase-hex md5 of the value's decimal string — one MessageDigest
    * per thread, table-driven hex (no per-byte formatter). */
  private[functions] def digest(v: Long): String = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(java.lang.Long.toString(v).getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hex(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
