package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator: keeps the k highest-scoring (id, score) pairs
  * with a bounded buffer — the `Aggregator[IN, BUF, OUT]` face of the UDAF
  * surface (SURVEY §2b). Mergeable (bounded per partition, bounded merge),
  * so a global top-k runs as partial top-k per partition + one reduce,
  * never a global sort — the fused alternative to window-rank top-k when
  * only the winners are needed.
  *
  * Ties break toward the smaller id (same rule as the window-rank
  * queries), making the result deterministic.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), mutable.ArrayBuffer[(Long, Double)], Seq[(Long, Double)]] {
  require(k > 0, s"TopKAggregator requires k > 0, got $k")

  private def better(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  /** Sorted-insert (best first) bounded at k: once full, one comparison
    * against the current kth rejects the common case — O(1) hot path,
    * O(k) worst case, never a full re-sort per row. */
  private def insert(buf: mutable.ArrayBuffer[(Long, Double)],
                     e: (Long, Double)): mutable.ArrayBuffer[(Long, Double)] = {
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

  override def zero: mutable.ArrayBuffer[(Long, Double)] = mutable.ArrayBuffer.empty

  override def reduce(buf: mutable.ArrayBuffer[(Long, Double)],
                      in: (Long, Double)): mutable.ArrayBuffer[(Long, Double)] =
    insert(buf, in)

  override def merge(a: mutable.ArrayBuffer[(Long, Double)],
                     b: mutable.ArrayBuffer[(Long, Double)]): mutable.ArrayBuffer[(Long, Double)] = {
    b.foreach(insert(a, _))
    a
  }

  override def finish(buf: mutable.ArrayBuffer[(Long, Double)]): Seq[(Long, Double)] =
    buf.toSeq // maintained in rank order

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[(Long, Double)]] =
    Encoders.kryo[mutable.ArrayBuffer[(Long, Double)]]

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    Encoders.kryo[Seq[(Long, Double)]]
}
