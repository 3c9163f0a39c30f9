package graft.nats

import scala.collection.concurrent.TrieMap

/** Test seam: an in-memory [[NatsBroker]] backed by a static frame store
  * (local-mode executors share the JVM, so the reflective per-reader
  * instantiation sees the same store — exactly how a per-executor
  * JetStream consumer would see the same stream). Records every fetch so
  * specs can assert the sharding contract. */
class InMemoryBroker extends NatsBroker {
  override def latestSeq(): Long =
    if (InMemoryBroker.frames.isEmpty) 0L else InMemoryBroker.frames.keySet.max

  override def fetch(start: Long, end: Long, shard: Int, shards: Int): Iterator[NatsFrame] = {
    InMemoryBroker.fetches.put((start, end, shard, shards), ())
    InMemoryBroker.frames.toSeq.sortBy(_._1).iterator
      .collect { case (seq, f) if seq > start && seq <= end && seq % shards == shard => f }
  }
}

object InMemoryBroker {
  private[nats] val frames = TrieMap.empty[Long, NatsFrame]
  private[nats] val fetches = TrieMap.empty[(Long, Long, Int, Int), Unit]

  def reset(): Unit = { frames.clear(); fetches.clear() }

  def publish(seq: Long, tsMicros: Long, msg: CdcProto.CdcMsg): Unit =
    frames.put(seq, NatsFrame(seq, tsMicros, CdcProto.encode(msg)))

  def recordedFetches: Seq[(Long, Long, Int, Int)] = fetches.keys.toSeq
}
