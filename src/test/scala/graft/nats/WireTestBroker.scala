package graft.nats

/** Test seam for the full wire-bytes → protocol → DataSourceV2 path:
  * the connector instantiates broker objects reflectively per use site
  * (driver offsets + one per partition reader), and ALL of them delegate
  * to ONE shared [[TextProtocolBroker]] session — exactly the
  * reference's model of one physical subscription per client
  * (lib/nats.js:62-64) fanned out to many logical consumers. */
class WireTestBroker extends NatsBroker {
  override def latestSeq(): Long = WireTestBroker.underlying.latestSeq()
  override def fetch(start: Long, end: Long, shard: Int,
                     shards: Int): Iterator[NatsFrame] =
    WireTestBroker.underlying.fetch(start, end, shard, shards)
}

object WireTestBroker {
  @volatile var underlying: TextProtocolBroker = _
}
