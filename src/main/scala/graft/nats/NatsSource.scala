package graft.nats

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** NATS micro-batch source skeleton (`DataSourceV2`) — the live-deployment
  * ingress for the CDC bus (reference `lib/nats.js:49-65`: one physical
  * subscription per client on the shared bus subject; envelopes decoded
  * once then fanned out).
  *
  * Structure is the real Spark connector shape: TableProvider → Table
  * (MICRO_BATCH_READ) → ScanBuilder → Scan → MicroBatchStream with
  * sequence-number offsets, sharded input partitions, and a
  * PartitionReader emitting the CdcMsg envelope schema. The actual broker
  * I/O (`connect`, `fetch`) is STUBBED with UnsupportedOperationException:
  * the build environment has zero egress and no NATS client jar; in a
  * deployment those two methods wrap a JetStream pull-consumer fetch,
  * which provides replayable sequence offsets for exactly-once micro
  * batches (core NATS, like the reference uses, is at-most-once and
  * cannot replay — the stub models JetStream semantics for that reason).
  *
  * Usage (deployment): spark.readStream.format("graft.nats").option("url", …)
  * .option("subject", "cdc.client").load() — then every graft operator
  * (mqtt routing, take(n), counters, windows) applies unchanged.
  */
class NatsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NatsSource.CdcMsgSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new NatsTable(schema)
}

object NatsSource {
  /** The CDCMsg envelope (reference fields, SURVEY §1.2) + stream metadata
    * (sequence, arrival ts) needed for offsets and event-time ops. */
  val CdcMsgSchema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("publisher", StringType),
    StructField("channel", StringType),
    StructField("contentType", StringType),
    StructField("protocol", StringType),
    StructField("reply", StringType),
    StructField("qos", IntegerType),
    StructField("retain", BooleanType),
    StructField("payload", BinaryType)))
}

private[nats] class NatsTable(schema: StructType) extends Table with SupportsRead {
  override def name(): String = "graft_nats_bus"
  override def schema(): StructType = schema0
  private def schema0 = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NatsScanBuilder(schema, options.getInt("shards", 4))
}

private[nats] class NatsScanBuilder(schema: StructType, shards: Int) extends ScanBuilder {
  override def build(): Scan = new NatsScan(schema, shards)
}

private[nats] class NatsScan(schema: StructType, shards: Int) extends Scan {
  override def readSchema(): StructType = schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new NatsMicroBatchStream(shards)
}

/** Offset = highest JetStream sequence number seen, JSON `{"seq": n}`. */
private[nats] case class NatsOffset(seq: Long) extends Offset {
  override def json(): String = s"""{"seq": $seq}"""
}

private[nats] class NatsMicroBatchStream(shards: Int) extends MicroBatchStream {

  /** STUB — deployment: open the JetStream pull consumer on the bus
    * subject and return its last sequence. Zero-egress here. */
  private def brokerLatestSeq(): Long =
    throw new UnsupportedOperationException(
      "NATS connectivity is stubbed: zero-egress build environment (design per SURVEY §4.2)")

  override def initialOffset(): Offset = NatsOffset(0L)
  override def latestOffset(): Offset = NatsOffset(brokerLatestSeq())
  override def deserializeOffset(json: String): Offset =
    NatsOffset("""\d+""".r.findFirstIn(json).map(_.toLong).getOrElse(0L))

  /** Shard the sequence range round-robin: shard i reads seqs with
    * seq % shards == i — each executor holds one pull-consumer slice. */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[NatsOffset].seq, end.asInstanceOf[NatsOffset].seq)
    (0 until shards).map(i => NatsRangePartition(s, e, i, shards): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new NatsReaderFactory
  override def commit(end: Offset): Unit = () // JetStream ack happens per fetch
  override def stop(): Unit = ()
}

private[nats] case class NatsRangePartition(startSeq: Long, endSeq: Long,
                                            shard: Int, shards: Int) extends InputPartition

private[nats] class NatsReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new NatsPartitionReader(partition.asInstanceOf[NatsRangePartition])
}

private[nats] class NatsPartitionReader(p: NatsRangePartition)
    extends PartitionReader[InternalRow] {

  /** STUB — deployment: `fetch` pulls the next protobuf-encoded CDCMsg in
    * (startSeq, endSeq] for this shard and decodes it once
    * (reference lib/nats.js:88-90) into an InternalRow via UTF8String /
    * micros-timestamp conversion. */
  private def fetchNext(): Option[InternalRow] =
    throw new UnsupportedOperationException(
      "NATS connectivity is stubbed: zero-egress build environment")

  private var current: Option[InternalRow] = None
  override def next(): Boolean = { current = fetchNext(); current.isDefined }
  override def get(): InternalRow = current.get
  override def close(): Unit = ()
}
