package graft.nats

import java.io.EOFException
import java.net.{InetAddress, InetSocketAddress, ServerSocket, Socket, SocketTimeoutException}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** NATS subject wildcard matching per the public protocol: a subject is a
  * '.'-separated token list; in a subscription pattern `*` matches exactly
  * one token and `>` — valid only as the final token — matches one or
  * more trailing tokens. (This is the broker-side routing rule; the CDC
  * channel hierarchy inside payloads uses MQTT '/' patterns — see
  * [[graft.cdc.MqttPattern]] — exactly like the reference, which runs
  * MQTT routing *over* a constant NATS subject, lib/nats.js:92-95.) */
object NatsSubject {
  def matches(pattern: String, subject: String): Boolean = {
    val p = pattern.split("\\.", -1)
    val s = subject.split("\\.", -1)
    var i = 0
    while (i < p.length) {
      if (p(i) == ">" && i == p.length - 1) return s.length > i
      if (i >= s.length) return false
      if (p(i) != "*" && p(i) != s(i)) return false
      i += 1
    }
    s.length == p.length
  }
}

/** A [[NatsChannel]] over a live TCP socket — the dial seam made real.
  * `read()` is non-blocking (the shared-session drain loop polls): it
  * returns whatever the kernel has buffered, empty when nothing is
  * pending, and raises EOF when the peer closed — which
  * [[TextProtocolBroker]] turns into a connection reset + redial, the
  * same recovery path as a server `-ERR`. */
final class TcpChannel(socket: Socket) extends NatsChannel {
  socket.setTcpNoDelay(true)
  // 1 ms probe window: distinguishes "no bytes yet" from "peer closed"
  // without turning the poll into a blocking read
  socket.setSoTimeout(1)
  private val in = socket.getInputStream
  private val out = socket.getOutputStream

  override def read(): Array[Byte] = {
    val avail = in.available()
    if (avail > 0) {
      val buf = new Array[Byte](math.min(avail, 1 << 16))
      val k = in.read(buf)
      if (k < 0) throw new EOFException("NATS server closed the connection")
      java.util.Arrays.copyOf(buf, k)
    } else {
      try {
        val one = in.read() // blocks ≤ soTimeout
        if (one < 0) throw new EOFException("NATS server closed the connection")
        Array(one.toByte)
      } catch { case _: SocketTimeoutException => Array.emptyByteArray }
    }
  }

  override def write(bytes: Array[Byte]): Unit = { out.write(bytes); out.flush() }
  override def close(): Unit = socket.close()
}

/** The live TCP-dialing broker: [[TextProtocolBroker]] with the socket
  * seam filled in. The dial target comes from the `graft.nats.server`
  * system property, defaulting to `127.0.0.1:4222` — the canonical NATS
  * default address the reference connects to (`nats://localhost:4222`).
  * The target is folded into the session key, so brokers aimed at
  * different servers never share a connection/sequence/replay buffer.
  *
  * Usage: `spark.readStream.format("graft.nats.NatsSource")` — this is
  * the DEFAULT broker — with a NATS-protocol server (e.g. the embedded
  * [[NatsServer]], or a real deployment's nats-server) listening at the
  * target. */
class TcpBroker extends TextProtocolBroker {
  protected def target: String = TcpBroker.target
  override protected def sessionKey: String = target
  override protected def dial(): NatsChannel = {
    val (host, port) = TcpBroker.parseTarget(target)
    new TcpChannel(new Socket(host, port))
  }
}

object TcpBroker {
  /** System property naming the `host:port` to dial. */
  val TargetProperty = "graft.nats.server"
  def target: String = sys.props.getOrElse(TargetProperty, "127.0.0.1:4222")
  def parseTarget(t: String): (String, Int) = t.lastIndexOf(':') match {
    case -1 => (t, 4222)
    case i  => (t.take(i), t.drop(i + 1).toInt)
  }
}

/** A minimal embedded NATS server speaking the public text protocol over
  * real loopback TCP sockets — the broker process the reference assumes
  * is already running (`nats-server` behind lib/nats.js:49-65), provided
  * in-process so the full client dialogue (INFO → CONNECT → SUB → PUB →
  * MSG fan-out, PING/PONG, ±OK, -ERR, UNSUB auto-unsubscribe, queue
  * groups) runs end-to-end with no external binary. Semantics per the
  * public protocol docs:
  *
  *   - every PUB is routed to all matching plain subscriptions
  *     ([[NatsSubject]] wildcards); each QUEUE group among the matches
  *     receives exactly one copy (round-robin over members);
  *   - `UNSUB <sid> [max]` removes the subscription immediately, or
  *     after `max` total messages have been delivered on it (the
  *     auto-unsubscribe behind the reference's take(n), lib/nats.js:98);
  *   - `CONNECT {"verbose":true}` switches the connection to +OK acks;
  *   - an unparseable line draws `-ERR 'Unknown Protocol Operation'`
  *     and closes the connection (clients redial — the
  *     [[TextProtocolBroker]] recovery path);
  *   - core-NATS delivery: at-most-once, no replay — a message published
  *     with no matching subscriber is dropped, exactly like the
  *     reference's transport.
  *
  * One thread accepts; one thread serves each connection (blocking reads
  * feeding an incremental [[NatsWire.ClientParser]]). Writes to a
  * connection are serialized by a per-connection lock (routing happens on
  * publisher threads). */
final class NatsServer(requestedPort: Int = 0) extends AutoCloseable {

  private val serverSocket = new ServerSocket()
  serverSocket.setReuseAddress(true)
  serverSocket.bind(new InetSocketAddress(InetAddress.getLoopbackAddress, requestedPort), 64)

  def port: Int = serverSocket.getLocalPort
  def target: String = s"127.0.0.1:$port"

  /** remaining < 0 means unlimited; an UNSUB max arms it with the count
    * still to deliver (max minus already-delivered). */
  private final class Subscription(val pattern: String, val queue: Option[String]) {
    val delivered = new AtomicInteger(0)
    @volatile var limit: Int = -1 // total-delivery cap; <0 = none
  }

  private val connSeq = new AtomicLong(0L)
  private final class Conn(val socket: Socket) {
    val id: Long = connSeq.incrementAndGet()
    socket.setTcpNoDelay(true)
    private val out = socket.getOutputStream
    val subs = new ConcurrentHashMap[Long, Subscription]
    @volatile var verbose = false
    private val writeLock = new Object
    def send(bytes: Array[Byte]): Unit =
      writeLock.synchronized { out.write(bytes); out.flush() }
  }

  private val conns = ConcurrentHashMap.newKeySet[Conn]()
  private val queueRoundRobin = new ConcurrentHashMap[String, AtomicLong]
  @volatile private var closed = false

  private def spawn(name: String)(body: => Unit): Thread = {
    val t = new Thread(() => body, name)
    t.setDaemon(true)
    t.start()
    t
  }

  spawn(s"nats-server-accept-$port") {
    try while (!closed) {
      val s = serverSocket.accept()
      val c = new Conn(s)
      conns.add(c)
      spawn(s"nats-server-conn-${c.id}")(serve(c))
    } catch { case _: java.io.IOException => () /* closed */ }
  }

  private def serve(conn: Conn): Unit = {
    try {
      conn.send(NatsWire.info(
        s"""{"server_id":"graft-embedded","host":"127.0.0.1","port":$port,"proto":1,"max_payload":1048576}"""))
      val parser = new NatsWire.ClientParser
      val in = conn.socket.getInputStream
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0 && !closed) {
        if (n > 0)
          parser.feed(java.util.Arrays.copyOf(buf, n)).foreach(handle(conn, _))
        n = in.read(buf)
      }
    } catch {
      case _: java.io.IOException => () // peer gone — drop the connection
      case _: IllegalArgumentException | _: NumberFormatException =>
        // real servers answer garbage with -ERR and hang up; the client's
        // redial path takes over
        try conn.send(NatsWire.err("Unknown Protocol Operation"))
        catch { case _: java.io.IOException => () }
    } finally {
      conns.remove(conn)
      try conn.socket.close() catch { case _: java.io.IOException => () }
    }
  }

  private def handle(conn: Conn, op: NatsWire.ClientOp): Unit = op match {
    case NatsWire.Connect(json) =>
      conn.verbose = json.replaceAll("\\s", "").contains("\"verbose\":true")
      ack(conn)
    case NatsWire.SubOp(subject, queue, sid) =>
      conn.subs.put(sid, new Subscription(subject, queue))
      ack(conn)
    case NatsWire.UnsubOp(sid, max) =>
      max match {
        case None => conn.subs.remove(sid)
        case Some(m) =>
          Option(conn.subs.get(sid)).foreach { sub =>
            if (sub.delivered.get() >= m) conn.subs.remove(sid)
            else sub.limit = m
          }
      }
      ack(conn)
    case NatsWire.Pub(subject, replyTo, payload) =>
      route(subject, payload, replyTo)
      ack(conn)
    case NatsWire.Ping => conn.send(NatsWire.pong)
    case NatsWire.Pong => ()
  }

  private def ack(conn: Conn): Unit = if (conn.verbose) conn.send(NatsWire.ok)

  private def route(subject: String, payload: Array[Byte],
                    replyTo: Option[String]): Unit = {
    import scala.jdk.CollectionConverters._
    val matching = (for {
      conn <- conns.iterator().asScala
      (sid, sub) <- conn.subs.asScala
      if NatsSubject.matches(sub.pattern, subject)
    } yield (conn, sid, sub)).toVector.sortBy { case (c, sid, _) => (c.id, sid) }
    val (queued, plain) = matching.partition(_._3.queue.isDefined)
    val recipients = plain ++ queued.groupBy(_._3.queue.get).toVector.sortBy(_._1)
      .map { case (q, members) =>
        val rr = queueRoundRobin.computeIfAbsent(q, _ => new AtomicLong(0L))
        members((rr.getAndIncrement() % members.size).toInt)
      }
    recipients.foreach { case (conn, sid, sub) =>
      val nth = sub.delivered.incrementAndGet()
      val cap = sub.limit
      if (cap < 0 || nth <= cap) {
        try conn.send(NatsWire.msg(subject, sid, payload, replyTo))
        catch { case _: java.io.IOException => conns.remove(conn) }
      }
      if (cap >= 0 && nth >= cap) conn.subs.remove(sid)
    }
  }

  override def close(): Unit = {
    closed = true
    try serverSocket.close() catch { case _: java.io.IOException => () }
    import scala.jdk.CollectionConverters._
    conns.iterator().asScala.foreach(c =>
      try c.socket.close() catch { case _: java.io.IOException => () })
    conns.clear()
  }
}
