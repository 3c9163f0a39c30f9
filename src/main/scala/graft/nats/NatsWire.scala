package graft.nats

import java.nio.charset.StandardCharsets.US_ASCII

/** The NATS client text protocol — the wire dialogue the reference's
  * `nats` dependency speaks against the broker (reference
  * `lib/nats.js:62-64` subscribes the bus subject; the nats@1.3.2 client
  * under it frames CONNECT/SUB/PUB/MSG/PING/PONG exactly as below, per
  * the public NATS protocol documentation).
  *
  * Framing rules implemented from the public protocol spec:
  *   - control lines are ASCII, terminated by CRLF;
  *   - server → client: `INFO {json}`, `MSG <subject> <sid> [reply-to]
  *     <#bytes>` followed by exactly #bytes of payload and a CRLF,
  *     `PING`, `PONG`, `+OK`, `-ERR 'message'`;
  *   - client → server: `CONNECT {json}`, `PUB <subject> [reply-to]
  *     <#bytes>` + payload + CRLF, `SUB <subject> [queue] <sid>`,
  *     `UNSUB <sid> [max]`, `PING`, `PONG`;
  *   - payloads are raw bytes (MAY contain CRLF — the length prefix, not
  *     a delimiter, bounds them);
  *   - protocol verbs are case-insensitive.
  *
  * [[NatsWire.Parser]] is incremental: bytes arrive in arbitrary chunks
  * (TCP segmentation) and ops are emitted once complete — the
  * NatsWireSpec property test re-splits whole dialogues at every byte
  * boundary.
  */
object NatsWire {

  private val CRLF = "\r\n".getBytes(US_ASCII)

  /** A server→client protocol operation. */
  sealed trait ServerOp
  /** A client→server protocol operation (what an embedded server parses). */
  sealed trait ClientOp
  final case class Info(json: String) extends ServerOp
  final case class Msg(subject: String, sid: Long, replyTo: Option[String],
                       payload: Array[Byte]) extends ServerOp {
    override def equals(o: Any): Boolean = o match {
      case m: Msg => subject == m.subject && sid == m.sid && replyTo == m.replyTo &&
        java.util.Arrays.equals(payload, m.payload)
      case _ => false
    }
    override def hashCode(): Int =
      (subject, sid, replyTo, java.util.Arrays.hashCode(payload)).hashCode()
  }
  // PING/PONG flow in both directions (keepalive is symmetric in the
  // protocol), so the ops belong to both alphabets
  case object Ping extends ServerOp with ClientOp
  case object Pong extends ServerOp with ClientOp
  case object Ok extends ServerOp
  final case class Err(message: String) extends ServerOp

  final case class Connect(json: String) extends ClientOp
  final case class Pub(subject: String, replyTo: Option[String],
                       payload: Array[Byte]) extends ClientOp {
    override def equals(o: Any): Boolean = o match {
      case p: Pub => subject == p.subject && replyTo == p.replyTo &&
        java.util.Arrays.equals(payload, p.payload)
      case _ => false
    }
    override def hashCode(): Int =
      (subject, replyTo, java.util.Arrays.hashCode(payload)).hashCode()
  }
  final case class SubOp(subject: String, queue: Option[String], sid: Long) extends ClientOp
  final case class UnsubOp(sid: Long, max: Option[Int]) extends ClientOp

  // ---- client → server serialization ---------------------------------

  private def line(s: String): Array[Byte] = (s + "\r\n").getBytes(US_ASCII)

  def connect(json: String): Array[Byte] = line(s"CONNECT $json")

  def pub(subject: String, payload: Array[Byte],
          replyTo: Option[String] = None): Array[Byte] = {
    val head = replyTo match {
      case Some(r) => s"PUB $subject $r ${payload.length}"
      case None    => s"PUB $subject ${payload.length}"
    }
    line(head) ++ payload ++ CRLF
  }

  def sub(subject: String, sid: Long, queue: Option[String] = None): Array[Byte] =
    line(queue match {
      case Some(q) => s"SUB $subject $q $sid"
      case None    => s"SUB $subject $sid"
    })

  def unsub(sid: Long, max: Option[Int] = None): Array[Byte] =
    line(max match {
      case Some(m) => s"UNSUB $sid $m"
      case None    => s"UNSUB $sid"
    })

  def ping: Array[Byte] = line("PING")
  def pong: Array[Byte] = line("PONG")

  // ---- server-side serialization (for in-memory/spec servers) --------

  def info(json: String): Array[Byte] = line(s"INFO $json")

  def msg(subject: String, sid: Long, payload: Array[Byte],
          replyTo: Option[String] = None): Array[Byte] = {
    val head = replyTo match {
      case Some(r) => s"MSG $subject $sid $r ${payload.length}"
      case None    => s"MSG $subject $sid ${payload.length}"
    }
    line(head) ++ payload ++ CRLF
  }

  def ok: Array[Byte] = line("+OK")
  def err(message: String): Array[Byte] = line(s"-ERR '$message'")

  // ---- incremental server→client parser ------------------------------

  /** Incremental CRLF-line + length-prefixed-payload framer shared by the
    * two protocol directions. Feed arbitrary byte chunks; complete
    * operations are returned as they materialize. State between feeds:
    * the unconsumed buffer + a pending payload-carrying header
    * (MSG / PUB) waiting for its bytes. Not thread-safe (one parser per
    * connection, like one reader per socket). */
  sealed abstract class WireParser[Op] {
    // consumed-prefix offset + lazy compaction: consumption advances an
    // index instead of reallocating the buffer per op, so a payload
    // arriving in k chunks costs O(n), not O(n·k)
    private var buf = Array.emptyByteArray
    private var off = 0
    // a parsed payload-op header whose payload hasn't fully arrived yet:
    // (byte count, payload → completed op)
    private var pending: Option[(Int, Array[Byte] => Op)] = None

    /** Parse one CRLF-terminated control line: emit completed ops via
      * `out`, or call [[awaitPayload]] for a length-prefixed body. */
    protected def parseLine(l: String,
                            out: scala.collection.mutable.ArrayBuffer[Op]): Unit

    /** The op's payload (`n` bytes + CRLF) follows the control line. */
    protected final def awaitPayload(n: Int)(complete: Array[Byte] => Op): Unit =
      pending = Some((n, complete))

    private def available: Int = buf.length - off

    private def compactAndAppend(chunk: Array[Byte]): Unit = {
      if (off > 0 || buf.isEmpty) {
        val live = java.util.Arrays.copyOfRange(buf, off, buf.length)
        buf = if (chunk.isEmpty) live else live ++ chunk
        off = 0
      } else if (chunk.nonEmpty) buf = buf ++ chunk
    }

    private def indexOfCrlf(): Int = {
      var i = off
      while (i + 1 < buf.length) {
        if (buf(i) == '\r' && buf(i + 1) == '\n') return i
        i += 1
      }
      -1
    }

    final def feed(chunk: Array[Byte]): Seq[Op] = {
      compactAndAppend(chunk)
      val out = scala.collection.mutable.ArrayBuffer.empty[Op]
      var progress = true
      while (progress) {
        progress = false
        pending match {
          case Some((n, complete)) =>
            if (available >= n + 2) { // payload + CRLF
              if (buf(off + n) != '\r' || buf(off + n + 1) != '\n')
                throw new IllegalArgumentException(
                  s"payload of $n bytes not terminated by CRLF")
              out += complete(java.util.Arrays.copyOfRange(buf, off, off + n))
              off += n + 2
              pending = None
              progress = true
            }
          case None =>
            val eol = indexOfCrlf()
            if (eol >= 0) {
              val lineStr = new String(buf, off, eol - off, US_ASCII)
              off = eol + 2
              parseLine(lineStr, out)
              progress = true
            }
        }
      }
      out.toSeq
    }

    /** Split `l` into (VERB, rest) — verbs are case-insensitive. */
    protected final def verbOf(l: String): (String, String) = {
      val verb = l.takeWhile(c => c != ' ' && c != '\t').toUpperCase
      (verb, l.drop(verb.length).trim)
    }
  }

  /** Parser for the server→client stream (what a client reads). */
  final class Parser extends WireParser[ServerOp] {
    protected def parseLine(l: String,
                            out: scala.collection.mutable.ArrayBuffer[ServerOp]): Unit = {
      val (verb, rest) = verbOf(l)
      verb match {
        case "INFO" => out += Info(rest)
        case "PING" => out += Ping
        case "PONG" => out += Pong
        case "+OK"  => out += Ok
        case "-ERR" =>
          out += Err(rest.stripPrefix("'").stripSuffix("'"))
        case "MSG" =>
          val parts = rest.split("\\s+")
          parts.length match {
            case 3 => awaitPayload(parts(2).toInt)(Msg(parts(0), parts(1).toLong, None, _))
            case 4 => awaitPayload(parts(3).toInt)(Msg(parts(0), parts(1).toLong, Some(parts(2)), _))
            case _ => throw new IllegalArgumentException(s"malformed MSG header: $l")
          }
        case other =>
          throw new IllegalArgumentException(s"unknown protocol verb: $other")
      }
    }
  }

  /** Parser for the client→server stream (what a server reads) —
    * CONNECT / PUB / SUB / UNSUB / PING / PONG per the public protocol
    * grammar; the exact inverse of the client serializers above, and
    * byte-split-proven the same way as [[Parser]]. */
  final class ClientParser extends WireParser[ClientOp] {
    protected def parseLine(l: String,
                            out: scala.collection.mutable.ArrayBuffer[ClientOp]): Unit = {
      val (verb, rest) = verbOf(l)
      verb match {
        case "CONNECT" => out += Connect(rest)
        case "PING"    => out += Ping
        case "PONG"    => out += Pong
        case "PUB" =>
          val parts = rest.split("\\s+")
          parts.length match {
            case 2 => awaitPayload(parts(1).toInt)(Pub(parts(0), None, _))
            case 3 => awaitPayload(parts(2).toInt)(Pub(parts(0), Some(parts(1)), _))
            case _ => throw new IllegalArgumentException(s"malformed PUB header: $l")
          }
        case "SUB" =>
          val parts = rest.split("\\s+")
          parts.length match {
            case 2 => out += SubOp(parts(0), None, parts(1).toLong)
            case 3 => out += SubOp(parts(0), Some(parts(1)), parts(2).toLong)
            case _ => throw new IllegalArgumentException(s"malformed SUB line: $l")
          }
        case "UNSUB" =>
          val parts = rest.split("\\s+")
          parts.length match {
            case 1 => out += UnsubOp(parts(0).toLong, None)
            case 2 => out += UnsubOp(parts(0).toLong, Some(parts(1).toInt))
            case _ => throw new IllegalArgumentException(s"malformed UNSUB line: $l")
          }
        case other =>
          throw new IllegalArgumentException(s"unknown protocol verb: $other")
      }
    }
  }
}

/** A byte-stream connection to a NATS server — the ONLY remaining
  * environment seam (a deployment backs it with a TCP socket; specs back
  * it with in-memory byte queues). */
trait NatsChannel {
  /** Next available chunk, empty when the server has nothing buffered. */
  def read(): Array[Byte]
  def write(bytes: Array[Byte]): Unit
  def close(): Unit
}

object TextProtocolBroker {
  /** One live protocol session per (broker class, subject) per JVM. The
    * micro-batch source reflectively instantiates its broker at every
    * use site — the driver for offsets and each partition reader for
    * fetches — and plain NATS cannot replay, so a fresh connection per
    * instance could never serve the (start, end] ranges the driver's
    * offsets refer to. All instances of the same broker class therefore
    * BIND THE SAME session: one connection, one replay buffer, one
    * sequence counter. (Executors in separate JVMs still can't see the
    * driver's buffer — a multi-JVM cluster needs a JetStream-backed
    * [[NatsBroker]] whose server-side replay makes fetch independent of
    * local state; core NATS is at-most-once, exactly like the
    * reference.) */
  private[nats] final class Session {
    var channel: NatsChannel = _
    var parser = new NatsWire.Parser
    val frames = scala.collection.mutable.ArrayBuffer.empty[NatsFrame]
    var seq = 0L
    /** PONGs received — lets [[TextProtocolBroker.flush]] match its PING. */
    var pongs = 0L
    /** Drop the connection (dead socket / server -ERR) so the next use
      * redials with a FRESH parser; buffered frames and the sequence
      * counter survive — they index delivered history, not the
      * connection. */
    def resetConnection(): Unit = {
      if (channel != null) {
        try channel.close() catch { case _: Throwable => () }
      }
      channel = null
      parser = new NatsWire.Parser
    }
  }
  private val sessions =
    new java.util.concurrent.ConcurrentHashMap[String, Session]
  private[nats] def sessionFor(key: String): Session =
    sessions.computeIfAbsent(key, _ => new Session)

  private[nats] def keyOf(brokerClass: Class[_], subject: String,
                          sessionKey: String): String =
    brokerClass.getName + "#" + subject + "#" + sessionKey

  /** Evict one session: close its connection and forget its replay
    * buffer / sequence counter. For harnesses that stand up a
    * THROWAWAY server per run (ephemeral port in the session key) —
    * without eviction every run leaks one Session for the JVM
    * lifetime, and OS-level port reuse would hand a NEW server a STALE
    * counter, failing the run's delivery check spuriously. Not for the
    * steady-state path: a long-lived broker's session must survive
    * redials (the buffer indexes delivered history, see [[Session]]). */
  def dropSession(brokerClass: Class[_], subject: String,
                  sessionKey: String): Unit = {
    val s = sessions.remove(keyOf(brokerClass, subject, sessionKey))
    if (s != null) s.resetConnection()
  }
}

/** A [[NatsBroker]] that SPEAKS the NATS text protocol over a
  * [[NatsChannel]]: performs the reference client's connection dialogue
  * (read INFO → CONNECT → SUB the bus subject, reference
  * `lib/nats.js:62-64`), answers PING with PONG, and buffers delivered
  * MSG frames with arrival sequence numbers so the micro-batch source
  * can serve replayable (start, end] ranges. Session state is shared
  * per (class, subject) within the JVM — see
  * [[TextProtocolBroker$.sessionFor]] for why. Only [[dial]] — the
  * socket itself — is left to the environment. */
abstract class TextProtocolBroker extends NatsBroker {

  /** Open the byte stream to the server. The zero-egress build cannot;
    * a deployment returns a TCP-socket-backed channel. */
  protected def dial(): NatsChannel

  /** Bus subject to subscribe (reference default "cdc.client"). */
  protected def subject: String = "cdc.client"

  /** Discriminator folded into the shared-session key. Two instances of
    * one broker class dialing DIFFERENT servers (or with different
    * options) must NOT share a connection, sequence counter, and replay
    * buffer — a subclass whose `dial()` is parameterized returns its
    * dial target (e.g. "host:port") here. The default is constant, which
    * keeps the DataSourceV2 local-mode behavior: one session per
    * (class, subject) in the JVM. */
  protected def sessionKey: String = ""

  private lazy val session =
    TextProtocolBroker.sessionFor(
      TextProtocolBroker.keyOf(getClass, subject, sessionKey))

  private def ensureConnected(): Unit =
    if (session.channel == null) {
      session.channel = dial()
      try {
        // INFO may not have arrived yet; CONNECT/SUB regardless (the real
        // client pipelines exactly this way)
        session.channel.write(NatsWire.connect(
          """{"verbose":false,"pedantic":false,"protocol":1,"name":"graft"}"""))
        session.channel.write(NatsWire.sub(subject, 1L))
      } catch {
        case e: java.io.IOException =>
          session.resetConnection()
          throw new IllegalStateException(s"NATS connection lost: ${e.getMessage}", e)
      }
      drain()
    }

  /** Pull everything the server has buffered, answering pings and
    * sequencing MSG frames. A server `-ERR` — or a dead byte stream
    * (EOF / socket error) — resets the connection before propagating, so
    * the NEXT call redials instead of reusing a poisoned channel forever
    * (the shared session must never become a JVM-lifetime dead end). */
  private def drain(): Unit =
    try {
      var chunk = session.channel.read()
      while (chunk.nonEmpty) {
        session.parser.feed(chunk).foreach {
          case NatsWire.Ping => session.channel.write(NatsWire.pong)
          case m: NatsWire.Msg =>
            session.seq += 1
            session.frames +=
              NatsFrame(session.seq, System.currentTimeMillis() * 1000L, m.payload)
          case NatsWire.Err(msg) =>
            session.resetConnection()
            throw new IllegalStateException(s"NATS server error: $msg")
          case NatsWire.Pong => session.pongs += 1
          case _ => () // INFO / +OK need no action here
        }
        chunk = session.channel.read()
      }
    } catch {
      case e: java.io.IOException =>
        session.resetConnection()
        throw new IllegalStateException(s"NATS connection lost: ${e.getMessage}", e)
    }

  /** PING → PONG round-trip — the standard NATS client `flush()` idiom:
    * the server processes a connection's ops in order, so when the PONG
    * arrives, everything written before the PING (CONNECT, the SUB, any
    * PUBs) has been fully processed server-side. Call after connecting
    * and before publishing to guarantee the subscription is live —
    * core NATS is at-most-once, so a frame published before the SUB
    * registers is silently gone. */
  def flush(timeoutMs: Long = 10000L): Unit = session.synchronized {
    ensureConnected()
    val p0 = session.pongs
    session.channel.write(NatsWire.ping)
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (session.pongs == p0 && System.nanoTime() < deadline) {
      drain()
      if (session.pongs == p0) Thread.sleep(1)
    }
    if (session.pongs == p0)
      throw new IllegalStateException(s"NATS flush timed out after $timeoutMs ms")
  }

  override def latestSeq(): Long = session.synchronized {
    ensureConnected(); drain(); session.seq
  }

  override def fetch(start: Long, end: Long, shard: Int,
                     shards: Int): Iterator[NatsFrame] = session.synchronized {
    ensureConnected(); drain()
    // snapshot: the iterator is consumed outside the lock while drain()
    // may keep appending
    session.frames.filter(f =>
      f.seq > start && f.seq <= end && f.seq % shards == shard).toVector.iterator
  }

  /** Committed offsets make old frames unreachable — drop them so the
    * shared session's replay buffer is bounded by in-flight batches, not
    * the subject's lifetime volume. */
  override def commit(upTo: Long): Unit = session.synchronized {
    session.frames.filterInPlace(_.seq > upTo)
  }
}
