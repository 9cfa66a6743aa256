package graft.streaming

import java.io.{InputStream, OutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets

/** Minimal MQTT 3.1.1 ingest endpoint — the reference's `run message
  * broker` mode, where the node itself ACCEPTS publishes instead of
  * subscribing to an external broker
  * (/root/reference/edge_lake/tcpip/message_server.py `MQTT_MESSAGES`:
  * CONNECT→CONNACK `:185-189`, PUBLISH payload/topic capture
  * `:130-131`, ping/disconnect; cmd `run message broker`
  * cmd/member_cmd.py:9260).
  *
  * Handles CONNECT/CONNACK, PUBLISH QoS 0 and QoS 1 (PUBACK),
  * PINGREQ/PINGRESP, DISCONNECT. Every PUBLISH's (topic, payload) goes
  * to `sink` — in deployment that is TopicRouter.route + table append,
  * exactly the same downstream as the file/stream ingest paths, so the
  * broker is a thin network front: no Spark coupling, one thread per
  * connection (ingest fan-in is bounded by device count, not data
  * volume — the data path stays in Spark).
  */
final class MqttBroker(sink: (String, String) => Unit, port: Int = 0) {

  private val server = new ServerSocket(port)
  @volatile private var running = true

  /** Live subscriptions: (connection out-stream, topic filter,
    * granted qos). A PUBLISH forwards to every matching filter — this
    * is the broker half that makes `run msg client`
    * ([[MqttClient]]) testable against the node's own broker, and it
    * is real MQTT 3.1.1 fan-out: wildcard filters (`+` one level,
    * `#` tail), per-subscription granted QoS, dead connections pruned
    * on write failure. */
  private val subs = scala.collection.mutable.ArrayBuffer
    .empty[(OutputStream, String, Int)]
  private val nextForwardId = new java.util.concurrent.atomic.AtomicInteger(1)

  /** Open connection sockets, so [[stop]] can drop them — a stopped
    * broker must go silent instead of letting parked handler threads
    * keep serving publishes (same contract as KafkaMiniBroker). */
  private val conns =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Socket]()

  /** MQTT 3.1.1 §4.7 topic filter match: `+` spans exactly one level,
    * `#` (final level only) spans the rest. */
  private[streaming] def topicMatches(filter: String, topic: String): Boolean = {
    val f = filter.split("/", -1)
    val t = topic.split("/", -1)
    var i = 0
    while (i < f.length) {
      if (f(i) == "#") return true
      if (i >= t.length) return false
      if (f(i) != "+" && f(i) != t(i)) return false
      i += 1
    }
    f.length == t.length
  }

  /** Encode the fixed-header remaining length as the MQTT varint. */
  private def remLen(n: Int): Array[Byte] = {
    var v = n
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var cont = true
    while (cont) {
      var d = v % 128
      v /= 128
      if (v > 0) d |= 0x80
      out += d.toByte
      cont = v > 0
    }
    out.toArray
  }

  /** Forward a PUBLISH to every matching subscriber at
    * min(publish qos, granted qos) (spec §3.8.4); subscribers whose
    * socket is gone are pruned. At-least-once to the subscriber is the
    * PUBACK-carrying frame itself; retransmit-on-reconnect state is
    * out of scope for this embedded broker (documented). */
  private def forward(topic: String, payload: Array[Byte], pubQos: Int): Unit = {
    val targets = subs.synchronized {
      subs.filter(s => topicMatches(s._2, topic)).toList
    }
    targets.foreach { case (o, _, grantedQos) =>
      val qos = math.min(pubQos, grantedQos)
      val t = topic.getBytes(StandardCharsets.UTF_8)
      val pid =
        if (qos > 0) {
          // packet ids are non-zero 16-bit (spec §2.3.1) and must be
          // unique among in-flight forwards — `& 0x7fff | 1` gave
          // consecutive forwards the SAME id (2|1 == 3|1), which a
          // compliant subscriber discards as a DUP retransmission.
          // WRAP ASSUMPTION: the counter repeats every 32,768
          // forwards, so an id collides only if a subscriber still has
          // that id IN FLIGHT (un-acked) after 32k subsequent
          // forwards — an in-flight window no MQTT client sustains
          // (spec Receive Maximum is capped at 65,535, and broker
          // QoS-1 forwards here are fire-and-forget, not retried).
          val id = (nextForwardId.getAndIncrement() & 0x7fff) + 1
          Array[Byte](((id >> 8) & 0xff).toByte, (id & 0xff).toByte)
        } else Array.emptyByteArray
      val body = Array[Byte]((t.length >> 8).toByte,
        (t.length & 0xff).toByte) ++ t ++ pid ++ payload
      try o.synchronized {
        o.write(Array[Byte]((0x30 | (qos << 1)).toByte) ++
          remLen(body.length) ++ body)
        o.flush()
      } catch {
        case _: java.io.IOException =>
          subs.synchronized { subs.filterInPlace(_._1 ne o) }
      }
    }
  }

  /** QoS 2 exactly-once receiver state, keyed by CLIENT ID at the broker
    * level (MQTT 3.1.1 §4.3.3): packet ids that got PUBREC but not yet
    * PUBREL. Broker-level (not per-connection) so a sender that
    * reconnects and retransmits an incomplete QoS 2 PUBLISH (DUP=1,
    * same packet id) is still suppressed — exactly-once survives TCP
    * session loss, matching the spec's session-state requirement. */
  private val qos2Inflight =
    scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[Int]]
  private def inflightFor(clientId: String): scala.collection.mutable.Set[Int] =
    qos2Inflight.synchronized {
      qos2Inflight.getOrElseUpdate(clientId,
        scala.collection.mutable.Set.empty[Int])
    }

  private def readRemainingLength(in: InputStream): Int = {
    // MQTT varint: 7 bits per byte, MSB = continuation
    var mult = 1
    var value = 0
    var i = 0
    var cont = true
    while (cont && i < 4) {
      val b = in.read()
      if (b < 0) throw new java.io.EOFException
      value += (b & 0x7f) * mult
      mult *= 128
      cont = (b & 0x80) != 0
      i += 1
    }
    // frame-size sanity (same treatment as the Kafka client's frame
    // cap): a continuation bit on the 4th byte is a protocol
    // violation (spec §2.2.3 caps the varint at 4 bytes), and an
    // adversarial length would otherwise make readFully allocate up
    // to 256 MB PER CONNECTION before a single payload byte arrives.
    // Drop the connection, never the broker.
    if (cont) throw new java.io.IOException(
      "malformed remaining length (continuation past 4 bytes)")
    if (value > MqttBroker.MaxFrameBytes) throw new java.io.IOException(
      s"frame of $value bytes exceeds the ${MqttBroker.MaxFrameBytes}" +
        " cap")
    value
  }

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new java.io.EOFException
      off += r
    }
    buf
  }

  private def handle(sock: Socket): Unit = {
    val in = sock.getInputStream
    val out: OutputStream = sock.getOutputStream
    // Until CONNECT names the client, key QoS 2 state by a socket-unique
    // fallback (a client violating the CONNECT-first rule still gets
    // within-connection exactly-once).
    var inflightKey = "anon:" + System.identityHashCode(sock).toHexString
    var inflight = inflightFor(inflightKey)
    try {
      var open = true
      while (open && running) {
        val first = in.read()
        if (first < 0) open = false
        else {
          val msgType = (first >> 4) & 0x0f
          val flags = first & 0x0f
          val body = readFully(in, readRemainingLength(in))
          msgType match {
            case 1 => // CONNECT -> CONNACK (session not present, accepted)
              // variable header: protocol name (2+4), level (1),
              // flags (1), keepalive (2) -> client id at offset 10
              if (body.length >= 12) {
                val idLen = ((body(10) & 0xff) << 8) | (body(11) & 0xff)
                if (body.length >= 12 + idLen && idLen > 0) {
                  val clientId =
                    new String(body, 12, idLen, StandardCharsets.UTF_8)
                  inflightKey = clientId
                  inflight = inflightFor(clientId)
                }
              }
              // out.synchronized like every other reply: a re-CONNECT
              // after SUBSCRIBE races forward()'s PUBLISH frames
              out.synchronized {
                out.write(Array[Byte](0x20, 0x02, 0x00, 0x00)); out.flush()
              }
            case 3 => // PUBLISH
              val qos = (flags >> 1) & 0x03
              val topicLen = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
              val topic = new String(body, 2, topicLen, StandardCharsets.UTF_8)
              var pos = 2 + topicLen
              var packetId = 0
              if (qos > 0) {
                packetId = ((body(pos) & 0xff) << 8) | (body(pos + 1) & 0xff)
                pos += 2
              }
              val payload = new String(body, pos, body.length - pos,
                StandardCharsets.UTF_8)
              // QoS 2 receiver flow "method A" (spec §4.3.3): deliver on
              // first PUBLISH receipt, answer PUBREC, and suppress
              // delivery for a retransmission of the same packet id
              // until PUBREL completes the exchange
              if (!(qos == 2 && inflight.synchronized(inflight.contains(packetId)))) {
                sink(topic, payload)
                // broker fan-out: subscribers get the message too
                forward(topic,
                  java.util.Arrays.copyOfRange(body, pos, body.length),
                  qos)
              }
              if (qos == 1) out.synchronized { // PUBACK
                out.write(Array[Byte](0x40, 0x02,
                  ((packetId >> 8) & 0xff).toByte, (packetId & 0xff).toByte))
                out.flush()
              } else if (qos == 2) { // PUBREC (re-sent on DUP too)
                inflight.synchronized(inflight += packetId)
                out.synchronized {
                  out.write(Array[Byte](0x50, 0x02,
                    ((packetId >> 8) & 0xff).toByte,
                    (packetId & 0xff).toByte))
                  out.flush()
                }
              }
            case 6 => // PUBREL -> PUBCOMP (completes the QoS 2 exchange)
              val packetId = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
              inflight.synchronized(inflight -= packetId)
              // out.synchronized: forward() may be writing a PUBLISH to
              // this same stream from another handler thread
              out.synchronized {
                out.write(Array[Byte](0x70, 0x02,
                  ((packetId >> 8) & 0xff).toByte, (packetId & 0xff).toByte))
                out.flush()
              }
            case 4 => // PUBACK from a subscriber: at-least-once done
            case 8 => // SUBSCRIBE -> register filters, SUBACK
              val packetId = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
              var pos = 2
              val granted = scala.collection.mutable.ArrayBuffer.empty[Byte]
              while (pos + 2 <= body.length) {
                val fLen = ((body(pos) & 0xff) << 8) | (body(pos + 1) & 0xff)
                val filter = new String(body, pos + 2, fLen,
                  StandardCharsets.UTF_8)
                val reqQos = body(pos + 2 + fLen) & 0x03
                val g = math.min(reqQos, 1) // QoS 0/1 granted; 2 capped
                subs.synchronized { subs += ((out, filter, g)) }
                granted += g.toByte
                pos += 3 + fLen
              }
              out.synchronized {
                out.write(Array[Byte](0x90.toByte) ++
                  remLen(2 + granted.length) ++
                  Array[Byte](((packetId >> 8) & 0xff).toByte,
                    (packetId & 0xff).toByte) ++ granted.toArray)
                out.flush()
              }
            case 10 => // UNSUBSCRIBE -> drop this connection's filters,
              // UNSUBACK
              val packetId = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
              var pos = 2
              while (pos + 2 <= body.length) {
                val fLen = ((body(pos) & 0xff) << 8) | (body(pos + 1) & 0xff)
                val filter = new String(body, pos + 2, fLen,
                  StandardCharsets.UTF_8)
                subs.synchronized {
                  subs.filterInPlace(s => !((s._1 eq out) && s._2 == filter))
                }
                pos += 2 + fLen
              }
              out.synchronized {
                out.write(Array[Byte](0xb0.toByte, 0x02,
                  ((packetId >> 8) & 0xff).toByte,
                  (packetId & 0xff).toByte))
                out.flush()
              }
            case 12 => // PINGREQ -> PINGRESP
              out.synchronized {
                out.write(Array[Byte](0xd0.toByte, 0x00)); out.flush()
              }
            case 14 => // DISCONNECT
              open = false
            case _ => // unsupported control packet: ignore body
          }
        }
      }
    } catch {
      // malformed frames (short PUBLISH bodies) or a throwing sink must
      // drop THIS connection cleanly, not kill the worker with an
      // uncaught exception mid-protocol
      case scala.util.control.NonFatal(_) => ()
    }
    finally {
      subs.synchronized { subs.filterInPlace(_._1 ne out) }
      // QoS 2 session state survives a NAMED client's reconnect (the
      // spec's session-state requirement) but must not leak forever:
      // drop the socket-unique anon key always, and a named key whose
      // set is EMPTY (no incomplete exchange — nothing to survive)
      qos2Inflight.synchronized {
        qos2Inflight.get(inflightKey).foreach { s =>
          if (inflightKey.startsWith("anon:") ||
              s.synchronized(s.isEmpty))
            qos2Inflight.remove(inflightKey)
        }
      }
      conns.remove(sock)
      sock.close()
    }
  }

  def start(): Int = {
    val t = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          conns.add(sock)
          if (!running) sock.close() // raced with stop()
          val worker = new Thread(() => handle(sock))
          worker.setDaemon(true)
          worker.start()
        } catch { case _: java.io.IOException => () }
      }
    })
    t.setDaemon(true)
    t.start()
    server.getLocalPort
  }

  def stop(): Unit = {
    running = false
    server.close()
    conns.forEach(s => try s.close() catch { case _: Exception => () })
    conns.clear()
  }
}

object MqttBroker {
  /** Largest accepted frame body. The reference's MQTT payloads are
    * sensor JSON documents (KBs); 16 MB leaves three orders of
    * magnitude of headroom while bounding what one adversarial or
    * corrupted length prefix can make a connection allocate. */
  val MaxFrameBytes: Int = 16 << 20
}
