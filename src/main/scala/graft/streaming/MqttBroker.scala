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
    // QoS 2 exactly-once receiver state (MQTT 3.1.1 §4.3.3): packet ids
    // that got PUBREC but not yet PUBREL. A retransmitted PUBLISH
    // (DUP=1, same id) while in this set must re-send PUBREC WITHOUT
    // delivering to the sink again.
    val qos2Inflight = scala.collection.mutable.Set.empty[Int]
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
              out.write(Array[Byte](0x20, 0x02, 0x00, 0x00)); out.flush()
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
              if (!(qos == 2 && qos2Inflight.contains(packetId)))
                sink(topic, payload)
              if (qos == 1) { // PUBACK
                out.write(Array[Byte](0x40, 0x02,
                  ((packetId >> 8) & 0xff).toByte, (packetId & 0xff).toByte))
                out.flush()
              } else if (qos == 2) { // PUBREC (re-sent on DUP too)
                qos2Inflight += packetId
                out.write(Array[Byte](0x50, 0x02,
                  ((packetId >> 8) & 0xff).toByte, (packetId & 0xff).toByte))
                out.flush()
              }
            case 6 => // PUBREL -> PUBCOMP (completes the QoS 2 exchange)
              val packetId = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
              qos2Inflight -= packetId
              out.write(Array[Byte](0x70, 0x02,
                ((packetId >> 8) & 0xff).toByte, (packetId & 0xff).toByte))
              out.flush()
            case 12 => // PINGREQ -> PINGRESP
              out.write(Array[Byte](0xd0.toByte, 0x00)); out.flush()
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
    finally sock.close()
  }

  def start(): Int = {
    val t = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
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
  }
}
