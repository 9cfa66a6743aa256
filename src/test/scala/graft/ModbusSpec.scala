package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming._
import graft.streaming.ModbusMap._

/** Wire-level and map-level coverage for the native Modbus TCP stack
  * (the §2.1 PLC row — reference api/modbus_client.py semantics). */
class ModbusSpec extends AnyFunSuite {

  private def withServer(bank: ModbusBank)(
      body: (ModbusTcpServer, ModbusTcpClient) => Unit): Unit = {
    val srv = new ModbusTcpServer(bank)
    val port = srv.start()
    val cli = new ModbusTcpClient("localhost", port, timeoutMs = 3000)
    try body(srv, cli)
    finally { cli.close(); srv.stop() }
  }

  test("holding and input register reads round-trip") {
    val bank = ModbusBank(
      holding = Vector(11, 22, 33, 44, 55),
      input = Vector(7, 8, 9))
    withServer(bank) { (_, cli) =>
      assert(cli.readHoldingRegisters(1, 0, 5) ==
        IndexedSeq(11, 22, 33, 44, 55))
      assert(cli.readHoldingRegisters(1, 2, 2) == IndexedSeq(33, 44))
      assert(cli.readInputRegisters(1, 1, 2) == IndexedSeq(8, 9))
    }
  }

  test("coil and discrete reads pack and unpack bits past one byte") {
    val pattern = Vector(1, 0, 1, 1, 0, 0, 1, 0, 1, 1, 1)
    withServer(ModbusBank(coils = pattern, discrete = pattern.reverse)) {
      (_, cli) =>
        assert(cli.readCoils(1, 0, 11) == pattern)
        assert(cli.readDiscreteInputs(1, 0, 11) == pattern.reverse)
        assert(cli.readCoils(1, 2, 3) == IndexedSeq(1, 1, 0))
    }
  }

  test("out-of-range read answers ILLEGAL DATA ADDRESS") {
    withServer(ModbusBank(holding = Vector(1, 2, 3))) { (_, cli) =>
      val e = intercept[ModbusError](cli.readHoldingRegisters(1, 2, 2))
      assert(e.code == 2)
      assert(e.function == ModbusTcp.ReadHoldingRegisters)
      // the connection survives an exception response
      assert(cli.readHoldingRegisters(1, 0, 3) == IndexedSeq(1, 2, 3))
    }
  }

  test("unknown function code answers ILLEGAL FUNCTION") {
    withServer(ModbusBank(holding = Vector(1))) { (srv, _) =>
      val port = {
        // reconnect to discover the port via a raw socket exchange
        val f = classOf[ModbusTcpServer].getDeclaredField("server")
        f.setAccessible(true)
        f.get(srv).asInstanceOf[java.net.ServerSocket].getLocalPort
      }
      val s = new java.net.Socket("localhost", port)
      try {
        val out = new java.io.DataOutputStream(s.getOutputStream)
        val in = new java.io.DataInputStream(s.getInputStream)
        out.writeShort(9); out.writeShort(0); out.writeShort(6)
        out.writeByte(1)
        out.writeByte(0x2B) // unsupported function
        out.writeShort(0); out.writeShort(1)
        out.flush()
        in.readUnsignedShort(); in.readUnsignedShort()
        val len = in.readUnsignedShort(); in.readUnsignedByte()
        val pdu = new Array[Byte](len - 1)
        in.readFully(pdu)
        assert((pdu(0) & 0xFF) == (0x2B | 0x80))
        assert(pdu(1) == 1)
      } finally s.close()
    }
  }

  test("client reopens the socket once on a severed connection") {
    withServer(ModbusBank(holding = Vector(5, 6))) { (srv, cli) =>
      assert(cli.readHoldingRegisters(1, 0, 2) == IndexedSeq(5, 6))
      srv.dropConnections()
      // first attempt hits the dead socket, the retry reconnects
      assert(cli.readHoldingRegisters(1, 0, 2) == IndexedSeq(5, 6))
    }
  }

  // ---- map parsing -------------------------------------------------

  private def bad(json: String): String =
    intercept[IllegalArgumentException](ModbusMap.parse(json)).getMessage

  test("map validation mirrors the reference rules") {
    assert(bad("""[{"name":"x"}]""").contains("exactly one"))
    assert(bad("""[{"name":"x","coil":0,"register":1}]""")
      .contains("exactly one"))
    assert(bad("""[{"register":0}]""").contains("missing non-empty"))
    assert(bad("""[{"name":"x","register":[0,2]}]""")
      .contains("non-consecutive"))
    assert(bad("""[{"name":"x","register":[0,1,2],"type":"float","swap":"word"}]""")
      .contains("swap"))
    assert(bad("""[{"name":"x","register":[0,1,2,3,4],"type":"long"}]""")
      .contains("1 to 4"))
    assert(bad("""[{"name":"x","register":[0,1],"type":"byte"}]""")
      .contains("more than 4"))
    assert(bad("""[{"name":"x","coil":0,"scale":2}]""")
      .contains("do not support modifiers"))
    assert(bad("""[{"name":"x","register":0,"type":"word"}]""")
      .contains("only 'long', 'float', or 'byte'"))
    assert(bad("""[]""").contains("no entries"))
    assert(bad("not json").contains("not valid JSON"))
  }

  test("map validation refuses silent-garbage shapes: wide floats, " +
      "word swap past 2 registers, out-of-range addresses") {
    // float on 3 registers would decode to a raw word list and drop
    // scale/offset — refused at parse
    assert(bad("""[{"name":"x","register":[0,1,2],"type":"float"}]""")
      .contains("1 or 2"))
    // the word half of swap only applies to 2-register values
    assert(bad(
      """[{"name":"x","register":[0,1,2,3],"type":"long","swap":"words"}]""")
      .contains("2-register"))
    assert(bad(
      """[{"name":"x","register":[0,1,2],"swap":"both"}]""")
      .contains("2-register"))
    // writeShort would silently wrap these onto different registers
    assert(bad("""[{"name":"x","register":-1}]""").contains("0..65535"))
    assert(bad("""[{"name":"x","register":70000}]""")
      .contains("0..65535"))
    assert(bad("""[{"name":"x","register":1.9}]""").contains("0..65535"))
    assert(bad("""[{"name":"x","register":[65535,65536]}]""")
      .contains("0..65535"))
    // still-legal shapes parse: 2-register float with word swap,
    // byte-only swap on a wide block, the top address
    assert(ModbusMap.parse(
      """[{"name":"a","register":[0,1],"type":"float","swap":"both"},
        |{"name":"b","register":[2,3,4,5,6],"type":"byte","swap":"bytes"},
        |{"name":"c","register":65535}]""".stripMargin).size == 3)
  }

  test("map accepts the documented shapes, including object form") {
    val pts = ModbusMap.parse(
      """{"values":[{"name":"a","register":0},
        |{"name":"b","inputRegister":[0,1],"type":"long"},
        |{"name":"c","coil":3},{"name":"d","input":2}]}""".stripMargin)
    assert(pts.map(_.tag) == Seq("hr:0", "ir:0+2", "c:3", "di:2"))
    assert(pts(1).typ.contains("long"))
  }

  // ---- decode ------------------------------------------------------

  private def p(kind: String, count: Int, typ: String = null,
      swap: String = null, scale: java.lang.Double = null,
      offset: java.lang.Double = null) =
    Point("t", kind, 0, count, Option(typ), Option(swap),
      Option(scale).map(_.doubleValue),
      Option(offset).map(_.doubleValue))

  test("single-register decode: default, long sign, float, byte") {
    assert(decode(IndexedSeq(0xFFFF), p("hr", 1)) == MLong(0xFFFF))
    assert(decode(IndexedSeq(0x8000), p("hr", 1, "long")) ==
      MLong(-32768))
    assert(decode(IndexedSeq(42), p("hr", 1, "float")) == MDouble(42.0))
    assert(decode(IndexedSeq(0x1234), p("hr", 1, "byte")) ==
      MString("52")) // low byte 0x34
  }

  test("multi-register decode: 32-bit long, float, 64-bit long") {
    assert(decode(IndexedSeq(0x0001, 0x0000), p("hr", 2, "long")) ==
      MLong(65536L))
    assert(decode(IndexedSeq(0xFFFF, 0xFFFE), p("hr", 2, "long")) ==
      MLong(-2L))
    val f = java.lang.Float.floatToIntBits(3.25f)
    assert(decode(IndexedSeq((f >>> 16) & 0xFFFF, f & 0xFFFF),
      p("hr", 2, "float")) == MDouble(3.25))
    assert(decode(IndexedSeq(0xFFFF, 0xFFFF, 0xFFFF, 0xFFFF),
      p("hr", 4, "long")) == MLong(-1L))
    // untyped multi falls back to the word list
    assert(decode(IndexedSeq(1, 2, 3), p("hr", 3)) == MWords(Seq(1, 2, 3)))
  }

  test("swap modes re-order bytes and words before decode") {
    // 0x1234 byte-swapped is 0x3412
    assert(decode(IndexedSeq(0x1234), p("hr", 1, null, "bytes")) ==
      MLong(0x3412))
    // word swap on a 2-register long flips word order
    assert(decode(IndexedSeq(0x0001, 0x0000),
      p("hr", 2, "long", "words")) == MLong(1L))
    assert(decode(IndexedSeq(0x1234, 0x5678),
      p("hr", 2, "long", "both")) == MLong(0x78563412L))
    // words mode touches nothing unless exactly two registers
    assert(decode(IndexedSeq(1, 2, 3), p("hr", 3, null, "words")) ==
      MWords(Seq(1, 2, 3)))
  }

  test("scale and offset force float output") {
    assert(decode(IndexedSeq(100), p("hr", 1, null, null, 0.1)) ==
      MDouble(10.0))
    assert(decode(IndexedSeq(100),
      p("hr", 1, null, null, null, -3.0)) == MDouble(97.0))
    assert(decode(IndexedSeq(100), p("hr", 1, null, null, 2.0, 1.0)) ==
      MDouble(201.0))
  }

  // ---- read planning ----------------------------------------------

  test("consecutive singles merge into block reads") {
    assert(batchSingles(Seq(10, 6, 0, 1, 2, 5), 125) ==
      Seq((0, 3), (5, 2), (10, 1)))
    // maxBlock splits a long run
    assert(batchSingles(0 until 7, 3) == Seq((0, 3), (3, 3), (6, 1)))
  }

  test("plan batches singles per kind, keeps multis separate, dedupes") {
    val pts = ModbusMap.parse(
      """[{"name":"a","register":0},{"name":"b","register":1},
        |{"name":"c","register":[4,5],"type":"long"},
        |{"name":"d","inputRegister":0},{"name":"e","coil":0},
        |{"name":"f","coil":1},{"name":"g","register":[4,5],"type":"float"}]"""
        .stripMargin)
    val (ops, where) = plan(pts)
    assert(ops.toSet == Set(ReadOp("hr", 0, 2), ReadOp("hr", 4, 2),
      ReadOp("ir", 0, 1), ReadOp("c", 0, 2)))
    assert(where(("hr", 1, 1)) == (ReadOp("hr", 0, 2), 1))
    assert(where(("hr", 4, 2)) == (ReadOp("hr", 4, 2), 0))
  }

  test("dynamic table names sanitize like the reference") {
    assert(dynamicTableName("dev-1", "door 1") == "dev_1_door_1")
    assert(dynamicSegment("9lives") == "t_9lives")
    assert(dynamicSegment("") == "x")
  }

  // ---- adversarial server behavior (the client must FAIL CLEANLY —
  // a typed IOException after the one reconnect retry — never hang,
  // never return corrupt data) ----------------------------------------

  /** A hostile Modbus server: reads each request, answers with a
    * scripted response built from the request's transaction id, and
    * serves every connection the same way (so the client's
    * reconnect-once retry meets the same hostility twice). */
  private def withHostileServer(respond: (Int, java.io.DataOutputStream) => Unit)(
      body: ModbusTcpClient => Unit): Unit = {
    val ss = new java.net.ServerSocket(0)
    val alive = new java.util.concurrent.atomic.AtomicBoolean(true)
    val th = new Thread(() => {
      while (alive.get()) {
        try {
          val s = ss.accept()
          val in = new java.io.DataInputStream(s.getInputStream)
          val out = new java.io.DataOutputStream(s.getOutputStream)
          try {
            while (alive.get()) {
              val tid = in.readUnsignedShort()
              in.readUnsignedShort(); in.readUnsignedShort()
              val skip = new Array[Byte](6) // unit + 5-byte read PDU
              in.readFully(skip)
              respond(tid, out)
              out.flush()
            }
          } catch { case _: java.io.IOException => () }
          finally s.close()
        } catch { case _: java.io.IOException => () }
      }
    })
    th.setDaemon(true); th.start()
    val cli = new ModbusTcpClient("localhost", ss.getLocalPort,
      timeoutMs = 1500)
    try body(cli)
    finally { cli.close(); alive.set(false); ss.close() }
  }

  test("a mismatched transaction id is a transport error, not data") {
    withHostileServer { (tid, out) =>
      out.writeShort(tid + 7); out.writeShort(0); out.writeShort(4)
      out.writeByte(1); out.writeByte(0x03); out.writeByte(2)
      out.writeShort(0xBEEF)
    } { cli =>
      val e = intercept[java.io.IOException](
        cli.readHoldingRegisters(1, 0, 1))
      assert(e.getMessage.contains("transaction id"))
    }
  }

  test("an insane MBAP length is rejected before any allocation") {
    withHostileServer { (tid, out) =>
      out.writeShort(tid); out.writeShort(0); out.writeShort(60000)
      out.writeByte(1)
    } { cli =>
      val e = intercept[java.io.IOException](
        cli.readHoldingRegisters(1, 0, 1))
      assert(e.getMessage.contains("insane frame length"))
    }
  }

  test("a lying byte count is rejected") {
    withHostileServer { (tid, out) =>
      out.writeShort(tid); out.writeShort(0); out.writeShort(4)
      out.writeByte(1); out.writeByte(0x03)
      out.writeByte(7) // claims 7 data bytes, sends 1
      out.writeByte(0x12)
    } { cli =>
      val e = intercept[java.io.IOException](
        cli.readHoldingRegisters(1, 0, 1))
      assert(e.getMessage.contains("byte count"))
    }
  }

  test("a mid-frame disconnect surfaces as IOException, not a hang") {
    val ss = new java.net.ServerSocket(0)
    val th = new Thread(() => {
      while (!ss.isClosed) {
        try {
          val s = ss.accept()
          val out = new java.io.DataOutputStream(s.getOutputStream)
          // half an MBAP header, then slam the door
          out.writeShort(1); out.flush()
          s.close()
        } catch { case _: java.io.IOException => () }
      }
    })
    th.setDaemon(true); th.start()
    val cli = new ModbusTcpClient("localhost", ss.getLocalPort,
      timeoutMs = 1500)
    try intercept[java.io.IOException](cli.readHoldingRegisters(1, 0, 1))
    finally { cli.close(); ss.close() }
  }

  test("the client rides a server restart on the same port") {
    val srv1 = new ModbusTcpServer(ModbusBank(holding = Vector(11)))
    val port = srv1.start()
    val cli = new ModbusTcpClient("localhost", port, timeoutMs = 3000)
    try {
      assert(cli.readHoldingRegisters(1, 0, 1) == IndexedSeq(11))
      srv1.stop()
      val srv2 = new ModbusTcpServer(ModbusBank(holding = Vector(22)))
      // same port: a restarted device at the same address
      var bound = false
      val end = System.currentTimeMillis + 5000
      while (!bound && System.currentTimeMillis < end) {
        try { srv2.start(port); bound = true }
        catch { case _: java.io.IOException => Thread.sleep(50) }
      }
      assert(bound, "could not rebind the port")
      try {
        // the dead socket fails the first attempt; the retry reconnects
        assert(cli.readHoldingRegisters(1, 0, 1) == IndexedSeq(22))
      } finally srv2.stop()
    } finally cli.close()
  }
}
