package graft

import graft.streaming.{ModbusBank, ModbusTcpServer}

/** Engine-level PLC client chain (§2.1 row 9 — `run plc client where
  * type = modbus`, reference api/plc_client.py:219): poll an embedded
  * Modbus TCP server, decode per the register map, land wide NDJSON
  * rows in a watch dir, drive the status board, and survive an
  * engine restart via `attach all`. */
class PlcClientSpec extends SparkSpec {

  private def freshEngine(root: java.nio.file.Path) = {
    val cat = new graft.engine.Catalog(spark, Some(root))
    (new graft.engine.Engine(spark, cat), cat)
  }

  private def waitFor(deadlineMs: Long = 10000)(cond: => Boolean): Unit = {
    val end = System.currentTimeMillis + deadlineMs
    while (!cond && System.currentTimeMillis < end) Thread.sleep(20)
    assert(cond, "condition not reached within deadline")
  }

  private def landed(dir: java.nio.file.Path): Seq[String] = {
    if (!java.nio.file.Files.isDirectory(dir)) return Nil
    val s = java.nio.file.Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(_.toString.endsWith(".json"))
        .map(f => java.nio.file.Files.readString(f)).toSeq
    } finally s.close()
  }

  test("wide-row polling: one one-line JSON row per poll with decoded " +
      "columns, board counters, clean exit") {
    val srv = new ModbusTcpServer(ModbusBank(
      coils = Vector(1, 0),
      holding = Vector(500, 0, 0x0001, 0x0000), // hr2+hr3 = long 65536
      input = Vector(250)))
    val port = srv.start()
    val root = java.nio.file.Files.createTempDirectory("plc1")
    val dir = root.resolve("land")
    val (engine, _) = freshEngine(root)
    try {
      val out = engine.execute(s"run plc client where type = modbus " +
        s"and hostname = localhost and port = $port and name = dev1 " +
        s"and frequency = 0.05 and dir = $dir and table = sens and " +
        """map = [{"name":"level","register":0},
          |{"name":"big","register":[2,3],"type":"long"},
          |{"name":"flow","inputRegister":0,"scale":0.1},
          |{"name":"door","coil":0}]""".stripMargin.replace("\n", " "))
      assert(out.contains("polling"), out)
      // 4 points plan into 3 reads (hr singles+multi merge per kind)
      assert(out.contains("4 point(s)"), out)
      waitFor() { landed(dir).size >= 2 }
      val rows = landed(dir)
      rows.foreach { r =>
        assert(!r.contains("\n"), "landing must be one-line JSON")
        val j = org.json4s.jackson.JsonMethods.parse(r)
        import org.json4s._
        val m = j.asInstanceOf[JObject].obj.toMap
        assert(m("level").values == BigInt(500))
        assert(m("big").values == BigInt(65536))
        assert(m("flow") == JDouble(25.0)) // 250 * 0.1, scale→float
        assert(m("door").values == BigInt(1))
        assert(m.contains("timestamp") && m.contains("duration"))
      }
      val board = engine.execute("get plc clients")
      assert(board.contains("dev1") && board.contains("modbus") &&
        board.contains("running"), board)
      val procs = engine.execute("get processes")
      assert(procs.contains("PLC Client"), procs)
      assert(procs.linesIterator.find(_.contains("PLC Client"))
        .exists(_.contains("Running")), procs)
      assert(engine.execute("exit plc dev1").contains("stopped 1"))
      assert(engine.execute("get plc clients").contains("terminated"))
      val after = landed(dir).size
      Thread.sleep(150) // a stopped poller must not land more rows
      assert(landed(dir).size == after)
    } finally { try engine.execute("exit plc all") catch {
      case _: Exception => () }; srv.stop() }
  }

  test("dynamic = true lands one row per point in per-field tables") {
    val srv = new ModbusTcpServer(ModbusBank(
      holding = Vector(7), coils = Vector(1)))
    val port = srv.start()
    val root = java.nio.file.Files.createTempDirectory("plc2")
    val dir = root.resolve("land")
    val (engine, _) = freshEngine(root)
    try {
      engine.execute(s"run plc client where type = modbus and " +
        s"hostname = localhost and port = $port and name = dev-2 and " +
        s"frequency = 0.05 and dir = $dir and dynamic = true and " +
        """map = [{"name":"temp 1","register":0},{"name":"on","coil":0}]""")
      val t1 = dir.resolve("dev_2_temp_1")
      val t2 = dir.resolve("dev_2_on")
      waitFor() { landed(t1).nonEmpty && landed(t2).nonEmpty }
      val j = org.json4s.jackson.JsonMethods.parse(landed(t1).head)
      import org.json4s._
      val m = j.asInstanceOf[JObject].obj.toMap
      assert(m("value").values == BigInt(7) && m.contains("timestamp"))
    } finally { engine.execute("exit plc all"); srv.stop() }
  }

  test("dynamic = true with table = is refused; non-modbus types are " +
      "out of scope; empty polls land nothing and count no Reads") {
    val srv = new ModbusTcpServer(ModbusBank(holding = Vector(1)))
    val port = srv.start()
    val root = java.nio.file.Files.createTempDirectory("plc3")
    val dir = root.resolve("land")
    val (engine, _) = freshEngine(root)
    try {
      val e1 = intercept[IllegalArgumentException](engine.execute(
        s"run plc client where type = modbus and hostname = localhost " +
          s"and port = $port and name = x and frequency = 1 and " +
          s"dir = $dir and table = t and dynamic = true and " +
          """map = [{"name":"a","register":0}]"""))
      assert(e1.getMessage.contains("dynamic"))
      val e2 = intercept[IllegalArgumentException](engine.execute(
        s"run plc client where type = opcua and hostname = localhost " +
          s"and port = $port and name = x and frequency = 1 and " +
          s"dir = $dir and table = t and map = [{\"name\":\"a\",\"register\":0}]"))
      assert(e2.getMessage.contains("out of parity scope"))
      // every mapped point out of range -> empty poll: no landing
      engine.execute(s"run plc client where type = modbus and " +
        s"hostname = localhost and port = $port and name = ghost and " +
        s"frequency = 0.05 and dir = $dir and table = t and " +
        """map = [{"name":"a","register":99}]""")
      Thread.sleep(300)
      assert(landed(dir).isEmpty, "empty polls must not land")
      val board = engine.execute("get plc clients")
      val ghostRow = board.linesIterator.find(_.contains("ghost")).get
      assert(ghostRow.trim.endsWith("| 0 |") ||
        ghostRow.replaceAll("\\s", "").endsWith("|0|"), board)
    } finally { engine.execute("exit plc all"); srv.stop() }
  }

  test("a failed point drops its column; the healthy point still " +
      "lands; the board shows the degraded streak") {
    val srv = new ModbusTcpServer(ModbusBank(holding = Vector(9)))
    val port = srv.start()
    val root = java.nio.file.Files.createTempDirectory("plc4")
    val dir = root.resolve("land")
    val (engine, _) = freshEngine(root)
    try {
      engine.execute(s"run plc client where type = modbus and " +
        s"hostname = localhost and port = $port and name = mix and " +
        s"frequency = 0.05 and dir = $dir and table = t and " +
        """map = [{"name":"ok","register":0},{"name":"gone","register":77}]""")
      waitFor() { landed(dir).nonEmpty }
      val j = org.json4s.jackson.JsonMethods.parse(landed(dir).head)
      import org.json4s._
      val m = j.asInstanceOf[JObject].obj.toMap
      assert(m("ok").values == BigInt(9))
      assert(!m.contains("gone"), "failed point must omit its column")
      waitFor() {
        engine.execute("get processes").contains("degraded: gone")
      }
    } finally { engine.execute("exit plc all"); srv.stop() }
  }

  test("idempotent re-declaration is a no-op; a conflicting one is " +
      "refused; a terminated name is reusable") {
    val srv = new ModbusTcpServer(ModbusBank(holding = Vector(1)))
    val port = srv.start()
    val root = java.nio.file.Files.createTempDirectory("plc5")
    val dir = root.resolve("land")
    val (engine, _) = freshEngine(root)
    val cmd = s"run plc client where type = modbus and hostname = " +
      s"localhost and port = $port and name = one and frequency = 5 " +
      s"and dir = $dir and table = t and " +
      """map = [{"name":"a","register":0}]"""
    try {
      engine.execute(cmd)
      assert(engine.execute(cmd).contains("already polling"))
      val e = intercept[IllegalArgumentException](
        engine.execute(cmd.replace("frequency = 5", "frequency = 9")))
      assert(e.getMessage.contains("different configuration"))
      engine.execute("exit plc one")
      assert(engine.execute(cmd).contains("polling"), "name reusable")
    } finally { engine.execute("exit plc all"); srv.stop() }
  }

  test("get plc values: one-shot batched read renders decoded values " +
      "and per-point errors, no landing") {
    val srv = new ModbusTcpServer(ModbusBank(
      holding = Vector(5, 0x0002, 0x0001), coils = Vector(0, 1)))
    val port = srv.start()
    val root = java.nio.file.Files.createTempDirectory("plc7")
    val (engine, _) = freshEngine(root)
    try {
      val out = engine.execute(s"get plc values where type = modbus " +
        s"and hostname = localhost and port = $port and " +
        """map = [{"name":"a","register":0},""" +
        """{"name":"big","register":[1,2],"type":"long"},""" +
        """{"name":"c1","coil":1},{"name":"nope","inputRegister":3}]""")
      assert(!out.contains("\n"))
      import org.json4s._
      val m = org.json4s.jackson.JsonMethods.parse(out)
        .asInstanceOf[JObject].obj.toMap
      assert(m("a").values == BigInt(5))
      assert(m("big").values == BigInt(0x00020001)) // 131073
      assert(m("c1").values == BigInt(1))
      val nope = m("nope").asInstanceOf[JObject].obj.toMap[String, JValue]
      assert(nope("error").values.toString
        .contains("ILLEGAL DATA ADDRESS"))
      // one-shot: no poller registered, nothing on the board
      assert(engine.execute("get plc clients")
        .contains("no plc clients"))
    } finally srv.stop()
  }

  test("get plc struct aborts on consecutive transport failures " +
      "instead of timing out once per chunk") {
    // accepts the connection, never answers any read
    val silent = new java.net.ServerSocket(0)
    val sink = new Thread(() => {
      try while (!silent.isClosed) { silent.accept() }
      catch { case _: java.io.IOException => () }
    })
    sink.setDaemon(true); sink.start()
    val root = java.nio.file.Files.createTempDirectory("plc11")
    val (engine, _) = freshEngine(root)
    try {
      val t0 = System.currentTimeMillis
      val e = intercept[IllegalArgumentException](engine.execute(
        s"get plc struct where type = modbus and hostname = localhost " +
          s"and port = ${silent.getLocalPort} and timeout = 200 and " +
          s"max_registers = 65536 and scan_chunk = 1"))
      assert(e.getMessage.contains("stopped answering"), e.getMessage)
      // 65536 addrs x 4 kinds at ~400ms/chunk would be a day; the
      // streak abort must cut it to a couple of chunk reads
      assert(System.currentTimeMillis - t0 < 10000)
    } finally silent.close()
  }

  test("exit plc on a wedged client still terminates the handle and " +
      "drops the artifact, so the name is immediately reusable") {
    // a silent server: accepts the connection and never answers — the
    // poll thread blocks in the socket read past both grace joins
    // (interrupt cannot unblock a java.io socket read)
    val silent = new java.net.ServerSocket(0)
    val sink = new Thread(() => {
      try while (!silent.isClosed) { silent.accept() }
      catch { case _: java.io.IOException => () }
    })
    sink.setDaemon(true); sink.start()
    val root = java.nio.file.Files.createTempDirectory("plc10")
    val dir = root.resolve("land")
    val (engine, cat) = freshEngine(root)
    try {
      engine.execute(s"run plc client where type = modbus and " +
        s"hostname = localhost and port = ${silent.getLocalPort} and " +
        s"name = wedge and frequency = 60 and dir = $dir and " +
        s"""table = t and map = [{"name":"a","register":0}]""")
      Thread.sleep(100) // let the poll enter the blocking read
      val out = engine.execute("exit plc wedge")
      // the thread is still stuck in the read, but the handle must be
      // terminated NOW: board truth, artifact dropped, name reusable
      assert(engine.execute("get plc clients").contains("terminated"))
      assert(cat.artifactRecord("plc client:wedge").isEmpty, out)
      val srv = new ModbusTcpServer(ModbusBank(holding = Vector(1)))
      val p2 = srv.start()
      try {
        val re = engine.execute(s"run plc client where type = modbus " +
          s"and hostname = localhost and port = $p2 and name = wedge " +
          s"and frequency = 60 and dir = $dir and table = t and " +
          """map = [{"name":"a","register":0}]""")
        assert(re.contains("polling"), re)
      } finally { engine.execute("exit plc all"); srv.stop() }
    } finally silent.close()
  }

  test("get plc struct: chunked discovery finds the readable address " +
      "space, and its run_client rendering is directly executable") {
    val srv = new ModbusTcpServer(ModbusBank(
      holding = Vector(10, 20, 30), coils = Vector(1, 0, 1, 1, 0)))
    val port = srv.start()
    val root = java.nio.file.Files.createTempDirectory("plc9")
    val dir = root.resolve("land")
    val (engine, _) = freshEngine(root)
    try {
      val nodes = engine.execute(s"get plc struct where type = modbus " +
        s"and hostname = localhost and port = $port and " +
        s"max_registers = 6 and scan_chunk = 2 and format = nodes")
      // chunk granularity (reference semantics): the [2,4) holding
      // chunk trips ILLEGAL DATA ADDRESS (register 3 missing), so
      // hr:2 is NOT discovered even though it is readable alone
      assert(nodes.contains("\"hr:0\"") && nodes.contains("\"hr:1\""))
      assert(!nodes.contains("\"hr:2\""))
      assert(nodes.contains("\"c:0\"") && nodes.contains("\"c:3\""))
      assert(!nodes.contains("\"c:4\"") && !nodes.contains("ir:"))
      val map = engine.execute(s"get plc struct where type = modbus " +
        s"and hostname = localhost and port = $port and " +
        s"max_registers = 2 and scan_chunk = 2")
      assert(map.contains("""{"name": "hr_0", "register": 0}"""), map)
      assert(map.contains("""{"name": "c_1", "coil": 1}"""), map)
      // the run_client rendering is a complete, runnable command
      val cmd = engine.execute(s"get plc struct where type = modbus " +
        s"and hostname = localhost and port = $port and " +
        s"max_registers = 2 and scan_chunk = 2 and " +
        s"format = run_client and name = disc and frequency = 0.05 " +
        s"and table = t and dir = $dir")
      assert(cmd.startsWith("run plc client where type = modbus"), cmd)
      engine.execute(cmd)
      waitFor() { landed(dir).nonEmpty }
      val j = org.json4s.jackson.JsonMethods.parse(landed(dir).head)
      import org.json4s._
      val m = j.asInstanceOf[JObject].obj.toMap[String, JValue]
      assert(m("hr_0").values == BigInt(10))
      assert(m("hr_1").values == BigInt(20))
      assert(m("c_0").values == BigInt(1))
    } finally { engine.execute("exit plc all"); srv.stop() }
  }

  test("flaky-network soak: the poller keeps landing rows while the " +
      "connection is severed under it, and health recovers") {
    val srv = new ModbusTcpServer(ModbusBank(holding = Vector(4)))
    val port = srv.start()
    val root = java.nio.file.Files.createTempDirectory("plc8")
    val dir = root.resolve("land")
    val (engine, _) = freshEngine(root)
    try {
      engine.execute(s"run plc client where type = modbus and " +
        s"hostname = localhost and port = $port and name = soak and " +
        s"frequency = 0.03 and dir = $dir and table = t and " +
        """map = [{"name":"a","register":0}]""")
      waitFor() { landed(dir).nonEmpty }
      (1 to 8).foreach { _ =>
        srv.dropConnections()
        Thread.sleep(60)
      }
      val afterChaos = landed(dir).size
      // polling continues across the severed connections
      waitFor() { landed(dir).size > afterChaos + 3 }
      // and once the network is calm the degraded streak clears
      waitFor() {
        val d = engine.execute("get processes")
        d.contains("soak (modbus)") && !d.contains("degraded")
      }
      landed(dir).foreach { r =>
        val j = org.json4s.jackson.JsonMethods.parse(r)
        import org.json4s._
        assert(j.asInstanceOf[JObject].obj.toMap
          .apply("a").values == BigInt(4)) // no torn/corrupt values
      }
    } finally { engine.execute("exit plc all"); srv.stop() }
  }

  test("attach all replays a recorded plc client after an engine " +
      "restart; exit plc drops the record") {
    val srv = new ModbusTcpServer(ModbusBank(holding = Vector(3)))
    val port = srv.start()
    val root = java.nio.file.Files.createTempDirectory("plc6")
    val dir = root.resolve("land")
    val (e1, _) = freshEngine(root)
    try {
      e1.execute(s"run plc client where type = modbus and hostname = " +
        s"localhost and port = $port and name = att and " +
        s"frequency = 0.05 and dir = $dir and table = t and " +
        """map = [{"name":"a","register":0}]""")
      waitFor() { landed(dir).nonEmpty }
      e1.execute("exit plc all")

      // restart: the recorded artifact was dropped by exit — attach
      // must NOT resurrect it
      val (e2, _) = freshEngine(root)
      val rep = e2.execute("attach all")
      assert(!rep.contains("plc client"), rep)

      // re-declare and "crash" (no exit): the record persists, and a
      // fresh engine's attach all restores the poller
      e2.execute(s"run plc client where type = modbus and hostname = " +
        s"localhost and port = $port and name = att and " +
        s"frequency = 0.05 and dir = $dir and table = t and " +
        """map = [{"name":"a","register":0}]""")
      val (e3, _) = freshEngine(root)
      val rep3 = e3.execute("attach all")
      assert(rep3.contains("attached plc client:att"), rep3)
      val before = landed(dir).size
      waitFor() { landed(dir).size > before }
      e3.execute("exit plc all")
      e2.execute("exit plc all")
    } finally { srv.stop() }
  }
}
