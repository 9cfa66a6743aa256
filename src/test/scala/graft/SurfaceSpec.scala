package graft

import org.apache.spark.sql.functions._

import graft.engine.{Catalog, Engine, GrafanaRoute}

class EngineSpec extends SparkSpec {
  private lazy val engine = {
    val cat = new Catalog(spark)
    cat.registerTable("events", s"$sfDir/events.parquet",
      nanoTs = Seq("ts"))
    cat.registerTable("customer", s"$sfDir/customer.parquet")
    new Engine(spark, cat)
  }

  test("sql command renders json with stat footer") {
    val out = engine.execute(
      """sql edge format=json stat=true """ +
        """"select event_type, count(*) as n from events """ +
        """group by event_type order by event_type"""")
    assert(out.contains("\"Query\": ["))
    assert(out.contains("\"Count\":"))
  }

  test("sql command renders ASCII table") {
    val out = engine.execute(
      """sql edge format=table "select event_type, count(*) as n """ +
        """from events group by event_type order by event_type"""")
    assert(out.contains("| event_type |"))
  }

  test("create view + query through the view") {
    engine.execute("create view ev on events (event_id as id, value)")
    assert(engine.catalog.viewNames.contains("ev"))
    val df = engine.query("""sql edge "select id, value from ev limit 5"""")
    assert(df.columns.toSeq === Seq("id", "value"))
    assert(df.count() === 5)
  }

  test("partition / drop partition lifecycle") {
    val dir = java.nio.file.Files.createTempDirectory("engp").toString
    val out = engine.execute(s"partition events using ts by 1 month into $dir")
    assert(out.contains("partitioned events"))
    val parts = graft.engine.TimePartitions.partitions(spark, dir)
    assert(parts.nonEmpty)
    val dropOut = engine.execute(s"drop partition $dir before ${parts.last}")
    assert(graft.engine.TimePartitions.partitions(spark, dir) ===
      Seq(parts.last))
    assert(dropOut.contains(s"dropped ${parts.length - 1}"))
  }

  test("get partitions lists a partitioned table's buckets") {
    val dir = java.nio.file.Files.createTempDirectory("engp2").toString
    val cat = new Catalog(spark)
    cat.registerTable("events", s"$sfDir/events.parquet", nanoTs = Seq("ts"))
    val eng = new Engine(spark, cat)
    eng.execute(s"partition events using ts by 1 month into $dir")
    cat.registerPartitionedTable("events_p", dir, "ts", "month", 1)
    val listing = eng.execute("get partitions events_p")
    assert(listing.startsWith("events_p using ts by 1 month: "))
    assert(listing.contains("2024-01"))
    assert(eng.execute("get partitions nope") === "no partitioned tables")
  }

  test("suggest create infers the reference DDL") {
    val ddl = engine.execute(
      """suggest create iot.sensor from [""" +
        """{"device": "ab", "temp": 21.57, "t_time": "2024-01-02 10:00:00"},""" +
        """{"device": "cdef", "temp": 22}]""")
    assert(ddl.contains("CREATE TABLE iot.sensor"))
    assert(ddl.contains("row_id BIGINT"))
    assert(ddl.contains("device CHAR(4)"))   // widened CHAR(2)+CHAR(4)
    assert(ddl.contains("temp DECIMAL"))     // INT widened with DECIMAL
    assert(ddl.contains("t_time TIMESTAMP"))
  }

  test("get tables lists registrations") {
    assert(engine.execute("get tables").linesIterator.toSeq
      .contains("events"))
  }

  test("get rows count reports per-table counts") {
    val all = engine.execute("get rows count")
    assert(all.linesIterator.exists(_.startsWith("events: ")))
    val one = engine.execute(
      "get rows count where dbms = edge and table = events")
    assert(one.matches("events: \\d+"))
    assert(one.split(": ")(1).toLong > 0)
  }

  test("timezone option converts timestamp output at the edge") {
    val cat = new Catalog(spark)
    cat.registerTable("events", s"$sfDir/events.parquet",
      nanoTs = Seq("ts"))
    val eng = new Engine(spark, cat)
    // note: events.ts arrives as raw nano longs via catalog-parquet read;
    // build a view over a timestamp column to exercise the conversion
    val out = eng.execute(
      """sql edge timezone=+05:30 format=json:list """ +
        """"select event_id from events order by event_id limit 1"""")
    assert(out.contains("\"event_id\":"))
  }
}

class GrafanaRouteSpec extends SparkSpec {
  private lazy val engine2 = {
    val cat = new Catalog(spark)
    cat.registerTable("events", s"$sfDir/events.parquet",
      nanoTs = Seq("ts"))
    new Engine(spark, cat)
  }

  private val payload = """
    {"range": {"from": "2024-01-02T00:00:00.000Z", "to": "2024-01-05T00:00:00.000Z"},
     "maxDataPoints": 50,
     "targets": [{"target": "events",
       "payload": {"dbms": "edge", "type": "increments",
                   "time_column": "ts", "value_column": "value"}}]}"""

  test("payload parses: range, target, type") {
    val r = GrafanaRoute.parse(payload)
    assert(r.fromTs === "2024-01-02 00:00:00")
    assert(r.toTs === "2024-01-05 00:00:00")
    assert(r.table === "events")
    assert(r.requestType === "increments")
    assert(r.dataPoints === 50)
  }

  test("increments request runs end-to-end") {
    val df = GrafanaRoute.run(engine2, payload)
    assert(df.count() > 0)
    assert(df.columns.contains("avg_value"))
  }

  test("grain-aligned increments dashboard request is served from a " +
      "registered rollup (same rows, no event scan)") {
    // 50 points over 3 days -> auto unit ~ hour-ish (coarser than the
    // minute grain); the Z-range literals sit on day boundaries, so the
    // matcher accepts and the dashboard never touches event history
    val cat = new Catalog(spark)
    cat.registerTable("events", s"$sfDir/events.parquet",
      nanoTs = Seq("ts"))
    val engine = new Engine(spark, cat)
    val before = GrafanaRoute.run(engine, payload)
      .collect().map(_.toString).sorted
    val dir = java.nio.file.Files.createTempDirectory("grafroll")
      .resolve("roll").toString
    engine.execute("rollup create where table = events and " +
      s"path = $dir and time = ts and value = value and grain = minute")
    val served = GrafanaRoute.run(engine, payload)
    assert(!served.queryExecution.sparkPlan.toString
      .contains("events.parquet"))
    assert(served.collect().map(_.toString).sorted === before)
  }

  test("query request gets the time range spliced in") {
    val r = GrafanaRoute.parse(payload).copy(requestType = "query",
      sql = Some("select count(*) as n from events"))
    val cmd = GrafanaRoute.toCommand(r)
    assert(cmd.contains("where ts >= '2024-01-02 00:00:00'"))
    val n = GrafanaRoute.run(engine2, GrafanaRouteSpecHelpers.payloadFor(r))
    assert(n.head().getLong(0) > 0)
  }
}

object GrafanaRouteSpecHelpers {
  /** Re-serialize a Request to the payload JSON shape (test helper). */
  def payloadFor(r: GrafanaRoute.Request): String = s"""
    {"range": {"from": "${r.fromTs.replace(' ', 'T')}.000Z",
               "to": "${r.toTs.replace(' ', 'T')}.000Z"},
     "maxDataPoints": ${r.dataPoints},
     "targets": [{"target": "${r.table}",
       "payload": {"dbms": "${r.dbms}", "type": "${r.requestType}",
                   ${r.sql.map(s => s""""sql": "$s",""").getOrElse("")}
                   "time_column": "${r.tsColumn}",
                   "value_column": "${r.valueColumn}"}}]}"""
}

class StreamIngestE2ESpec extends SparkSpec {
  import graft.ingest.MappingPolicy
  import graft.streaming.{StreamIngest, StreamOps}

  test("watch-dir -> policy -> conditions -> partitioned parquet append") {
    val watch = java.nio.file.Files.createTempDirectory("watch")
    val out = java.nio.file.Files.createTempDirectory("out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString

    val policy = MappingPolicy.Policy("iot", "readings", Some("readings"),
      Seq(
        MappingPolicy.ColumnSpec("device", "varchar", "[device]"),
        MappingPolicy.ColumnSpec("ts", "timestamp", "[timestamp]"),
        MappingPolicy.ColumnSpec("value", "float", "[value]")))

    // drop two json docs into the watch dir (one reading each + one batch)
    java.nio.file.Files.writeString(watch.resolve("a.json"),
      """{"readings": [{"device": "d1", "timestamp": "2024-01-01 10:00:00", "value": 1.5},
                       {"device": "d1", "timestamp": "2024-01-02 11:00:00", "value": 2.5}]}""".replaceAll("\n\\s+", ""))
    java.nio.file.Files.writeString(watch.resolve("b.json"),
      """{"readings": [{"device": "d2", "timestamp": "2024-01-01 12:00:00", "value": -9.0}]}""")

    val raw = StreamIngest.watchDir(spark, watch.toString)
    val (rows, _) = StreamIngest.pipeline(raw, policy,
      Seq(StreamOps.Condition("value < 0", StreamOps.Drop)))
    val withPar = rows.withColumn("__par",
      graft.engine.TimePartitions.bucketExpr("ts", "day", 1))
    val q = withPar.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .partitionBy("__par").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val stored = spark.read.parquet(out)
    assert(stored.count() === 2) // d2's negative reading dropped
    assert(stored.select("device").distinct().count() === 1)
    assert(graft.engine.TimePartitions.partitions(spark, out) ===
      Seq("2024-01-01", "2024-01-02"))
  }
}

class MqttChainE2ESpec extends SparkSpec {
  import graft.ingest.MappingPolicy
  import graft.streaming.{MqttBroker, StreamIngest}
  import graft.engine.{Catalog, Engine}

  test("MQTT publish -> watch-dir -> policy stream -> parquet -> sql") {
    val watch = java.nio.file.Files.createTempDirectory("mq_watch")
    val out = java.nio.file.Files.createTempDirectory("mq_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("mq_ckpt").toString

    // broker sink = the reference's message-broker-to-streamer handoff:
    // each PUBLISH lands as one NDJSON file in the watch dir
    val n = new java.util.concurrent.atomic.AtomicInteger
    val broker = new MqttBroker((topic, payload) =>
      java.nio.file.Files.writeString(
        watch.resolve(s"m${n.incrementAndGet()}.json"), payload))
    val port = broker.start()
    try {
      val sock = new java.net.Socket("localhost", port)
      val os = sock.getOutputStream
      def pub(msg: String): Unit = {
        val t = "factory/temp".getBytes("UTF-8")
        val m = msg.getBytes("UTF-8")
        val body = Array[Byte](0, t.length.toByte) ++ t ++ m
        os.write(Array[Byte](0x30, body.length.toByte) ++ body)
        os.flush()
      }
      val varHeader = Array[Byte](0, 4, 'M', 'Q', 'T', 'T', 4, 2, 0, 60)
      val cid = "chain".getBytes("UTF-8")
      val payload = Array[Byte](0, cid.length.toByte) ++ cid
      os.write(Array[Byte](0x10,
        (varHeader.length + payload.length).toByte) ++ varHeader ++ payload)
      os.flush()
      pub("""{"device": "t1", "value": 21.5}""")
      pub("""{"device": "t2", "value": 22.5}""")
      sock.close()
      val deadline = System.currentTimeMillis + 5000
      while (n.get < 2 && System.currentTimeMillis < deadline)
        Thread.sleep(20)
      assert(n.get === 2)

      // the SAME streaming chain files use: watch-dir source -> mapping
      // policy -> parquet append
      val policy = MappingPolicy.Policy("edge", "temps", None, Seq(
        MappingPolicy.ColumnSpec("device", "varchar", "[device]"),
        MappingPolicy.ColumnSpec("value", "float", "[value]")))
      val (rows, _) =
        StreamIngest.pipeline(StreamIngest.watchDir(spark, watch.toString),
          policy)
      val q = StreamIngest.startParquetSink(rows, out, ckpt,
        flushSeconds = 1, name = Some("mqtt_temps"))
      try q.processAllAvailable() finally { q.stop(); q.awaitTermination() }

      // queryable through the Engine like any table
      val cat = new Catalog(spark)
      cat.registerTable("temps", out)
      val e = new Engine(spark, cat)
      val reply = e.execute(
        """sql edge "select device, count(*) as n from temps """ +
          """group by device order by device"""")
      assert(reply.contains("t1") && reply.contains("t2"))
    } finally broker.stop()
  }
}

class MqttClientChainE2ESpec extends SparkSpec {
  import graft.ingest.MappingPolicy
  import graft.streaming.{MqttBroker, MqttClient, StreamIngest}
  import graft.engine.{Catalog, Engine}

  /** QoS 1 publish helper speaking raw MQTT 3.1.1 to the broker. */
  private def connectAndPublish(port: Int, topic: String,
      msgs: Seq[String]): Unit = {
    val sock = new java.net.Socket("localhost", port)
    try {
      val os = sock.getOutputStream
      val is = sock.getInputStream
      val varHeader = Array[Byte](0, 4, 'M', 'Q', 'T', 'T', 4, 2, 0, 60)
      val cid = "pub".getBytes("UTF-8")
      val connBody = varHeader ++
        Array[Byte](0, cid.length.toByte) ++ cid
      os.write(Array[Byte](0x10, connBody.length.toByte) ++ connBody)
      os.flush()
      assert((is.read() >> 4) === 2) // CONNACK
      is.skip(is.read().toLong)
      msgs.zipWithIndex.foreach { case (m, i) =>
        val t = topic.getBytes("UTF-8")
        val pid = i + 1
        val body = Array[Byte](0, t.length.toByte) ++ t ++
          Array[Byte](((pid >> 8) & 0xff).toByte, (pid & 0xff).toByte) ++
          m.getBytes("UTF-8")
        os.write(Array[Byte](0x32, body.length.toByte) ++ body) // QoS 1
        os.flush()
        assert((is.read() >> 4) === 4) // PUBACK from the broker
        is.skip(is.read().toLong)
      }
    } finally sock.close()
  }

  test("run msg client: SUBSCRIBE to the node's own broker, QoS 1 " +
      "delivery -> watch-dir -> policy stream -> parquet -> sql " +
      "(the reference's client mode end-to-end)") {
    val watch = java.nio.file.Files.createTempDirectory("mqc_watch")
    val out = java.nio.file.Files.createTempDirectory("mqc_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("mqc_ckpt").toString
    // broker with a no-op ingest sink: THIS node consumes via the
    // client, the broker just fans out (an external plant broker)
    val broker = new MqttBroker((_, _) => ())
    val port = broker.start()
    val engine = new Engine(spark, new Catalog(spark))
    try {
      val reply = engine.execute(s"run msg client where " +
        s"broker = localhost and port = $port and " +
        s"topic = plant/+/temp and dir = $watch and qos = 1")
      assert(reply.contains("subscribed"), reply)
      connectAndPublish(port, "plant/a/temp", Seq(
        """{"device": "t1", "value": 21.5}""",
        """{"device": "t2", "value": 22.5}"""))
      // a topic OUTSIDE the filter must not land
      connectAndPublish(port, "office/door", Seq(
        """{"device": "d9", "value": 1.0}"""))
      val deadline = System.currentTimeMillis + 5000
      def landed() = java.nio.file.Files.list(watch).count()
      while (landed() < 2 && System.currentTimeMillis < deadline)
        Thread.sleep(20)
      Thread.sleep(200) // grace: the off-filter message must NOT arrive
      assert(landed() === 2L)
      // same downstream as broker mode: watch-dir -> policy -> parquet
      val policy = MappingPolicy.Policy("edge", "temps", None, Seq(
        MappingPolicy.ColumnSpec("device", "varchar", "[device]"),
        MappingPolicy.ColumnSpec("value", "float", "[value]")))
      val (rows, _) = StreamIngest.pipeline(
        StreamIngest.watchDir(spark, watch.toString), policy)
      val q = StreamIngest.startParquetSink(rows, out, ckpt,
        flushSeconds = 1, name = Some("mqtt_client_temps"))
      try q.processAllAvailable() finally { q.stop(); q.awaitTermination() }
      val cat = new Catalog(spark)
      cat.registerTable("temps", out)
      val e2 = new Engine(spark, cat)
      val rep = e2.execute(
        """sql edge "select device, count(*) as n from temps """ +
          """group by device order by device"""")
      assert(rep.contains("t1") && rep.contains("t2") &&
        !rep.contains("d9"), rep)
      assert(engine.execute("exit msg client")
        .contains("1 msg client(s) disconnected"))
    } finally broker.stop()
  }

  test("msg client landings honor the line-oriented contract: " +
      "pretty-printed JSON folds to ONE compact line, garbage " +
      "quarantines beside the watch dir") {
    val watch = java.nio.file.Files.createTempDirectory("mqc_norm")
    val broker = new MqttBroker((_, _) => ())
    val port = broker.start()
    val engine = new Engine(spark, new Catalog(spark))
    try {
      engine.execute(s"run msg client where broker = localhost and " +
        s"port = $port and topic = norm/# and dir = $watch")
      connectAndPublish(port, "norm/a", Seq(
        "{\n  \"device\": \"p\",\n  \"value\": 9\n}",
        "not json at all",
        """{"device": "ok", "value": 1}"""))
      def landed() =
        Option(watch.toFile.listFiles()).getOrElse(Array.empty).toSeq
          .filter(_.isFile)
      val deadline = System.currentTimeMillis + 8000
      while (landed().size < 2 && System.currentTimeMillis < deadline)
        Thread.sleep(30)
      val bodies = landed().map(f =>
        java.nio.file.Files.readString(f.toPath))
      assert(bodies.size === 2, bodies.toString)
      assert(bodies.forall(!_.contains("\n")), bodies.toString)
      val errDir = watch.resolveSibling(
        watch.getFileName.toString + ".err").toFile
      val errs = Option(errDir.listFiles()).getOrElse(Array.empty)
      assert(errs.length === 1 &&
        java.nio.file.Files.readString(errs.head.toPath)
          === "not json at all", errs.toSeq.toString)
      engine.execute("exit msg client")
    } finally broker.stop()
  }

  test("the msg client RECONNECTS: a broker restart on the same port " +
      "is survived — the subscription re-establishes and delivery " +
      "resumes without operator action") {
    val got = new java.util.concurrent.CopyOnWriteArrayList[String]
    var broker = new MqttBroker((_, _) => ())
    val port = broker.start()
    val client = new MqttClient("localhost", port, "graft-reconn",
      (_, p) => got.add(p))
    try {
      client.start(Seq(("plant/+", 1)))
      connectAndPublish(port, "plant/a", Seq("""{"m": 1}"""))
      val d1 = System.currentTimeMillis + 5000
      while (got.size < 1 && System.currentTimeMillis < d1)
        Thread.sleep(20)
      assert(got.size === 1, s"pre-restart delivery: ${got.size}")
      assert(client.isConnected)
      // the plant broker restarts (same port, fresh process state)
      broker.stop()
      val d2 = System.currentTimeMillis + 5000
      while (client.isConnected && System.currentTimeMillis < d2)
        Thread.sleep(20)
      assert(!client.isConnected, "client never noticed the drop")
      assert(client.isRunning, "client gave up instead of reconnecting")
      broker = new MqttBroker((_, _) => (), port)
      assert(broker.start() === port)
      // the client re-subscribes on its own; a publish after the
      // restart is delivered with no operator action
      val d3 = System.currentTimeMillis + 15000
      while (!client.isConnected && System.currentTimeMillis < d3)
        Thread.sleep(50)
      assert(client.isConnected, "client never re-attached")
      connectAndPublish(port, "plant/b", Seq("""{"m": 2}"""))
      val d4 = System.currentTimeMillis + 5000
      while (got.size < 2 && System.currentTimeMillis < d4)
        Thread.sleep(20)
      assert(got.toArray.toSeq === Seq("""{"m": 1}""", """{"m": 2}"""),
        got.toArray.toSeq.toString)
    } finally { client.stop(); broker.stop() }
  }
}

class GoldenOutputSpec extends SparkSpec {
  import graft.engine.{Catalog, Engine}

  private lazy val engine = {
    val cat = new Catalog(spark)
    cat.registerTable("events", s"$sfDir/events.parquet",
      nanoTs = Seq("ts"))
    new Engine(spark, cat)
  }
  private val q =
    """"select event_type, count(*) as n from events """ +
      """group by event_type order by event_type""""

  test("dest=file writes the rendered output") {
    val f = java.nio.file.Files.createTempFile("golden", ".txt")
    val msg = engine.execute(
      s"""sql edge format=table dest=file:$f $q""")
    assert(msg === s"written to $f")
    assert(java.nio.file.Files.readString(f).contains("| event_type |"))
  }

  test("test=true + source=<golden> compares against the stored output") {
    val f = java.nio.file.Files.createTempFile("golden", ".txt")
    engine.execute(s"""sql edge format=table dest=file:$f $q""")
    val pass = engine.execute(
      s"""sql edge format=table test=true source=$f title=t1 $q""")
    assert(pass.contains("Test passed"))
    java.nio.file.Files.writeString(f, "something else")
    val fail = engine.execute(
      s"""sql edge format=table test=true source=$f title=t1 $q""")
    assert(fail.contains("Test failed"))
  }

  test("format=json:output renders a bare row array") {
    val out = engine.execute(s"""sql edge format=json:output $q""")
    assert(out.startsWith("[{") && out.endsWith("}]"))
  }
}

class WatchDirArchiveSpec extends SparkSpec {
  import graft.ingest.MappingPolicy
  import graft.streaming.StreamIngest

  test("consumed files are archived (the reference's watch->archive flow)") {
    val watch = java.nio.file.Files.createTempDirectory("watch2")
    val arch = java.nio.file.Files.createTempDirectory("arch").toString
    val out = java.nio.file.Files.createTempDirectory("out2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt2").toString
    java.nio.file.Files.writeString(watch.resolve("a.json"),
      """{"readings": [{"device": "d1", "value": 1.0}]}""")

    val policy = MappingPolicy.Policy("iot", "t", Some("readings"), Seq(
      MappingPolicy.ColumnSpec("device", "varchar", "[device]"),
      MappingPolicy.ColumnSpec("value", "float", "[value]")))
    val raw = spark.readStream.format("text")
      .option("cleanSource", "archive")
      .option("sourceArchiveDir", arch)
      .load(watch.toString)
    val (rows, _) = StreamIngest.pipeline(raw, policy)
    val q = rows.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // archiving happens at the NEXT batch planning; force another cycle
      java.nio.file.Files.writeString(watch.resolve("b.json"),
        """{"readings": [{"device": "d2", "value": 2.0}]}""")
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.read.parquet(out).count() === 2)
    // a.json moved out of the watch dir into the archive tree
    def findIn(dir: String): Seq[String] = {
      val b = Seq.newBuilder[String]
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).forEach(p =>
        if (p.toString.endsWith(".json")) b += p.getFileName.toString)
      b.result()
    }
    assert(findIn(arch).contains("a.json"))
    assert(!findIn(watch.toString).contains("a.json"))
  }
}

class EngineIntrospectionSpec extends SparkSpec {
  import graft.engine.{Catalog, Engine}
  private lazy val engine = {
    val cat = new Catalog(spark)
    cat.registerTable("events", s"$sfDir/events.parquet", nanoTs = Seq("ts"))
    new Engine(spark, cat)
  }

  test("explain sql returns the formatted plan") {
    val out = engine.execute(
      """explain sql edge "select event_type, count(*) as n from events """ +
        """group by event_type"""")
    assert(out.contains("HashAggregate"))
    assert(out.contains("Scan parquet"))
    // no standing artifact registered -> the base plan answers
    assert(out.startsWith("serving: base table scan"), out.linesIterator.next())
  }

  test("explain sql reports the serving source when a standing " +
      "artifact qualifies") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("explain")
    Seq(("a", 1L), ("b", 2L)).toDF("g", "k")
      .write.parquet(dir.resolve("t.parquet").toString)
    val cat = new graft.engine.Catalog(spark)
    cat.registerTable("t", dir.resolve("t.parquet").toString)
    val e = new graft.engine.Engine(spark, cat)
    val p = dir.resolve("mv").toString
    e.execute(s"matview create where table = t and path = $p " +
      s"""and spec = {"keys": ["g"], "aggs": [
        {"fn": "count", "alias": "n"}]}""")
    val served = e.execute(
      """explain sql edge "select g, count(*) as n from t group by g"""")
    assert(served.startsWith(s"serving: matview at $p"),
      served.linesIterator.next())
    // a query the matcher cannot prove falls back — and says so
    val base = e.execute(
      """explain sql edge "select g, k from t"""")
    assert(base.startsWith("serving: base table scan"),
      base.linesIterator.next())
  }

  test("get status reports catalog size") {
    val out = engine.execute("get status")
    assert(out.contains("tables: 1"))
    assert(out.contains("spark: "))
  }
}

class PartitionPruningSpec extends SparkSpec {
  import graft.engine.{Catalog, Engine, Tables, TimePartitions}

  test("time-range WHERE prunes partition directories through the Engine") {
    val dir = java.nio.file.Files.createTempDirectory("parq").toString
    val ev = Tables.load(spark, sfDir, "events")
    TimePartitions.write(ev, "ts", "day", 1, dir)

    val cat = new Catalog(spark)
    cat.registerPartitionedTable("events", dir, "ts", "day", 1)
    val engine = new Engine(spark, cat)

    val cmd = """sql edge "select count(*) as n, sum(value) as s from events """ +
      """where ts >= '2024-01-03' and ts < '2024-01-05'""""
    val df = engine.query(cmd)

    // the scan must carry non-empty PartitionFilters on __par
    val plan = df.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters"))
      .getOrElse(fail(s"no scan in plan:\n$plan"))
    assert(scanLine.contains("__par"),
      s"expected __par partition filter: $scanLine")
    assert(!scanLine.contains("PartitionFilters: []"))

    // and the result equals the unpartitioned computation
    val direct = ev.filter(col("ts") >= "2024-01-03" && col("ts") < "2024-01-05")
      .agg(count(lit(1)), sum(expr("cast(value as decimal(18,2))")).cast("double"))
      .head()
    val got = df.head()
    assert(got.getLong(0) === direct.getLong(0))
    assert(got.getDouble(1) === direct.getDouble(1))
  }

  test("a JOIN query's time-range WHERE still prunes the partitioned " +
      "side's directories (loadWithOptions injects per table)") {
    val dir = java.nio.file.Files.createTempDirectory("parq2").toString
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("ts"), col("user_id"), col("value"))
    TimePartitions.write(ev, "ts", "day", 1, dir)
    val cat = new Catalog(spark)
    cat.registerPartitionedTable("pev", dir, "ts", "day", 1)
    // a tiny dimension keyed by user_id
    val dimDir = java.nio.file.Files.createTempDirectory("parq2d")
      .resolve("dim.parquet").toString
    ev.select(col("user_id").as("uid")).distinct()
      .withColumn("grp", pmod(col("uid"), lit(3)))
      .write.parquet(dimDir)
    cat.registerTable("udim", dimDir)
    val engine = new Engine(spark, cat)
    val df = engine.query(
      """sql edge "select grp, count(*) as n from pev join udim """ +
        """on pev.user_id = udim.uid """ +
        """where ts >= '2024-01-03' and ts < '2024-01-05' """ +
        """group by grp order by grp"""")
    val plan = df.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(l =>
      l.contains("PartitionFilters") && l.contains("__par"))
    assert(scanLine.exists(!_.contains("PartitionFilters: []")),
      s"join query lost partition pruning:\n$plan")
    // correctness against the hand-written join
    val direct = ev
      .filter(col("ts") >= "2024-01-03" && col("ts") < "2024-01-05")
      .withColumn("grp", pmod(col("user_id"), lit(3)))
      .groupBy(col("grp")).agg(count(lit(1)).as("n"))
      .orderBy(col("grp"))
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      direct.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("TWO partitioned tables join through the dialect: the physical " +
      "__par layout column never collides (dropped as a system column, " +
      "pruning retained)") {
    val d1 = java.nio.file.Files.createTempDirectory("parq3a").toString
    val d2 = java.nio.file.Files.createTempDirectory("parq3b").toString
    val ev = Tables.load(spark, sfDir, "events")
    TimePartitions.write(ev.select(col("ts"), col("user_id"),
      col("value")), "ts", "day", 1, d1)
    TimePartitions.write(ev.select(col("ts").as("ts2"),
      col("user_id").as("uid2"), col("event_id")), "ts2", "day", 1, d2)
    val cat = new Catalog(spark)
    cat.registerPartitionedTable("pa", d1, "ts", "day", 1)
    cat.registerPartitionedTable("pb", d2, "ts2", "day", 1)
    val engine = new Engine(spark, cat)
    val df = engine.query(
      """sql edge "select count(*) as n from pa join pb """ +
        """on pa.user_id = pb.uid2 """ +
        """where ts >= '2024-01-03' and ts < '2024-01-04'"""")
    // runs (no __par name collision) and prunes the filtered side
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("PartitionFilters") &&
      l.contains("__par") && !l.contains("PartitionFilters: []")), plan)
    val direct = ev.filter(col("ts") >= "2024-01-03" &&
        col("ts") < "2024-01-04").select(col("user_id"))
      .join(ev.select(col("user_id").as("uid2")),
        col("user_id") === col("uid2")).count()
    assert(df.head().getLong(0) === direct)
  }

  test("bucketString mirrors bucketExpr for every unit") {
    val ev = Tables.load(spark, sfDir, "events").limit(200)
    for ((unit, n) <- Seq(("day", 1), ("day", 7), ("month", 1),
        ("hour", 1), ("year", 1))) {
      val mismatches = ev.select(col("ts"),
        TimePartitions.bucketExpr("ts", unit, n).as("expr_b"))
        .collect().count { r =>
          val t = r.getTimestamp(0).toLocalDateTime
          TimePartitions.bucketString(t, unit, n) != r.getString(1)
        }
      assert(mismatches === 0, s"unit=$unit n=$n")
    }
  }
}

class CommittedFilterSpec extends SparkSpec {
  import spark.implicits._
  import graft.engine.{Catalog, Engine}
  import graft.ingest.SystemColumns

  test("committed=true restricts to the replicated tsd_id watermark") {
    // two ingest batches: tsd_id 1 (replicated) and 2 (not yet)
    val dir = java.nio.file.Files.createTempDirectory("ha").toString
    val b1 = SystemColumns.stamp(
      Seq(("a", 1.0), ("b", 2.0)).toDF("device", "value"), "n01", 1)
    val b2 = SystemColumns.stamp(
      Seq(("c", 3.0)).toDF("device", "value"), "n01", 2)
    b1.unionByName(b2).write.mode("overwrite").parquet(dir)

    val cat = new Catalog(spark)
    cat.registerTable("sensor", dir)
    val engine = new Engine(spark, cat)
    engine.setSafeTsdId("sensor", 1)

    val all = engine.query("""sql edge "select count(*) as n from sensor"""")
    val committed = engine.query(
      """sql edge committed=true "select count(*) as n from sensor"""")
    assert(all.head().getLong(0) === 3)
    assert(committed.head().getLong(0) === 2)

    // nodes=main|all (member_cmd.py:150-153): main = the replicated
    // consensus the main operators hold (same boundary as committed,
    // dbms/ha.py:225 safe ids); all = everything this node holds —
    // and the two options compose without conflict
    val main = engine.query(
      """sql edge nodes=main "select count(*) as n from sensor"""")
    assert(main.head().getLong(0) === 2)
    val nodesAll = engine.query(
      """sql edge nodes=all "select count(*) as n from sensor"""")
    assert(nodesAll.head().getLong(0) === 3)
    val both = engine.query("""sql edge nodes=main committed=true """ +
      """"select count(*) as n from sensor"""")
    assert(both.head().getLong(0) === 2)
    val err = intercept[IllegalArgumentException] {
      engine.query(
        """sql edge nodes=some "select count(*) as n from sensor"""")
    }
    assert(err.getMessage.contains("main|all"), err.getMessage)
  }

  test("stamp adds the four system columns with the tsd lineage") {
    val out = SystemColumns.stamp(Seq(("x", 1.0)).toDF("d", "v"), "node1", 7)
    assert(out.columns.toSet ===
      Set("d", "v", "row_id", "insert_timestamp", "tsd_name", "tsd_id"))
    val r = out.head()
    assert(r.getAs[String]("tsd_name") === "nod") // CHAR(3) truncation
    assert(r.getAs[Int]("tsd_id") === 7)
  }
}

class HttpFrontendSpec extends SparkSpec {
  import graft.engine.{Catalog, Engine, HttpFrontend}

  test("GET ?command= executes through the engine") {
    val cat = new Catalog(spark)
    cat.registerTable("events", s"$sfDir/events.parquet", nanoTs = Seq("ts"))
    val fe = new HttpFrontend(new Engine(spark, cat))
    val port = fe.start()
    try {
      val cmd = java.net.URLEncoder.encode(
        """sql edge format=json "select event_type, count(*) as n """ +
          """from events group by event_type order by event_type"""", "UTF-8")
      val client = java.net.http.HttpClient.newHttpClient()
      val resp = client.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://localhost:$port/?command=$cmd")).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() === 200)
      assert(resp.body().contains("\"Query\": ["))

      // command HEADER form (the reference's canonical REST shape)
      val viaHeader = client.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://localhost:$port/"))
          .header("command", "get tables").build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(viaHeader.body() === "events")

      // POST body form + error path
      val post = client.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://localhost:$port/"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString("get tables"))
          .build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(post.body() === "events")
      val bad = client.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://localhost:$port/?command=nonsense")).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(bad.statusCode() === 400)
    } finally fe.stop()
  }

  test("request bodies are BOUNDED: an oversized POST command answers " +
      "413 without buffering the body, and normal traffic still flows") {
    val fe = new HttpFrontend(new Engine(spark, new Catalog(spark)))
    val port = fe.start()
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      // 2 MB command body vs the 1 MB cap: refused with 413, not OOM
      val big = new String(Array.fill(2 << 20)('x'))
      val over = client.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://localhost:$port/"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(big))
          .build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(over.statusCode() === 413, over.body())
      assert(over.body().contains("exceeds"))
      // the server is still healthy afterward
      val ok = client.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://localhost:$port/"))
          .header("command", "get tables").build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(ok.statusCode() === 200)
    } finally fe.stop()
  }
}

class BlockchainCmdSpec extends SparkSpec {
  import graft.engine.{Catalog, Engine}

  test("insert / get / bring over typed policies") {
    val engine = new Engine(spark, new Catalog(spark))
    engine.execute("""blockchain insert where policy = """ +
      """{"operator": {"id": "op1", "dbms": "edge", "ip": "10.0.0.1", "port": 32148}}""")
    engine.execute("""blockchain insert where policy = """ +
      """{"operator": {"id": "op2", "dbms": "other", "ip": "10.0.0.2", "port": 32149}}""")
    engine.execute("""blockchain insert where policy = """ +
      """{"cluster": {"id": "cl1", "company": "acme"}}""")

    val all = engine.execute("blockchain get operator")
    assert(all.contains("op1") && all.contains("op2") && !all.contains("cl1"))

    val filtered = engine.execute("blockchain get operator where dbms = edge")
    assert(filtered.contains("op1") && !filtered.contains("op2"))

    // the reference's canonical bring example (member_cmd.py:884)
    val brought = engine.execute(
      """blockchain get operator bring [operator][ip] ":" [operator][port] separator = ","""")
    assert(brought === "10.0.0.1:32148,10.0.0.2:32149")

    val star = engine.execute("blockchain get *")
    assert(star.contains("cl1") && star.contains("op1"))

    // bring paths resolve strictly: a wrong head segment yields empty,
    // NOT a re-rooted lookup at the policy body ([bogus][ip] must not
    // silently act like [ip])
    val bogus = engine.execute(
      """blockchain get operator where id = op1 bring [bogus][ip]""")
    assert(bogus === "")
    // 3-segment path through nested structure resolves end-to-end
    engine.execute("""blockchain insert where policy = """ +
      """{"config": {"id": "c1", "net": {"addr": {"host": "h9"}}}}""")
    val deep = engine.execute(
      """blockchain get config bring [config][net][addr]""")
    assert(deep.contains("h9"))
    val deep4 = engine.execute(
      """blockchain get config bring [net][addr][host]""")
    assert(deep4 === "h9")
    // body-rooted single segment still works
    val body1 = engine.execute(
      """blockchain get operator where id = op1 bring [ip]""")
    assert(body1 === "10.0.0.1")
  }
}

class AdmissionControlSpec extends SparkSpec {
  import graft.engine.{Catalog, Engine}

  private def engine() = {
    val cat = new Catalog(spark)
    cat.registerTable("events", s"$sfDir/events.parquet", nanoTs = Seq("ts"))
    new Engine(spark, cat)
  }

  test("max_time within budget returns normally") {
    val out = engine().execute(
      """sql edge max_time=60 "select count(*) as n from events"""")
    assert(out.contains("\"n\""))
  }

  test("max_volume caps the reply size") {
    val e = intercept[IllegalStateException](engine().execute(
      """sql edge max_volume=64 "select * from events""""))
    assert(e.getMessage.contains("max_volume"))
  }

  test("get queries time histogram + query log profile (job_instance parity)") {
    val cat = new Catalog(spark)
    cat.registerTable("events", s"$sfDir/events.parquet", nanoTs = Seq("ts"))
    val e = new Engine(spark, cat)
    // empty monitor: zero total
    assert(e.execute("get queries time").contains("Total queries: 0"))
    e.execute("""sql edge "select count(*) as n from events"""")
    e.execute("""sql edge "select count(*) as n from events"""")
    val rep = e.execute("get queries time")
    assert(rep.contains("Total queries: 2"))
    assert(rep.contains("Up to  1 sec.:"))
    val js = e.execute("get queries time where format = json")
    assert(js.contains("\"Queries Statistics\""))
    assert(js.contains("\"Total queries\":\"2\""))
    // log off by default; `on` logs everything (threshold 0)
    assert(e.execute("get query log") === "query log is off")
    assert(e.execute("set query log on") === "query log on")
    e.execute("""sql edge "select count(*) as n from events"""")
    assert(e.execute("get query log").contains("select count(*)"))
    // profile N seconds: fast queries drop below the threshold
    assert(e.execute("reset query log") === "query log reset")
    e.execute("set query log profile 10 seconds")
    e.execute("""sql edge "select count(*) as n from events"""")
    assert(e.execute("get query log") === "query log is empty")
    // reset clears the histogram
    e.execute("reset queries time")
    assert(e.execute("get queries time").contains("Total queries: 0"))
  }

  test("event log records commands; error log records failures") {
    val cat = new Catalog(spark)
    cat.registerTable("events", s"$sfDir/events.parquet", nanoTs = Seq("ts"))
    val e = new Engine(spark, cat)
    assert(e.execute("get event log") === "log is empty")
    e.execute("""sql edge "select count(*) as n from events"""")
    val ev = e.execute("get event log")
    assert(ev.contains("select count(*)"))
    assert(e.execute("get error log") === "log is empty")
    intercept[Exception](e.execute("sql edge \"select * from no_such\""))
    val er = e.execute("get error log")
    assert(er.contains("no_such") && er.contains("->"))
    assert(e.execute("reset error log") === "error log reset")
    assert(e.execute("get error log") === "log is empty")
    assert(e.execute("reset event log") === "event log reset")
  }

  test("get streaming lists active named queries with batch progress") {
    val cat = new Catalog(spark)
    val e = new Engine(spark, cat)
    assert(e.execute("get streaming") === "no active streaming queries")
    val out = java.nio.file.Files.createTempDirectory("gs").toString
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", "5").load()
      .writeStream.queryName("rate_ingest").format("noop")
      .option("checkpointLocation", s"$out/ckpt").start()
    try {
      q.processAllAvailable()
      val rep = e.execute("get streaming")
      assert(rep.contains("rate_ingest"))
      assert(rep.contains("active=true"))
    } finally { q.stop(); q.awaitTermination() }
    assert(e.execute("get streaming") === "no active streaming queries")
  }

  test("the 10 MB reply cap applies by DEFAULT (query_mode parity)") {
    val cat = new Catalog(spark)
    cat.registerTable("events", s"$sfDir/events.parquet", nanoTs = Seq("ts"))
    // shrink the default so the spec doesn't need a 10 MB result
    val tiny = new Engine(spark, cat, defaultMaxVolume = 64)
    val e = intercept[IllegalStateException](tiny.execute(
      """sql edge "select * from events""""))
    assert(e.getMessage.contains("max_volume"))
    // explicit option overrides the default upward
    val out = tiny.execute(
      """sql edge max_volume=100000000 "select count(*) as n from events"""")
    assert(out.contains("\"n\""))
    // the default is a REPLY cap: a dest=file EXPORT larger than the
    // default must still succeed (an explicit max_volume would bind)
    val f = java.nio.file.Files.createTempFile("cap", ".json")
    val r = tiny.execute(
      s"""sql edge dest=file:$f "select * from events limit 50"""")
    assert(r.contains("written to"))
    assert(java.nio.file.Files.size(f) > 64)
    // explicit max_volume binds even for exports
    val e2 = intercept[IllegalStateException](tiny.execute(
      s"""sql edge max_volume=64 dest=file:$f "select * from events""""))
    assert(e2.getMessage.contains("max_volume"))
    // an UNRECOGNIZED dest value falls through to the reply path and
    // must stay capped (a typo'd dest must not bypass the default cap)
    val e3 = intercept[IllegalStateException](tiny.execute(
      """sql edge dest=files:/tmp/x "select * from events""""))
    assert(e3.getMessage.contains("max_volume"))
  }
}

class ExtendVarsSpec extends SparkSpec {
  import graft.engine.{Catalog, Engine}

  test("extend !var.type / @ip / @port with aliases stamp result columns") {
    val cat = new Catalog(spark)
    cat.registerTable("events", s"$sfDir/events.parquet", nanoTs = Seq("ts"))
    val engine = new Engine(spark, cat)
    engine.nodeAddress = ("10.0.0.7", 32048)
    engine.execute("set disk_space = 512")
    assert(engine.execute("get dictionary").contains("disk_space = 512"))
    val df = engine.query(
      """sql edge extend=(@ip, @port.int, !disk_space.int as space, +prod) """ +
        """"select ip, port, space, prod, count(*) as n from events """ +
        """group by ip, port, space, prod"""")
    val r = df.head()
    assert(r.getAs[String]("ip") === "10.0.0.7")
    assert(r.getAs[Long]("port") === 32048L)
    assert(r.getAs[Long]("space") === 512L)
    assert(r.getAs[String]("prod") === "prod")
    assert(r.getAs[Long]("n") > 0)
  }

  test("undefined !var is an error") {
    val cat = new Catalog(spark)
    cat.registerTable("events", s"$sfDir/events.parquet", nanoTs = Seq("ts"))
    val engine = new Engine(spark, cat)
    val e = intercept[IllegalArgumentException](engine.query(
      """sql edge extend=(!nope.int) "select count(*) as n from events""""))
    assert(e.getMessage.contains("undefined variable"))
  }
}

class KafkaDestSpec extends SparkSpec {
  import graft.engine.{Catalog, Engine}

  test("dest=kafka@host routes rendered output through the transport") {
    val cat = new Catalog(spark)
    cat.registerTable("events", s"$sfDir/events.parquet", nanoTs = Seq("ts"))
    val engine = new Engine(spark, cat)
    val sent = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    engine.kafkaTransport = (s, t, p) => sent += ((s, t, p))
    val reply = engine.execute(
      """sql edge dest=kafka@broker:9092 topic=alerts format=json:list """ +
        """"select event_type, count(*) as n from events group by event_type """ +
        """order by event_type"""")
    assert(reply === "sent to kafka@broker:9092 topic=alerts")
    assert(sent.length === 1)
    val (servers, topic, payload) = sent.head
    assert(servers === "broker:9092" && topic === "alerts")
    assert(payload.contains("\"event_type\""))
  }

  test("dest=buffer assigns output to a dictionary variable") {
    val cat = new Catalog(spark)
    cat.registerTable("events", s"$sfDir/events.parquet", nanoTs = Seq("ts"))
    val engine = new Engine(spark, cat)
    val reply = engine.execute(
      """sql edge dest=buffer output_key=evcount format=json:list """ +
        """"select count(*) as n from events"""")
    assert(reply === "assigned to !evcount")
    assert(engine.execute("get dictionary").contains("evcount"))
  }

  test("kafka dest to an unreachable broker fails loudly (the default " +
      "transport is now the NATIVE wire-protocol producer)") {
    val cat = new Catalog(spark)
    cat.registerTable("events", s"$sfDir/events.parquet", nanoTs = Seq("ts"))
    val engine = new Engine(spark, cat)
    // unresolvable host: the native producer's connect raises — the
    // reply is never a silent "sent"
    intercept[java.io.IOException](engine.execute(
      """sql edge dest=kafka@graft-no-such-host:9092 """ +
        """"select count(*) as n from events""""))
  }
}

class PutIngestSpec extends SparkSpec {
  import graft.engine.{Catalog, Engine, HttpFrontend}
  import org.apache.spark.sql.functions._

  test("REST PUT appends JSON rows readable via a sql command") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("put-ingest").toString
    Seq(("dev1", 10.0, "2024-01-01 00:00:00"))
      .toDF("device", "value", "ts_str")
      .write.mode("overwrite").parquet(s"$dir/sensor")
    val cat = new Catalog(spark)
    cat.registerTable("sensor", s"$dir/sensor")
    val engine = new Engine(spark, cat)
    val fe = new HttpFrontend(engine)
    val port = fe.start()
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      // NDJSON body; 'extra' is dropped, missing 'ts_str' -> NULL
      val body =
        """{"device": "dev2", "value": 20.5, "ts_str": "2024-01-02 00:00:00", "extra": 1}
          |{"device": "dev3", "value": 31.5}""".stripMargin
      val resp = client.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://localhost:$port/"))
          .header("table", "sensor").header("dbms", "edge")
          .PUT(java.net.http.HttpRequest.BodyPublishers.ofString(body))
          .build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() === 200)
      assert(resp.body().contains("\"appended\": 2"))

      val n = engine.query(
        """sql edge "select count(*) as n from sensor"""").head().getLong(0)
      assert(n === 3)
      val vals = engine.query(
        """sql edge "select device, value from sensor order by device"""")
        .collect().map(r => (r.getString(0), r.getDouble(1)))
      assert(vals === Array(("dev1", 10.0), ("dev2", 20.5), ("dev3", 31.5)))

      // array body form + missing table header -> 400
      val arr = client.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://localhost:$port/"))
          .header("table", "sensor")
          .PUT(java.net.http.HttpRequest.BodyPublishers.ofString(
            """[{"device": "dev4", "value": 4.0}, {"device": "dev5", "value": 5.0}]"""))
          .build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(arr.body().contains("\"appended\": 2"))
      val bad = client.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://localhost:$port/"))
          .PUT(java.net.http.HttpRequest.BodyPublishers.ofString("{}"))
          .build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(bad.statusCode() === 400)
    } finally fe.stop()
  }

  test("PUT auto-creates unknown tables from the data when a data dir is set") {
    val dir = java.nio.file.Files.createTempDirectory("put-auto").toString
    val cat = new Catalog(spark)
    val engine = new Engine(spark, cat)
    engine.dataDir = Some(dir)
    val n = engine.ingest("fresh_t",
      """{"device": "d1", "reading": 2.25, "ok": true}
        |{"device": "d2", "reading": 3.5, "ok": false}""".stripMargin)
    assert(n === 2)
    // inferred user columns + the four system columns, tsd lineage stamped
    val df = engine.query("""sql edge "select * from fresh_t"""")
    assert(df.columns.toSet.contains("tsd_id"))
    assert(df.count() === 2)
    val r = engine.query(
      """sql edge "select device, reading from fresh_t where ok = true"""")
      .head()
    assert(r.getString(0) === "d1" && r.getDouble(1) === 2.25)
    assert(engine.tsdLedger.maxId("fresh_t") === 1)
  }

  test("PUT into a time-partitioned table lands in the right bucket") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("put-par").toString
    Seq(("2024-01-01 10:00:00", 1.0), ("2024-01-02 11:00:00", 2.0))
      .toDF("ts_str", "value")
      .withColumn("ts", to_timestamp(col("ts_str"))).drop("ts_str")
      .createOrReplaceTempView("seed_par")
    graft.engine.TimePartitions.write(
      spark.table("seed_par"), "ts", "day", 1, s"$dir/pt")
    val cat = new Catalog(spark)
    cat.registerPartitionedTable("pt", s"$dir/pt", "ts", "day", 1)
    val engine = new Engine(spark, cat)
    val n = engine.ingest("pt",
      """{"ts": "2024-01-03 09:30:00", "value": 3.5}""")
    assert(n === 1)
    // new bucket directory exists and pruned queries see the new row
    val parts = graft.engine.TimePartitions.partitions(spark, s"$dir/pt")
    assert(parts.contains("2024-01-03"))
    val got = engine.query(
      """sql edge "select value from pt where ts >= '2024-01-03' """ +
        """and ts < '2024-01-04'"""").head()
    assert(got.getDouble(0) === 3.5)
  }

  test("duplicate PUT payloads are refused via the tsd ledger hash index") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("put-dup").toString
    Seq(("d0", 1.0)).toDF("device", "value")
      .write.mode("overwrite").parquet(s"$dir/m")
    val cat = new Catalog(spark)
    cat.registerTable("m", s"$dir/m")
    val engine = new Engine(spark, cat)
    val body = """{"device": "d1", "value": 2.0}"""
    assert(engine.ingest("m", body) === 1)
    assert(engine.ingest("m", body) === 0) // same payload hash -> no-op
    assert(engine.query("""sql edge "select count(*) as n from m"""")
      .head().getLong(0) === 2)
    val ledger = engine.execute("get tsd list m")
    assert(ledger.contains("rest_put") && ledger.contains("m"))
    assert(engine.tsdLedger.maxId("m") === 1)
  }

  test("get tsd diff plans the pull/push set against a peer ledger") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tsd-diff").toString
    Seq(("d0", 1.0)).toDF("device", "value")
      .write.mode("overwrite").parquet(s"$dir/m")
    val cat = new Catalog(spark)
    cat.registerTable("m", s"$dir/m")
    val engine = new Engine(spark, cat)
    engine.ingest("m", """{"device": "d1", "value": 2.0}""") // shared
    engine.ingest("m", """{"device": "d2", "value": 3.0}""") // local-only
    // peer ledger: the shared batch plus one batch this node lacks
    val localLedger = engine.tsdLedger.df(spark)
    val sharedHash = localLedger.orderBy("file_id")
      .head().getAs[String]("file_hash")
    localLedger.filter(col("file_hash") === sharedHash)
      .unionByName(localLedger.limit(1)
        .withColumn("file_hash", lit("peerhash123"))
        .withColumn("source", lit("peer_put")))
      .write.mode("overwrite").parquet(s"$dir/peer_ledger")
    val out = engine.execute(s"get tsd diff where peer = $dir/peer_ledger")
    // pull the peer-only batch, push the local-only one, shared absent
    assert(out.contains("pull") && out.contains("peerhash123"))
    assert(out.contains("push"))
    assert(!out.contains(sharedHash))
    intercept[IllegalArgumentException](engine.execute("get tsd diff"))
  }

  test("PUT with instructions routes rows through the mapping policy") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("put-policy").toString
    Seq(("dev0", 1.0)).toDF("device", "reading")
      .write.mode("overwrite").parquet(s"$dir/mapped")
    val cat = new Catalog(spark)
    cat.registerTable("mapped", s"$dir/mapped")
    cat.addPolicy("m1", """
      {"mapping": {"dbms": "edge", "table": "mapped", "schema": {
        "device": {"type": "varchar", "bring": "[meta][id]"},
        "reading": {"type": "float", "bring": "[val]"}}}}""")
    val engine = new Engine(spark, cat)
    val n = engine.ingest("mapped",
      """{"meta": {"id": "devX"}, "val": 7.25}""", Some("m1"))
    assert(n === 1)
    val got = engine.query(
      """sql edge "select device, reading from mapped where device = 'devX'"""")
      .head()
    assert(got.getString(0) === "devX")
    assert(got.getDouble(1) === 7.25)

    // a JSON ARRAY body through the policy maps one row per ELEMENT
    val n2 = engine.ingest("mapped",
      """[{"meta": {"id": "devY"}, "val": 1.5},
        | {"meta": {"id": "devZ"}, "val": 2.5}]""".stripMargin, Some("m1"))
    assert(n2 === 2)
    val ys = engine.query(
      """sql edge "select device, reading from mapped """ +
        """where device in ('devY', 'devZ') order by device"""").collect()
    assert(ys.map(_.getString(0)).toSeq === Seq("devY", "devZ"))
    assert(ys.map(_.getDouble(1)).toSeq === Seq(1.5, 2.5))

    // a pretty-printed single object spanning lines is ONE row
    val n3 = engine.ingest("mapped",
      "{\n  \"meta\": {\"id\": \"devP\"},\n  \"val\": 9.75\n}", Some("m1"))
    assert(n3 === 1)

    // an unknown policy id is an error, never silent misalignment
    val err = intercept[IllegalArgumentException](
      engine.ingest("mapped", """{"val": 1}""", Some("no-such-policy")))
    assert(err.getMessage.contains("unknown mapping policy"))
  }
}

class QualifiedTableNameSpec extends SparkSpec {
  import graft.dialect.EdgeSql
  import graft.engine.Tables

  test("dbms-qualified table names resolve to the bare table") {
    def load(n: String) = Tables.load(spark, sfDir, n)
    val df = EdgeSql.query(spark, load,
      """sql edge "select count(*) as n from edge.events"""")
    assert(df.head().getLong(0) > 0)
  }
}

class GrafanaHttpSpec extends SparkSpec {
  import graft.engine.{Catalog, Engine, HttpFrontend}

  test("POST /grafana serves the datasource payload") {
    val cat = new Catalog(spark)
    cat.registerTable("events", s"$sfDir/events.parquet", nanoTs = Seq("ts"))
    val fe = new HttpFrontend(new Engine(spark, cat))
    val port = fe.start()
    try {
      val payload = """
        {"range": {"from": "2024-01-02T00:00:00.000Z", "to": "2024-01-05T00:00:00.000Z"},
         "maxDataPoints": 20,
         "targets": [{"target": "events",
           "payload": {"dbms": "edge", "type": "increments",
                       "time_column": "ts", "value_column": "value"}}]}"""
      val client = java.net.http.HttpClient.newHttpClient()
      val resp = client.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://localhost:$port/grafana"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(payload))
          .build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() === 200)
      assert(resp.body().contains("avg_value"))
    } finally fe.stop()
  }
}

/** HA peer-sync loop end to end (the reference's dbms/ha.py:19-35 flow,
  * assembled from the two halves that already exist: `get tsd diff`
  * renders the pull/push DECISION from exchanged ledgers, and REST PUT
  * is the file TRANSPORT): two engines ingest overlapping payload sets,
  * exchange ledger exports, execute the plan against each other's
  * HttpFrontend, and converge — identical file_hash sets, the diff
  * empty in both directions, and the committed watermark advanced to
  * the new consensus. No protocol code beyond what ships; the spec IS
  * the sync driver, as the reference's is a scheduled task. */
class TsdSyncE2ESpec extends SparkSpec {
  import graft.engine.{Catalog, Engine, HttpFrontend}
  import graft.ingest.TsdLedger
  import org.apache.spark.sql.functions._

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def put(port: Int, table: String, body: String): Int = {
    val client = java.net.http.HttpClient.newHttpClient()
    client.send(
      java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"http://localhost:$port/"))
        .header("table", table)
        .PUT(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build(),
      java.net.http.HttpResponse.BodyHandlers.ofString()).statusCode()
  }

  test("two nodes execute the tsd-diff plan over REST PUT and converge") {
    val root = java.nio.file.Files.createTempDirectory("tsdsync")
    def node(name: String) = {
      val engine = new Engine(spark, new Catalog(spark))
      engine.dataDir = Some(root.resolve(name).toString)
      val fe = new HttpFrontend(engine)
      (engine, fe, fe.start())
    }
    val (engA, feA, portA) = node("a")
    val (engB, feB, portB) = node("b")
    try {
      // each node keeps the ingested source files, hash-addressed — the
      // reference's archive dir, which ha.py copies between peers
      val archive = scala.collection.mutable.Map[String, String]()
      val p1 = """{"device": "d1", "value": 1.0}
                 |{"device": "d2", "value": 2.0}""".stripMargin
      val p2 = """{"device": "d3", "value": 3.0}"""
      val p3 = """{"device": "d4", "value": 4.0}"""
      val p4 = """{"device": "d5", "value": 5.0}"""
      Seq(p1, p2, p3, p4).foreach(p => archive(md5(p.trim)) = p)
      Seq(p1, p2, p3).foreach(p => assert(put(portA, "t", p) === 200))
      Seq(p1, p4).foreach(p => assert(put(portB, "t", p) === 200))

      // exchange ledgers (the fetched form `get tsd diff` consumes)
      val exportA = s"$root/ledger_a.parquet"
      engA.tsdLedger.df(spark).write.mode("overwrite").parquet(exportA)

      // the command surface renders the same plan the loop executes
      val rendered = engB.execute(s"get tsd diff where peer = $exportA")
      assert(rendered.contains("pull") && rendered.contains("push"))

      val plan = TsdLedger.diff(engB.tsdLedger.df(spark),
        spark.read.parquet(exportA)).collect()
      val pulls = plan.filter(_.getString(0) == "pull")
      val pushes = plan.filter(_.getString(0) == "push")
      assert(pulls.map(_.getString(3)).toSet ===
        Set(md5(p2.trim), md5(p3.trim))) // B lacks p2, p3
      assert(pushes.map(_.getString(3)).toSet === Set(md5(p4.trim)))

      // execute the plan: pull rows PUT to THIS node, push rows PUT to
      // the peer — the archived source bytes move verbatim, so the
      // idempotent content hash converges
      pulls.foreach(r =>
        assert(put(portB, r.getString(1), archive(r.getString(3))) === 200))
      pushes.foreach(r =>
        assert(put(portA, r.getString(1), archive(r.getString(3))) === 200))

      // convergence: same hash set, empty diff in both directions
      val hashesA = engA.tsdLedger.list(None).map(_.fileHash).toSet
      val hashesB = engB.tsdLedger.list(None).map(_.fileHash).toSet
      assert(hashesA === hashesB && hashesA.size === 4)
      assert(TsdLedger.diff(engB.tsdLedger.df(spark),
        engA.tsdLedger.df(spark)).isEmpty)
      // a re-delivered file is refused by the hash index (idempotent)
      val before = engB.tsdLedger.list(None).size
      assert(put(portB, "t", p2) === 200)
      assert(engB.tsdLedger.list(None).size === before)

      // both hold all 5 rows; the committed watermark advances to the
      // new consensus (min over peers' max tsd_id — ha.py:225) and
      // committed=true now sees every replicated row
      val safe = math.min(engA.tsdLedger.maxId("t"), engB.tsdLedger.maxId("t"))
      assert(safe === 4) // was min(3, 2) = 2 before the sync
      for (e <- Seq(engA, engB)) {
        e.setSafeTsdId("t", safe)
        assert(e.query("""sql edge "select count(*) as n from t"""")
          .head().getLong(0) === 5)
        assert(e.query(
          """sql edge committed=true "select count(*) as n from t"""")
          .head().getLong(0) === 5)
      }
    } finally { feA.stop(); feB.stop() }
  }
}
