package graft

import org.apache.spark.sql.functions._

/** Concurrent-engine soak — the reference schedules up to 500 parallel
  * jobs against one node (job/job_scheduler.py:14); this drives one
  * Engine with parallel writers, readers and a retention/chaos thread
  * and then demands the FULL trust loop: every standing artifact
  * verifies row-exact against a rebuild. Exercises the thread-safety
  * contract documented on [[graft.engine.Engine]]: writers serialize
  * on the engine write lock, queries never block on writers, and
  * command-surface reads are retention-safe (the physical delete
  * drains them through the fair read gate — only the lazy `query()`
  * surface keeps the retry-on-file-not-found contract). */
class ConcurrencySoakSpec extends SparkSpec {
  import spark.implicits._

  test("soak: concurrent PUT writers + query threads + sync/retention " +
      "chaos end with every artifact VERIFIED exact and no unexplained " +
      "failures") {
    val dir = java.nio.file.Files.createTempDirectory("soak")
    // day-partitioned fact side `sl` (seeded so the partition layout
    // and lineage exist before the threads start)
    val slPath = dir.resolve("sl").toString
    val seed = Seq((1000L, "2024-01-01 01:00:00", "g0", 5L, "alpha beta"))
      .toDF("id", "ts_s", "g", "v", "text")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("tsd_id", lit(0))
    graft.engine.TimePartitions.write(seed, "ts", "day", 1, slPath)
    val cat = new graft.engine.Catalog(spark)
    cat.registerPartitionedTable("sl", slPath, "ts", "day", 1)
    val engine = new graft.engine.Engine(spark, cat)
    engine.dataDir = Some(dir.resolve("data").toString)
    // dimension side `sr` auto-created by its first PUT
    engine.ingest("sr", """{"rk": 1000, "w": 10}""")

    // the artifact fleet under stress: matview + rollup + tindex on
    // the partitioned side, a join matview across both sides
    val mv = dir.resolve("mv").toString
    engine.execute(s"matview create where table = sl and path = $mv " +
      s"""and spec = {"keys": ["g"], "aggs": [
        {"fn": "count", "alias": "n"},
        {"fn": "sum", "expr": "v", "alias": "sv"}]}""")
    val ru = dir.resolve("ru").toString
    engine.execute(s"rollup create where table = sl and path = $ru " +
      "and time = ts and value = v and grain = day")
    val tx = dir.resolve("tx").toString
    engine.execute(s"tindex create where table = sl and path = $tx " +
      "and id = id and text = text")
    val jm = dir.resolve("jm").toString
    engine.execute(s"join matview create where path = $jm " +
      s"""and spec = {"left": "sl", "right": "sr",
        "on": [["id", "rk"]], "keys": ["g"], "aggs": [
        {"fn": "count", "alias": "n"},
        {"fn": "sum", "expr": "w", "alias": "sw"}]}""")

    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val retriedReads = new java.util.concurrent.atomic.AtomicInteger
    val nextId = new java.util.concurrent.atomic.AtomicLong(1L)
    def isRetentionRace(e: Throwable): Boolean = {
      // the documented read-vs-retention race: a physical partition
      // delete under a planned scan (no snapshot isolation)
      def chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      chain.exists(c => c.isInstanceOf[java.io.FileNotFoundException] ||
        Option(c.getMessage).exists(m =>
          m.contains("FileNotFound") || m.contains("does not exist")))
    }
    def thread(name: String)(body: => Unit): Thread = {
      val t = new Thread(() =>
        try body catch { case e: Throwable => errors.add(e) }, name)
      t.start(); t
    }

    val writersL = (0 until 2).map(w => thread(s"putL$w") {
      for (i <- 0 until 6) {
        val id = nextId.incrementAndGet()
        val day = 1 + ((w * 6 + i) % 5)
        val n = engine.ingest("sl",
          s"""{"id": $id, "ts": "2024-01-0$day 0$i:0$w:00", """ +
            s""""g": "g${id % 3}", "v": ${id % 7}, """ +
            s""""text": "w${id % 5} w${id % 11} common"}""")
        assert(n === 1L, s"writer L$w PUT $i acked $n rows")
      }
    })
    val writersR = (0 until 2).map(w => thread(s"putR$w") {
      for (i <- 0 until 6) {
        val id = nextId.incrementAndGet()
        val n = engine.ingest("sr", s"""{"rk": $id, "w": ${id % 13}}""")
        assert(n === 1L, s"writer R$w PUT $i acked $n rows")
      }
    })
    // command-surface readers: execute() holds the retention read
    // gate, so these must NEVER see a file-not-found from the chaos
    // thread's drop partition — any throw here fails the soak (the
    // isRetentionRace escape hatch is deliberately NOT applied)
    val strictReaders = (0 until 2).map(r => thread(s"exec$r") {
      for (_ <- 0 until 12) {
        val out =
          if (r == 0) engine.execute(
            """sql edge "select g, count(*) as n from sl group by g"""")
          else engine.execute(
            """sql edge format=table "select count(*) as n from sr"""")
        assert(out.nonEmpty)
      }
    })
    val readers = (0 until 3).map(r => thread(s"read$r") {
      for (i <- 0 until 12) {
        try {
          val df = r % 3 match {
            case 0 => engine.query(
              """sql edge "select g, count(*) as n from sl group by g"""")
            case 1 => engine.query(
              """sql edge committed=true "select count(*) as n from sl"""")
            case _ => engine.query(
              """sql edge "select count(*) as n from sr"""")
          }
          assert(df.collect().nonEmpty)
        } catch {
          case e: Throwable if isRetentionRace(e) =>
            retriedReads.incrementAndGet() // documented: retry
          case e: Throwable => throw e
        }
      }
    })
    val chaos = thread("chaos") {
      for (i <- 0 until 6) {
        i % 3 match {
          case 0 => engine.execute(
            s"set view auto refresh = ${if (i % 2 == 0) "off" else "on"}")
          case 1 =>
            engine.execute("sync all where table = sl")
            engine.execute("sync all where table = sr")
          case _ =>
            val parts = graft.engine.TimePartitions
              .partitions(spark, slPath)
            if (parts.length > 2) {
              val horizon = parts(1)
              try engine.execute(s"drop partition sl before $horizon")
              catch { case _: Exception =>
                engine.execute("sync all where table = sl")
                engine.execute(s"drop partition sl before $horizon")
              }
            }
        }
        Thread.sleep(50)
      }
    }

    (writersL ++ writersR ++ strictReaders ++ readers :+ chaos)
      .foreach(_.join(300000))
    assert(errors.isEmpty, "soak thread failures:\n" +
      errors.toArray.map {
        case e: Throwable =>
          s"${e.getClass.getName}: ${e.getMessage}"
      }.mkString("\n"))

    // quiesce: folds on, reconcile everything, then the trust loop —
    // syncAll reports per-artifact failures as FAILED lines instead of
    // throwing, so assert the receipts are clean (a swallowed refusal
    // here is exactly how the pre-fix lineage bugs hid)
    engine.execute("set view auto refresh = on")
    val s1 = engine.execute("sync all where table = sl")
    val s2 = engine.execute("sync all where table = sr")
    assert(!s1.contains("FAILED") && !s2.contains("FAILED"),
      s"final sync must fully reconcile:\n$s1\n$s2")
    val audit = engine.execute("artifact verify where table = sl")
    assert(audit.linesIterator.count(_.contains("VERIFIED exact")) === 4,
      audit)
    assert(!audit.contains("DIVERGED"), audit)
    // ledger sanity: every acked PUT holds a distinct tsd id — no two
    // writers ever shared a reservation
    val ids = engine.execute("get tsd list").linesIterator.size
    assert(ids > 0)
    info(s"soak complete: ${retriedReads.get()} retention-race reads " +
      "retried (documented contract)")
  }

  test("operational-loop soak: live scheduler wakes firing sync + ha " +
      "sync, a kafka consumer + streamer landing batches, PUT writers " +
      "and retention drops all run concurrently; every standing " +
      "artifact ends VERIFIED exact and the peers converge") {
    val dir = java.nio.file.Files.createTempDirectory("opsoak")
    // ---- node A: partitioned fact table + artifact fleet -------------
    val slPath = dir.resolve("sl").toString
    val seed = Seq((1000L, "2024-01-01 01:00:00", "g0", 5L))
      .toDF("id", "ts_s", "g", "v")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("tsd_id", lit(0))
    graft.engine.TimePartitions.write(seed, "ts", "day", 1, slPath)
    val catA = new graft.engine.Catalog(spark)
    catA.registerPartitionedTable("sl", slPath, "ts", "day", 1)
    val engA = new graft.engine.Engine(spark, catA)
    engA.dataDir = Some(dir.resolve("a").toString)
    val mv = dir.resolve("mv").toString
    engA.execute(s"matview create where table = sl and path = $mv " +
      s"""and spec = {"keys": ["g"], "aggs": [
        {"fn": "count", "alias": "n"},
        {"fn": "sum", "expr": "v", "alias": "sv"}]}""")
    val ru = dir.resolve("ru").toString
    engA.execute(s"rollup create where table = sl and path = $ru " +
      "and time = ts and value = v and grain = day")
    // ---- node B: the HA peer --------------------------------------
    val engB = new graft.engine.Engine(spark,
      new graft.engine.Catalog(spark))
    engB.dataDir = Some(dir.resolve("b").toString)
    val feB = new graft.engine.HttpFrontend(engB)
    val portB = feB.start()
    // ---- kafka chain: broker -> consumer -> watch dir -> streamer --
    val broker = new graft.streaming.KafkaMiniBroker()
    val kport = broker.start()
    val producer = new graft.streaming.KafkaNativeClient("localhost", kport)
    val land = dir.resolve("land")
    engA.execute("""policy add sp {"mapping": {
      "dbms": "edge", "table": "kt",
      "schema": {
        "device": {"type": "varchar", "bring": "[device]"},
        "value": {"type": "float", "bring": "[value]"}
      }}}""")
    engA.execute(s"run kafka consumer where ip = localhost and " +
      s"port = $kport and topic = soak and dir = $land " +
      "and reset = earliest and poll = 50")
    engA.execute(s"run streamer where dir = $land and table = kt " +
      "and policy = sp and flush = 1")
    // ---- plc chain: embedded modbus server under run/exit churn ----
    val plcSrv = new graft.streaming.ModbusTcpServer(
      graft.streaming.ModbusBank(holding = Vector(42)))
    val plcPort = plcSrv.start()
    val plcLand = dir.resolve("plcland")
    // ---- live scheduler (REAL wake thread): fold + ha sync tasks ---
    engA.taskScheduler.start(wakeMs = 200L)
    engA.execute("""schedule time = 1 seconds and name = "fleet" """ +
      "task sync all where table = sl")
    engA.execute("""schedule time = 1 seconds and name = "ha" """ +
      s"task run ha sync where peer = localhost:$portB and table = ht")

    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    def thread(name: String)(body: => Unit): Thread = {
      val t = new Thread(() =>
        try body catch { case e: Throwable => errors.add(e) }, name)
      t.start(); t
    }
    val nextId = new java.util.concurrent.atomic.AtomicLong(1L)
    // PUT writers on A's partitioned side
    val writers = (0 until 2).map(w => thread(s"putA$w") {
      for (i <- 0 until 5) {
        val id = nextId.incrementAndGet()
        val day = 1 + ((w * 5 + i) % 5)
        assert(engA.ingest("sl",
          s"""{"id": $id, "ts": "2024-01-0$day 0$i:0$w:00", """ +
            s""""g": "g${id % 3}", "v": ${id % 7}}""") === 1L)
        Thread.sleep(40)
      }
    })
    // HA writers: distinct payloads land on EACH node; the scheduled
    // ha sync task replicates them while everything else runs
    val haWriters = Seq(
      thread("putHtA") {
        for (i <- 0 until 4) {
          assert(engA.ingest("ht",
            s"""{"device": "a$i", "value": $i}""") === 1L)
          Thread.sleep(120)
        }
      },
      thread("putHtB") {
        for (i <- 0 until 4) {
          assert(engB.ingest("ht",
            s"""{"device": "b$i", "value": $i}""") === 1L)
          Thread.sleep(120)
        }
      })
    // kafka producer feeding the consumer->streamer chain
    val kafkaFeeder = thread("producer") {
      for (i <- 0 until 12) {
        producer.produceStrings("soak",
          Seq(s"""{"device": "k${i % 4}", "value": $i}"""))
        Thread.sleep(60)
      }
    }
    // plc lifecycle churn: declare/poll/exit cycles (mutating
    // commands contending on the write lock with the scheduler's
    // sync tasks) while a board reader hammers the read path
    val plcChurn = thread("plcChurn") {
      for (_ <- 0 until 4) {
        engA.execute(s"run plc client where type = modbus and " +
          s"hostname = localhost and port = $plcPort and " +
          s"name = soakplc and frequency = 0.05 and dir = $plcLand " +
          s"""and table = pt and map = [{"name":"a","register":0}]""")
        Thread.sleep(150)
        assert(engA.execute("exit plc soakplc").contains("stopped 1"))
      }
    }
    val plcBoard = thread("plcBoard") {
      for (_ <- 0 until 12) {
        engA.execute("get plc clients")
        engA.execute("get processes")
        Thread.sleep(50)
      }
    }
    // retention chaos against the partitioned side
    val chaos = thread("chaos") {
      for (_ <- 0 until 3) {
        Thread.sleep(300)
        val parts = graft.engine.TimePartitions.partitions(spark, slPath)
        if (parts.length > 3) {
          val horizon = parts(1)
          try engA.execute(s"drop partition sl before $horizon")
          catch { case _: Exception =>
            engA.execute("sync all where table = sl")
            engA.execute(s"drop partition sl before $horizon")
          }
        }
      }
    }
    (writers ++ haWriters :+ kafkaFeeder :+ chaos :+ plcChurn :+
      plcBoard).foreach(_.join(300000))
    assert(errors.isEmpty, "operational soak failures:\n" +
      errors.toArray.map { case e: Throwable =>
        s"${e.getClass.getName}: ${e.getMessage}" }.mkString("\n"))

    // drain the kafka chain: all 12 produced messages become rows
    val q = engA.streamerQueries("kt")
    val deadline = System.currentTimeMillis + 30000
    def ktRows() =
      try catA.table("kt").count() catch { case _: Exception => 0L }
    while (ktRows() < 12 && System.currentTimeMillis < deadline) {
      q.processAllAvailable(); Thread.sleep(100)
    }
    assert(ktRows() === 12L, s"kafka chain drained ${ktRows()} of 12")
    // stop the moving parts (exits run on the read path — they must
    // not deadlock against in-flight folds; see StreamerExitSpec)
    assert(engA.execute("exit kafka consumer").contains("stopped 1"))
    assert(engA.execute("exit streamer kt").contains("stopped 1"))
    engA.execute("exit scheduler")
    // scheduler ran both tasks at least once, with no timeouts left
    // behind (Success or a benign in-flight overlap is the only
    // acceptable terminal state)
    val sched = engA.execute("get scheduler 1")
    assert(sched.contains("fleet") && sched.contains("ha"), sched)
    // final reconcile + the trust loop on every standing artifact
    val s1 = engA.execute("sync all where table = sl")
    assert(!s1.contains("FAILED"), s1)
    val audit = engA.execute("artifact verify where table = sl")
    assert(audit.linesIterator.count(_.contains("VERIFIED exact")) === 2,
      audit)
    assert(!audit.contains("DIVERGED"), audit)
    // HA convergence: one final round moves nothing new in either
    // direction beyond what the scheduled task already replicated,
    // and the ledgers agree exactly
    engA.execute(s"run ha sync where peer = localhost:$portB " +
      "and table = ht")
    val hashesA = engA.tsdLedger.list(None)
      .filter(_.table == "ht").map(_.fileHash).toSet
    val hashesB = engB.tsdLedger.list(None)
      .filter(_.table == "ht").map(_.fileHash).toSet
    assert(hashesA === hashesB && hashesA.size === 8,
      s"A=${hashesA.size} B=${hashesB.size}")
    assert(engA.query("""sql edge "select count(*) as n from ht"""")
      .head().getLong(0) === 8L)
    // every plc churn cycle polled at least once and exited cleanly:
    // rows landed, the final board shows the terminated client, and
    // no artifact survives to resurrect it
    val plcFiles = {
      val st = java.nio.file.Files.list(plcLand)
      try st.filter(_.toString.endsWith(".json")).count()
      finally st.close()
    }
    assert(plcFiles >= 4, s"plc churn landed only $plcFiles polls")
    assert(engA.execute("get plc clients").contains("terminated"))
    assert(catA.artifactRecord("plc client:soakplc").isEmpty)
    feB.stop(); producer.close(); broker.stop(); plcSrv.stop()
  }

  test("kafka restart soak: consumer killed/restarted MID-STREAM twice " +
      "(offset journal carries the cursor) with a broker truncation " +
      "between restarts — every surviving message lands exactly once, " +
      "truncated-unseen messages never appear") {
    val dir = java.nio.file.Files.createTempDirectory("krsoak")
    val root = dir.resolve("root")
    val land = dir.resolve("land")
    val broker = new graft.streaming.KafkaMiniBroker()
    val kport = broker.start()
    val producer = new graft.streaming.KafkaNativeClient("localhost", kport)
    try {
      def startConsumer(): graft.engine.Engine = {
        // a FRESH engine + FRESH catalog per (re)start — only the
        // persisted journal under `root` carries the cursor across
        val e = new graft.engine.Engine(spark,
          new graft.engine.Catalog(spark, Some(root)))
        e.execute(s"run kafka consumer where ip = localhost and " +
          s"port = $kport and topic = kr and dir = $land " +
          "and reset = earliest and poll = 30")
        e
      }
      def landed(): Seq[String] =
        Option(land.toFile.listFiles()).getOrElse(Array.empty).toSeq
          .filter(_.isFile)
          .flatMap(f => java.nio.file.Files.readString(f.toPath)
            .linesIterator.toSeq)
      def awaitLanded(n: Int): Unit = {
        val deadline = System.currentTimeMillis + 15000
        while (landed().size < n && System.currentTimeMillis < deadline)
          Thread.sleep(30)
      }
      // ---- phase 1: feed WHILE killing and restarting mid-stream ----
      val e1 = startConsumer()
      val feeder = new Thread(() => (0 until 30).foreach { i =>
        producer.produceStrings("kr", Seq(s"""{"n": $i}"""))
        Thread.sleep(20)
      })
      feeder.start()
      Thread.sleep(250) // mid-stream: some landed, feeder still going
      e1.execute("exit kafka consumer")
      Thread.sleep(150) // messages pile up while the consumer is down
      val e2 = startConsumer()
      feeder.join(30000)
      awaitLanded(30)
      Thread.sleep(300) // settle: replays would land immediately
      val p1 = landed()
      assert(p1.size === 30, s"phase 1 landed ${p1.size}: $p1")
      assert((0 until 30).forall(i =>
        p1.count(_ == s"""{"n": $i}""") == 1),
        s"phase-1 duplicates/losses: ${p1.sorted}")
      // ---- phase 2: truncate past UNSEEN messages, restart again ----
      e2.execute("exit kafka consumer")
      // 4 messages the stopped consumer never sees...
      producer.produceStrings("kr",
        (0 until 4).map(i => s"""{"lost": $i}"""))
      // ...retention eats them (journal now points below log start)
      broker.truncate("kr", 34L)
      producer.produceStrings("kr",
        (0 until 3).map(i => s"""{"post": $i}"""))
      val e3 = startConsumer()
      awaitLanded(33)
      Thread.sleep(300)
      val p2 = landed()
      assert(p2.size === 33, s"phase 2 landed ${p2.size}")
      assert((0 until 3).forall(i =>
        p2.count(_ == s"""{"post": $i}""") == 1), p2.sorted.toString)
      assert(!p2.exists(_.contains("lost")),
        "truncated-unseen messages reappeared")
      assert((0 until 30).forall(i =>
        p2.count(_ == s"""{"n": $i}""") == 1),
        "phase-1 messages re-landed after the truncation restart")
      e3.execute("exit kafka consumer")
    } finally { producer.close(); broker.stop() }
  }
}
