package graft

import scala.collection.mutable

import graft.engine.{Catalog, Engine, TaskScheduler}

/** The reference's repeatable-task scheduler family
  * (cmd/member_cmd.py:21696 `schedule`, :21712 `run scheduler`,
  * :21650 `task`, :20339 `get scheduler`; job/task_scheduler.py).
  * Virtual clock throughout — no sleeps. */
class TaskSchedulerSpec extends SparkSpec {

  private def fixture() = {
    val ran = mutable.ArrayBuffer.empty[String]
    var now = 1000000L
    val ts = new TaskScheduler(cmd => { ran += cmd; "ok" }, () => now)
    (ts, ran, () => now, (t: Long) => now = t)
  }

  test("fires on the first wake after registration, then gates on repeat") {
    val (ts, ran, now, setNow) = fixture()
    ts.add("t1", "cmd one", repeatMs = 10000L)
    assert(ts.tick() === 1)
    assert(ran.toList === List("cmd one"))
    // same instant: repeat not elapsed
    assert(ts.tick() === 0)
    setNow(now() + 9999)
    assert(ts.tick() === 0)
    setNow(now() + 1)
    assert(ts.tick() === 1)
    assert(ran.size === 2)
    assert(ts.tasksOf().head.counter === 2)
    assert(ts.tasksOf().head.lastStatus === "Success")
  }

  test("start gate: a future start time defers the first run") {
    val (ts, ran, now, setNow) = fixture()
    ts.add("later", "cmd", 1000L, startAt = Some(now() + 60000))
    assert(ts.tick() === 0 && ran.isEmpty)
    setNow(now() + 60000)
    assert(ts.tick() === 1)
  }

  test("stop/resume/remove modes; removed slot is reused; dup name refused") {
    val (ts, ran, _, _) = fixture()
    val t1 = ts.add("a", "cmd a", 1000L)
    intercept[IllegalArgumentException](ts.add("a", "other", 1000L))
    ts.taskCmd("stop", "a")
    assert(ts.tick() === 0)
    ts.taskCmd("resume", "a")
    assert(ts.tick() === 1)
    ts.taskCmd("remove", "a")
    assert(ts.tick() === 0)
    // removed frees the name AND the slot (task_scheduler.py:266)
    val t2 = ts.add("a", "cmd a2", 1000L)
    assert(t2.id === t1.id)
    assert(ts.tasksOf().map(_.name) === Seq("a"))
  }

  test("task run forces one immediate execution; init re-arms start") {
    val (ts, ran, now, setNow) = fixture()
    ts.add("m", "cmd m", 60000L)
    ts.taskCmd("run", "m")
    assert(ran.size === 1)
    // run counted as an execution: the repeat gate now applies
    assert(ts.tick() === 0)
    // init pushes the start into the future and clears the run gate
    ts.taskCmd("init", "m", newStart = Some(now() + 5000))
    assert(ts.tick() === 0)
    setNow(now() + 5000)
    assert(ts.tick() === 1)
  }

  test("single-flight under races: a manual `task run` is refused while " +
      "a scheduled run is in flight, concurrent ticks never " +
      "double-dispatch, and the guard clears when the run finishes") {
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    val started = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val runs = new java.util.concurrent.atomic.AtomicInteger
    var now = 1000000L
    val ts = new TaskScheduler(_ => {
      runs.incrementAndGet(); started.countDown()
      release.await(10, TimeUnit.SECONDS); "ok"
    }, () => now)
    ts.add("slow", "cmd slow", repeatMs = 1L)
    ts.setTaskTimeout(50L) // tick returns while the task still runs
    assert(ts.tick() === 1)
    assert(started.await(5, TimeUnit.SECONDS))
    // the pooled run is STILL executing (blocked on `release`) —
    // a due re-tick must not re-dispatch, and a manual run must be
    // refused, not raced
    now += 10000
    assert(ts.tick() === 0, "in-flight task re-dispatched by tick")
    assert(ts.taskCmd("run", "slow").contains("skipped"),
      "manual run raced an in-flight scheduled run")
    assert(runs.get() === 1)
    release.countDown()
    // wait for the pooled completion to clear inFlight
    val deadline = System.currentTimeMillis + 5000
    while (ts.tasksOf().head.inFlight &&
        System.currentTimeMillis < deadline) Thread.sleep(10)
    // guard cleared: both dispatch paths work again
    assert(ts.taskCmd("run", "slow") === "Task 'slow' executed")
    now += 10000
    assert(ts.tick() === 1)
    assert(runs.get() === 3)
  }

  test("tick/manual hammer: many interleaved ticks and manual runs " +
      "never overlap two executions of one task") {
    import java.util.concurrent.atomic.AtomicInteger
    val active = new AtomicInteger
    val overlaps = new AtomicInteger
    val runs = new AtomicInteger
    @volatile var now = 1000000L
    val ts = new TaskScheduler(_ => {
      if (active.incrementAndGet() > 1) overlaps.incrementAndGet()
      Thread.sleep(1) // widen the overlap window
      runs.incrementAndGet()
      active.decrementAndGet(); "ok"
    }, () => now)
    ts.add("hammered", "cmd h", repeatMs = 1L)
    ts.setTaskTimeout(1L) // every tick returns immediately, leaving
    // the pooled run racing the next dispatch attempt
    val threads = (0 until 4).map { i =>
      new Thread(() => {
        (0 until 200).foreach { _ =>
          now += 10
          if (i % 2 == 0) ts.tick()
          else ts.taskCmd("run", "hammered")
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(30000))
    val deadline = System.currentTimeMillis + 5000
    while (ts.tasksOf().head.inFlight &&
        System.currentTimeMillis < deadline) Thread.sleep(10)
    assert(overlaps.get() === 0,
      s"${overlaps.get()} overlapping executions of one task")
    assert(runs.get() > 0)
  }

  test("TIME(PREVIOUS)/TIME(CURRENT) substitution chains across runs") {
    val (ts, ran, now, setNow) = fixture()
    ts.start(spawnThread = false) // sets wakeMs default 10 s
    ts.add("w", "sql sel between TIME(PREVIOUS) and TIME(CURRENT)", 10000L)
    ts.tick()
    setNow(now() + 10000)
    ts.tick()
    val stamps = ran.map { c =>
      val m = "'([^']+)' and '([^']+)'".r.findFirstMatchIn(c).get
      (m.group(1), m.group(2))
    }
    // first run: PREVIOUS seeded with now - wake (task_scheduler.py:193)
    assert(stamps(0)._1 < stamps(0)._2)
    // second run: PREVIOUS == first run's CURRENT stamp (:198-200)
    assert(stamps(1)._1 === stamps(0)._2)
  }

  test("a failing task records Failed status and keeps the scheduler alive") {
    var now = 0L
    val ts = new TaskScheduler(
      _ => throw new RuntimeException("boom"), () => now)
    ts.add("f", "cmd", 1000L)
    assert(ts.tick() === 1)
    assert(ts.tasksOf().head.lastStatus.startsWith("Failed: boom"))
    now += 1000
    assert(ts.tick() === 1) // still scheduled
  }

  test("engine command surface: schedule/task/get scheduler/run scheduler") {
    val engine = new Engine(spark, new Catalog(spark))
    var now = 5000000L
    engine.schedulerClock = () => now
    // run scheduler refuses a double start (Process_already_running)
    // — started WITHOUT the wake thread so the test drives time
    assert(engine.taskScheduler.start(spawnThread = false)
      .startsWith("Scheduler 1 started"))
    assert(engine.execute("run scheduler") ===
      "Scheduler 1 already running")
    val reply = engine.execute(
      """schedule time = 10 seconds and name = "dict snap" task set snap = on""")
    assert(reply.contains("'dict snap' scheduled every 10 seconds"))
    intercept[IllegalArgumentException](engine.execute(
      """schedule time = 5 seconds and name = "dict snap" task set x = 1"""))
    intercept[IllegalArgumentException](engine.execute(
      "schedule time = 10 seconds no marker here"))
    assert(engine.taskScheduler.tick() === 1)
    // the task executed a real engine command
    assert(engine.execute("get dictionary").contains("snap"))
    val rep = engine.execute("get scheduler 1")
    assert(rep.contains("Scheduler Status: Running"))
    assert(rep.contains("dict snap") && rep.contains("Success"))
    assert(engine.execute("get scheduler").contains("Scheduler ID:     1"))
    assert(engine.execute("""task stop where name = "dict snap""""
      ).contains("stopped"))
    now += 60000
    assert(engine.taskScheduler.tick() === 0)
    assert(engine.execute("""task remove where name = "dict snap""""
      ).contains("removed"))
    assert(!engine.execute("get scheduler 1").contains("dict snap"))
    assert(engine.execute("exit scheduler") === "Scheduler 1 terminated")
    assert(engine.execute("get scheduler 1")
      .contains("Scheduler Status: Not Running"))
  }

  test("a scheduled MUTATING task serializes through the engine write lock") {
    // schedule `task run` of a mutating command — the dispatch
    // classifies the whole family mutating precisely so this nested
    // execute never upgrades the retention read gate (Engine.isMutating)
    val dir = java.nio.file.Files.createTempDirectory("schedmv")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val cat = new Catalog(spark)
    cat.registerTable("events", dir.resolve("events.parquet").toString)
    val engine = new Engine(spark, cat)
    var now = 9000000L
    engine.schedulerClock = () => now
    val out = dir.resolve("by_day").toString
    engine.execute(s"""schedule time = 1 seconds and name = "zap" """ +
      s"task partition events using ts by 1 day into $out")
    assert(engine.execute("""task run where name = "zap""""
      ).contains("executed"))
    assert(engine.taskScheduler.tasksOf().head.lastStatus === "Success")
    assert(graft.engine.TimePartitions.partitions(spark, out).nonEmpty)
  }

  test("a hung task neither delays the other due tasks nor blocks " +
      "later wakes; get scheduler shows it Failed-by-timeout") {
    val gate = new java.util.concurrent.CountDownLatch(1)
    val ran = new java.util.concurrent.CopyOnWriteArrayList[String]()
    var now = 1000000L
    val ts = new TaskScheduler(cmd => {
      if (cmd == "hang") { gate.await(); "ok" }
      else { ran.add(cmd); "ok" }
    }, () => now)
    ts.setTaskTimeout(500) // real-time wait budget per wake
    ts.add("hung", "hang", 10000L)
    ts.add("fast", "quick", 10000L)
    val t0 = System.currentTimeMillis
    assert(ts.tick() === 2)
    // the wake returned at the deadline — it did not wait forever,
    // and the healthy task ran concurrently with the hung one
    assert(System.currentTimeMillis - t0 < 5000)
    assert(ran.toArray.toList === List("quick"))
    val hung = ts.tasksOf().find(_.name == "hung").get
    assert(hung.lastStatus.startsWith("Failed: timeout"),
      hung.lastStatus)
    assert(ts.report().contains("Failed: timeout"))
    // next wake: fast fires on time, the still-running hung task is
    // NOT re-dispatched (no thread pile-up)
    now += 10000
    assert(ts.tick() === 1)
    assert(ran.size === 2)
    // once it finally completes, its real outcome replaces the
    // timeout status and its schedule resumes
    gate.countDown()
    val deadline = System.currentTimeMillis + 5000
    while (hung.inFlight && System.currentTimeMillis < deadline)
      Thread.sleep(10)
    assert(!hung.inFlight, "hung task never finished after release")
    assert(hung.lastStatus === "Success")
    now += 10000
    assert(ts.tick() === 2)
  }

  test("schedule: a quoted task name containing the word 'task' does " +
      "not truncate the options or garble the command") {
    val engine = new Engine(spark, new Catalog(spark))
    val reply = engine.execute(
      """schedule time = 10 seconds and name = "sync task" task get status""")
    assert(reply.contains("'sync task' scheduled every 10 seconds"),
      reply)
    val t = engine.taskScheduler.tasksOf()
      .find(_.name == "sync task").get
    assert(t.command === "get status")
    assert(t.repeatMs === 10000L)
  }

  test("run scheduler accepts a per-wake task timeout option") {
    val engine = new Engine(spark, new Catalog(spark))
    var now = 1000000L
    engine.schedulerClock = () => now
    // start on scheduler 3 without the wake thread, then re-issue the
    // command form with the timeout knob (already running: knob still
    // applied, start refused)
    engine.taskScheduler.start(3, spawnThread = false)
    assert(engine.execute("run scheduler 3 where timeout = 1 seconds")
      === "Scheduler 3 already running")
    // knob parsed and applied even on the already-running path; a
    // normal task still runs under it
    engine.taskScheduler.add("ok", "get status", 10000L, schedId = 3)
    assert(engine.taskScheduler.tick(3) === 1)
    assert(engine.taskScheduler.tasksOf(3).head.lastStatus === "Success")
    intercept[IllegalArgumentException](
      engine.execute("run scheduler 4 where timeout = 0 seconds"))
  }
}

/** `get processes` — the reference's background-service board
  * (member_cmd.py:8521 get_processes_stat, 'get processes where
  * format = json'). Honest rows: out-of-scope/waived services report
  * Not declared WITH the scope/receipt pointer as details. */
class ProcessesBoardSpec extends SparkSpec {
  import graft.engine.{Catalog, Engine, HttpFrontend}

  test("board shows Running services with details, Not declared others") {
    val engine = new Engine(spark, new Catalog(spark))
    val pre = engine.execute("get processes")
    assert(pre.contains("| Process") && pre.contains("Status"))
    assert(pre.contains("TCP Server") && pre.contains("Not declared"))
    assert(pre.contains("run kafka consumer where"))
    assert(pre.contains("run plc client where"))
    // start services: REST frontend self-registers, scheduler via command
    val fe = new HttpFrontend(engine)
    val port = fe.start()
    engine.taskScheduler.start(spawnThread = false)
    engine.dataDir = Some("/tmp/ingest-root")
    val mid = engine.execute("get processes")
    assert(mid.linesIterator.exists(l =>
      l.contains("REST Server") && l.contains("Running") &&
        l.contains(s":$port")))
    assert(mid.linesIterator.exists(l =>
      l.contains("Scheduler") && l.contains("Running") &&
        l.contains("scheduler id(s) 1")))
    assert(mid.linesIterator.exists(l =>
      l.contains("Operator") && l.contains("Running")))
    // json form parses and carries the same statuses
    val js = engine.execute("get processes where format = json")
    val parsed = org.json4s.jackson.JsonMethods.parse(js)
    val rest = (parsed \ "REST Server" \ "Status")
    assert(rest === org.json4s.JString("Running"))
    // stop: the rows flip back
    fe.stop()
    engine.execute("exit scheduler")
    val post = engine.execute("get processes")
    assert(post.linesIterator.exists(l =>
      l.contains("REST Server") && l.contains("Not declared")))
    assert(post.linesIterator.exists(l =>
      l.contains("Scheduler") && l.contains("Not declared")))
  }

  test("format = json escapes user-supplied detail strings (a quote " +
      "in a topic name must not break the JSON)") {
    val broker = new graft.streaming.KafkaMiniBroker()
    val port = broker.start()
    try {
      val engine = new Engine(spark, new Catalog(spark))
      val dir = java.nio.file.Files.createTempDirectory("jsonesc")
      engine.execute(s"run kafka consumer where ip = localhost and " +
        s"""port = $port and topic = a"b and dir = $dir""")
      val js = engine.execute("get processes where format = json")
      // the raw quote would truncate the JSON string — it must parse
      val parsed = org.json4s.jackson.JsonMethods.parse(js)
      val det = (parsed \ "Kafka Consumer" \ "Details")
      assert(det === org.json4s.JString("a\"b"), js)
      engine.execute("exit kafka consumer")
    } finally broker.stop()
  }
}

/** `test table` — schema-consistency audit between the policy-store
  * (blockchain) table definition and the node's storage, including
  * every time-partition bucket (member_cmd.py:14816 test_table,
  * compare_schema_ledger_to_table). */
class TestTableCmdSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import graft.engine.{Catalog, Engine, Tables, TimePartitions}

  private def policy(tbl: String, cols: (String, String)*): String =
    s"""blockchain insert where policy = {"table": {"name": "$tbl",
       "dbms": "edge", "columns": [${cols.map { case (n, t) =>
      s"""{"column_name": "$n", "data_type": "$t"}""" }.mkString(", ")}]}}"""

  private val eventCols = Seq(
    "event_id" -> "BIGINT", "ts" -> "TIMESTAMP", "user_id" -> "BIGINT",
    "event_type" -> "VARCHAR", "value" -> "DOUBLE", "props" -> "VARCHAR")

  test("Passed on a matching schema; ledger-vs-storage diffs named") {
    val cat = new Catalog(spark)
    cat.registerTable("events", s"$sfDir/events.parquet")
    val engine = new Engine(spark, cat)
    // no policy yet: the reference's exact failure mode
    assert(engine.execute("test table events where dbms = edge") ===
      "Test table edge.events schema failed: Blockchain schema " +
        "not available")
    engine.execute(policy("events", eventCols: _*))
    assert(engine.execute("test table events where dbms = edge") ===
      "Passed")
    // a second table with a WRONG declared type
    cat.registerTable("ev2", s"$sfDir/events.parquet")
    engine.execute(policy("ev2", eventCols.map {
      case ("value", _) => ("value", "BIGINT"); case kv => kv }: _*))
    val bad = engine.execute("test table ev2 where dbms = edge")
    assert(bad.contains("schema failed") && bad.contains("'value'"))
    // column-count drift
    cat.registerTable("ev3", s"$sfDir/events.parquet")
    engine.execute(policy("ev3", eventCols.take(5): _*))
    assert(engine.execute("test table ev3 where dbms = edge")
      .contains("ledger has 5 columns, storage has 6"))
  }

  test("partition audit: a bucket written under an older schema is named") {
    val dir = java.nio.file.Files.createTempDirectory("ttpar").toString
    val ev = Tables.load(spark, sfDir, "events")
      .filter(col("ts") < lit("2024-01-04"))
    TimePartitions.write(ev, "ts", "day", 1, dir)
    val buckets = TimePartitions.partitions(spark, dir)
    assert(buckets.size >= 2)
    // rewrite ONE bucket without the props column (schema drift)
    val victim = s"$dir/__par=${buckets.head}"
    val drifted = spark.read.parquet(victim).drop("props")
    val tmp = java.nio.file.Files.createTempDirectory("ttold").toString
    drifted.write.mode("overwrite").parquet(tmp)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(victim))
    org.apache.commons.io.FileUtils.moveDirectory(
      new java.io.File(tmp), new java.io.File(victim))
    val cat = new Catalog(spark)
    cat.registerTable("evp", dir)
    val engine = new Engine(spark, cat)
    engine.execute(policy("evp", eventCols: _*))
    val out = engine.execute("test table evp where dbms = edge")
    assert(out.contains(s"partition ${buckets.head}") &&
      out.contains("schema failed"), out)
    // healthy partitions: repair the bucket and the audit passes
    val healthy = Tables.load(spark, sfDir, "events")
      .filter(col("ts") < lit("2024-01-04"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(victim))
    TimePartitions.write(healthy, "ts", "day", 1, dir)
    assert(engine.execute("test table evp where dbms = edge")
      .startsWith("Passed ("))
  }
}

/** The OPERATIONAL loop assembled end-to-end: a standing matview kept
  * converged by a SCHEDULED `sync all` task (the way the reference's
  * docs wire maintenance — schedule + run scheduler), with
  * out-of-band parquet appends as the drift source and `artifact
  * verify` as the trust check. */
class ScheduledOpsLoopSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import graft.engine.{Catalog, Engine, Tables}

  test("scheduled sync all reconverges a matview after appends; " +
      "artifact verify stays exact") {
    val tmp = java.nio.file.Files.createTempDirectory("schedsync")
    val evDir = tmp.resolve("evt.parquet").toString
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("ts"), col("event_type"), col("value"), col("user_id"))
    ev.filter(pmod(col("user_id"), lit(3)) === 0)
      .withColumn("tsd_id", lit(1)).write.parquet(evDir)
    val cat = new Catalog(spark)
    cat.registerTable("evt", evDir)
    val engine = new Engine(spark, cat)
    var now = 3000000000L
    engine.schedulerClock = () => now
    engine.taskScheduler.start(spawnThread = false)
    val mv = tmp.resolve("mv").toString
    // decimal sum partial: the fold algebra is EXACT, so the scheduled
    // increments can be compared to a one-shot rebuild bit-for-bit
    engine.execute(s"matview create where table = evt and path = $mv " +
      s"""and spec = {"keys": ["event_type"], "aggs": [
        {"fn": "count", "expr": "1", "alias": "n"},
        {"fn": "sum", "expr": "CAST(value AS DECIMAL(18,2))",
         "alias": "sv"}]}""")
    engine.execute("""schedule time = 10 seconds and name = "fleet" """ +
      "task sync all where table = evt")
    // two drift/wake cycles
    ev.filter(pmod(col("user_id"), lit(3)) === 1)
      .withColumn("tsd_id", lit(2)).write.mode("append").parquet(evDir)
    assert(engine.taskScheduler.tick() === 1)
    ev.filter(pmod(col("user_id"), lit(3)) === 2)
      .withColumn("tsd_id", lit(3)).write.mode("append").parquet(evDir)
    now += 10000
    assert(engine.taskScheduler.tick() === 1)
    assert(engine.taskScheduler.tasksOf().head.lastStatus === "Success")
    // served state == one-shot rebuild over the whole corpus
    val got = graft.ops.IndexStore.read(spark, mv).get
      .select(col("event_type"), col("n"),
        col("sv").cast("decimal(18,2)").as("sv"))
    val want = spark.read.parquet(evDir).groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)"))
          .cast("decimal(18,2)").as("sv"))
    assert(got.exceptAll(want).count() === 0 &&
      want.exceptAll(got).count() === 0)
    assert(engine.execute("artifact verify where table = evt")
      .contains("VERIFIED"))
  }
}

/** `run ha sync` — the HA peer-sync round as ONE command (the
  * TsdSyncE2ESpec flow, but engine-driven: ledger fetch over the
  * command channel, hash anti-join, archive pull / REST push,
  * consensus watermark), schedulable exactly the way the reference
  * deploys ha.py. Plus the archive surface it rides on:
  * hash-addressed raw payloads, `get tsd export`,
  * `get archive file`, `delete archive`. */
class HaSyncCmdSpec extends SparkSpec {
  import graft.engine.{Catalog, Engine, HttpFrontend}
  import graft.ingest.TsdLedger

  private def node(root: java.nio.file.Path, name: String) = {
    val engine = new Engine(spark, new Catalog(spark))
    engine.dataDir = Some(root.resolve(name).toString)
    val fe = new HttpFrontend(engine)
    (engine, fe, fe.start())
  }

  test("one command converges two overlapping nodes; idempotent; " +
      "scheduler drives later rounds") {
    val root = java.nio.file.Files.createTempDirectory("hasync")
    val (engA, feA, portA) = node(root, "a")
    val (engB, feB, portB) = node(root, "b")
    try {
      val p1 = """{"device": "d1", "value": 1.0}
                 |{"device": "d2", "value": 2.0}""".stripMargin
      val p2 = """{"device": "d3", "value": 3.0}"""
      val p3 = """{"device": "d4", "value": 4.0}"""
      val p4 = """{"device": "d5", "value": 5.0}"""
      Seq(p1, p2, p3).foreach(p => assert(engA.ingest("t", p) > 0))
      Seq(p1, p4).foreach(p => assert(engB.ingest("t", p) > 0))
      // the archive holds the raw payloads, hash-addressed
      val h2 = java.security.MessageDigest.getInstance("MD5")
        .digest(p2.trim.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(engA.execute(s"get archive file $h2") === p2.trim)
      // ONE round on B: pulls p2+p3 from A's archive, pushes p4 to A
      val out = engB.execute(
        s"run ha sync where peer = localhost:$portA and table = t")
      assert(out.contains("pulled 2") && out.contains("pushed 1"), out)
      val hashesA = engA.tsdLedger.list(None).map(_.fileHash).toSet
      val hashesB = engB.tsdLedger.list(None).map(_.fileHash).toSet
      assert(hashesA === hashesB && hashesA.size === 4)
      assert(TsdLedger.diff(engB.tsdLedger.df(spark),
        engA.tsdLedger.df(spark)).isEmpty)
      // second round: nothing moves (content-hash idempotence)
      assert(engB.execute(
        s"run ha sync where peer = localhost:$portA and table = t")
        .contains("pulled 0, pushed 0"))
      // committed watermark advanced on B to the consensus: every
      // replicated row is now visible under committed=true
      assert(engB.query(
        """sql edge committed=true "select count(*) as n from t"""")
        .head().getLong(0) === 5)
      // SCHEDULED rounds: a new batch lands on A, B's scheduled task
      // replicates it on the next wake (virtual clock)
      var now = 7000000000L
      engB.schedulerClock = () => now
      engB.taskScheduler.start(spawnThread = false)
      engB.execute(s"""schedule time = 10 seconds and name = "ha" """ +
        s"task run ha sync where peer = localhost:$portA and table = t")
      val p5 = """{"device": "d6", "value": 6.0}"""
      assert(engA.ingest("t", p5) > 0)
      assert(engB.taskScheduler.tick() === 1)
      assert(engB.taskScheduler.tasksOf().head.lastStatus === "Success")
      assert(engB.tsdLedger.list(None).size === 5) // 5 batches, 6 rows
      assert(engB.query("""sql edge "select count(*) as n from t"""")
        .head().getLong(0) === 6)
    } finally { feA.stop(); feB.stop() }
  }

  test("delete archive ages out payloads; sync reports unservable pushes") {
    val root = java.nio.file.Files.createTempDirectory("haage")
    val (engA, feA, portA) = node(root, "a")
    val (engB, feB, portB) = node(root, "b")
    try {
      val pOld = """{"device": "old", "value": 1.0}"""
      assert(engB.ingest("t", pOld) > 0)
      // age the archived file out
      assert(engB.execute("delete archive where days = 1")
        .startsWith("deleted 0"))
      val hash = java.security.MessageDigest.getInstance("MD5")
        .digest(pOld.trim.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val f = java.nio.file.Paths.get(engB.dataDir.get, "archive",
        s"$hash.json").toFile
      assert(f.setLastModified(System.currentTimeMillis - 3L * 86400000))
      assert(engB.execute("delete archive where days = 1")
        .startsWith("deleted 1"))
      intercept[Exception](engB.execute(s"get archive file $hash"))
      // B still LISTS the batch (ledger intact) but cannot serve it
      val out = engB.execute(
        s"run ha sync where peer = localhost:$portA and table = t")
      assert(out.contains("pushed 0") && out.contains("1 not in archive"),
        out)
    } finally { feA.stop(); feB.stop() }
  }
}

/** `run streamer` / `exit streamer` / `get status` — the watch-dir
  * ingest chain as a background-process COMMAND (member_cmd.py:21339
  * run streamer; §2.1 row 10 watch-dir + archive), through the
  * transactional sink (one foreachBatch owns table append + view
  * folds). */
class StreamerCmdSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import graft.engine.{Catalog, Engine}

  test("policy-mapped watch-dir streamer lands rows, folds views, " +
      "archives processed files; exit stops it") {
    val root = java.nio.file.Files.createTempDirectory("streamcmd")
    val watch = root.resolve("watch"); val arch = root.resolve("arch")
    java.nio.file.Files.createDirectories(watch)
    val cat = new Catalog(spark)
    val engine = new Engine(spark, cat)
    engine.dataDir = Some(root.resolve("data").toString)
    engine.execute("""policy add p1 {"mapping": {
      "dbms": "iot", "table": "readings", "readings": "readings",
      "schema": {
        "device": {"type": "varchar", "bring": "[device]"},
        "value": {"type": "float", "bring": "[value]"}
      }}}""")
    val out = engine.execute(s"run streamer where dir = $watch and " +
      s"table = readings and policy = p1 and flush = 1 and archive = $arch")
    assert(out.contains("streamer for readings"))
    intercept[IllegalArgumentException](engine.execute(
      s"run streamer where dir = $watch and table = readings and policy = p1"))
    // the watch source is LINE-oriented: one JSON document per line
    java.nio.file.Files.writeString(watch.resolve("b1.json"),
      """{"readings": [{"device": "d1", "value": 1.5}, """ +
        """{"device": "d2", "value": 9.0}]}""")
    val q = engine.streamerQueries("readings")
    q.processAllAvailable()
    assert(cat.table("readings").count() === 2L)
    // matview registered mid-stream folds later batches (the sink
    // resolves standing views per batch)
    val mv = root.resolve("mv").toString
    engine.execute(s"matview create where table = readings and " +
      s"""path = $mv and spec = {"keys": ["device"], "aggs": [
        {"fn": "count", "alias": "n"}]}""")
    java.nio.file.Files.writeString(watch.resolve("b2.json"),
      """{"readings": [{"device": "d1", "value": 2.5}]}""")
    q.processAllAvailable()
    assert(cat.table("readings").count() === 3L)
    val got = engine.execute(s"matview get where path = $mv")
    assert(got.contains(""""device":"d1","n":2"""), got)
    // processed files moved to the archive
    assert(!java.nio.file.Files.exists(watch.resolve("b1.json")))
    // the board shows it Running; get streaming names it
    assert(engine.execute("get processes").linesIterator.exists(l =>
      l.contains("Streamer") && l.contains("Running") &&
        l.contains("readings")))
    assert(engine.execute("get streaming").contains("streamer_readings"))
    assert(engine.execute("get status").contains("is running"))
    assert(engine.execute("exit streamer readings")
      === "stopped 1 streamer(s)")
    assert(!q.isActive)
    intercept[IllegalArgumentException](
      engine.execute("exit streamer nope"))
  }

  test("schema-path streamer (no policy) parses NDJSON into the " +
      "registered schema") {
    val root = java.nio.file.Files.createTempDirectory("streamcmd2")
    val watch = root.resolve("watch")
    java.nio.file.Files.createDirectories(watch)
    val tbl = root.resolve("m.parquet").toString
    import spark.implicits._
    Seq(("a", 1L)).toDF("g", "k").write.parquet(tbl)
    val cat = new Catalog(spark)
    cat.registerTable("m", tbl)
    val engine = new Engine(spark, cat)
    engine.execute(s"run streamer where dir = $watch and table = m " +
      "and flush = 1")
    java.nio.file.Files.writeString(watch.resolve("x.json"),
      "{\"g\": \"b\", \"k\": 7}\n{\"g\": \"c\", \"k\": 8}")
    engine.streamerQueries("m").processAllAvailable()
    assert(cat.table("m").orderBy("g").select("g", "k")
      .as[(String, Long)].collect().toSeq ===
      Seq(("a", 1L), ("b", 7L), ("c", 8L)))
    engine.execute("exit streamer")
  }
}
