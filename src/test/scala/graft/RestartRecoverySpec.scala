package graft

import org.apache.spark.sql.functions._

/** Restart recovery: the catalog reloads its metadata root (tables /
  * views / policies / artifact attach records) and `attach all`
  * re-registers the standing-artifact fleet — the reference's
  * startup `blockchain load` equivalent. */
class RestartRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("a root-backed catalog reloads tables, views and policies on " +
      "construction") {
    val root = java.nio.file.Files.createTempDirectory("rr1")
    val data = root.resolve("t.parquet").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.parquet(data)
    val cat1 = new graft.engine.Catalog(spark, Some(root))
    cat1.registerTable("t", data)
    cat1.createView("v", "t", Seq("id" -> "key", "s" -> "label"))
    cat1.addPolicy("p1", """{"mapping": {"dbms": "d", "table": "t"}}""")

    // "restart": a brand-new catalog over the same root
    val cat2 = new graft.engine.Catalog(spark, Some(root))
    assert(cat2.reloadErrors.isEmpty, cat2.reloadErrors.mkString("; "))
    assert(cat2.tableNames === Seq("t"))
    assert(cat2.table("t").count() === 2L)
    assert(cat2.viewNames === Seq("v"))
    assert(cat2.table("v").columns.toSeq === Seq("key", "label"))
    assert(cat2.policy("p1").isDefined)
  }

  test("attach all replays recorded artifacts: matview serving and " +
      "the ingest auto-fold survive an engine restart") {
    val root = java.nio.file.Files.createTempDirectory("rr2")
    val data = root.resolve("base.parquet").toString
    Seq(("a", 1L), ("a", 5L), ("b", 2L)).toDF("g", "k")
      .write.parquet(data)
    val cat1 = new graft.engine.Catalog(spark, Some(root))
    cat1.registerTable("base", data)
    val e1 = new graft.engine.Engine(spark, cat1)
    val p = root.resolve("mv").toString
    e1.execute(s"matview create where table = base and path = $p " +
      s"""and spec = {"keys": ["g"], "aggs": [
        {"fn": "count", "alias": "n"},
        {"fn": "sum", "expr": "k", "alias": "sk"}]}""")

    // restart: fresh catalog + engine over the same root
    val cat2 = new graft.engine.Catalog(spark, Some(root))
    val e2 = new graft.engine.Engine(spark, cat2)
    // before attach all: the artifact exists on disk but is unserved
    assert(e2.execute("get matviews").contains("no matviews"))
    val out = e2.execute("attach all")
    assert(out.contains("attached matview:"), out)
    assert(!out.contains("FAILED"), out)
    // serving is back
    val got = e2.execute(s"matview get where path = $p")
    assert(got.contains(""""g":"a","n":2,"sk":6"""), got)
    // and the re-attached registry feeds the auto-fold: a manual
    // refresh-equivalent fold through foldStandingViews
    e2.foldStandingViews("base", Seq(("b", 10L)).toDF("g", "k"))
    val got2 = e2.execute(s"matview get where path = $p")
    assert(got2.contains(""""g":"b","n":2,"sk":12"""), got2)
  }

  test("attach all + sync all: lineage watermarks survive a restart " +
      "(matview rider column, tindex wm_ version tag) and one sync " +
      "all catches the whole fleet up on rows appended while down") {
    val root = java.nio.file.Files.createTempDirectory("rr5")
    val cat1 = new graft.engine.Catalog(spark, Some(root))
    val e1 = new graft.engine.Engine(spark, cat1)
    e1.dataDir = Some(root.resolve("data").toString)
    e1.ingest("rt5",
      """{"id": 1, "g": "a", "text": "alpha beta"}""" + "\n" +
        """{"id": 2, "g": "b", "text": "beta gamma"}""")
    val mv = root.resolve("mv").toString
    val tx = root.resolve("tx").toString
    e1.execute(s"matview create where table = rt5 and path = $mv " +
      s"""and spec = {"keys": ["g"], "aggs": [
        {"fn": "count", "alias": "n"}]}""")
    e1.execute(s"tindex create where table = rt5 and path = $tx " +
      "and id = id and text = text")
    // rows land while the serving engine is DOWN (a second writer
    // appends through its own engine over the same root/ledger state —
    // simulated by auto refresh off)
    e1.execute("set view auto refresh = off")
    e1.ingest("rt5", """{"id": 3, "g": "a", "text": "gamma delta"}""")

    // restart: fresh catalog + engine, re-attach, ONE sync all
    val cat2 = new graft.engine.Catalog(spark, Some(root))
    val e2 = new graft.engine.Engine(spark, cat2)
    assert(!e2.execute("attach all").contains("FAILED"))
    val synced = e2.execute("sync all where table = rt5")
    assert(synced.contains("matview for rt5 synced"), synced)
    assert(synced.contains("tindex for rt5 synced"), synced)
    val got = e2.execute(s"matview get where path = $mv")
    assert(got.contains(""""g":"a","n":2"""), got)
    assert(graft.ops.IndexStore.read(spark, tx).get
      .filter(col("id") === 3L).count() > 0,
      "tindex sync after restart missed the offline batch")
    // idempotent: everything reports in sync now
    val again = e2.execute("sync all where table = rt5")
    assert(again.contains("in sync"), again)
    assert(!again.contains("synced:"), again)
    // RESTART SEED: a post-restart PUT must get a tsd_id ABOVE the
    // stored lineage (a fresh in-memory ledger would otherwise
    // re-issue id 1, stamping the new rows below every watermark —
    // auto-folded but unsyncable, and replay-by-id ambiguous)
    e2.ingest("rt5", """{"id": 4, "g": "b", "text": "delta epsilon"}""")
    import org.apache.spark.sql.functions.max
    val ids = cat2.table("rt5").agg(max(col("tsd_id").cast("long")))
      .head().getLong(0)
    // pre-restart lineage topped out at 2 (two PUT batches) — the new
    // batch must stamp 3+, not recycle 1
    assert(ids >= 3L, s"restart re-issued a used tsd_id (max $ids)")
    val got4 = e2.execute(s"matview get where path = $mv")
    assert(got4.contains(""""g":"b","n":2"""), got4)
    assert(e2.execute("sync all where table = rt5").contains("in sync"))
    // the full trust loop across the restart: attach all -> sync all ->
    // every artifact row-exact against a rebuild
    val audit = e2.execute("artifact verify where table = rt5")
    assert(audit.linesIterator.count(_.contains("VERIFIED exact")) === 2,
      audit)
    assert(!audit.contains("DIVERGED"), audit)
  }

  test("root-backed ledger journal: PUT idempotence and id continuity " +
      "survive a restart — a retrying client's re-PUT after the " +
      "restart is refused as a duplicate, not re-ingested") {
    val root = java.nio.file.Files.createTempDirectory("rr6")
    val cat1 = new graft.engine.Catalog(spark, Some(root))
    val e1 = new graft.engine.Engine(spark, cat1)
    e1.dataDir = Some(root.resolve("data").toString)
    val payload = """{"id": 1, "g": "a"}""" + "\n" + """{"id": 2, "g": "b"}"""
    assert(e1.ingest("rt6", payload) === 2L)

    // restart over the same root: the journal replays
    val cat2 = new graft.engine.Catalog(spark, Some(root))
    val e2 = new graft.engine.Engine(spark, cat2)
    // the client retries the SAME payload against the fresh engine —
    // without the journal this would re-ingest 2 duplicate rows
    assert(e2.ingest("rt6", payload) === 0L,
      "restart lost the ledger: duplicate payload re-ingested")
    assert(cat2.table("rt6").count() === 2L)
    // id continuity: the next batch stamps above the journaled ids
    e2.ingest("rt6", """{"id": 3, "g": "c"}""")
    import org.apache.spark.sql.functions.max
    assert(cat2.table("rt6").agg(max(col("tsd_id").cast("long")))
      .head().getLong(0) >= 2L)
    // and the rendered ledger shows all three batches' history
    assert(e2.execute("get tsd list rt6").linesIterator.size >= 3)
  }

  test("monitor and layout artifacts re-attach through attach all") {
    val root = java.nio.file.Files.createTempDirectory("rr4")
    val data = root.resolve("ev.parquet").toString
    (0 until 120).map(i =>
      (s"k${i % 2}", java.sql.Timestamp.valueOf(
        f"2024-01-01 00:${i % 60}%02d:00"), i.toLong, i.toLong * 2))
      .toDF("k", "ts", "x", "y").write.parquet(data)
    val cat1 = new graft.engine.Catalog(spark, Some(root))
    cat1.registerTable("ev", data)
    val e1 = new graft.engine.Engine(spark, cat1)
    e1.execute(s"monitor create where table = ev and " +
      s"path = ${root.resolve("mon")} and key = k and ts = ts")
    e1.execute(s"layout zorder where table = ev and " +
      s"path = ${root.resolve("lay")} and x = x and y = y and " +
      "bits = 8 and buckets = 16")

    val cat2 = new graft.engine.Catalog(spark, Some(root))
    val e2 = new graft.engine.Engine(spark, cat2)
    val out = e2.execute("attach all")
    assert(out.contains("attached monitor:"), out)
    assert(out.contains("attached layout:"), out)
    assert(!out.contains("FAILED"), out)
    // the re-attached monitor serves levels without re-create
    val lvl = e2.execute("monitor level where table = ev")
    assert(lvl.contains("k0"), lvl)
  }

  test("reload is per-entry tolerant: a vanished storage path reports " +
      "in reloadErrors, the rest of the catalog restores") {
    val root = java.nio.file.Files.createTempDirectory("rr3")
    val keep = root.resolve("keep.parquet").toString
    val gone = root.resolve("gone.parquet")
    Seq((1L, "x")).toDF("id", "s").write.parquet(keep)
    Seq((2L, "y")).toDF("id", "s").write.parquet(gone.toString)
    val cat1 = new graft.engine.Catalog(spark, Some(root))
    cat1.registerTable("keep", keep)
    cat1.registerTable("gone", gone.toString)
    // vanish one table's storage
    def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.list(p)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.toVector.foreach(rm)
        } finally s.close()
      }
      java.nio.file.Files.delete(p)
    }
    rm(gone)
    val cat2 = new graft.engine.Catalog(spark, Some(root))
    assert(cat2.tableNames === Seq("keep"))
    assert(cat2.reloadErrors.exists(_.contains("table_gone")),
      cat2.reloadErrors.mkString("; "))
    assert(cat2.table("keep").count() === 1L)
  }

  test("FULL-CHAIN exactly-once across an engine restart: kafka " +
      "consumer (offset journal) + streamer + ledger land each " +
      "produced message as exactly one TABLE ROW, before and after " +
      "the restart") {
    val root = java.nio.file.Files.createTempDirectory("rrchain")
    val land = root.resolve("land")
    val broker = new graft.streaming.KafkaMiniBroker()
    val kport = broker.start()
    val producer = new graft.streaming.KafkaNativeClient("localhost", kport)
    try {
      def boot(): graft.engine.Engine = {
        val e = new graft.engine.Engine(spark,
          new graft.engine.Catalog(spark, Some(root)))
        e.dataDir = Some(root.resolve("data").toString)
        e.execute("""policy add cp {"mapping": {
          "dbms": "edge", "table": "krows",
          "schema": {
            "device": {"type": "varchar", "bring": "[device]"},
            "value": {"type": "int", "bring": "[value]"}
          }}}""")
        e.execute(s"run kafka consumer where ip = localhost and " +
          s"port = $kport and topic = rows and dir = $land " +
          "and reset = earliest and poll = 40")
        e.execute(s"run streamer where dir = $land and table = krows " +
          "and policy = cp and flush = 1")
        e
      }
      def drainTo(e: graft.engine.Engine, want: Long): Long = {
        val q = e.streamerQueries("krows")
        def rows(): Long =
          try e.catalog.table("krows").count()
          catch { case _: Exception => 0L }
        val deadline = System.currentTimeMillis + 20000
        var n = rows()
        while (n < want && System.currentTimeMillis < deadline) {
          q.processAllAvailable(); Thread.sleep(60); n = rows()
        }
        n
      }
      val e1 = boot()
      producer.produceStrings("rows",
        (0 until 6).map(i => s"""{"device": "d$i", "value": $i}"""))
      assert(drainTo(e1, 6) === 6L)
      e1.execute("exit kafka consumer")
      e1.execute("exit streamer")
      // restart: fresh engine over the same root; reset=earliest
      // would re-land all 6 retained messages without the offset
      // journal, and a fresh streamer checkpoint re-reads every
      // watch-dir file — the ledger's hash dedup must refuse them
      val e2 = boot()
      producer.produceStrings("rows",
        (6 until 10).map(i => s"""{"device": "d$i", "value": $i}"""))
      assert(drainTo(e2, 10) === 10L)
      Thread.sleep(500) // settle: duplicates would land promptly
      e2.streamerQueries("krows").processAllAvailable()
      val per = e2.catalog.table("krows").groupBy("device").count()
        .as[(String, Long)].collect().toMap
      assert(per.size === 10 && per.values.forall(_ == 1L),
        s"per-device counts not exactly-once: $per")
      e2.execute("exit kafka consumer")
      e2.execute("exit streamer")
    } finally { producer.close(); broker.stop() }
  }

  test("attach all restores the INGEST topology after a crash: the " +
      "rebooted engine re-attaches the recorded kafka consumer and " +
      "streamer, resumes from the offset journal, and lands each " +
      "message exactly once; an explicitly exited service stays down") {
    val root = java.nio.file.Files.createTempDirectory("rrattach")
    val land = root.resolve("land")
    val broker = new graft.streaming.KafkaMiniBroker()
    val kport = broker.start()
    val producer = new graft.streaming.KafkaNativeClient("localhost", kport)
    try {
      val e1 = new graft.engine.Engine(spark,
        new graft.engine.Catalog(spark, Some(root)))
      e1.dataDir = Some(root.resolve("data").toString)
      e1.execute("""policy add ap {"mapping": {
        "dbms": "edge", "table": "arows",
        "schema": {
          "device": {"type": "varchar", "bring": "[device]"},
          "value": {"type": "int", "bring": "[value]"}
        }}}""")
      e1.execute(s"run kafka consumer where ip = localhost and " +
        s"port = $kport and topic = att and dir = $land " +
        "and reset = earliest and poll = 40")
      e1.execute(s"run streamer where dir = $land and table = arows " +
        "and policy = ap and flush = 1")
      e1.execute("""schedule time = 1 hours and name = "keep" """ +
        "task sync all where table = arows")
      e1.execute("""schedule time = 1 hours and name = "paused" """ +
        "task get tables")
      // an operator-PAUSED task must come back paused after a reboot
      e1.execute("""task stop where name = "paused"""")
      // the ingest topology + standing tasks are RECORDED artifacts
      val recs = e1.execute("get artifacts")
      assert(recs.contains("kafka consumer:att") &&
        recs.contains("streamer:arows") &&
        recs.contains("task:1:keep") &&
        recs.contains("taskmode:1:paused"), recs)
      // a CONFLICTING re-declaration (same topic, different dir) is
      // refused loudly, never silently ignored
      val conflict = intercept[IllegalArgumentException](e1.execute(
        s"run kafka consumer where ip = localhost and port = $kport " +
          s"and topic = att and dir = ${root.resolve("elsewhere")} " +
          "and reset = earliest"))
      assert(conflict.getMessage.contains("different configuration"),
        conflict.getMessage)
      producer.produceStrings("att",
        (0 until 4).map(i => s"""{"device": "a$i", "value": $i}"""))
      def drain(e: graft.engine.Engine, want: Long): Long = {
        val q = e.streamerQueries("arows")
        def rows(): Long =
          try e.catalog.table("arows").count()
          catch { case _: Exception => 0L }
        val deadline = System.currentTimeMillis + 20000
        var n = rows()
        while (n < want && System.currentTimeMillis < deadline) {
          q.processAllAvailable(); Thread.sleep(60); n = rows()
        }
        n
      }
      assert(drain(e1, 4) === 4L)
      // CRASH simulation — no `exit` commands run, so the artifact
      // records survive: kill the poll thread directly and stop the
      // streaming query (in a real crash the process dies; in-process
      // the thread must die to release the topic claim)
      import scala.jdk.CollectionConverters._
      Thread.getAllStackTraces.keySet.asScala
        .filter(_.getName.startsWith("graft-kafka-consumer-"))
        .foreach(_.interrupt())
      val deadline = System.currentTimeMillis + 10000
      while (Thread.getAllStackTraces.keySet.asScala
          .exists(_.getName.startsWith("graft-kafka-consumer-")) &&
          System.currentTimeMillis < deadline) Thread.sleep(30)
      e1.streamerQueries("arows").stop()
      // messages arriving while the node is down
      producer.produceStrings("att",
        (4 until 7).map(i => s"""{"device": "a$i", "value": $i}"""))
      // reboot: ONE command restores the whole topology
      val e2 = new graft.engine.Engine(spark,
        new graft.engine.Catalog(spark, Some(root)))
      e2.dataDir = Some(root.resolve("data").toString)
      val attach = e2.execute("attach all")
      assert(attach.contains("attached kafka consumer:att") &&
        attach.contains("attached streamer:arows") &&
        attach.contains("attached task:1:keep") &&
        !attach.contains("FAILED"), attach)
      // the whole replay is IDEMPOTENT: a second attach with
      // everything already live is all no-ops, zero FAILED rows
      val again = e2.execute("attach all")
      assert(!again.contains("FAILED"), again)
      val sched = e2.execute("get scheduler 1")
      assert(sched.contains("keep"), sched)
      // the paused task re-registered AND re-paused (taskmode replay
      // sorts after the schedule replay)
      assert(sched.linesIterator.exists(l =>
        l.contains("paused") && l.contains("Stopped")), sched)
      assert(drain(e2, 7) === 7L)
      Thread.sleep(400)
      e2.streamerQueries("arows").processAllAvailable()
      import spark.implicits._
      val per = e2.catalog.table("arows").groupBy("device").count()
        .as[(String, Long)].collect().toMap
      assert(per.size === 7 && per.values.forall(_ == 1L),
        s"attach-all restart not exactly-once: $per")
      // an EXPLICIT exit undeclares: the next attach must not resurrect
      e2.execute("exit kafka consumer")
      assert(!e2.execute("get artifacts").contains("kafka consumer:att"))
      e2.execute("exit streamer")
      assert(!e2.execute("get artifacts").contains("streamer:arows"))
    } finally { producer.close(); broker.stop() }
  }
}
