package graft

/** Regression: `exit streamer` while a micro-batch is IN FLIGHT.
  *
  * The batch thread's foreachBatch folds standing views under the
  * engine write lock; `exit streamer` calls StreamingQuery.stop(),
  * which joins that thread. When `exit streamer` itself ran inside
  * the write lock (its old isMutating classification), a batch that
  * had data at stop time blocked on monitor entry (uninterruptible),
  * stop() never returned, and the whole write path deadlocked.
  * `exit streamer` now runs on the read-gated path — the batch only
  * ever needs the write lock (never the retention gate), so the exit
  * can wait the batch out. This spec stops the streamer exactly when
  * a batch is processing and bounds the wait. */
class StreamerExitSpec extends SparkSpec {
  import graft.engine.{Catalog, Engine}

  test("exit streamer returns while a fold-bearing batch is in flight") {
    val root = java.nio.file.Files.createTempDirectory("streamexit")
    val watch = root.resolve("watch")
    java.nio.file.Files.createDirectories(watch)
    val tbl = root.resolve("t.parquet").toString
    import spark.implicits._
    Seq(("seed", 0L)).toDF("g", "k").write.parquet(tbl)
    val cat = new Catalog(spark)
    cat.registerTable("t", tbl)
    val engine = new Engine(spark, cat)
    // a standing view so every batch takes the fold path (write lock)
    val mv = root.resolve("mv").toString
    engine.execute(s"matview create where table = t and path = $mv " +
      """and spec = {"keys": ["g"], "aggs": [{"fn": "count", "alias": "n"}]}""")
    engine.execute(s"run streamer where dir = $watch and table = t " +
      "and flush = 1")
    val q = engine.streamerQueries("t")
    // a batch big enough that append + fold takes real time
    val body = (0 until 60000)
      .map(i => s"""{"g": "g${i % 7}", "k": $i}""").mkString("\n")
    java.nio.file.Files.writeString(watch.resolve("big.json"), body)
    // wait until the query has PICKED UP the data (batch in flight)
    val t0 = System.currentTimeMillis
    while (!q.status.isDataAvailable && !q.status.isTriggerActive &&
        System.currentTimeMillis - t0 < 20000) Thread.sleep(10)
    // old classification: this call deadlocked permanently here
    val exited = new java.util.concurrent.CountDownLatch(1)
    @volatile var out = ""
    val th = new Thread(() => {
      out = engine.execute("exit streamer t"); exited.countDown() })
    th.setDaemon(true); th.start()
    assert(exited.await(60, java.util.concurrent.TimeUnit.SECONDS),
      "exit streamer deadlocked against an in-flight batch")
    assert(out === "stopped 1 streamer(s)")
    assert(!q.isActive)
    // and the write path is still alive afterwards (not wedged)
    assert(engine.execute("get status").nonEmpty)
  }

  test("exit streamer cannot 3-way deadlock with an in-flight batch " +
      "and a concurrent retention writer") {
    // The cycle the read-gated classification allowed (fair gate):
    // exit holds gate READ + joins the batch; the batch waits the
    // write lock held by `drop partition`; drop partition waits the
    // gate WRITE side queued behind exit's read hold. `exit streamer`
    // now runs unguarded, so the cycle cannot form.
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("streamexit3")
    val watch = root.resolve("watch")
    java.nio.file.Files.createDirectories(watch)
    // retention target: partitioned table with an artifact to fold
    val slPath = root.resolve("sl").toString
    import spark.implicits._
    val seed = (0 until 500).map { i =>
      (i.toLong, s"2024-01-0${1 + i % 5} 0${i % 10}:00:00",
        s"g${i % 3}", (i % 7).toLong) }
      .toDF("id", "ts_s", "g", "v")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("tsd_id", lit(0))
    graft.engine.TimePartitions.write(seed, "ts", "day", 1, slPath)
    val cat = new graft.engine.Catalog(spark)
    cat.registerPartitionedTable("sl", slPath, "ts", "day", 1)
    // streamer target
    val tbl = root.resolve("t.parquet").toString
    Seq(("seed", 0L)).toDF("g", "k").write.parquet(tbl)
    cat.registerTable("t", tbl)
    val engine = new graft.engine.Engine(spark, cat)
    engine.execute(s"matview create where table = sl and " +
      s"path = ${root.resolve("mv")} " +
      """and spec = {"keys": ["g"], "aggs": [{"fn": "count", "alias": "n"}]}""")
    engine.execute(s"matview create where table = t and " +
      s"path = ${root.resolve("mvt")} " +
      """and spec = {"keys": ["g"], "aggs": [{"fn": "count", "alias": "n"}]}""")
    engine.execute(s"run streamer where dir = $watch and table = t " +
      "and flush = 1")
    val q = engine.streamerQueries("t")
    val body = (0 until 60000)
      .map(i => s"""{"g": "g${i % 7}", "k": $i}""").mkString("\n")
    java.nio.file.Files.writeString(watch.resolve("big.json"), body)
    val t0 = System.currentTimeMillis
    while (!q.status.isDataAvailable && !q.status.isTriggerActive &&
        System.currentTimeMillis - t0 < 20000) Thread.sleep(10)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val done = new java.util.concurrent.CountDownLatch(2)
    val horizon = graft.engine.TimePartitions.partitions(spark, slPath)(2)
    val dropper = new Thread(() => {
      try engine.execute(s"drop partition sl before $horizon")
      catch { case e: Throwable => errors.add(e) }
      finally done.countDown()
    })
    val exiter = new Thread(() => {
      try engine.execute("exit streamer t")
      catch { case e: Throwable => errors.add(e) }
      finally done.countDown()
    })
    dropper.setDaemon(true); exiter.setDaemon(true)
    dropper.start(); Thread.sleep(30); exiter.start()
    assert(done.await(120, java.util.concurrent.TimeUnit.SECONDS),
      "exit streamer / drop partition / micro-batch deadlocked")
    assert(errors.isEmpty, errors.toArray.mkString("\n"))
    assert(!q.isActive)
    assert(graft.engine.TimePartitions.partitions(spark, slPath)
      .head >= horizon)
  }
}
