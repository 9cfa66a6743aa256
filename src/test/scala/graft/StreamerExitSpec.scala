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
}
