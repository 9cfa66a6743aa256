package graft

import org.apache.spark.sql.functions._

/** Cross-NODE tsd ledger (TsdLedger shared mode): several engine
  * processes pointing at ONE journal on a shared filesystem must agree
  * on duplicate-hash refusal and never collide on tsd ids — the fleet
  * semantics the reference gets from tsd_info being a single DBMS
  * table (dbms/db_info.py:1738, UNIQUE hash_index). Two TsdLedger
  * instances in one JVM are the two "nodes": every operation takes the
  * OS file lock + incremental journal replay, exactly the code path
  * two real processes would exercise (the JVM-wide per-path monitor
  * only serializes in-process contenders around the OS lock — the
  * file-lock protocol itself is identical).
  */
class CrossNodeLedgerSpec extends SparkSpec {
  import graft.ingest.TsdLedger

  private def pair(): (TsdLedger, TsdLedger, java.nio.file.Path) = {
    val j = java.nio.file.Files.createTempDirectory("xledger")
      .resolve("tsd_ledger.ndjson")
    (new TsdLedger(Some(j), shared = true),
      new TsdLedger(Some(j), shared = true), j)
  }

  test("duplicate hash is refused ACROSS instances without a restart, " +
      "and ids interleave without collision") {
    val (a, b, _) = pair()
    assert(a.record("d", "t", "s", "h1", "", 10L) === Some(1))
    // node B never saw h1 locally — only the shared journal knows
    assert(b.record("d", "t", "s", "h1", "", 10L) === None)
    assert(b.record("d", "t", "s", "h2", "", 20L) === Some(2))
    assert(a.record("d", "t", "s", "h3", "", 30L) === Some(3))
    // both nodes render the SAME three-batch history
    assert(a.list(Some("t")).map(e => (e.fileId, e.fileHash)) ===
      Seq((1, "h1"), (2, "h2"), (3, "h3")))
    assert(b.list(Some("t")) === a.list(Some("t")))
    assert(a.maxId("t") === 3 && b.maxId("t") === 3)
  }

  test("remove (failed-write rollback) is visible cross-node as a " +
      "tombstone: the hash becomes ingestable again, ids stay " +
      "monotonic, and a RESTARTED node replays the same state") {
    val (a, b, j) = pair()
    assert(a.record("d", "t", "s", "hx", "", 1L) === Some(1))
    assert(b.record("d", "t", "s", "hy", "", 2L) === Some(2))
    // node B rolls back hx (e.g. it learned A's write failed)
    b.remove("hx")
    // A can now re-ingest the SAME payload — with a FRESH id, never a
    // reused one (a reused id would sit below standing watermarks)
    assert(a.record("d", "t", "s", "hx", "", 1L) === Some(3))
    assert(a.list(Some("t")).map(_.fileId) === Seq(2, 3))
    // a third node constructed NOW replays append-only history
    // (including the tombstone) to the identical state
    val c = new TsdLedger(Some(j), shared = true)
    assert(c.list(Some("t")) === a.list(Some("t")))
    assert(c.record("d", "t", "s", "hz", "", 3L) === Some(4))
  }

  test("ensureAbove floor holds through cross-node refresh") {
    val (a, b, _) = pair()
    a.ensureAbove(10L)
    assert(a.record("d", "t", "s", "p1", "", 1L) === Some(11))
    // B refreshed under the lock and continues above A's journal max
    assert(b.record("d", "t", "s", "p2", "", 1L) === Some(12))
  }

  test("concurrent hammer: contested hashes record exactly once " +
      "fleet-wide, every assigned id is unique, both nodes converge") {
    val (a, b, _) = pair()
    val contested = (0 until 25).map(i => s"shared$i")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val ids = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    try {
      val tasks = (0 until 8).map { w =>
        val node = if (w % 2 == 0) a else b
        pool.submit(new Runnable {
          def run(): Unit = {
            (0 until 25).foreach { i =>
              node.record("d", "t", s"w$w", s"uniq-$w-$i", "", 1L)
                .foreach(id => assert(ids.add(id), s"id $id reused"))
              node.record("d", "t", s"w$w", contested(i), "", 1L)
                .foreach { id =>
                  assert(ids.add(id), s"id $id reused")
                  wins.incrementAndGet()
                }
            }
          }
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    // every contested hash won exactly once across all 8 writers
    assert(wins.get() === contested.size)
    val fin = a.list(Some("t"))
    assert(fin.size === 8 * 25 + contested.size)
    assert(fin.map(_.fileId).distinct.size === fin.size)
    assert(b.list(Some("t")) === fin)
  }

  test("two ENGINES over one catalog root with sharedLedger=true: the " +
      "second node's re-PUT of a payload the first already ingested " +
      "is refused live (no restart between them)") {
    val root = java.nio.file.Files.createTempDirectory("xeng")
    val catA = new graft.engine.Catalog(spark, Some(root))
    val catB = new graft.engine.Catalog(spark, Some(root))
    val nodeA = new graft.engine.Engine(spark, catA, sharedLedger = true)
    val nodeB = new graft.engine.Engine(spark, catB, sharedLedger = true)
    nodeA.dataDir = Some(root.resolve("data").toString)
    nodeB.dataDir = Some(root.resolve("data").toString)
    val payload =
      """{"id": 1, "g": "a"}""" + "\n" + """{"id": 2, "g": "b"}"""
    assert(nodeA.ingest("xt", payload) === 2L)
    // node B is ALIVE the whole time — this is the cross-node dedup
    // the restart journal alone cannot give (B's in-memory ledger
    // would accept the hash without the shared file lock + replay)
    assert(nodeB.ingest("xt", payload) === 0L,
      "cross-node duplicate PUT was re-ingested")
    assert(nodeB.ingest("xt", """{"id": 3, "g": "c"}""") === 1L)
    assert(catA.table("xt").count() === 3L)
    // tsd ids stamped by the two nodes never collided
    val ids = catA.table("xt").select(col("tsd_id").cast("long"))
      .distinct().collect().map(_.getLong(0)).sorted
    assert(ids.length === 2)
  }

  test("replay survives a journal line longer than the replay chunk: " +
      "the chunk grows to land it (no silent wedge), and a line above " +
      "the growth ceiling is skipped so every LATER entry still applies") {
    val j = java.nio.file.Files.createTempDirectory("bigline")
      .resolve("tsd_ledger.ndjson")
    val writer = new TsdLedger(Some(j), shared = true)
    val big = "x" * 5000 // instructions blob -> a ~5 KB journal line
    assert(writer.record("d", "t", "s", "h_big", big, 1L) === Some(1))
    assert(writer.record("d", "t", "s", "h_after", "", 2L) === Some(2))
    // 1 KB initial chunk: the first line never fits until growth kicks
    // in — before the fix this replay stalled at offset 0 forever
    val grown = new TsdLedger(Some(j), shared = true,
      replayChunkBytes = 1024L)
    assert(grown.list(Some("t")).map(_.fileHash) ===
      Seq("h_big", "h_after"))
    // growth CEILING below the line size: the giant line is
    // unparseable at that budget and must be SKIPPED — the entry after
    // it still applies, and so does a fresh append
    val capped = new TsdLedger(Some(j), shared = true,
      replayChunkBytes = 1024L, replayMaxChunkBytes = 2048L)
    assert(capped.list(Some("t")).map(_.fileHash) === Seq("h_after"))
    assert(capped.record("d", "t", "s", "h_new", "", 3L).nonEmpty)
  }
}
