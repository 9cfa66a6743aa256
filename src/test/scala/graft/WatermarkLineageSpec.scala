package graft

import org.apache.spark.sql.functions._

/** Lineage-watermark invariants around the SUBTRACTIVE paths (ADVICE
  * r12): watermark tags must keep a join matview's lineage alive
  * across an emptied state, and every delete-side fold (manual jmv
  * delete, drop partition) must mirror the AS-OF snapshots the state
  * was built from — unfolded rows on either side subtract nothing. */
class WatermarkLineageSpec extends SparkSpec {
  import spark.implicits._

  private def mkEngine(dataDir: java.nio.file.Path) = {
    val cat = new graft.engine.Catalog(spark)
    val engine = new graft.engine.Engine(spark, cat)
    engine.dataDir = Some(dataDir.resolve("data").toString)
    (cat, engine)
  }

  test("jmv watermark tags survive an EMPTIED state: delete every " +
      "group, sync still sees the pre-delete watermarks and a later " +
      "missed batch folds exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("wl1")
    val (_, engine) = mkEngine(dir)
    engine.ingest("el",
      Seq((1L, "x"), (2L, "y")).map { case (k, g) =>
        s"""{"lk": $k, "g": "$g"}""" }.mkString("\n"))
    engine.ingest("er",
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).map { case (k, v) =>
        s"""{"rk": $k, "v": $v}""" }.mkString("\n"))
    val p = dir.resolve("jmv").toString
    engine.execute(s"join matview create where path = $p " +
      s"""and spec = {"left": "el", "right": "er",
        "on": [["lk", "rk"]], "keys": ["g"], "aggs": [
        {"fn": "count", "alias": "n"},
        {"fn": "sum", "expr": "v", "alias": "sv"}]}""")
    // delete EVERY folded left row -> every group retires, state empties
    val allLeft = dir.resolve("all_left.parquet").toString
    engine.query("""sql edge "select * from el"""").write.parquet(allLeft)
    engine.execute(s"join matview delete where path = $p and " +
      s"side = left and source = $allLeft")
    val emptied = graft.ops.IndexStore.read(spark, p).get
    assert(emptied.count() === 0L, "state must be empty after deleting " +
      "every group")
    // rider wm columns died with the rows; the VERSION TAGS must keep
    // lineage: sync neither refuses ("no lineage watermark") nor
    // replays the still-present base rows below the watermarks
    val synced = engine.execute(s"join matview sync where path = $p")
    assert(synced.contains("in sync"), synced)
    // a batch missed while auto refresh is off folds EXACTLY itself
    engine.execute("set view auto refresh = off")
    engine.ingest("el", """{"lk": 3, "g": "x"}""")
    val synced2 = engine.execute(s"join matview sync where path = $p")
    assert(synced2.contains("1 left + 0 right missed row(s) folded"),
      synced2)
    val got = engine.execute(s"join matview get where path = $p")
    assert(got.contains(""""g":"x","n":1,"sv":30"""), got)
    assert(!got.contains(""""g":"y""""), got)
  }

  test("manual jmv delete folds against BOTH as-of snapshots: pending " +
      "other-side rows are not subtracted (silent under-count) and a " +
      "pending delete row subtracts nothing") {
    val dir = java.nio.file.Files.createTempDirectory("wl2")
    val (_, engine) = mkEngine(dir)
    // two left rows in ONE group so the buggy over-subtraction lands
    // the count on exactly zero — past the count-negative check
    engine.ingest("dl",
      Seq(1L, 2L).map(k => s"""{"lk": $k, "g": "x"}""").mkString("\n"))
    engine.ingest("dr",
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).map { case (k, v) =>
        s"""{"rk": $k, "v": $v}""" }.mkString("\n"))
    val p = dir.resolve("jmv").toString
    engine.execute(s"join matview create where path = $p " +
      s"""and spec = {"left": "dl", "right": "dr",
        "on": [["lk", "rk"]], "keys": ["g"], "aggs": [
        {"fn": "count", "alias": "n"},
        {"fn": "sum", "expr": "v", "alias": "sv"}]}""")
    // x: (1,10) + (2,20) -> n=2 sv=30
    engine.execute("set view auto refresh = off")
    // a pending right row ABOVE wmR: never folded into the state, so
    // the delete below must NOT see it — joining right-current would
    // subtract (lk=1 ⋈ rk=1,v=100) too: x -> n=0, sv=-80, the group
    // silently retired with no negative count to trip the guard
    engine.ingest("dr", """{"rk": 1, "v": 100}""")
    val delOne = dir.resolve("del1.parquet").toString
    engine.query("""sql edge "select * from dl where lk = 1"""")
      .write.parquet(delOne)
    engine.execute(s"join matview delete where path = $p and " +
      s"side = left and source = $delOne")
    val got = engine.execute(s"join matview get where path = $p")
    assert(got.contains(""""g":"x","n":1,"sv":20"""), got)
    // a pending DELETE-side row (above wmL) never contributed pairs:
    // deleting it must subtract nothing — unfiltered it would join
    // rk=3 and take x to n=0, sv=-10 (again past the negative check)
    engine.ingest("dl", """{"lk": 3, "g": "x"}""")
    val delPending = dir.resolve("del3.parquet").toString
    engine.query("""sql edge "select * from dl where lk = 3"""")
      .write.parquet(delPending)
    engine.execute(s"join matview delete where path = $p and " +
      s"side = left and source = $delPending")
    assert(engine.execute(s"join matview get where path = $p") === got,
      "deleting an unfolded row must leave the state untouched")
  }

  test("matview watermark tags survive an EMPTIED state (the jmv fix " +
      "applied to single-table matviews): delete every group, sync " +
      "still works and a later missed batch folds exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("wl4")
    val (_, engine) = mkEngine(dir)
    engine.ingest("mt",
      Seq((1L, "x"), (2L, "y")).map { case (k, g) =>
        s"""{"k": $k, "g": "$g"}""" }.mkString("\n"))
    val p = dir.resolve("mv").toString
    engine.execute(s"matview create where table = mt and path = $p " +
      s"""and spec = {"keys": ["g"], "aggs": [
        {"fn": "count", "alias": "n"},
        {"fn": "sum", "expr": "k", "alias": "sk"}]}""")
    // delete every folded row -> all groups retire, state empties
    val all = dir.resolve("all.parquet").toString
    engine.query("""sql edge "select * from mt"""").write.parquet(all)
    engine.execute(s"matview delete where path = $p and source = $all")
    // the rider wm died with the rows; the wm_ tag must keep lineage:
    // sync neither refuses nor replays the still-present base rows
    assert(engine.execute("matview sync where table = mt")
      .contains("in sync"))
    engine.execute("set view auto refresh = off")
    engine.ingest("mt", """{"k": 30, "g": "x"}""")
    val synced = engine.execute("matview sync where table = mt")
    assert(synced.contains("1 missed row(s) folded"), synced)
    val got = engine.execute(s"matview get where path = $p")
    assert(got.contains(""""g":"x","n":1,"sk":30"""), got)
    assert(!got.contains(""""g":"y""""), got)
  }

  test("a bucket RE-CREATED by late rows after its horizon was already " +
      "dropped folds again on the second drop — the exactly-once tag " +
      "keys on the drop EVENT, not the horizon") {
    val dir = java.nio.file.Files.createTempDirectory("wl5")
    val p = dir.resolve("rt").toString
    val seed = Seq((1L, "2024-01-01 10:00:00", "a"),
        (2L, "2024-01-02 10:00:00", "b"))
      .toDF("id", "ts_s", "g")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("tsd_id", lit(0))
    graft.engine.TimePartitions.write(seed, "ts", "day", 1, p)
    val cat = new graft.engine.Catalog(spark)
    cat.registerPartitionedTable("rt", p, "ts", "day", 1)
    val engine = new graft.engine.Engine(spark, cat)
    engine.dataDir = Some(dir.resolve("data").toString)
    val mv = dir.resolve("mv").toString
    engine.execute(s"matview create where table = rt and path = $mv " +
      s"""and spec = {"keys": ["g"], "aggs": [
        {"fn": "count", "alias": "n"},
        {"fn": "sum", "expr": "id", "alias": "si"}]}""")
    val out1 = engine.execute("drop partition rt before 2024-01-02")
    assert(out1.contains("tombstones folded"), out1)
    // late-arriving rows RE-CREATE the dropped bucket (auto-folded)
    engine.ingest("rt",
      """{"id": 11, "ts": "2024-01-01 05:00:00", "g": "a"}""")
    engine.ingest("rt",
      """{"id": 12, "ts": "2024-01-01 06:00:00", "g": "a"}""")
    // the same horizon drops again: a horizon-keyed tag would report
    // "already folded" and leave the matview serving ids 11+12 forever
    val out2 = engine.execute("drop partition rt before 2024-01-02")
    assert(out2.contains("dropped 1 partitions"), out2)
    assert(out2.contains("tombstones folded"), out2)
    assert(!out2.contains("already folded"), out2)
    val got = engine.execute(s"matview get where path = $mv")
    assert(got.contains(""""g":"b","n":1,"si":2"""), got)
    assert(!got.contains(""""g":"a""""), got)
    assert(engine.execute("artifact verify where table = rt")
      .contains("VERIFIED exact"))
    // and a RE-RUN at the same horizon with nothing to drop stays a
    // no-op (the retry path)
    assert(engine.execute("drop partition rt before 2024-01-02")
      .contains("dropped 0 partitions"))
  }

  test("drop partition with rows pending ABOVE the matview watermark: " +
      "folded rows subtract, pending rows drop unfolded, a later sync " +
      "replays nothing and the artifact verifies exact") {
    val dir = java.nio.file.Files.createTempDirectory("wl3")
    val p = dir.resolve("rt").toString
    val seed = Seq((1L, "2024-01-01 10:00:00", "a"),
        (2L, "2024-01-02 10:00:00", "b"))
      .toDF("id", "ts_s", "g")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("tsd_id", lit(0))
    graft.engine.TimePartitions.write(seed, "ts", "day", 1, p)
    val cat = new graft.engine.Catalog(spark)
    cat.registerPartitionedTable("rt", p, "ts", "day", 1)
    val engine = new graft.engine.Engine(spark, cat)
    engine.dataDir = Some(dir.resolve("data").toString)
    val mv = dir.resolve("mv").toString
    engine.execute(s"matview create where table = rt and path = $mv " +
      s"""and spec = {"keys": ["g"], "aggs": [
        {"fn": "count", "alias": "n"},
        {"fn": "sum", "expr": "id", "alias": "si"}]}""")
    // folded batch: auto refresh on, lands in the day-01 partition
    engine.ingest("rt",
      """{"id": 11, "ts": "2024-01-01 05:00:00", "g": "a"}""")
    // pending batch: refresh off, SAME doomed partition, above the wm
    engine.execute("set view auto refresh = off")
    engine.ingest("rt",
      """{"id": 12, "ts": "2024-01-01 06:00:00", "g": "a"}""")
    // the fold must subtract ids 1 and 11 (folded) but NOT 12 —
    // unfiltered it would take group a to n = 2 - 3 = -1 and abort a
    // perfectly legal retention drop
    val out = engine.execute("drop partition rt before 2024-01-02")
    assert(out.contains("dropped 1 partitions"), out)
    val got = engine.execute(s"matview get where path = $mv")
    assert(got.contains(""""g":"b","n":1,"si":2"""), got)
    assert(!got.contains(""""g":"a""""),
      s"group a (both folded rows dropped) must retire: $got")
    // the pending row died with its partition: sync replays NOTHING
    assert(engine.execute("matview sync where table = rt")
      .contains("in sync"))
    val audit = engine.execute("artifact verify where table = rt")
    assert(audit.contains("VERIFIED exact"), audit)
    assert(!audit.contains("DIVERGED"), audit)
  }
}
