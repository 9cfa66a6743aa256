package graft

import org.apache.spark.sql.functions._

/** Retention symmetry: `drop partition` must fold the dropped rows OUT
  * of every registered standing artifact over the table (or refuse
  * loudly per the deletion boundary map) — nightly retention must
  * never leave an index serving forgotten rows. */
class DropRetentionSpec extends SparkSpec {
  import spark.implicits._

  /** Day-partitioned 5-row table `pt` (2024-01-01..03) + a dimension
    * table `rd` keyed by id. */
  private def mk(dir: java.nio.file.Path)
      : (graft.engine.Catalog, graft.engine.Engine) = {
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", "a", 10L, "alpha beta gamma"),
      (2L, "2024-01-01 11:00:00", "b", 20L, "beta gamma delta"),
      (3L, "2024-01-02 10:00:00", "a", 30L, "gamma delta epsilon"),
      (4L, "2024-01-03 10:00:00", "b", 40L, "alpha alpha beta"),
      (5L, "2024-01-03 11:00:00", "a", 50L, "delta epsilon zeta"))
      .toDF("id", "ts_s", "g", "v", "text")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val p = dir.resolve("pt").toString
    graft.engine.TimePartitions.write(rows, "ts", "day", 1, p)
    val cat = new graft.engine.Catalog(spark)
    cat.registerPartitionedTable("pt", p, "ts", "day", 1)
    (1L to 5L).map(i => (i, i * 100L)).toDF("rid", "w")
      .write.parquet(dir.resolve("rd.parquet").toString)
    cat.registerTable("rd", dir.resolve("rd.parquet").toString)
    (cat, new graft.engine.Engine(spark, cat))
  }

  test("drop partition folds tombstones into matview + rollup + join " +
      "matview + tindex; every artifact equals a rebuild over the " +
      "survivors; re-run is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("dr1")
    val (_, engine) = mk(dir)
    val mv = dir.resolve("mv").toString
    engine.execute(s"matview create where table = pt and path = $mv " +
      s"""and spec = {"keys": ["g"], "aggs": [
        {"fn": "count", "alias": "n"},
        {"fn": "sum", "expr": "v", "alias": "sv"}]}""")
    val ru = dir.resolve("ru").toString
    engine.execute(s"rollup create where table = pt and path = $ru " +
      "and time = ts and value = v and grain = day")
    val jm = dir.resolve("jm").toString
    engine.execute(s"join matview create where path = $jm " +
      s"""and spec = {"left": "pt", "right": "rd",
        "on": [["id", "rid"]], "keys": ["g"], "aggs": [
        {"fn": "count", "alias": "n"},
        {"fn": "sum", "expr": "w", "alias": "sw"}]}""")
    val tx = dir.resolve("tx").toString
    engine.execute(s"tindex create where table = pt and path = $tx " +
      "and id = id and text = text")
    val dx = dir.resolve("dx").toString
    engine.execute(s"dedup index create where table = pt and path = $dx " +
      "and type = shingle and id = id and text = text and n = 2")
    val out = engine.execute("drop partition pt before 2024-01-02")
    assert(out.contains("dropped 1 partitions: 2024-01-01"), out)
    assert(out.contains(s"matview at $mv: 2 tombstones folded"), out)
    assert(out.contains("rollup at"), out)
    assert(out.contains(s"join matview at $jm: 2 tombstones folded"), out)
    assert(out.contains("tindex at"), out)
    // matview == rebuild over survivors (ids 3,4,5)
    val got = engine.execute(s"matview get where path = $mv")
    assert(got.contains(""""g":"a","n":2,"sv":80"""), got)
    assert(got.contains(""""g":"b","n":1,"sv":40"""), got)
    // join matview: a -> ids 3,5 (w 300+500), b -> id 4 (w 400)
    val jgot = engine.execute(s"join matview get where path = $jm")
    assert(jgot.contains(""""g":"a","n":2,"sw":800"""), jgot)
    assert(jgot.contains(""""g":"b","n":1,"sw":400"""), jgot)
    // rollup forgot the 2024-01-01 bucket
    val rollup = graft.ops.IndexStore.read(spark, ru).get
    assert(rollup.filter(col("grain_ts") <
      to_timestamp(lit("2024-01-02"))).count() === 0L)
    assert(rollup.count() > 0L)
    // tindex forgot doc ids 1 and 2 entirely
    val postings = graft.ops.IndexStore.read(spark, tx).get
    assert(postings.filter(col("id").isin(1L, 2L)).count() === 0L)
    assert(postings.filter(col("id") === 3L).count() > 0L)
    // dedup (shingle) index forgot them too — and the survivors'
    // df/rank re-derived (delete == rebuild-over-survivors)
    assert(out.contains("dedup index at"), out)
    val shingles = graft.ops.IndexStore.read(spark, dx).get
    assert(shingles.filter(col("id").isin(1L, 2L)).count() === 0L)
    assert(shingles.filter(col("id") === 3L).count() > 0L)
    // the partition directories are gone
    assert(graft.engine.TimePartitions.partitions(spark,
      dir.resolve("pt").toString) === Seq("2024-01-02", "2024-01-03"))
    // THE integration claim: after the drop, every artifact is
    // row-exact against a rebuild over the survivors — matview,
    // rollup, join matview, tindex AND the dedup index all VERIFY
    // (the trust-but-verify audit composes with retention)
    val audit = engine.execute("artifact verify where table = pt")
    assert(audit.linesIterator.count(_.contains("VERIFIED exact")) === 5,
      audit)
    assert(!audit.contains("DIVERGED"), audit)
    // re-run: nothing below the horizon remains — a clean no-op
    val again = engine.execute("drop partition pt before 2024-01-02")
    assert(again.contains("dropped 0 partitions"), again)
    assert(engine.execute(s"matview get where path = $mv") === got)
    assert(engine.execute("get view auto refresh")
      .contains("no fold errors"))
  }
  test("drop partition with a registered EXACT dedup index: dropped " +
      "content becomes re-INGESTABLE (no corpse hash, no corpse bloom " +
      "bits), survivors still gate, re-run is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("dr3")
    val (_, engine) = mk(dir)
    val dx = dir.resolve("dx").toString
    engine.execute(s"dedup index create where table = pt and path = $dx " +
      "and type = exact and id = id and text = text")
    def gate(rows: Seq[(Long, String)]): Map[Long, Int] = {
      val hashes = graft.ops.IndexStore.read(spark, dx).get
      val bloom = graft.ops.IndexStore.read(spark, s"$dx-bloom")
      assert(bloom.isDefined, "bloom sidecar missing")
      graft.ops.Dedup.exactGate(rows.toDF("id", "text"), hashes, bloom,
        "text", "id").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    }
    // before the drop: both day-1 texts are refused, survivor text too
    assert(gate(Seq((10L, "alpha beta gamma"), (11L, "beta gamma delta"),
      (12L, "delta epsilon zeta"))) ===
      Map(10L -> 1, 11L -> 1, 12L -> 1))
    val out = engine.execute("drop partition pt before 2024-01-02")
    assert(out.contains(s"dedup index at $dx: dropped ids tombstoned"),
      out)
    // dropped day's content re-ingestable; survivors still gate
    assert(gate(Seq((10L, "alpha beta gamma"), (11L, "beta gamma delta"),
      (12L, "delta epsilon zeta"))) ===
      Map(10L -> 0, 11L -> 0, 12L -> 1))
    // exactly-once: the drop tag makes a re-run skip the fold
    val again = engine.execute("drop partition pt before 2024-01-02")
    assert(again.contains("dropped 0 partitions"), again)
    // the exact kind rebuild-diffs in the fleet audit over survivors
    val audit = engine.execute("artifact verify where table = pt")
    assert(audit.contains("VERIFIED exact") && !audit.contains("DIVERGED"),
      audit)
  }

  test("RANDOMIZED retention schedules (seeded): PUTs into a " +
      "partitioned table interleaved with auto-refresh toggles, syncs " +
      "and partition drops keep matview + rollup + tindex verify-EXACT; " +
      "an unsynced drop aborts cleanly and sync-then-retry succeeds") {
    val rnd = new scala.util.Random(7)
    val dir = java.nio.file.Files.createTempDirectory("drr")
    // partitioned lineage-stamped base the engine PUTs into
    val p = dir.resolve("rt").toString
    val seed = Seq((1L, "2024-01-01 10:00:00", "a", "alpha beta"))
      .toDF("id", "ts_s", "g", "text")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("tsd_id", lit(0))
    graft.engine.TimePartitions.write(seed, "ts", "day", 1, p)
    val cat = new graft.engine.Catalog(spark)
    cat.registerPartitionedTable("rt", p, "ts", "day", 1)
    val engine = new graft.engine.Engine(spark, cat)
    engine.execute(s"matview create where table = rt and " +
      s"""path = ${dir.resolve("mv")} and spec = {"keys": ["g"],
        "aggs": [{"fn": "count", "alias": "n"}]}""")
    // grain COARSER than the partition unit on purpose: every drop
    // leaves the month bucket spanning survivors, so the targeted
    // re-aggregation must recompute from survivors AS OF the rollup's
    // watermark or pending rows would double-fold on the next sync
    engine.execute(s"rollup create where table = rt and " +
      s"path = ${dir.resolve("ru")} and time = ts and value = id " +
      "and grain = month")
    engine.execute(s"tindex create where table = rt and " +
      s"path = ${dir.resolve("tx")} and id = id and text = text")
    var nextId = 10L
    def put(): Unit = {
      nextId += 1
      val day = 1 + (nextId % 6)
      engine.ingest("rt", s"""{"id": $nextId, """ +
        s""""ts": "2024-01-0$day 0${nextId % 10}:00:00", """ +
        s""""g": "g${nextId % 3}", "text": "w${nextId % 5} w${nextId % 7}"}""")
    }
    def dropOldest(): Unit = {
      val parts = graft.engine.TimePartitions.partitions(spark, p)
      if (parts.length > 1) {
        val horizon = parts(1) // drop the oldest bucket only
        try engine.execute(s"drop partition rt before $horizon")
        catch { case _: IllegalArgumentException =>
          // matview behind (auto refresh off) -> subset guard aborted
          // the drop with state intact; the documented recovery is
          // sync-then-retry, which must succeed
          engine.execute("sync all where table = rt")
          engine.execute(s"drop partition rt before $horizon")
        }
      }
    }
    put(); put()
    for (_ <- 1 to 14) rnd.nextInt(6) match {
      case 0 | 1 | 2 => put()
      case 3 => engine.execute(
        s"set view auto refresh = ${if (rnd.nextBoolean()) "on" else "off"}")
      case 4 => engine.execute("sync all where table = rt")
      case _ => dropOldest()
    }
    engine.execute("set view auto refresh = on")
    engine.execute("sync all where table = rt")
    val audit = engine.execute("artifact verify where table = rt")
    assert(audit.linesIterator.count(_.contains("VERIFIED exact")) === 3,
      audit)
    assert(!audit.contains("DIVERGED"), audit)
  }

  test("drop partition REFUSES when a one-way artifact (sindex) or a " +
      "min/max matview is registered; force = true drops anyway and " +
      "records the stale artifact") {
    val dir = java.nio.file.Files.createTempDirectory("dr2")
    val (_, engine) = mk(dir)
    val sx = dir.resolve("sx").toString
    engine.execute(s"sindex create where table = pt and key = g " +
      s"and text = text and k = 4 and path = $sx")
    val err = intercept[IllegalStateException] {
      engine.execute("drop partition pt before 2024-01-02")
    }
    assert(err.getMessage.contains("sindex"), err.getMessage)
    assert(err.getMessage.contains("force = true"), err.getMessage)
    // nothing was deleted by the refusal
    assert(graft.engine.TimePartitions.partitions(spark,
      dir.resolve("pt").toString).length === 3)
    // min/max matview also refuses
    engine.execute("sindex drop where table = pt")
    val mv = dir.resolve("mvmm").toString
    engine.execute(s"matview create where table = pt and path = $mv " +
      s"""and spec = {"keys": ["g"], "aggs": [
        {"fn": "count", "alias": "n"},
        {"fn": "min", "expr": "v", "alias": "mn"}]}""")
    val err2 = intercept[IllegalStateException] {
      engine.execute("drop partition pt before 2024-01-02")
    }
    assert(err2.getMessage.contains("min/max"), err2.getMessage)
    // force: the drop happens, the stale artifact is recorded
    val out = engine.execute(
      "drop partition pt before 2024-01-02 and force = true")
    assert(out.contains("dropped 1 partitions"), out)
    assert(out.contains("STALE (forced)"), out)
    assert(engine.execute("get view auto refresh").contains("STALE"),
      "forced-stale artifact must surface in the fold error log")
  }
}
