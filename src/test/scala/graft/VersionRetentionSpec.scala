package graft

import graft.ops.IndexStore

/** [[graft.ops.IndexStore]] version retention + AS-OF reads, and the
  * generic `index versions/retain/get` Engine commands — the audit
  * surface over every standing artifact's history. */
class VersionRetentionSpec extends SparkSpec {
  import spark.implicits._

  private def df(n: Int) = (1 to n).map(i => (i.toLong, s"r$i"))
    .toDF("id", "s")

  test("default retention keeps exactly current + previous; older " +
      "versions prune and refuse AS-OF reads loudly") {
    val dir = java.nio.file.Files.createTempDirectory("vr1")
      .resolve("ix").toString
    val v1 = IndexStore.write(df(1), dir)
    val v2 = IndexStore.write(df(2), dir)
    val v3 = IndexStore.write(df(3), dir)
    assert(IndexStore.committedVersions(spark, dir) === Seq(v2, v3))
    assert(IndexStore.readVersion(spark, dir, v2).count() === 2L)
    val err = intercept[IllegalArgumentException] {
      IndexStore.readVersion(spark, dir, v1)
    }
    assert(err.getMessage.contains("not a committed version"),
      err.getMessage)
    assert(err.getMessage.contains(s"$v2, $v3"), err.getMessage)
  }

  test("setRetention deepens the kept history; every retained version " +
      "reads back as the exact state its commit produced; lowering " +
      "takes effect on the next write") {
    val dir = java.nio.file.Files.createTempDirectory("vr2")
      .resolve("ix").toString
    IndexStore.setRetention(spark, dir, 4)
    val vs = (1 to 5).map(n => IndexStore.write(df(n), dir))
    // newest 4 of 5 kept
    assert(IndexStore.committedVersions(spark, dir) === vs.drop(1))
    vs.drop(1).zipWithIndex.foreach { case (v, i) =>
      assert(IndexStore.readVersion(spark, dir, v).count() === (i + 2L))
    }
    // read() still serves the CURRENT version
    assert(IndexStore.read(spark, dir).get.count() === 5L)
    // floor 2 enforced
    val err = intercept[IllegalArgumentException] {
      IndexStore.setRetention(spark, dir, 1)
    }
    assert(err.getMessage.contains("lookback"), err.getMessage)
    // lowering to 2 prunes down at the next write
    IndexStore.setRetention(spark, dir, 2)
    val v6 = IndexStore.write(df(6), dir)
    assert(IndexStore.committedVersions(spark, dir) === Seq(vs.last, v6))
  }

  test("retention survives writes (the _GRAFT_RETAIN sidecar is not " +
      "swept with legacy root files)") {
    val dir = java.nio.file.Files.createTempDirectory("vr3")
      .resolve("ix").toString
    IndexStore.setRetention(spark, dir, 3)
    (1 to 4).foreach(n => IndexStore.write(df(n), dir))
    assert(IndexStore.retention(spark, dir) === 3)
    assert(IndexStore.committedVersions(spark, dir).size === 3)
  }

  test("engine index commands: versions lists history + tags, retain " +
      "deepens it, get version = reads the exact AS-OF state") {
    val dir = java.nio.file.Files.createTempDirectory("vr4")
    val p = dir.resolve("mv").toString
    Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
      .write.parquet(dir.resolve("base.parquet").toString)
    Seq(("b", 10L), ("c", 7L)).toDF("k", "v")
      .write.parquet(dir.resolve("batch.parquet").toString)
    val cat = new graft.engine.Catalog(spark)
    cat.registerTable("base", dir.resolve("base.parquet").toString)
    val engine = new graft.engine.Engine(spark, cat)
    engine.execute(s"index retain where path = $p and keep = 4")
    engine.execute(s"matview create where table = base " +
      s"""and path = $p and spec = {"keys": ["k"], "aggs": [
        {"fn": "count", "alias": "n"}, {"fn": "sum", "expr": "v",
         "alias": "sv"}]}""")
    engine.execute(s"matview refresh where path = $p and " +
      s"source = ${dir.resolve("batch.parquet")}")
    val listing = engine.execute(s"index versions where path = $p")
    assert(listing.contains("(current)"), listing)
    assert(listing.contains("retention 4"), listing)
    val vs = IndexStore.committedVersions(spark, p)
    assert(vs.size === 2, listing)
    // AS-OF the pre-refresh state: only a and b, original sums
    val asof = engine.execute(
      s"index get where path = $p and version = ${vs.head}")
    assert(asof.contains(""""k":"a","n":1,"sv":1"""), asof)
    assert(asof.contains(""""k":"b","n":1,"sv":2"""), asof)
    assert(!asof.contains(""""k":"c""""), asof)
    // live state includes the folded batch
    val live = engine.execute(s"index get where path = $p")
    assert(live.contains(""""k":"c","n":1,"sv":7"""), live)
    // the watermark rider never leaks into the rendered audit read
    assert(!asof.contains("_graft_mv_wm"), asof)
  }
}
