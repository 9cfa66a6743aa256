package graft

import org.apache.spark.sql.functions._

/** The EMPTIED-state umbrella: three artifacts have now lost identity
  * that rode on state rows when every row was deleted (jmv watermarks
  * r12, matview watermarks + rollup grain r13 — each a silent
  * divergence found late). This spec pins the surviving families:
  * delete EVERYTHING out of each standing index, then fold a new
  * batch, and demand the artifact still behaves exactly (geometry
  * frozen, lineage alive, serve == rebuild). */
class EmptyStateSpec extends SparkSpec {
  import spark.implicits._

  test("vindex (sq8): delete every coded row -> geometry survives " +
      "frozen, a new batch folds and serves") {
    val dir = java.nio.file.Files.createTempDirectory("es1")
    Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
        (3L, Array(0.5f, 0.5f)), (4L, Array(0.9f, 0.1f)))
      .toDF("id", "vec")
      .write.parquet(dir.resolve("vt.parquet").toString)
    val cat = new graft.engine.Catalog(spark)
    cat.registerTable("vt", dir.resolve("vt.parquet").toString)
    val engine = new graft.engine.Engine(spark, cat)
    val vx = dir.resolve("vx").toString
    engine.execute(s"vindex create where table = vt and path = $vx " +
      "and id = id and vector = vec and type = sq8")
    engine.execute(
      "vindex delete where table = vt and ids = (1, 2, 3, 4)")
    // geometry rows (role != code) must survive the full delete
    val st = graft.ops.IndexStore.read(spark, vx).get
    assert(st.filter(col("role") =!= "code").count() > 0,
      "recorded sq8 geometry must survive an all-rows delete")
    // a refresh against the frozen geometry serves the new row
    Seq((5L, Array(0.8f, 0.2f))).toDF("id", "vec")
      .write.parquet(dir.resolve("nv.parquet").toString)
    engine.execute(s"vindex refresh where table = vt and " +
      s"source = ${dir.resolve("nv.parquet")}")
    Seq((99L, Array(0.8f, 0.2f))).toDF("id", "vec")
      .write.parquet(dir.resolve("pb.parquet").toString)
    val hit = engine.execute(s"vindex search where table = vt and " +
      s"probes = ${dir.resolve("pb.parquet")} and k = 1")
    assert(hit.contains(""""id":5"""), hit)
  }

  test("tindex: delete every posting -> a new batch folds and BM25 " +
      "serves it (df/len state restarts cleanly from empty)") {
    val dir = java.nio.file.Files.createTempDirectory("es2")
    Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta"))
      .toDF("id", "text")
      .write.parquet(dir.resolve("tt.parquet").toString)
    val cat = new graft.engine.Catalog(spark)
    cat.registerTable("tt", dir.resolve("tt.parquet").toString)
    val engine = new graft.engine.Engine(spark, cat)
    val tx = dir.resolve("tx").toString
    engine.execute(s"tindex create where table = tt and path = $tx " +
      "and id = id and text = text")
    engine.execute("tindex delete where table = tt and ids = (1, 2)")
    assert(graft.ops.IndexStore.read(spark, tx).get.count() === 0L)
    Seq((3L, "epsilon zeta alpha")).toDF("id", "text")
      .write.parquet(dir.resolve("nt.parquet").toString)
    engine.execute(s"tindex refresh where table = tt and " +
      s"source = ${dir.resolve("nt.parquet")}")
    Seq((9L, "epsilon zeta")).toDF("id", "text")
      .write.parquet(dir.resolve("pq.parquet").toString)
    val hit = engine.execute(s"tindex search where table = tt and " +
      s"probes = ${dir.resolve("pq.parquet")} and k = 1")
    assert(hit.contains(""""id":3"""), hit)
  }

  test("dedup index (shingle): delete every doc -> a new batch folds " +
      "with the RECORDED shingle width and candidates still generate") {
    val dir = java.nio.file.Files.createTempDirectory("es3")
    Seq((1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "the quick brown fox jumps over a lazy dog"))
      .toDF("doc_id", "text")
      .write.parquet(dir.resolve("dt.parquet").toString)
    val cat = new graft.engine.Catalog(spark)
    cat.registerTable("dt", dir.resolve("dt.parquet").toString)
    val engine = new graft.engine.Engine(spark, cat)
    val dx = dir.resolve("dx").toString
    engine.execute(s"dedup index create where table = dt and path = $dx " +
      "and type = shingle and id = doc_id and text = text and n = 3")
    engine.execute(
      s"dedup index delete where path = $dx and ids = (1, 2)")
    assert(graft.ops.IndexStore.read(spark, dx).get.count() === 0L)
    // refold both docs from the base — the near-identical pair must
    // still be discoverable through the refreshed index
    Seq((3L, "the quick brown fox jumps over the lazy dog"),
        (4L, "the quick brown fox jumps over a lazy dog"))
      .toDF("doc_id", "text")
      .write.parquet(dir.resolve("nd.parquet").toString)
    engine.execute(s"dedup index refresh where table = dt and " +
      s"source = ${dir.resolve("nd.parquet")}")
    val idx = graft.ops.IndexStore.read(spark, dx).get
    assert(idx.filter(col("id").isin(3L, 4L)).count() > 0, "refold missing")
    val pairs = graft.ops.Dedup.incrementalJaccard(
      Seq((5L, "the quick brown fox jumps over the lazy dog"))
        .toDF("doc_id", "text"),
      idx.localCheckpoint(), "text", "doc_id",
      shingleN = 3, threshold = 0.5)
    assert(pairs.count() > 0,
      "candidates must still generate against the refolded index")
  }

  test("rollup: a fold into an EMPTIED state keeps the registered " +
      "grain (the r13 grainOf fix, command-surface form)") {
    val dir = java.nio.file.Files.createTempDirectory("es4")
    val rows = Seq((1L, "2024-01-01 10:00:00", 10L),
        (2L, "2024-01-02 11:00:00", 20L))
      .toDF("id", "ts_s", "v")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    rows.write.parquet(dir.resolve("rt.parquet").toString)
    val cat = new graft.engine.Catalog(spark)
    cat.registerTable("rt", dir.resolve("rt.parquet").toString)
    val engine = new graft.engine.Engine(spark, cat)
    val ru = dir.resolve("ru").toString
    engine.execute(s"rollup create where table = rt and path = $ru " +
      "and time = ts and value = v and grain = day")
    // delete BOTH buckets -> state empties (base = the post-delete
    // survivor table, here empty)
    rows.select(col("id"), col("ts"), col("v"))
      .write.parquet(dir.resolve("dels.parquet").toString)
    rows.filter(lit(false)).select(col("id"), col("ts"), col("v"))
      .write.parquet(dir.resolve("after.parquet").toString)
    cat.registerTable("rt_after", dir.resolve("after.parquet").toString)
    engine.execute(s"rollup delete where table = rt and " +
      s"source = ${dir.resolve("dels.parquet")} and base = rt_after")
    assert(graft.ops.IndexStore.read(spark, ru).get.count() === 0L)
    // fold a new batch: it must land at DAY grain, not grainOf's old
    // silent "second" default
    Seq((3L, "2024-01-03 09:00:00", 30L), (4L, "2024-01-03 15:00:00", 40L))
      .toDF("id", "ts_s", "v")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .write.parquet(dir.resolve("nb.parquet").toString)
    engine.execute(s"rollup refresh where table = rt and " +
      s"source = ${dir.resolve("nb.parquet")}")
    val st = graft.ops.IndexStore.read(spark, ru).get
    assert(st.count() === 1L,
      s"two same-day rows must share ONE day bucket: ${st.count()}")
    assert(graft.ops.Rollup.grainOf(st) === "day")
  }
}
