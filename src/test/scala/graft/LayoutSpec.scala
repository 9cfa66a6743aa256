package graft

import org.apache.spark.sql.functions._

import graft.ops.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("morton Column encode round-trips through the scalar decode") {
    val pts = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val coded = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.morton(col("x"), col("y"), 5).as("z"))
      .collect()
    coded.foreach { r =>
      assert(Layout.mortonDecode(r.getLong(2), 5) ===
        (r.getLong(0), r.getLong(1)))
    }
    // bijection over the full 10-bit space
    assert(coded.map(_.getLong(2)).distinct.length === 1024)
  }

  test("candidateBuckets covers exactly the quads overlapping the box") {
    // 6-bit space, 16 buckets -> shift 8, quad side 16
    val cands = Layout.candidateBuckets(10, 20, 30, 40, bits = 6,
      numBuckets = 16)
    // brute force: bucket of every point in the box
    val brute = (for (x <- 10L to 20L; y <- 30L to 40L)
      yield {
        val z = (0 until 6).map(i =>
          (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
          .sum
        z >> 8
      }).distinct.sorted
    assert(cands.sorted === brute)
  }

  test("candidateBuckets rejects non-quad-aligned bucket counts") {
    intercept[IllegalArgumentException](
      Layout.candidateBuckets(0, 1, 0, 1, bits = 6, numBuckets = 8))
    intercept[IllegalArgumentException](
      Layout.candidateBuckets(0, 1, 0, 1, bits = 6, numBuckets = 20))
  }

  test("zorderWrite + candidate-bucket read: partition pruning reads a " +
      "strict subset of directories and loses no rows") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val ev = graft.engine.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id").as("u"),
        expr("unix_micros(ts) div 1000").as("tm"))
    Layout.zorderWrite(ev, "u", "tm", dir, bits = 10, numBuckets = 64)
    val back = spark.read.parquet(dir)
    assert(back.count() === ev.count())

    // box in QUANTIZED coordinates; zq_x/zq_y are persisted so the
    // exact predicate and the pruning filter use the same space
    val (x0, x1, y0, y1) = (256L, 511L, 256L, 511L)
    val cands = Layout.candidateBuckets(x0, x1, y0, y1, 10, 64)
    assert(cands.nonEmpty && cands.length < 64)

    val full = back.filter(col("zq_x").between(x0, x1) &&
      col("zq_y").between(y0, y1))
    val pruned = back.filter(col("zbucket").isin(cands: _*))
      .filter(col("zq_x").between(x0, x1) && col("zq_y").between(y0, y1))
    assert(pruned.count() === full.count())

    // the zbucket filter is a PARTITION filter (directory pruning —
    // no file of a pruned quad is ever opened)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("zbucket"), s"expected partition pruning:\n$plan")

    // zone-map sanity: every file's z-range stays inside its quad
    val spanBad = back
      .select(input_file_name().as("f"), col("zbucket"), col("z"))
      .groupBy("f", "zbucket").agg(min("z").as("zl"), max("z").as("zh"))
      .filter(expr("zl div 16384") =!= col("zbucket") ||
        expr("zh div 16384") =!= col("zbucket"))
      .count()
    assert(spanBad === 0L)
  }
}

class LayoutAppendSpec extends SparkSpec {
  import spark.implicits._

  test("zorderAppend codes against the RECORDED grid (clamping " +
      "out-of-range), and layout refresh serves it on the command " +
      "surface with pruning intact") {
    val dir = java.nio.file.Files.createTempDirectory("zappend")
    val p = dir.resolve("lay").toString
    val head = (1L to 4000L).map(i =>
      (i, (i * 13) % 1000, (i * 29) % 100000)).toDF("id", "u", "tm")
    graft.ops.Layout.zorderWrite(head, "u", "tm", p, 10, 64)
    // batch with in-range rows plus out-of-range outliers
    val batch = ((5001L to 6000L).map(i =>
      (i, (i * 7) % 1000, (i * 31) % 100000)) ++
      Seq((9001L, 99999L, 999999999L), (9002L, -50L, -99L)))
      .toDF("id", "u", "tm")
    graft.ops.Layout.zorderAppend(batch, "u", "tm", p, 10, 64)
    val back = spark.read.parquet(p)
    assert(back.count() === 4000L + 1000L + 2L)
    // outliers clamp to edge quads, never corrupt the lattice. Round 9:
    // the clamp is applied to the VALUE before quantization (overflow-
    // safe — an unbounded (v - lo) * 2^bits product wraps int64), so an
    // out-of-range high lands in the RECORDED max's cell: u's range is
    // 1000 < 1024 lattice cells, so max-cell = (999*1024) div 1000 =
    // 1022 (the top cell 1023 holds no real data on this grid)
    val out = back.filter(col("id") >= 9000L)
      .select(col("zq_x"), col("zq_y")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1022L, 1023L), (0L, 0L)))
    // appended rows live inside their quads like original rows
    val bad = back.filter(expr("z div 16384") =!= col("zbucket")).count()
    assert(bad === 0L)
    // command surface: register via zorder then refresh a second batch
    val cat = new graft.engine.Catalog(spark)
    val more = dir.resolve("more").toString
    (7001L to 7200L).map(i => (i, (i * 3) % 1000, (i * 17) % 100000))
      .toDF("id", "u", "tm").write.parquet(more)
    val evP = dir.resolve("ev").toString
    head.write.parquet(evP)
    cat.registerTable("ev", evP)
    val engine = new graft.engine.Engine(spark, cat)
    engine.execute(s"layout zorder where table = ev and x = u and " +
      s"y = tm and path = ${dir.resolve("lay2")} and bits = 10 " +
      "and buckets = 64")
    val reply = engine.execute("layout refresh where table = ev and " +
      s"source = $more")
    assert(reply.contains("+200 rows"), reply)
    assert(spark.read.parquet(dir.resolve("lay2").toString).count()
      === 4200L)
  }
}
