package graft

import org.apache.spark.sql.functions._

import graft.ingest.SchemaInference._
import graft.ingest.MappingPolicy

class SchemaInferenceSpec extends SparkSpec {

  test("value inference follows the reference rules") {
    assert(inferValue("x", true) === ELBool)
    assert(inferValue("x", 5) === ELInt)
    assert(inferValue("x", 0x5F5E0FFL) === ELInt)
    assert(inferValue("x", 0x5F5E100L) === ELBigInt)
    assert(inferValue("x", 3.14) === ELDecimal)       // 2 fraction digits
    assert(inferValue("x", 3.14159265) === ELFloat)   // > 5 fraction digits
    assert(inferValue("x", "550e8400-e29b-41d4-a716-446655440000") === ELUuid)
    assert(inferValue("x", "2024-01-02 10:00:00") === ELTimestamp)
    assert(inferValue("x", "2024-01-02") === ELDate)
    assert(inferValue("x", "10:00:00") === ELTime)
    assert(inferValue("x", "192.168.1.1") === ELCidr)
    assert(inferValue("x", "short") === ELChar(5))
    assert(inferValue("x", "longer than eight") === ELVarchar)
    assert(inferValue("x", Seq(1, 2)) === ELVarchar)  // lists -> VARCHAR
  }

  test("negative integer strings type as INT/BIGINT; empty strings " +
      "as VARCHAR (reference parity, suggest_create_table.py:188/:208)") {
    assert(inferValue("x", "-5") === ELInt)
    assert(inferValue("x", "-12345678") === ELInt) // len 9 incl. '-'
    assert(inferValue("x", "-999999999") === ELBigInt) // len 10
    assert(inferValue("x", "") === ELVarchar) // never CHAR(0) DDL
    // a column mixing "5" and "-5" stays integer, not VARCHAR
    assert(widen(inferValue("x", "5"), inferValue("x", "-5")) === ELInt)
  }

  test("'*time*'-named digit strings become TIMESTAMP (>= year 2000)") {
    assert(inferValue("event_time", "1700000000") === ELTimestamp)
    assert(inferValue("event_time", "900000000") === ELBigInt)
    assert(inferValue("counter", "1700000000") === ELBigInt)
  }

  test("explicit widening pairs from resolve_data_type") {
    assert(widen(ELInt, ELDecimal) === ELDecimal)
    assert(widen(ELDecimal, ELFloat) === ELFloat)
    assert(widen(ELInt, ELBigInt) === ELBigInt)
    assert(widen(ELChar(3), ELChar(7)) === ELChar(7))
    assert(widen(ELInt, ELVarchar) === ELVarchar)
    assert(widen(ELBool, ELInt) === ELVarchar)
  }

  // the lattice is finite -> verify the join laws EXHAUSTIVELY
  private val allTypes: Seq[ELType] =
    Seq(ELBool, ELInt, ELBigInt, ELDecimal, ELFloat, ELUuid, ELTimestamp,
      ELDate, ELTime, ELCidr, ELVarchar) ++ (1 to 8).map(ELChar)

  test("widen is a join: idempotent, commutative, associative (exhaustive)") {
    for (a <- allTypes) assert(widen(a, a) === a)
    for (a <- allTypes; b <- allTypes)
      assert(widen(a, b) === widen(b, a))
    for (a <- allTypes; b <- allTypes; c <- allTypes)
      assert(widen(widen(a, b), c) === widen(a, widen(b, c)))
  }

  test("inferSchema is order-insensitive") {
    val rows = Seq(
      Map[String, Any]("a" -> 1, "b" -> "2024-01-01"),
      Map[String, Any]("a" -> 2.5, "b" -> "2024-01-01 10:00:00"),
      Map[String, Any]("a" -> 99999999999L, "c" -> "x"))
    val fwd = inferSchema(rows).toMap
    val rev = inferSchema(rows.reverse).toMap
    assert(fwd === rev)
    // INT widen DECIMAL -> DECIMAL, then DECIMAL widen BIGINT -> DECIMAL
    assert(fwd("a") === ELDecimal)
  }

  test("suggestCreate leads with the four system columns") {
    val sch = suggestCreate(Seq(Map("temp" -> 21.5, "device" -> "abc")))
    assert(sch.fieldNames.take(4) ===
      Array("row_id", "insert_timestamp", "tsd_name", "tsd_id"))
    assert(sch.fieldNames.drop(4) === Array("temp", "device"))
  }
}

class MappingPolicySpec extends SparkSpec {
  import spark.implicits._

  private val policyJson = """
  {"mapping": {
    "dbms": "iot", "table": "readings", "readings": "readings",
    "condition": "value is not null",
    "schema": {
      "device": {"type": "varchar", "bring": "[device]"},
      "ts": {"type": "timestamp", "bring": "[timestamp]"},
      "value": {"type": "float", "bring": "[value]"},
      "unit": {"type": "varchar", "bring": "[unit]", "default": "C"}
    }}}"""

  private val doc =
    """{"device_group": "g1", "readings": [
      {"device": "d1", "timestamp": "2024-01-01 10:00:00", "value": 21.5, "unit": "F"},
      {"device": "d2", "timestamp": "2024-01-01 10:00:05", "value": 22.0},
      {"device": "d3", "timestamp": "2024-01-01 10:00:10"}
    ]}"""

  test("policy JSON parses to the model") {
    val p = MappingPolicy.fromJson(policyJson)
    assert(p.dbms === "iot")
    assert(p.readings === Some("readings"))
    assert(p.columns.map(_.name).toSet === Set("device", "ts", "value", "unit"))
    assert(p.columns.find(_.name == "unit").get.default === Some("C"))
  }

  test("readings fan out to rows; defaults fill; condition filters") {
    val p = MappingPolicy.fromJson(policyJson)
    val out = MappingPolicy.compile(p, Seq(doc).toDF("value"), "value")
      .orderBy("device").collect()
    // d3 has no value -> dropped by the condition
    assert(out.map(_.getString(0)).toSeq === Seq("d1", "d2"))
    assert(out(0).getAs[Double]("value") === 21.5)
    assert(out(0).getAs[String]("unit") === "F")
    assert(out(1).getAs[String]("unit") === "C") // default applied
    assert(out(0).getAs[java.sql.Timestamp]("ts") ===
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00"))
  }

  test("regex extraction and nested root paths") {
    val p = MappingPolicy.Policy("db", "t", None, Seq(
      MappingPolicy.ColumnSpec("num", "int", "[msg]",
        regex = Some("id=(\\d+)")),
      MappingPolicy.ColumnSpec("city", "varchar", "[loc][city]")))
    val out = MappingPolicy.compile(p,
      Seq("""{"msg": "id=42 ok", "loc": {"city": "berlin"}}""").toDF("value"))
      .head()
    assert(out.getAs[Int]("num") === 42)
    assert(out.getAs[String]("city") === "berlin")
  }
}

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._
  import graft.streaming.StreamOps
  import graft.streaming.StreamOps._

  test("conditions split store/drop/alert") {
    val df = Seq((1, 10.0), (2, 150.0), (3, -5.0)).toDF("id", "v")
    val (kept, alerts) = StreamOps.applyConditions(df, Seq(
      Condition("v < 0", Drop),
      Condition("v > 100", Alert("high"))))
    assert(kept.select("id").as[Int].collect().sorted === Array(1, 2))
    val a = alerts.collect()
    assert(a.length === 1)
    assert(a.head.getAs[Int]("id") === 2)
    assert(a.head.getAs[String]("alert_tag") === "high")
  }

  test("monitor aggregates tumbling intervals with alert flag") {
    val df = Seq(
      ("2024-01-01 00:00:10", "t1", 10.0),
      ("2024-01-01 00:00:50", "t1", 30.0),
      ("2024-01-01 00:01:10", "t1", 300.0))
      .toDF("ts0", "k", "v")
      .select(to_timestamp($"ts0").as("ts"), $"k", $"v")
    val out = StreamOps.monitor(df, "ts", "k", "v", 60,
      alertAvgAbove = Some(100.0)).orderBy("interval.start").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Double]("sum_value") === 40.0)
    assert(out(0).getAs[Boolean]("alert") === false)
    assert(out(1).getAs[Boolean]("alert") === true)
  }

  test("streamingDedup keeps first occurrence per key across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val src = mem.toDF().toDF("k", "v")
    val deduped = StreamOps.streamingDedup(src, "k")
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      mem.addData(("a", 1.0), ("a", 2.0), ("b", 3.0))
      q.processAllAvailable()
      mem.addData(("a", 4.0), ("c", 5.0)) // 'a' already seen -> dropped
      q.processAllAvailable()
      val rows = spark.table("sdedup").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).sortBy(_._1)
      assert(rows.toSeq === Seq("a" -> 1.0, "b" -> 3.0, "c" -> 5.0))
    } finally q.stop()
  }

  test("streaming clean chain: quality filter + content-hash dedup " +
      "(the q57 dedup_exact/quality stages as a live stream)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val src = mem.toDF().toDF("doc_id", "text")
      // quality gate: >= 3 whitespace tokens (Condition exprs compile to
      // Catalyst filters, so the same rule text works batch or stream)
      .filter(expr("size(filter(split(text, ' '), t -> t != '')) >= 3"))
      .withColumn("h", md5(col("text")))
    val cleaned = StreamOps.streamingDedup(src, "h")
    val q = cleaned.writeStream.format("memory").queryName("sclean")
      .outputMode("append").start()
    try {
      mem.addData((1L, "alpha beta gamma"), (2L, "too short"),
        (3L, "alpha beta gamma")) // 3 dup of 1 within the batch
      q.processAllAvailable()
      mem.addData((4L, "alpha beta gamma"), // dup of 1 across batches
        (5L, "delta epsilon zeta eta"))
      q.processAllAvailable()
      val ids = spark.table("sclean").select("doc_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 5L)) // 2 quality-dropped; 3,4 deduped
    } finally q.stop()
  }

  test("monitor works on a stream with watermark (bounded state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val src = mem.toDF().toDF("ts", "k", "v").withWatermark("ts", "2 minutes")
    val agg = StreamOps.monitor(src, "ts", "k", "v", 60)
    val q = agg.writeStream.format("memory").queryName("mon")
      .outputMode("complete").start()
    try {
      mem.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 00:00:10"), "t1", 5.0),
        (java.sql.Timestamp.valueOf("2024-01-01 00:00:20"), "t1", 7.0))
      q.processAllAvailable()
      val rows = spark.table("mon").collect()
      assert(rows.length === 1)
      assert(rows.head.getAs[Long]("events_count") === 2)
    } finally q.stop()
  }

  test("nearDupIngestBatch gates micro-batches against the standing index") {
    import spark.implicits._
    import graft.ops.Dedup
    val idxDir = java.nio.file.Files.createTempDirectory("ndgate")
      .resolve("idx").toString
    def body(i: Long) = (0 until 12).map(j => s"w${i}_$j").mkString(" ")
    // batch 1: two distinct docs + a within-batch twin of doc 0
    val b1 = Seq((0L, body(0)), (1L, body(1)), (2L, body(0)))
      .toDF("doc_id", "text")
    val k1 = graft.streaming.StreamOps
      .nearDupIngestBatch(b1, idxDir, "text", "doc_id")
    assert(k1.select("doc_id").as[Long].collect().sorted.toSeq
      === Seq(0L, 1L)) // lower id of the twin pair survives
    // batch 2: a cross-batch twin of doc 1 + one genuinely new doc
    val b2 = Seq((10L, body(1)), (11L, body(7))).toDF("doc_id", "text")
    val k2 = graft.streaming.StreamOps
      .nearDupIngestBatch(b2, idxDir, "text", "doc_id")
    assert(k2.select("doc_id").as[Long].collect().toSeq === Seq(11L))
    // batch 3: a twin of the doc ADMITTED in batch 2 — the index grew
    val b3 = Seq((20L, body(7))).toDF("doc_id", "text")
    val k3 = graft.streaming.StreamOps
      .nearDupIngestBatch(b3, idxDir, "text", "doc_id")
    assert(k3.count() === 0)
    // the on-disk index is exactly the index of every accepted doc
    val allKept = Seq((0L, body(0)), (1L, body(1)), (11L, body(7)))
      .toDF("doc_id", "text")
    val expected = Dedup.shingleIndex(allKept, "text", "doc_id")
    val onDisk = graft.ops.IndexStore.read(spark, idxDir).get
      .select("id", "h", "df", "pos", "n")
    assert(onDisk.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(onDisk).count() === 0)
  }

  test("dedup index delete command: tombstoned docs leave the standing " +
      "shingle index == rebuild over survivors; the gate re-admits a " +
      "twin of a forgotten doc") {
    import spark.implicits._
    import graft.ops.Dedup
    val idxDir = java.nio.file.Files.createTempDirectory("nddel")
      .resolve("idx").toString
    def body(i: Long) = (0 until 12).map(j => s"w${i}_$j").mkString(" ")
    val b1 = Seq((0L, body(0)), (1L, body(1)), (2L, body(2)))
      .toDF("doc_id", "text")
    graft.streaming.StreamOps
      .nearDupIngestBatch(b1, idxDir, "text", "doc_id")
    val engine = new graft.engine.Engine(spark,
      new graft.engine.Catalog(spark))
    val out = engine.execute(
      s"dedup index delete where path = $idxDir and ids = (1)")
    assert(out.contains("1 doc(s) deleted"), out)
    assert(out.contains("2 remain"), out)
    // delete == rebuild over the survivors (df/pos/n re-derived)
    val expected = Dedup.shingleIndex(
      Seq((0L, body(0)), (2L, body(2))).toDF("doc_id", "text"),
      "text", "doc_id")
    val onDisk = graft.ops.IndexStore.read(spark, idxDir).get
      .select("id", "h", "df", "pos", "n")
    assert(onDisk.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(onDisk).count() === 0)
    // right-to-be-forgotten semantics: a twin of the FORGOTTEN doc is
    // new again (the gate no longer remembers doc 1's shingles)
    val twin = Seq((30L, body(1))).toDF("doc_id", "text")
    val k = graft.streaming.StreamOps
      .nearDupIngestBatch(twin, idxDir, "text", "doc_id")
    assert(k.select("doc_id").as[Long].collect().toSeq === Seq(30L))
  }

  test("hammingIngestBatch: the production-geometry gate dedups across " +
      "batches on simhash64, folds (id, sig) state, replays " +
      "idempotently, fold == rebuild") {
    import spark.implicits._
    import graft.ops.Dedup
    val idxDir = java.nio.file.Files.createTempDirectory("hamgate")
      .resolve("idx").toString
    def body(i: Long) = (0 until 12).map(j => s"w${i}_$j").mkString(" ")
    // batch 1: two distinct docs + a verbatim within-batch twin
    val b1 = Seq((0L, body(0)), (1L, body(1)), (2L, body(0)))
      .toDF("doc_id", "text")
    val k1 = graft.streaming.StreamOps
      .hammingIngestBatch(b1, idxDir, "text", "doc_id")
    assert(k1.select("doc_id").as[Long].collect().sorted.toSeq
      === Seq(0L, 1L))
    // batch 2: a cross-batch twin of doc 1 + a genuinely new doc
    val b2 = Seq((10L, body(1)), (11L, body(7))).toDF("doc_id", "text")
    val k2 = graft.streaming.StreamOps
      .hammingIngestBatch(b2, idxDir, "text", "doc_id")
    assert(k2.select("doc_id").as[Long].collect().toSeq === Seq(11L))
    // replay of batch 2 (crash before corpus append): same kept set,
    // byte-identical index
    val before = graft.ops.IndexStore.read(spark, idxDir).get
      .collect().toSet
    val k2r = graft.streaming.StreamOps
      .hammingIngestBatch(b2, idxDir, "text", "doc_id")
    assert(k2r.select("doc_id").as[Long].collect().toSeq === Seq(11L))
    assert(graft.ops.IndexStore.read(spark, idxDir).get
      .collect().toSet === before)
    // on-disk state == simhashIndex of every accepted doc
    val allKept = Seq((0L, body(0)), (1L, body(1)), (11L, body(7)))
      .toDF("doc_id", "text")
    assert(before === Dedup.simhashIndex(allKept, "text", "doc_id")
      .collect().toSet)
    // tombstones: forget doc 1, a twin of it is new again
    assert(graft.ops.IndexStore.read(spark, idxDir).isDefined)
    graft.ops.IndexStore.write(
      Dedup.deleteFromSimhashIndex(
        graft.ops.IndexStore.read(spark, idxDir).get,
        Seq(1L).toDF("doc_id")), idxDir)
    val twin = Seq((30L, body(1))).toDF("doc_id", "text")
    assert(graft.streaming.StreamOps
      .hammingIngestBatch(twin, idxDir, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSeq === Seq(30L))
  }

  test("nearDupIngestBatch replay is idempotent: a crashed batch re-runs " +
      "to the same kept set and a byte-identical index") {
    import spark.implicits._
    val idxDir = java.nio.file.Files.createTempDirectory("ndreplay")
      .resolve("idx").toString
    def body(i: Long) = (0 until 12).map(j => s"r${i}_$j").mkString(" ")
    val b1 = Seq((0L, body(0)), (1L, body(1))).toDF("doc_id", "text")
    graft.streaming.StreamOps
      .nearDupIngestBatch(b1, idxDir, "text", "doc_id")
    // batch 2 commits its index fold, then "crashes" before the caller
    // appends kept to the corpus sink (we just drop the return value)
    val b2 = Seq((10L, body(2)), (11L, body(1))).toDF("doc_id", "text")
    val k2a = graft.streaming.StreamOps
      .nearDupIngestBatch(b2, idxDir, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val idxAfterCrash = graft.ops.IndexStore.read(spark, idxDir).get
      .collect().map(_.toString).sorted
    // foreachBatch replays the SAME batch against the index that
    // already contains it: self-matches are excluded, so doc 10 is
    // re-accepted (not rejected by its own ghost entry)
    val k2b = graft.streaming.StreamOps
      .nearDupIngestBatch(b2, idxDir, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(k2a === Seq(10L) && k2b === k2a)
    val idxAfterReplay = graft.ops.IndexStore.read(spark, idxDir).get
      .collect().map(_.toString).sorted
    assert(idxAfterReplay === idxAfterCrash) // no duplicate index rows
  }

  test("embeddingIngestBatch: the vector gate dedups across batches, " +
      "records its geometry, and replays idempotently") {
    import spark.implicits._
    val idxDir = java.nio.file.Files.createTempDirectory("embgate")
      .resolve("idx").toString
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(16)(rnd.nextGaussian().toFloat)
    def twin(v: Array[Float]) = v.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
    val v0 = vec(); val v1 = vec(); val v7 = vec()
    // batch 1: two distinct vectors + a within-batch twin of v0
    val b1 = Seq((0L, v0), (1L, v1), (2L, twin(v0))).toDF("vec_id", "embedding")
    val k1 = graft.streaming.StreamOps
      .embeddingIngestBatch(b1, idxDir, "embedding", "vec_id",
        threshold = 0.9, bits = 8, tables = 4)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(k1 === Seq(0L, 1L))
    // batch 2: a cross-batch twin of v1 + one genuinely new vector
    val b2 = Seq((10L, twin(v1)), (11L, v7)).toDF("vec_id", "embedding")
    val k2 = graft.streaming.StreamOps
      .embeddingIngestBatch(b2, idxDir, "embedding", "vec_id",
        threshold = 0.9)
      .select("vec_id").as[Long].collect().toSeq
    assert(k2 === Seq(11L))
    // the index holds exactly the accepted ids with batch-1's geometry
    val idx = graft.ops.IndexStore.read(spark, idxDir).get
    assert(idx.select("id").as[Long].collect().sorted.toSeq
      === Seq(0L, 1L, 11L))
    assert(idx.select("bits", "tables").distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq === Seq((8, 4)))
    // replay of batch 2 (crash between index commit and corpus append):
    // same kept set, byte-identical index
    val before = idx.collect().map(_.toString).sorted
    val k2b = graft.streaming.StreamOps
      .embeddingIngestBatch(b2, idxDir, "embedding", "vec_id",
        threshold = 0.9)
      .select("vec_id").as[Long].collect().toSeq
    assert(k2b === k2)
    val after = graft.ops.IndexStore.read(spark, idxDir).get
      .collect().map(_.toString).sorted
    assert(after === before)
    // tombstones: forget v1, its twin gates as NEW again and the
    // surviving rows keep the recorded geometry
    graft.ops.IndexStore.write(
      graft.ops.Dedup.deleteFromEmbeddingIndex(
        graft.ops.IndexStore.read(spark, idxDir).get,
        Seq(1L).toDF("vec_id")), idxDir)
    val k3 = graft.streaming.StreamOps
      .embeddingIngestBatch(
        Seq((30L, twin(v1))).toDF("vec_id", "embedding"),
        idxDir, "embedding", "vec_id", threshold = 0.9)
      .select("vec_id").as[Long].collect().toSeq
    assert(k3 === Seq(30L))
    assert(graft.ops.IndexStore.read(spark, idxDir).get
      .select("bits", "tables").distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq === Seq((8, 4)))
  }

  test("embeddingIngestBatch auto-geometry: an index born small " +
      "re-derives its width when the corpus outgrows it") {
    import spark.implicits._
    val idxDir = java.nio.file.Files.createTempDirectory("embgrow")
      .resolve("idx").toString
    val rnd = new scala.util.Random(11)
    def vec() = Array.fill(16)(rnd.nextGaussian().toFloat)
    def gate(rows: Seq[(Long, Array[Float])]) = graft.streaming.StreamOps
      .embeddingIngestBatch(rows.toDF("vec_id", "embedding"), idxDir,
        "embedding", "vec_id", threshold = 0.9, targetRows = 8L)
    def geometry() = graft.ops.IndexStore.read(spark, idxDir).get
      .select("bits", "tables").distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    gate((0L until 50L).map(i => (i, vec())))
    assert(geometry() === Seq((4, graft.ops.Dedup.deriveTables(4))))
    // +250 distinct vectors: occupancy at 4 bits blows past 2x the
    // 8-row target -> the fold re-derives (6, deriveTables(6)) from the
    // index's own rows, corpus never re-read
    gate((100L until 350L).map(i => (i, vec())))
    val b = graft.ops.Dedup.deriveBits(
      graft.ops.IndexStore.read(spark, idxDir).get.count(), 8L)
    assert(b > 5)
    assert(geometry() === Seq((b, graft.ops.Dedup.deriveTables(b))))
  }
}

class IndexStoreSpec extends SparkSpec {
  import graft.ops.IndexStore

  private def tmp() = java.nio.file.Files
    .createTempDirectory("idxstore").resolve("idx").toString

  test("write/read roundtrip, versions increment, one previous version " +
      "retained for in-flight readers, older pruned") {
    import spark.implicits._
    val dir = tmp()
    assert(IndexStore.read(spark, dir).isEmpty && !IndexStore.exists(spark, dir))
    assert(IndexStore.write(Seq((1L, "a")).toDF("id", "x"), dir) === 1L)
    assert(IndexStore.write(Seq((2L, "b")).toDF("id", "x"), dir) === 2L)
    assert(IndexStore.currentVersion(spark, dir) === Some(2L))
    assert(IndexStore.read(spark, dir).get.collect().map(_.getLong(0))
      .toSeq === Seq(2L))
    // v=1 retained after v=2's commit (a reader resolved before the
    // commit may still be scanning it) ...
    val root = dir.stripPrefix("file:")
    assert(new java.io.File(s"$root/v=1").exists())
    // ... and pruned once v=3 lands (readers lag at most one write)
    assert(IndexStore.write(Seq((3L, "c")).toDF("id", "x"), dir) === 3L)
    assert(!new java.io.File(s"$root/v=1").exists())
    assert(new java.io.File(s"$root/v=2").exists())
    assert(IndexStore.read(spark, dir).get.collect().map(_.getLong(0))
      .toSeq === Seq(3L))
  }

  test("a write that dies mid-flight leaves the previous version live " +
      "and the next write recovers") {
    import spark.implicits._
    val dir = tmp()
    IndexStore.write(Seq((1L, "good")).toDF("id", "x"), dir)
    // poisoned frame: evaluation throws inside the parquet write job
    val poisoned = Seq(1L, 2L).toDF("id")
      .select(col("id"), udf((i: Long) =>
        if (i > 1L) throw new RuntimeException("injected crash")
        else "v").apply(col("id")).as("x"))
    intercept[Exception] { IndexStore.write(poisoned, dir) }
    // the committed index is untouched by the dead write
    assert(IndexStore.currentVersion(spark, dir) === Some(1L))
    assert(IndexStore.read(spark, dir).get.select("x").head().getString(0)
      === "good")
    // and the store recovers: the next commit lands above the dirty dir
    val v = IndexStore.write(Seq((3L, "after")).toDF("id", "x"), dir)
    assert(v > 1L && IndexStore.read(spark, dir).get
      .select("x").head().getString(0) === "after")
  }

  test("legacy root-level parquet is readable and upgraded on first write") {
    import spark.implicits._
    val dir = tmp()
    Seq((7L, "legacy")).toDF("id", "x").write.parquet(dir)
    assert(IndexStore.exists(spark, dir))
    assert(IndexStore.read(spark, dir).get.head().getLong(0) === 7L)
    IndexStore.write(Seq((8L, "versioned")).toDF("id", "x"), dir)
    assert(IndexStore.read(spark, dir).get.head().getLong(0) === 8L)
    // root data files removed after the versioned commit
    val root = new java.io.File(dir.stripPrefix("file:"))
    assert(!root.listFiles().exists(f => f.isFile &&
      f.getName.endsWith(".parquet")))
  }
}

class MqttBrokerSpec extends SparkSpec {
  import graft.streaming.{MqttBroker, TopicRouter}
  import graft.ingest.MappingPolicy

  // raw MQTT 3.1.1 client frames — no client library needed
  private def connectPacket: Array[Byte] = {
    val varHeader = Array[Byte](0, 4, 'M', 'Q', 'T', 'T', 4, 2, 0, 60)
    val clientId = "graft-test".getBytes("UTF-8")
    val payload = Array[Byte](0, clientId.length.toByte) ++ clientId
    Array[Byte](0x10, (varHeader.length + payload.length).toByte) ++
      varHeader ++ payload
  }
  private def publishPacket(topic: String, msg: String, qos: Int,
      packetId: Int = 7, dup: Boolean = false): Array[Byte] = {
    val t = topic.getBytes("UTF-8")
    val m = msg.getBytes("UTF-8")
    val pid = if (qos > 0) Array[Byte](((packetId >> 8) & 0xff).toByte,
      (packetId & 0xff).toByte) else Array.emptyByteArray
    val body = Array[Byte](0, t.length.toByte) ++ t ++ pid ++ m
    require(body.length < 128) // single-byte remaining length in tests
    val dupBit = if (dup) 0x08 else 0x00
    Array[Byte]((0x30 | dupBit | (qos << 1)).toByte, body.length.toByte) ++
      body
  }

  test("raw MQTT publishes arrive at the sink; QoS 1 gets PUBACK") {
    val got = new java.util.concurrent.CopyOnWriteArrayList[(String, String)]
    val broker = new MqttBroker((t, p) => got.add((t, p)))
    val port = broker.start()
    try {
      val sock = new java.net.Socket("localhost", port)
      val out = sock.getOutputStream
      val in = sock.getInputStream
      out.write(connectPacket); out.flush()
      val connack = new Array[Byte](4)
      assert(in.read(connack) === 4 && connack(0) === 0x20.toByte)
      out.write(publishPacket("factory/temp",
        """{"device": "t1", "value": 21.5}""", qos = 0)); out.flush()
      out.write(publishPacket("factory/pressure",
        """{"device": "p1", "value": 2.5}""", qos = 1, packetId = 42))
      out.flush()
      val puback = new Array[Byte](4)
      assert(in.read(puback) === 4)
      assert(puback(0) === 0x40.toByte && puback(3) === 42.toByte)
      // PINGREQ -> PINGRESP
      out.write(Array[Byte](0xc0.toByte, 0x00)); out.flush()
      val ping = new Array[Byte](2)
      assert(in.read(ping) === 2 && ping(0) === 0xd0.toByte)
      sock.close()
      val deadline = System.currentTimeMillis + 5000
      while (got.size < 2 && System.currentTimeMillis < deadline)
        Thread.sleep(20)
      assert(got.size === 2)

      // the broker's frames drive the SAME TopicRouter chain as files
      import spark.implicits._
      val frames = got.toArray.map(_.asInstanceOf[(String, String)]).toSeq
        .toDF("topic", "value")
      val policy = MappingPolicy.Policy("edge", "temps", None, Seq(
        MappingPolicy.ColumnSpec("device", "varchar", "[device]"),
        MappingPolicy.ColumnSpec("value", "float", "[value]")))
      val routed = TopicRouter.route(frames,
        Seq(TopicRouter.Route("^factory/temp$", policy)))
      val rows = routed(("edge", "temps")).collect()
      assert(rows.length === 1)
      assert(rows.head.getString(0) === "t1")
    } finally broker.stop()
  }

  test("QoS 2 retransmit before PUBREL is delivered exactly once") {
    val got = new java.util.concurrent.CopyOnWriteArrayList[String]
    val broker = new MqttBroker((_, p) => got.add(p))
    val port = broker.start()
    try {
      val sock = new java.net.Socket("localhost", port)
      val out = sock.getOutputStream
      val in = sock.getInputStream
      out.write(connectPacket); out.flush()
      val connack = new Array[Byte](4)
      assert(in.read(connack) === 4)
      def expect4(tpe: Byte, pid: Int): Unit = {
        val buf = new Array[Byte](4)
        var off = 0
        while (off < 4) { val r = in.read(buf, off, 4 - off)
          assert(r > 0); off += r }
        assert(buf(0) === tpe && buf(3) === (pid & 0xff).toByte)
      }
      out.write(publishPacket("t", "m1", qos = 2, packetId = 9)); out.flush()
      expect4(0x50, 9) // PUBREC
      // sender retransmits (DUP=1, same id) before completing with
      // PUBREL — MQTT 3.1.1 §4.3.3: must NOT be delivered again
      out.write(publishPacket("t", "m1", qos = 2, packetId = 9, dup = true))
      out.flush()
      expect4(0x50, 9) // PUBREC re-sent, no second delivery
      out.write(Array[Byte](0x62, 0x02, 0x00, 0x09)); out.flush() // PUBREL
      expect4(0x70, 9) // PUBCOMP
      // a NEW exchange reusing the id after PUBREL is a fresh message
      out.write(publishPacket("t", "m2", qos = 2, packetId = 9)); out.flush()
      expect4(0x50, 9)
      sock.close()
      val deadline = System.currentTimeMillis + 5000
      while (got.size < 2 && System.currentTimeMillis < deadline)
        Thread.sleep(20)
      assert(got.toArray.toSeq === Seq("m1", "m2"))
    } finally broker.stop()
  }

  test("QoS 2 state survives reconnect: retransmit on a NEW connection " +
      "is still suppressed") {
    val got = new java.util.concurrent.CopyOnWriteArrayList[String]
    val broker = new MqttBroker((_, p) => got.add(p))
    val port = broker.start()
    try {
      def expect4(in: java.io.InputStream, tpe: Byte, pid: Int): Unit = {
        val buf = new Array[Byte](4)
        var off = 0
        while (off < 4) { val r = in.read(buf, off, 4 - off)
          assert(r > 0); off += r }
        assert(buf(0) === tpe && buf(3) === (pid & 0xff).toByte)
      }
      // session 1: QoS 2 PUBLISH, PUBREC received, then the TCP
      // connection drops BEFORE the sender's PUBREL
      val s1 = new java.net.Socket("localhost", port)
      s1.getOutputStream.write(connectPacket); s1.getOutputStream.flush()
      expect4(s1.getInputStream, 0x20, 0)
      s1.getOutputStream.write(publishPacket("t", "m1", qos = 2,
        packetId = 9))
      s1.getOutputStream.flush()
      expect4(s1.getInputStream, 0x50, 9)
      s1.close()
      // session 2 (same client id): retransmit DUP=1 with the same
      // packet id — exactly-once must hold ACROSS connections
      val s2 = new java.net.Socket("localhost", port)
      s2.getOutputStream.write(connectPacket); s2.getOutputStream.flush()
      expect4(s2.getInputStream, 0x20, 0)
      s2.getOutputStream.write(publishPacket("t", "m1", qos = 2,
        packetId = 9, dup = true))
      s2.getOutputStream.flush()
      expect4(s2.getInputStream, 0x50, 9) // PUBREC re-sent, no redelivery
      s2.getOutputStream.write(Array[Byte](0x62, 0x02, 0x00, 0x09))
      s2.getOutputStream.flush()
      expect4(s2.getInputStream, 0x70, 9) // PUBCOMP
      s2.close()
      Thread.sleep(100)
      assert(got.toArray.toSeq === Seq("m1"))
    } finally broker.stop()
  }

  test("adversarial inputs drop only the offending CONNECTION, never " +
      "the broker: oversized remaining-length, malformed varint, and " +
      "a mid-frame disconnect all leave a healthy peer serving") {
    val got = new java.util.concurrent.CopyOnWriteArrayList[String]
    val broker = new MqttBroker((_, p) => got.add(p))
    val port = broker.start()
    try {
      def freshConn(): (java.net.Socket, java.io.OutputStream,
          java.io.InputStream) = {
        val s = new java.net.Socket("localhost", port)
        s.setSoTimeout(5000)
        val o = s.getOutputStream; val i = s.getInputStream
        o.write(connectPacket); o.flush()
        val connack = new Array[Byte](4)
        assert(i.read(connack) === 4 && connack(0) === 0x20.toByte)
        (s, o, i)
      }
      // 1) oversized remaining length: a 200 MB frame claim must be
      // refused BEFORE the broker allocates it; the connection dies
      val (s1, o1, i1) = freshConn()
      // varint for ~200 MB: 0x80 0x80 0x80 0x64 -> 0x64 << 21
      o1.write(Array[Byte](0x30, 0x80.toByte, 0x80.toByte, 0x80.toByte,
        0x64)); o1.flush()
      assert(i1.read() === -1, "oversized frame did not drop the conn")
      s1.close()
      // 2) malformed varint (continuation bit on all 4 bytes)
      val (s2, o2, i2) = freshConn()
      o2.write(Array[Byte](0x30, 0x81.toByte, 0x81.toByte, 0x81.toByte,
        0x81.toByte)); o2.flush()
      assert(i2.read() === -1, "malformed varint did not drop the conn")
      s2.close()
      // 3) mid-frame disconnect: half a PUBLISH body, then close —
      // nothing may reach the sink from the torn frame
      val (s3, o3, _) = freshConn()
      val torn = publishPacket("t/half", "never-delivered", qos = 0)
      o3.write(torn, 0, torn.length / 2); o3.flush()
      s3.close()
      Thread.sleep(150)
      // 4) the broker is still healthy: a well-formed peer publishes
      // and gets its QoS-1 ack
      val (s4, o4, i4) = freshConn()
      o4.write(publishPacket("t/ok", "healthy", qos = 1, packetId = 11))
      o4.flush()
      val puback = new Array[Byte](4)
      var off = 0
      while (off < 4) { val r = i4.read(puback, off, 4 - off)
        assert(r > 0); off += r }
      assert(puback(0) === 0x40.toByte && puback(3) === 11.toByte)
      s4.close()
      val deadline = System.currentTimeMillis + 5000
      while (got.isEmpty && System.currentTimeMillis < deadline)
        Thread.sleep(20)
      assert(got.toArray.toSeq === Seq("healthy"),
        s"torn-frame bytes leaked into the sink: ${got.toArray.toSeq}")
    } finally broker.stop()
  }

  test("duplicate QoS 2 PUBREL (a retransmitted release) answers " +
      "PUBCOMP each time and never re-delivers or crashes the handler") {
    val got = new java.util.concurrent.CopyOnWriteArrayList[String]
    val broker = new MqttBroker((_, p) => got.add(p))
    val port = broker.start()
    try {
      val sock = new java.net.Socket("localhost", port)
      sock.setSoTimeout(5000)
      val out = sock.getOutputStream
      val in = sock.getInputStream
      out.write(connectPacket); out.flush()
      val connack = new Array[Byte](4)
      assert(in.read(connack) === 4)
      def expect4(tpe: Byte, pid: Int): Unit = {
        val buf = new Array[Byte](4)
        var off = 0
        while (off < 4) { val r = in.read(buf, off, 4 - off)
          assert(r > 0); off += r }
        assert(buf(0) === tpe && buf(3) === (pid & 0xff).toByte)
      }
      out.write(publishPacket("t", "m1", qos = 2, packetId = 5)); out.flush()
      expect4(0x50, 5) // PUBREC
      out.write(Array[Byte](0x62, 0x02, 0x00, 0x05)); out.flush() // PUBREL
      expect4(0x70, 5) // PUBCOMP
      // the sender's PUBCOMP was lost, so it retransmits PUBREL —
      // twice, for good measure
      out.write(Array[Byte](0x62, 0x02, 0x00, 0x05)); out.flush()
      expect4(0x70, 5)
      out.write(Array[Byte](0x62, 0x02, 0x00, 0x05)); out.flush()
      expect4(0x70, 5)
      // and a PUBREL for an id that never existed is answered too
      // (idempotent release), not treated as a protocol error
      out.write(Array[Byte](0x62, 0x02, 0x00, 0x63)); out.flush()
      expect4(0x70, 0x63)
      sock.close()
      Thread.sleep(100)
      assert(got.toArray.toSeq === Seq("m1"))
    } finally broker.stop()
  }

}

class TopicRouterSpec extends SparkSpec {
  import spark.implicits._
  import graft.ingest.MappingPolicy
  import graft.streaming.TopicRouter
  import graft.streaming.TopicRouter.Route

  private def policy(dbms: String, table: String) =
    MappingPolicy.Policy(dbms, table, None, Seq(
      MappingPolicy.ColumnSpec("device", "varchar", "[device]"),
      MappingPolicy.ColumnSpec("value", "float", "[value]")))

  private val msgs = Seq(
    ("factory/temp", """{"device": "t1", "value": 21.0}"""),
    ("factory/pressure", """{"device": "p1", "value": 2.4}"""),
    ("office/temp", """{"device": "t9", "value": 19.5}"""),
    ("junk/unknown", """{"device": "x", "value": 0.0}"""))
    .toDF("topic", "value")

  test("topics route to their policy's (dbms, table)") {
    val routes = Seq(
      Route("^factory/temp$", policy("iot", "factory_temp")),
      Route("^factory/pressure$", policy("iot", "factory_pressure")),
      Route("^office/.*", policy("iot", "office")))
    val out = TopicRouter.route(msgs, routes)
    assert(out.keySet === Set(("iot", "factory_temp"),
      ("iot", "factory_pressure"), ("iot", "office")))
    assert(out(("iot", "factory_temp")).head().getString(0) === "t1")
    assert(out(("iot", "office")).count() === 1)
  }

  test("unrouted messages surface for dead-lettering") {
    val routes = Seq(Route("^factory/.*", policy("iot", "f")))
    val dead = TopicRouter.unrouted(msgs, routes)
    assert(dead.select("topic").as[String].collect().toSet ===
      Set("office/temp", "junk/unknown"))
  }

  test("two routes targeting the SAME table union (never " +
      "last-route-wins), and a plain-name route matches the whole " +
      "topic, not substrings") {
    // factory/temp and office/temp both feed ONE table
    val routes = Seq(
      Route("factory/temp", policy("iot", "all_temp")),
      Route("office/temp", policy("iot", "all_temp")))
    val out = TopicRouter.route(msgs, routes)
    assert(out.keySet === Set(("iot", "all_temp")))
    assert(out(("iot", "all_temp")).count() === 2,
      "messages from both routes must land (the old Map.toMap kept " +
        "only the last route)")
    // a plain topic-name route must not match superstrings: the
    // sibling-topic trap ("sensor/1" vs "sensor/10")
    val sib = Seq(("sensor/1", """{"device": "a", "value": 1}"""),
      ("sensor/10", """{"device": "b", "value": 2}"""))
      .toDF("topic", "value")
    val sibRoutes = Seq(
      Route("sensor/1", policy("iot", "s1")),
      Route("sensor/10", policy("iot", "s10")))
    val routedSib = TopicRouter.route(sib, sibRoutes)
    assert(routedSib(("iot", "s1")).count() === 1)
    assert(routedSib(("iot", "s10")).count() === 1)
    assert(TopicRouter.unrouted(sib, sibRoutes).count() === 0)
  }
}

class MonitorAlertSinkSpec extends SparkSpec {
  import spark.implicits._
  import graft.streaming.StreamOps
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  test("data-monitor alerts reach a foreachBatch sink") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val src = mem.toDF().toDF("ts", "k", "v").withWatermark("ts", "5 minutes")
    val agg = StreamOps.monitor(src, "ts", "k", "v", 60,
      alertAvgAbove = Some(100.0))
    val fired = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q = agg.writeStream.outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.filter(org.apache.spark.sql.functions.col("alert"))
          .collect().foreach(r => fired.add(r.getAs[String]("k")))
      }.start()
    try {
      mem.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 00:00:10"), "hot", 500.0),
        (java.sql.Timestamp.valueOf("2024-01-01 00:00:20"), "cool", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    assert(fired.contains("hot"))
    assert(!fired.contains("cool"))
  }
}

class MalformedDocSpec extends SparkSpec {
  import spark.implicits._
  import graft.ingest.MappingPolicy

  test("malformed / schema-missing docs yield nulls and can be dead-lettered") {
    val p = MappingPolicy.Policy("db", "t", None, Seq(
      MappingPolicy.ColumnSpec("device", "varchar", "[device]"),
      MappingPolicy.ColumnSpec("value", "float", "[value]")),
      condition = Some("device is not null"))
    val docs = Seq(
      """{"device": "ok", "value": 1.5}""",
      """not json at all""",
      """{"other": 1}""").toDF("value")
    val out = MappingPolicy.compile(p, docs)
    // only the valid doc survives the condition
    assert(out.count() === 1)
    assert(out.head().getString(0) === "ok")
    // the dead-letter view: compile without condition, filter the nulls
    val all = MappingPolicy.compile(p.copy(condition = None), docs)
    assert(all.filter(col("device").isNull).count() === 2)
  }
}

class RollupIngestSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("rollupIngestBatch keeps the standing rollup serving-fresh " +
      "across micro-batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rollingest")
      .resolve("roll").toString
    def batch(rows: Seq[(Long, String, String, Double)]) =
      graft.streaming.StreamOps.rollupIngestBatch(
        rows.toDF("event_id", "s", "event_type", "value")
          .withColumn("ts", col("s").cast("timestamp")).drop("s"),
        dir, "ts", "minute", Seq("event_type"), "value")
    batch(Seq((1L, "2024-01-01 10:00:10", "a", 1.25),
      (2L, "2024-01-01 10:00:40", "b", 2.00)))
    batch(Seq((3L, "2024-01-01 10:00:50", "a", 0.75),   // same minute, late
      (4L, "2024-01-02 09:30:00", "a", 4.00)))
    val roll = graft.ops.IndexStore.read(spark, dir).get
    assert(graft.ops.IndexStore.currentVersion(spark, dir) === Some(2L))
    val served = graft.ops.Rollup.serve(roll, "day", 1, Seq("event_type"))
      .orderBy(col("bucket_i"), col("event_type"))
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
    assert(served.toSeq === Seq(("a", 2L, 2.0), ("b", 1L, 2.0),
      ("a", 1L, 4.0)))
  }

  test("rollupIngestBatchOnce skips a replayed batch id — counts never " +
      "double-fold, markers survive later commits") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rollonce")
      .resolve("roll").toString
    def once(id: Long, rows: Seq[(Long, String, String, Double)]) =
      graft.streaming.StreamOps.rollupIngestBatchOnce(
        rows.toDF("event_id", "s", "event_type", "value")
          .withColumn("ts", col("s").cast("timestamp")).drop("s"),
        id, dir, "ts", "minute", Seq.empty, "value")
    val b1 = Seq((1L, "2024-01-01 10:00:10", "a", 1.0))
    val b2 = Seq((2L, "2024-01-01 10:01:00", "a", 2.0))
    assert(once(0L, b1) === true)
    assert(once(0L, b1) === false) // at-least-once replay: skipped
    assert(once(1L, b2) === true)  // later commit didn't wipe marker 0
    assert(once(0L, b1) === false)
    val n = graft.ops.Rollup.serve(
        graft.ops.IndexStore.read(spark, dir).get, "day", 1)
      .agg(sum(col("n"))).collect().head.getLong(0)
    assert(n === 2L) // each batch folded exactly once
  }
}

class DsirIngestSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("dsirIngestBatchOnce: scores against the pre-fold index, replay " +
      "keeps identical rows AND weights, histograms never double-fold") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dsironce")
      .resolve("dsir").toString
    def df(rows: (Long, String, String)*) =
      rows.toDF("doc_id", "lang", "text")
    def once(id: Long, b: org.apache.spark.sql.DataFrame) =
      graft.streaming.StreamOps.dsirIngestBatchOnce(b, id, dir,
        "text", "doc_id", col("lang") === "en", numBuckets = 512)
    // cold start: no distribution to judge against -> everything kept
    val b0 = df((1L, "en", "spark scala shuffle"),
      (2L, "xx", "cat dog bird"), (3L, "en", "spark scala plan"))
    assert(once(0L, b0).count() === 3)
    // batch 1: the target-like doc clears weight >= 0, the pool-like
    // doc (whose grams are raw-only in the index) scores negative
    val b1 = df((4L, "xx", "spark scala shuffle plan"),
      (5L, "xx", "cat dog bird fish"))
    def keptPairs(d: org.apache.spark.sql.DataFrame) =
      d.select(col("doc_id"), col("weight_q"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val kept1 = keptPairs(once(1L, b1))
    assert(kept1.map(_._1) === Set(4L))
    val vAfter = graft.ops.IndexStore.currentVersion(spark, dir).get
    // replay of batch 1: tag already on the live version -> scores
    // against the RETAINED PREVIOUS (pre-fold) state, so the weights
    // are bit-identical, and no new version is committed
    val replay = keptPairs(once(1L, b1))
    assert(replay === kept1)
    assert(graft.ops.IndexStore.currentVersion(spark, dir).get === vAfter)
    // each batch folded exactly once: target grams = docs 1+3 (5 each),
    // raw grams = all five docs (5+5+5+7+7)
    val idx = graft.ops.IndexStore.read(spark, dir).get
      .agg(sum(col("tc")), sum(col("rc"))).head()
    assert(idx.getLong(0) === 10L)
    assert(idx.getLong(1) === 29L)
  }

  test("pqIngestBatchOnce: first batch trains, later batches encode " +
      "against the RECORDED books, replay returns identical codes " +
      "without committing a new version") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pqonce")
      .resolve("pq").toString
    val embs = graft.engine.Tables.load(spark, sfDir, "embeddings")
      .limit(64).localCheckpoint()
    def once(id: Long, b: org.apache.spark.sql.DataFrame) =
      graft.streaming.StreamOps.pqIngestBatchOnce(b, id, dir,
        "embedding", "vec_id", numSub = 4, ksub = 8)
    def codeSet(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toString).sorted.toSeq
    val b0 = embs.filter($"vec_id" < 40)
    val b1 = embs.filter($"vec_id" >= 40)
    assert(once(0L, b0).count() === 40 * 4)
    val kept1 = codeSet(once(1L, b1))
    assert(kept1.size === 24 * 4)
    val vAfter = graft.ops.IndexStore.currentVersion(spark, dir).get
    // replay: tagged -> folds nothing, codes byte-identical
    assert(codeSet(once(1L, b1)) === kept1)
    assert(graft.ops.IndexStore.currentVersion(spark, dir).get === vAfter)
    // the committed artifact == encoding the whole corpus against the
    // books trained on batch 0 (no codeword ever moved)
    val idx = graft.ops.IndexStore.read(spark, dir).get
    val books = graft.ops.Similarity.pqCodebooks(b0, "embedding",
      "vec_id", numSub = 4, ksub = 8, iters = 1)
    assert(idx.filter(col("role") === "code")
        .select(col("id"), col("sub"), col("code"))
        .collect().map(_.toString).sorted.toSeq
      === graft.ops.Similarity.pqEncode(embs, books, "embedding",
        "vec_id", numSub = 4).select(col("id"), col("sub"), col("code"))
        .collect().map(_.toString).sorted.toSeq)
  }

  test("postingsIngestBatchOnce: batches fold exactly once, replay " +
      "returns identical receipts without committing a new version, " +
      "and the artifact == the whole-corpus rebuild") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("postonce")
      .resolve("post").toString
    val docs = Seq(
      (1L, "spark shuffle spark"), (2L, "plan join"),
      (3L, "cat dog"), (4L, "dog cat dog"))
      .toDF("doc_id", "text").localCheckpoint()
    def once(id: Long, b: org.apache.spark.sql.DataFrame) =
      graft.streaming.StreamOps.postingsIngestBatchOnce(b, id, dir,
        "text", "doc_id")
    val b0 = docs.filter($"doc_id" <= 2)
    val b1 = docs.filter($"doc_id" > 2)
    assert(once(0L, b0).collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq === Seq((1L, 3L), (2L, 2L)))
    val r1 = once(1L, b1).collect().map(_.toString).sorted.toSeq
    val vAfter = graft.ops.IndexStore.currentVersion(spark, dir).get
    // replay: tagged -> folds nothing, receipts byte-identical
    assert(once(1L, b1).collect().map(_.toString).sorted.toSeq === r1)
    assert(graft.ops.IndexStore.currentVersion(spark, dir).get === vAfter)
    // committed artifact == rebuilding over the whole corpus
    val idx = graft.ops.IndexStore.read(spark, dir).get
    val full = graft.ops.Retrieval.postingsIndex(docs, "text", "doc_id")
    assert(idx.exceptAll(full).count() === 0)
    assert(full.exceptAll(idx).count() === 0)
  }

  test("cmsIngestBatchOnce: counts fold additively exactly once — a " +
      "replayed batch never double-counts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cmsonce")
      .resolve("cms").toString
    val b0 = Seq.fill(10)("x").toDF("term").localCheckpoint()
    val b1 = (Seq.fill(5)("x") ++ Seq.fill(7)("y")).toDF("term")
      .localCheckpoint()
    def once(id: Long, b: org.apache.spark.sql.DataFrame) =
      graft.streaming.StreamOps.cmsIngestBatchOnce(b, id, dir, "term",
        depth = 4, width = 64)
    def estX(c: org.apache.spark.sql.DataFrame) =
      graft.ops.Sketches.cmsEstimate(c, Seq("x").toDF("term"), "term",
        4, 64).head().getLong(1)
    assert(estX(once(0L, b0)) === 10L)
    assert(estX(once(1L, b1)) === 15L)
    val vAfter = graft.ops.IndexStore.currentVersion(spark, dir).get
    // replay of batch 1: still 15, never 20, no new version
    assert(estX(once(1L, b1)) === 15L)
    assert(graft.ops.IndexStore.currentVersion(spark, dir).get === vAfter)
    // whole-stream sketch == the standing artifact (merge == union)
    val whole = graft.ops.Sketches.cmsCounters(b0.unionByName(b1),
      "term", 4, 64)
    val stored = graft.ops.IndexStore.read(spark, dir).get
    assert(stored.exceptAll(whole).count() === 0)
    assert(whole.exceptAll(stored).count() === 0)
  }

  test("hllIngestBatchOnce: registers fold by max, replay is harmless " +
      "and uncommitted") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hllonce")
      .resolve("hll").toString
    val b0 = (1 to 500).map(i => s"a$i").toDF("term").localCheckpoint()
    val b1 = (300 to 900).map(i => s"a$i").toDF("term").localCheckpoint()
    def once(id: Long, b: org.apache.spark.sql.DataFrame) =
      graft.streaming.StreamOps.hllIngestBatchOnce(b, id, dir, "term",
        m = 64)
    once(0L, b0)
    val r1 = once(1L, b1).collect().map(_.toString).sorted.toSeq
    val vAfter = graft.ops.IndexStore.currentVersion(spark, dir).get
    assert(once(1L, b1).collect().map(_.toString).sorted.toSeq === r1)
    assert(graft.ops.IndexStore.currentVersion(spark, dir).get === vAfter)
    // standing registers == whole-stream registers (union semantics)
    val whole = graft.ops.Sketches.hllRegisters(b0.unionByName(b1),
      "term", 64)
    val stored = graft.ops.IndexStore.read(spark, dir).get
    assert(stored.exceptAll(whole).count() === 0)
    assert(whole.exceptAll(stored).count() === 0)
  }

  test("kmvIngestBatchOnce: per-key bottom-k folds exactly once; the " +
      "standing sketches == one-shot sketches of the whole stream") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kmvonce")
      .resolve("kmv").toString
    def hashed(rows: Seq[(String, String)]) = {
      val df = rows.toDF("src", "term")
      df.select(col("src"), graft.ops.Sketches.avalanche31(
        graft.ops.TextOps.polyHash(col("term"))).as("h")).localCheckpoint()
    }
    val b0 = hashed((1 to 300).map(i => ("a", s"t$i")) ++
      (1 to 50).map(i => ("b", s"u$i")))
    val b1 = hashed((200 to 600).map(i => ("a", s"t$i")) ++
      (30 to 90).map(i => ("b", s"u$i")))
    def once(id: Long, b: org.apache.spark.sql.DataFrame) =
      graft.streaming.StreamOps.kmvIngestBatchOnce(b, id, dir, "src",
        "h", k = 32)
    once(0L, b0)
    val r1 = once(1L, b1).collect().map(_.toString).sorted.toSeq
    val vAfter = graft.ops.IndexStore.currentVersion(spark, dir).get
    // replay: identical artifact, no new version (idempotent lattice)
    assert(once(1L, b1).collect().map(_.toString).sorted.toSeq === r1)
    assert(graft.ops.IndexStore.currentVersion(spark, dir).get === vAfter)
    // fold == rebuild
    val whole = graft.ops.Sketches.kmvKeyed(b0.unionByName(b1), "src",
      "h", 32)
    val stored = graft.ops.IndexStore.read(spark, dir).get
    assert(stored.exceptAll(whole).count() === 0)
    assert(whole.exceptAll(stored).count() === 0)
  }
}


class IngestChainE2ESpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("the full ingest story on one checkpointed stream: exact gate -> " +
      "near-dup gate -> corpus append + rollup fold, replay-safe") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("chain")
    val exactDir = root.resolve("exact").toString
    val ndDir = root.resolve("shingles").toString
    val corpusDir = root.resolve("corpus").toString
    val rollDir = root.resolve("roll").toString

    val mem = MemoryStream[(Long, String, String)]
    val src = mem.toDF().toDF("doc_id", "ts0", "text")
      .select(col("doc_id"), col("ts0").cast("timestamp").as("ts"),
        col("text"))
    val q = src.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        // gate 1: content identity (standing bloom + hash index)
        val uniq = graft.streaming.StreamOps.exactDedupIngestBatch(
          b, exactDir, "text", "doc_id")
        // gate 2: near-duplicates vs the standing shingle index
        val kept = graft.streaming.StreamOps.nearDupIngestBatch(
          uniq, ndDir, "text", "doc_id")
        // corpus append + serving-fresh rollup of doc length, at most
        // once per batch id
        val enriched = kept.withColumn("n_chars",
          length(col("text")).cast("double"))
        enriched.write.mode("append").parquet(corpusDir)
        graft.streaming.StreamOps.rollupIngestBatchOnce(enriched, id,
          rollDir, "ts", "minute", Seq.empty, "n_chars")
        ()
      }.start()
    try {
      mem.addData(
        (1L, "2024-01-01 10:00:05", "alpha beta gamma delta"),
        (2L, "2024-01-01 10:00:20", "alpha beta gamma delta"), // exact dup
        (3L, "2024-01-01 10:00:40", "epsilon zeta eta theta"))
      q.processAllAvailable()
      mem.addData(
        (10L, "2024-01-01 10:01:10", "alpha beta gamma delta"), // exact vs standing
        (11L, "2024-01-01 10:01:30",
          "epsilon zeta eta theta iota"), // near-dup vs standing
        (12L, "2024-01-01 10:01:50", "completely different words here"))
      q.processAllAvailable()
    } finally q.stop()

    val corpus = spark.read.parquet(corpusDir)
    assert(corpus.select("doc_id").as[Long].collect().sorted ===
      Array(1L, 3L, 12L))
    // the rollup served the same accepted docs, exactly once each
    val served = graft.ops.Rollup.serve(
        graft.ops.IndexStore.read(spark, rollDir).get, "hour", 1)
      .agg(sum(col("n")).as("n")).collect().head.getLong(0)
    assert(served === 3L)
    // standing artifacts are live and versioned; the exact gate's index
    // holds every CONTENT-unique doc it admitted (1, 3, 11, 12) — doc 11
    // fell to the LATER near-dup gate, which rightly doesn't rewind the
    // exact gate's state (a future doc 11 twin is still an exact dup)
    assert(graft.ops.IndexStore.read(spark, s"$exactDir/hashes").get
      .count() === 4L)
    assert(graft.ops.IndexStore.currentVersion(spark, rollDir)
      .isDefined)
  }
}

class SearchIngestChainE2ESpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("search-serving ingest on one checkpointed stream: postings + " +
      "CMS + HLL fold per batch, exactly once, artifacts serve live") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("schain")
    val postDir = root.resolve("post").toString
    val cmsDir = root.resolve("cms").toString
    val hllDir = root.resolve("hll").toString

    val mem = MemoryStream[(Long, String)]
    val src = mem.toDF().toDF("doc_id", "text")
    val q = src.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        val toks = b.select(explode(
          graft.ops.TextOps.tokens(col("text"))).as("term"))
          .localCheckpoint()
        graft.streaming.StreamOps.postingsIngestBatchOnce(b, id,
          postDir, "text", "doc_id")
        graft.streaming.StreamOps.cmsIngestBatchOnce(toks, id, cmsDir,
          "term", depth = 4, width = 64)
        graft.streaming.StreamOps.hllIngestBatchOnce(toks, id, hllDir,
          "term", m = 64)
        ()
      }.start()
    val docs = Seq(
      (1L, "spark shuffle plan"),
      (2L, "spark join"),
      (3L, "shuffle shuffle plan"),
      (4L, "completely new words"))
    try {
      mem.addData(docs(0), docs(1))
      q.processAllAvailable()
      mem.addData(docs(2), docs(3))
      q.processAllAvailable()
    } finally q.stop()

    val all = docs.toDF("doc_id", "text")
    // postings artifact == whole-corpus rebuild; BM25 serves from it
    val post = graft.ops.IndexStore.read(spark, postDir).get
    val rebuilt = graft.ops.Retrieval.postingsIndex(all, "text", "doc_id")
    assert(post.exceptAll(rebuilt).count() === 0)
    assert(rebuilt.exceptAll(post).count() === 0)
    val hits = graft.ops.Retrieval.bm25TopK(post,
      all.filter($"doc_id" === 1), "text", "doc_id", k = 3)
    assert(hits.count() > 0)
    // CMS == whole-stream counts ("shuffle" occurs 3x total)
    val cms = graft.ops.IndexStore.read(spark, cmsDir).get
    assert(graft.ops.Sketches.cmsEstimate(cms,
        Seq("shuffle").toDF("term"), "term", 4, 64)
      .head().getLong(1) === 3L)
    // HLL == whole-stream registers (9 distinct terms)
    val hll = graft.ops.IndexStore.read(spark, hllDir).get
    val whole = graft.ops.Sketches.hllRegisters(
      all.select(explode(graft.ops.TextOps.tokens($"text")).as("term")),
      "term", 64)
    assert(hll.exceptAll(whole).count() === 0)
    assert(whole.exceptAll(hll).count() === 0)
  }
}

class QuantileIngestSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("quantileIngestBatchOnce: histogram folds additively exactly " +
      "once; standing cells == one-shot histogram of the whole stream") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("qhonce")
      .resolve("qh").toString
    val b0 = (1 to 400).map(i => ("s", (i % 977).toLong)).toDF("k", "n")
      .localCheckpoint()
    val b1 = (1 to 300).map(i => ("s", (i % 131).toLong)).toDF("k", "n")
      .localCheckpoint()
    def once(id: Long, b: org.apache.spark.sql.DataFrame) =
      graft.streaming.StreamOps.quantileIngestBatchOnce(b, id, dir,
        "k", "n")
    once(0L, b0)
    val total = once(1L, b1).agg(sum("c")).head().getLong(0)
    assert(total === 700L)
    val vAfter = graft.ops.IndexStore.currentVersion(spark, dir).get
    // replay: still 700, never 1000, no new version
    assert(once(1L, b1).agg(sum("c")).head().getLong(0) === 700L)
    assert(graft.ops.IndexStore.currentVersion(spark, dir).get === vAfter)
    // fold == rebuild, and quantiles serve from the standing cells
    val whole = graft.ops.Sketches.quantileHistogram(
      b0.unionByName(b1), "k", "n")
    val stored = graft.ops.IndexStore.read(spark, dir).get
    assert(stored.exceptAll(whole).count() === 0)
    assert(whole.exceptAll(stored).count() === 0)
    val p50 = graft.ops.Sketches.quantileEst(stored, Seq(50))
      .head().getLong(2)
    assert(p50 > 0L)
  }
}

class CusumIngestSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import graft.streaming.StreamOps

  private def minutes(rows: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("etype", "m", "x").localCheckpoint()
  }

  test("cusumFold of ordered batches == cusumRebuild of the whole " +
      "series under the frozen k (exact recursion composition)") {
    val whole = (1L to 120L).map(m =>
      ("a", m, 3L + (if (m > 80) 4L else 0L) + (m % 3))) ++
      (1L to 120L).map(m => ("b", m, 5L + (m % 2)))
    val b1 = whole.filter(_._2 <= 50)
    val b2 = whole.filter(r => r._2 > 50 && r._2 <= 90)
    val b3 = whole.filter(_._2 > 90)
    val init = StreamOps.cusumInit(minutes(b1))
    val folded = StreamOps.cusumFold(
      StreamOps.cusumFold(init, minutes(b2)), minutes(b3))
    val k = init.select(col("etype"), col("k100"))
    val rebuilt = StreamOps.cusumRebuild(minutes(whole), k)
    assert(folded.collect().map(_.toString).sorted.toSeq ===
      rebuilt.collect().map(_.toString).sorted.toSeq)
    // the injected level shift on 'a' raises the alarm level
    val lvl = StreamOps.cusumLevel(folded).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(lvl("a") > lvl("b") * 3, lvl.toString)
  }

  test("cusumFold rejects out-of-order batches; new keys initialize " +
      "with their own baseline") {
    val init = StreamOps.cusumInit(minutes(
      (1L to 20L).map(m => ("a", m, 4L))))
    intercept[IllegalArgumentException](StreamOps.cusumFold(init,
      minutes(Seq(("a", 20L, 4L)))))
    val withNew = StreamOps.cusumFold(init,
      minutes((21L to 30L).map(m => ("a", m, 4L)) ++
        (25L to 30L).map(m => ("c", m, 7L))))
    val types = withNew.collect().map(_.getString(0)).sorted
    assert(types === Array("a", "c"))
  }

  test("cusumIngestBatchOnce: replayed batch never double-folds") {
    val dir = java.nio.file.Files.createTempDirectory("cusum")
      .resolve("st").toString
    val b0 = minutes((1L to 40L).map(m => ("a", m, 4L)))
    val b1 = minutes((41L to 60L).map(m => ("a", m, 9L))) // drift
    StreamOps.cusumIngestBatchOnce(b0, 0L, dir)
    val r1 = StreamOps.cusumIngestBatchOnce(b1, 1L, dir)
      .collect().map(_.toString).sorted.toSeq
    val vAfter = graft.ops.IndexStore.currentVersion(spark, dir).get
    assert(StreamOps.cusumIngestBatchOnce(b1, 1L, dir)
      .collect().map(_.toString).sorted.toSeq === r1)
    assert(graft.ops.IndexStore.currentVersion(spark, dir).get === vAfter)
    // the drift shows in the served level
    val lvl = StreamOps.cusumLevel(
      graft.ops.IndexStore.read(spark, dir).get).head().getLong(3)
    assert(lvl >= 20L * 500, s"drift level $lvl")
  }
}
