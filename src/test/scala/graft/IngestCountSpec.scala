package graft

/** Regression: the PUT fast path (n = lines.size, skipping the Spark
  * count) is only valid when every validated line is a JSON OBJECT —
  * spark.read.json expands a top-level-array NDJSON line into one row
  * per element and silently drops a root-level `null` line, so those
  * shapes must fall back to the exact count (r15 advice item 1). The
  * reported/ledgered n must equal the rows actually written. */
class IngestCountSpec extends SparkSpec {

  private def mkEngine() = {
    val dir = java.nio.file.Files.createTempDirectory("ingestcount")
    val cat = new graft.engine.Catalog(spark)
    val engine = new graft.engine.Engine(spark, cat)
    engine.dataDir = Some(dir.resolve("data").toString)
    engine
  }

  test("a top-level-array NDJSON line counts one row per ELEMENT") {
    val engine = mkEngine()
    val n = engine.ingest("ic1",
      """{"k": 1, "g": "a"}
        |[{"k": 2, "g": "b"}, {"k": 3, "g": "b"}]""".stripMargin)
    val written = engine.query("""sql edge "select count(*) from ic1"""")
      .collect()(0).getLong(0)
    assert(n === written,
      s"reported n=$n must equal written rows=$written")
    assert(written === 3L)
  }

  test("a root-level null NDJSON line is dropped by the reader and " +
      "must not be counted") {
    val engine = mkEngine()
    val n = engine.ingest("ic2",
      """{"k": 1, "g": "a"}
        |null""".stripMargin)
    val written = engine.query("""sql edge "select count(*) from ic2"""")
      .collect()(0).getLong(0)
    assert(n === written,
      s"reported n=$n must equal written rows=$written")
  }

  test("plain all-object NDJSON still counts without a Spark job " +
      "(n == lines)") {
    val engine = mkEngine()
    val n = engine.ingest("ic3",
      """{"k": 1, "g": "a"}
        |{"k": 2, "g": "b"}""".stripMargin)
    assert(n === 2L)
  }
}
