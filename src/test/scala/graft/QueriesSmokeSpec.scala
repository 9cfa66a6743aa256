package graft

/** Every driver-inventory query must run end-to-end on sf0.001 — a fast
  * regression net under `sbt test` (the DuckDB hash gate runs separately
  * via tools/check.py at sf0.01). */
class QueriesSmokeSpec extends SparkSpec {
  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle") {
    // q58's stub decode turned out SQL-expressible over the pure-ASCII
    // corpus, so the rows-only exception set is now empty
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet)
  }
}
