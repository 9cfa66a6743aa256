package graft

import graft.engine.{Catalog, Engine, GrafanaRoute}

/** Payload-corpus fixtures for the Grafana datasource route: REAL
  * panel-request JSON (the JSON-datasource shape Grafana POSTs,
  * including the fields graft does not consume — requestId, interval,
  * scopedVars, adhocFilters) across the three request types, the
  * `functions` aggregate override (al_grafana.py:385-389) and the
  * `time_range` toggle (al_grafana.py:416). */
class GrafanaPayloadSpec extends SparkSpec {

  private lazy val engine = {
    val cat = new Catalog(spark)
    cat.registerTable("events", s"$sfDir/events.parquet",
      nanoTs = Seq("ts"))
    new Engine(spark, cat)
  }

  /** A full-fat Grafana panel request: everything Grafana actually
    * sends, with our payload spliced into the first target. */
  private def grafanaRequest(targetPayload: String): String = s"""
    {"app": "dashboard", "requestId": "Q103", "timezone": "utc",
     "panelId": 2, "dashboardUID": "ae0eeb4x9side8c",
     "range": {"from": "2024-01-02T00:00:00.000Z",
               "to": "2024-01-05T00:00:00.000Z",
               "raw": {"from": "now-72h", "to": "now"}},
     "timeInfo": "", "interval": "2m", "intervalMs": 120000,
     "targets": [{"refId": "A", "datasource":
         {"type": "simpod-json-datasource", "uid": "ee0eeb664"},
       "editorMode": "code", "target": "events",
       "payload": $targetPayload}],
     "maxDataPoints": 50, "scopedVars": {"__interval": {"value": "2m"}},
     "startTime": 1721900000000, "rangeRaw": {"from": "now-72h", "to": "now"},
     "adhocFilters": []}"""

  test("increments panel, default aggregate set (unconsumed Grafana " +
      "fields ignored)") {
    val df = GrafanaRoute.run(engine, grafanaRequest(
      """{"dbms": "edge", "type": "increments",
          "time_column": "ts", "value_column": "value"}"""))
    assert(df.columns.toSet.intersect(
      Set("min_value", "max_value", "avg_value", "n")).size === 4)
    assert(df.count() > 0)
  }

  test("increments panel with the functions override: exactly the " +
      "requested aggregates, reference column names") {
    val df = GrafanaRoute.run(engine, grafanaRequest(
      """{"dbms": "edge", "type": "increments",
          "functions": ["MIN", "count"],
          "time_column": "ts", "value_column": "value"}"""))
    // <f>(value) as <f>_val + the max(ts) time axis
    // (get_increments_timeseries_stmt functions branch)
    assert(df.columns.contains("timestamp"), df.columns.mkString(","))
    assert(df.columns.contains("min_val"))
    assert(df.columns.contains("count_val"))
    assert(!df.columns.contains("avg_value"),
      "override must REPLACE the default set")
    assert(df.count() > 0)
  }

  test("period panel with the functions override") {
    val df = GrafanaRoute.run(engine, grafanaRequest(
      """{"dbms": "edge", "type": "period",
          "functions": ["avg", "max"],
          "time_column": "ts", "value_column": "value"}"""))
    val row = df.head()
    assert(df.columns.toSeq === Seq("timestamp", "avg_val", "max_val"))
    assert(!row.isNullAt(1) && !row.isNullAt(2))
  }

  test("unknown function in the override is rejected loudly " +
      "(aggregations-path validation, al_grafana.py:437-442)") {
    val err = intercept[IllegalArgumentException] {
      GrafanaRoute.parse(grafanaRequest(
        """{"dbms": "edge", "type": "increments",
            "functions": ["median"],
            "time_column": "ts", "value_column": "value"}"""))
    }
    assert(err.getMessage.contains("median"), err.getMessage)
  }

  test("query panel: time_range=true splices the panel range; " +
      "time_range=false leaves the user SQL untouched") {
    val ranged = GrafanaRoute.run(engine, grafanaRequest(
      """{"dbms": "edge", "type": "query",
          "sql": "select count(*) as n from events",
          "time_range": true, "time_column": "ts"}"""))
    val unranged = GrafanaRoute.run(engine, grafanaRequest(
      """{"dbms": "edge", "type": "query",
          "sql": "select count(*) as n from events",
          "time_range": false, "time_column": "ts"}"""))
    val (nRanged, nAll) = (ranged.head().getLong(0),
      unranged.head().getLong(0))
    assert(nRanged > 0 && nAll > nRanged,
      s"range must bound the count: ranged=$nRanged all=$nAll")
    // and the command text itself proves where the toggle bites
    val rOn = GrafanaRoute.parse(grafanaRequest(
      """{"dbms": "edge", "type": "query",
          "sql": "select count(*) as n from events",
          "time_range": true, "time_column": "ts"}"""))
    assert(GrafanaRoute.toCommand(rOn).contains("ts >= '2024-01-02"))
    val rOff = GrafanaRoute.parse(grafanaRequest(
      """{"dbms": "edge", "type": "query",
          "sql": "select count(*) as n from events",
          "time_range": false, "time_column": "ts"}"""))
    assert(!GrafanaRoute.toCommand(rOff).contains("ts >="))
  }

  test("functions override vs rollup serving: the override's raw " +
      "max(ts) time axis CANNOT be served exactly from grain-truncated " +
      "buckets, so the matcher declines honestly (base scan, same " +
      "values) while the default panel still serves") {
    val cat = new Catalog(spark)
    cat.registerTable("events", s"$sfDir/events.parquet",
      nanoTs = Seq("ts"))
    val e2 = new Engine(spark, cat)
    val overridden = grafanaRequest(
      """{"dbms": "edge", "type": "increments",
          "functions": ["min", "max"],
          "time_column": "ts", "value_column": "value"}""")
    val defaulted = grafanaRequest(
      """{"dbms": "edge", "type": "increments",
          "time_column": "ts", "value_column": "value"}""")
    val before = GrafanaRoute.run(e2, overridden)
      .collect().map(_.toString).sorted
    val dir = java.nio.file.Files.createTempDirectory("grafover")
      .resolve("roll").toString
    e2.execute("rollup create where table = events and " +
      s"path = $dir and time = ts and value = value and grain = minute")
    val served = GrafanaRoute.run(e2, defaulted)
    assert(!served.queryExecution.sparkPlan.toString
      .contains("events.parquet"),
      "default panel must serve from the rollup")
    val fellBack = GrafanaRoute.run(e2, overridden)
    assert(fellBack.queryExecution.sparkPlan.toString
      .contains("events.parquet"),
      "a bucket-truncated max(ts) would be WRONG — the matcher must " +
        "decline the override panel, not serve it approximately")
    assert(fellBack.collect().map(_.toString).sorted === before)
  }
}
