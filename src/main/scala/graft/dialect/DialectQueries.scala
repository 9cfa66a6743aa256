package graft.dialect

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod}

import graft.engine.Tables

/** Driver-inventory queries routed through the EdgeSql dialect front-end —
  * each one parses the reference's actual command surface (`sql <dbms>
  * <options> "SELECT ..."`, member_cmd.py:3256 `run_client` path) and
  * compiles to a Catalyst plan; the DuckDB oracle checks the END-TO-END
  * result, so the parser + compiler are inside the correctness gate.
  */
object DialectQueries {
  type QFn = (SparkSession, String) => DataFrame

  private def run(cmd: String): QFn = (s, d) =>
    EdgeSql.query(s, name => Tables.load(s, d, name), cmd)

  // Exact-decimal sum/avg shorthand for the oracles (the dialect compiles
  // sum/avg through DECIMAL(18,2) — unify_results.py:236-277 semantics).
  private def oSum(x: String) =
    s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"
  private def oAvg(x: String) =
    s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE) / COUNT($x)"

  /** q39 — the reference's canonical query shape (member_cmd.py:21029):
    * group + full agg set + order, through the command parser. */
  private val q39 = run(
    """sql edge format=json "select event_type, count(*) as n, """ +
      """sum(value) as sum_value, avg(value) as avg_value, """ +
      """min(value) as min_value, max(value) as max_value from events """ +
      """where ts >= '2024-01-03' and ts < '2024-01-11' """ +
      """group by event_type order by event_type"""")
  private val q39Sql = s"""
    SELECT event_type, count(*) AS n, ${oSum("value")} AS sum_value,
      ${oAvg("value")} AS avg_value, min(value) AS min_value,
      max(value) AS max_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-03' AND ts < TIMESTAMP '2024-01-11'
    GROUP BY event_type ORDER BY event_type"""

  /** q40 — increments(minute, 10, ts) through the dialect: the SELECT-list
    * function becomes two grouping expressions
    * (unify_results.py:482-556). */
  private val q40 = run(
    """sql edge "select increments(minute, 10, ts), min(value) as min_value, """ +
      """max(value) as max_value, avg(value) as avg_value, count(*) as n """ +
      """from events where ts >= '2024-01-05' and ts < '2024-01-06' """ +
      """order by minute_parent, minute_bucket"""")
  private val q40Sql = s"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS minute_parent,
      CAST(FLOOR(EXTRACT(minute FROM ts) / 10) AS BIGINT) AS minute_bucket,
      min(value) AS min_value, max(value) AS max_value,
      ${oAvg("value")} AS avg_value, count(*) AS n
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-06'
    GROUP BY 1, 2 ORDER BY 1, 2"""

  /** q41 — period(day, 1, anchor, ts) in WHERE: two-phase anchored
    * trailing window through the dialect (unify_results.py:695-770). */
  private val q41 = run(
    """sql edge "select count(*) as n, sum(value) as sum_value """ +
      """from events where period(day, 1, '2024-01-15 12:00:00', ts)"""")
  private val q41Sql = s"""
    WITH m AS (SELECT max(ts) AS mx FROM events
               WHERE ts <= TIMESTAMP '2024-01-15 12:00:00')
    SELECT count(*) AS n, ${oSum("value")} AS sum_value
    FROM events, m WHERE ts > m.mx - INTERVAL 1 DAY AND ts <= m.mx"""

  /** q42 — period with the optional trailing filter: it narrows BOTH the
    * anchor search and the returned rows (unify_results.py:797-834). */
  private val q42 = run(
    """sql edge "select event_type, count(*) as n from events """ +
      """where period(minute, 30, '2024-01-20 00:00:00', ts, """ +
      """and event_type = 'click') group by event_type"""")
  private val q42Sql = """
    WITH m AS (SELECT max(ts) AS mx FROM events
               WHERE ts <= TIMESTAMP '2024-01-20 00:00:00'
                 AND event_type = 'click')
    SELECT event_type, count(*) AS n
    FROM events, m
    WHERE event_type = 'click'
      AND ts > m.mx - INTERVAL 30 MINUTE AND ts <= m.mx
    GROUP BY event_type"""

  /** q43 — `limit 2 per user_id` (al_parser.py:327-336): per-key top-n as
    * one window spec instead of the reference's delivery-time counters. */
  private val q43 = run(
    """sql edge "select user_id, event_id, value from events """ +
      """where user_id < 50 order by value desc, event_id limit 2 per user_id"""")
  private val q43Sql = """
    SELECT user_id, event_id, value FROM (
      SELECT user_id, event_id, value, row_number() OVER (
        PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
      FROM events WHERE user_id < 50)
    WHERE rn <= 2 ORDER BY value DESC, event_id"""

  /** q44 — extend=(@table_name) + include=(supplier): provenance column
    * stamped per source table, leading the GROUP BY
    * (member_cmd.py:110-113, unify_results.py:1260-1262). */
  private val q44 = run(
    """sql edge extend = (@table_name) include = (supplier) """ +
      """"select table_name, count(*) as n from customer group by table_name """ +
      """order by table_name"""")
  private val q44Sql = """
    SELECT table_name, count(*) AS n FROM (
      SELECT 'customer' AS table_name FROM customer
      UNION ALL SELECT 'supplier' AS table_name FROM supplier)
    GROUP BY table_name ORDER BY table_name"""

  /** q45 — `::` casting-suffix chains (utils_columns.py:1963-1977)
    * through the dialect parser. */
  private val q45 = run(
    """sql edge "select event_id, value::float(0) as value_f0, """ +
      """event_type::ljust(10) as type_ljust, event_type::rjust(8) as type_rjust, """ +
      """event_type::replace(click by tap) as type_repl """ +
      """from events order by event_id limit 200"""")
  private val q45Sql = """
    SELECT event_id, round(value, 0) AS value_f0,
      rpad(event_type, 10, ' ') AS type_ljust,
      lpad(event_type, 8, ' ') AS type_rjust,
      replace(event_type, 'click', 'tap') AS type_repl
    FROM events ORDER BY event_id LIMIT 200"""

  /** q46 — auto-sized increments(points, ts): (unit, n) derived from the
    * WHERE range (30 days / 100 points -> hour, 7 —
    * unify_results.py:339-459). */
  private val q46 = run(
    """sql edge "select increments(100, ts), count(*) as n, """ +
      """avg(value) as avg_value from events """ +
      """where ts >= '2024-01-01' and ts < '2024-01-31' """ +
      """order by hour_parent, hour_bucket"""")
  private val q46Sql = s"""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS hour_parent,
      CAST(FLOOR(EXTRACT(hour FROM ts) / 7) AS BIGINT) AS hour_bucket,
      count(*) AS n, ${oAvg("value")} AS avg_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-31'
    GROUP BY 1, 2 ORDER BY 1, 2"""

  /** q51 — increments(month, 1, ts): month unit -> year parent
    * (increment_date_types chain, utils_sql.py:18-26). */
  private val q51 = run(
    """sql edge "select increments(month, 1, ts), count(*) as n, """ +
      """min(value) as min_value from events """ +
      """order by month_parent, month_bucket"""")
  private val q51Sql = """
    SELECT strftime(date_trunc('year', ts), '%Y') AS month_parent,
      CAST(FLOOR(EXTRACT(month FROM ts) / 1) AS BIGINT) AS month_bucket,
      count(*) AS n, min(value) AS min_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2"""

  /** q52 — increments(year, n, ts): the year special case — extract
    * only, no parent truncation (unify_results.py:535-550). */
  private val q52 = run(
    """sql edge "select increments(year, 1, ts), count(*) as n """ +
      """from events order by year_bucket"""")
  private val q52Sql = """
    SELECT CAST(FLOOR(EXTRACT(year FROM ts) / 1) * 1 AS INTEGER) AS year_bucket,
      count(*) AS n
    FROM events GROUP BY 1 ORDER BY 1"""

  /** q62 — the formatting tail of the cast registry: `::format(spec)`
    * (cast_with_format, utils_columns.py:1837-1848), `::float(%n)`
    * thousands rendering (cast_to_float `:1787`) and
    * `::timediff(other)` on aggregates (ret_time_diff `:1895-1913`,
    * whose own doc example is min(ts)::timediff(max(ts))). */
  private val q62 = run(
    """sql edge "select l_returnflag, """ +
      """sum(l_extendedprice)::format(:.3f) as sum_fmt, """ +
      """sum(l_extendedprice)::float(%2) as sum_thousands, """ +
      """min(l_shipdate)::timediff(max(l_shipdate)) as span_hms """ +
      """from lineitem group by l_returnflag order by l_returnflag"""")
  private val q62Sql = s"""
    WITH g AS (
      SELECT l_returnflag,
        ${oSum("l_extendedprice")} AS s,
        ABS(epoch(max(l_shipdate)) - epoch(min(l_shipdate))) AS secs
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag,
      printf('%.3f', s) AS sum_fmt,
      printf('%,d', CAST(FLOOR(ROUND(s, 2)) AS BIGINT)) || '.' ||
        lpad(CAST(CAST(ROUND((ROUND(s, 2) - FLOOR(ROUND(s, 2))) * 100)
          AS BIGINT) AS VARCHAR), 2, '0') AS sum_thousands,
      printf('%02d:%02d:%02d.%d',
        CAST(FLOOR(secs / 3600) AS BIGINT),
        CAST(FLOOR((secs - FLOOR(secs / 3600) * 3600) / 60) AS BIGINT),
        CAST(FLOOR(secs - FLOOR(secs / 3600) * 3600
          - FLOOR((secs - FLOOR(secs / 3600) * 3600) / 60) * 60) AS BIGINT),
        CAST(FLOOR((secs - FLOOR(secs)) * 100000) AS BIGINT)) AS span_hms
    FROM g ORDER BY l_returnflag"""

  /** q102 — the ROLLUP-SERVED dialect path under the driver gate: an
    * engine registers events, `rollup create`s a minute-grain standing
    * rollup (event_type dim), and the increments(hour, 6) command is
    * answered by dialect.RollupServe from rollup buckets — the QFn
    * REQUIRES the served plan never scans the events parquet (a silent
    * fallback would still be value-correct, so the gate alone can't see
    * it; the plan assertion pins the serving path). The oracle is the
    * direct full-scan aggregate: serving from incrementally-foldable
    * DECIMAL partials is exact — the q100 argument, now end-to-end
    * through the command surface. */
  private val q102: QFn = (s, d) => {
    val cat = new graft.engine.Catalog(s)
    cat.registerTable("events", s"$d/events.parquet", nanoTs = Seq("ts"))
    val engine = new graft.engine.Engine(s, cat)
    val dir = java.nio.file.Files.createTempDirectory("q102roll")
      .resolve("roll").toString
    engine.execute(s"rollup create where table = events and path = $dir " +
      "and time = ts and value = value and grain = minute " +
      "and dims = (event_type)")
    val df = engine.query(
      """sql edge "select event_type, increments(hour, 6, ts), """ +
        """count(*) as n, sum(value) as sum_value, """ +
        """min(value) as min_value, max(value) as max_value, """ +
        """avg(value) as avg_value from events """ +
        """where ts >= '2024-01-03 00:00:00' and ts < '2024-01-28 00:00:00' """ +
        """order by event_type, hour_parent, hour_bucket"""")
    require(!df.queryExecution.sparkPlan.toString.contains("events.parquet"),
      "q102 fell back to the base plan — rollup serving did not engage")
    df
  }
  private val q102Sql = s"""
    SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d')
        AS hour_parent,
      CAST(FLOOR(EXTRACT(hour FROM ts) / 6) AS BIGINT) AS hour_bucket,
      count(*) AS n, ${oSum("value")} AS sum_value,
      min(value) AS min_value, max(value) AS max_value,
      ${oAvg("value")} AS avg_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-03' AND ts < TIMESTAMP '2024-01-28'
    GROUP BY 1, 2, 3 ORDER BY event_type, hour_parent, hour_bucket"""

  /** q194 — `rollup sync` (the rollup joins the watermark family): a
    * standing rollup is created over the lineage epoch (tsd_id 1) of
    * an events copy, the rest of the corpus lands as a tsd_id-2
    * parquet append UNDERNEATH the engine (the crash/off window —
    * round 11 closed this for matviews/jmv/indexes; rollups were the
    * one standing family a missed batch left stale-FOREVER, having no
    * watermark), and ONE `rollup sync` replays exactly the rows above
    * the artifact's wm_ version tag. The q102-style increments() query
    * over the FULL range then serves from the rollup (plan-asserted)
    * and hash-matches DuckDB over the whole corpus: sync == rebuild,
    * through the transparent serving path. */
  private val q194: QFn = (s, d) => {
    val tmp = java.nio.file.Files.createTempDirectory("q194")
    val evDir = tmp.resolve("evr.parquet").toString
    val ev = Tables.load(s, d, "events")
      .select(col("ts"), col("event_type"), col("value"), col("user_id"))
    ev.filter(pmod(col("user_id"), lit(4)) =!= 1)
      .withColumn("tsd_id", lit(1)).write.parquet(evDir)
    val cat = new graft.engine.Catalog(s)
    cat.registerTable("evr", evDir)
    val engine = new graft.engine.Engine(s, cat)
    val roll = tmp.resolve("roll").toString
    engine.execute(s"rollup create where table = evr and path = $roll " +
      "and time = ts and value = value and grain = minute " +
      "and dims = (event_type)")
    ev.filter(pmod(col("user_id"), lit(4)) === 1)
      .withColumn("tsd_id", lit(2)).write.mode("append").parquet(evDir)
    val msg = engine.execute("rollup sync where table = evr")
    require(msg.contains("synced"), s"q194 sync folded nothing: $msg")
    require(engine.execute("rollup sync where table = evr")
      .contains("in sync"), "q194 second sync must be a no-op")
    val df = engine.query(
      """sql edge "select event_type, increments(hour, 6, ts), """ +
        """count(*) as n, sum(value) as sum_value, """ +
        """min(value) as min_value, max(value) as max_value """ +
        """from evr """ +
        """where ts >= '2024-01-03 00:00:00' and ts < '2024-01-28 00:00:00' """ +
        """order by event_type, hour_parent, hour_bucket"""")
    require(!df.queryExecution.sparkPlan.toString.contains("evr.parquet"),
      "q194 fell back to the base plan — rollup serving did not engage")
    df
  }
  private val q194Sql = s"""
    SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d')
        AS hour_parent,
      CAST(FLOOR(EXTRACT(hour FROM ts) / 6) AS BIGINT) AS hour_bucket,
      count(*) AS n, ${oSum("value")} AS sum_value,
      min(value) AS min_value, max(value) AS max_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-03' AND ts < TIMESTAMP '2024-01-28'
    GROUP BY 1, 2, 3 ORDER BY event_type, hour_parent, hour_bucket"""

  /** q201 — the TASK SCHEDULER drives standing maintenance (the
    * reference's operational loop: `schedule time = .. task ..` +
    * `run scheduler`, member_cmd.py:21696/21712, task_scheduler.py —
    * its own docs schedule repeatable queries and syncs exactly this
    * way). A standing rollup is created over the lineage epoch
    * (tsd_id 1); a `rollup sync` task is REGISTERED on the engine's
    * scheduler under a VIRTUAL clock; then two parquet appends land
    * underneath the engine (tsd_id 2, then 3) and a scheduler tick
    * after each — never a direct sync call — replays exactly the rows
    * above the artifact watermark. The q194-style increments() query
    * must then serve from the rollup (plan-asserted) and hash-match
    * DuckDB over the whole corpus: scheduled sync == rebuild. A tick
    * BETWEEN appends also proves the repeat gate (no double fold). */
  private val q201: QFn = (s, d) => {
    val tmp = java.nio.file.Files.createTempDirectory("q201")
    val evDir = tmp.resolve("evs.parquet").toString
    val ev = Tables.load(s, d, "events")
      .select(col("ts"), col("event_type"), col("value"), col("user_id"))
    ev.filter(pmod(col("user_id"), lit(4)) === 0)
      .withColumn("tsd_id", lit(1)).write.parquet(evDir)
    val cat = new graft.engine.Catalog(s)
    cat.registerTable("evs", evDir)
    val engine = new graft.engine.Engine(s, cat)
    var now = 1700000000000L
    engine.schedulerClock = () => now
    engine.taskScheduler.start(spawnThread = false) // tick() = the wake
    val roll = tmp.resolve("roll").toString
    engine.execute(s"rollup create where table = evs and path = $roll " +
      "and time = ts and value = value and grain = minute " +
      "and dims = (event_type)")
    engine.execute("""schedule time = 10 seconds and name = "roll sync" """ +
      "task rollup sync where table = evs")
    ev.filter(pmod(col("user_id"), lit(4)) === 1)
      .withColumn("tsd_id", lit(2)).write.mode("append").parquet(evDir)
    require(engine.taskScheduler.tick() == 1, "q201: task did not fire")
    // repeat gate: a second wake at the same instant runs nothing
    require(engine.taskScheduler.tick() == 0, "q201: repeat gate broken")
    ev.filter(pmod(col("user_id"), lit(4)) >= 2)
      .withColumn("tsd_id", lit(3)).write.mode("append").parquet(evDir)
    now += 10000
    require(engine.taskScheduler.tick() == 1, "q201: second fire missed")
    val st = engine.taskScheduler.tasksOf().head
    require(st.counter == 2 && st.lastStatus == "Success",
      s"q201: task state ${st.counter}/${st.lastStatus}")
    val df = engine.query(
      """sql edge "select event_type, increments(hour, 6, ts), """ +
        """count(*) as n, sum(value) as sum_value, """ +
        """min(value) as min_value, max(value) as max_value """ +
        """from evs """ +
        """where ts >= '2024-01-03 00:00:00' and ts < '2024-01-28 00:00:00' """ +
        """order by event_type, hour_parent, hour_bucket"""")
    require(!df.queryExecution.sparkPlan.toString.contains("evs.parquet"),
      "q201 fell back to the base plan — rollup serving did not engage")
    df
  }
  private val q201Sql = s"""
    SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d')
        AS hour_parent,
      CAST(FLOOR(EXTRACT(hour FROM ts) / 6) AS BIGINT) AS hour_bucket,
      count(*) AS n, ${oSum("value")} AS sum_value,
      min(value) AS min_value, max(value) AS max_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-03' AND ts < TIMESTAMP '2024-01-28'
    GROUP BY 1, 2, 3 ORDER BY event_type, hour_parent, hour_bucket"""

  /** q167 — the MATVIEW-SERVED sql path under the driver gate (q102's
    * discipline applied to [[MatViewServe]]): an engine registers
    * lineitem, `matview create`s a (returnflag, linestatus) view with
    * the decimal sum partial, and a coarser GROUP BY with a key-only
    * WHERE is answered from the #groups-row state — the QFn REQUIRES
    * the served plan never scans the lineitem parquet. The oracle is
    * the one-shot full-scan GROUP BY: the decimal fold is exact, so
    * hash equality pins serving correctness end-to-end through the
    * command surface. */
  private val q167: QFn = (s, d) => {
    val cat = new graft.engine.Catalog(s)
    cat.registerTable("lineitem", s"$d/lineitem.parquet")
    val engine = new graft.engine.Engine(s, cat)
    val dir = java.nio.file.Files.createTempDirectory("q167mv")
      .resolve("mv").toString
    engine.execute(s"matview create where table = lineitem and " +
      s"""path = $dir and spec = {"keys":
        ["l_returnflag", "l_linestatus"], "aggs": [
        {"fn": "count", "alias": "cnt"},
        {"fn": "sum", "expr": "cast(l_extendedprice as decimal(18,2))",
         "alias": "sp"},
        {"fn": "min", "expr": "l_quantity", "alias": "mnq"},
        {"fn": "max", "expr": "l_quantity", "alias": "mxq"}]}""")
    val df = engine.query(
      """sql edge "select l_returnflag, count(*) as n, """ +
        """sum(l_extendedprice) as sum_price, """ +
        """min(l_quantity) as min_qty, max(l_quantity) as max_qty, """ +
        """range(l_quantity) as range_qty from lineitem """ +
        """where l_returnflag = 'R' or l_returnflag = 'N' """ +
        """group by l_returnflag order by l_returnflag"""")
    require(!df.queryExecution.sparkPlan.toString
        .contains("lineitem.parquet"),
      "q167 fell back to the base plan — matview serving did not engage")
    df
  }
  private val q167Sql = s"""
    SELECT l_returnflag, count(*) AS n,
      ${oSum("l_extendedprice")} AS sum_price,
      min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
      abs(max(l_quantity) - min(l_quantity)) AS range_qty
    FROM lineitem
    WHERE l_returnflag = 'R' OR l_returnflag = 'N'
    GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** q178 — matview-served `avg` + HAVING under the driver gate:
    * the view records the (decimal sum, NULL-SENSITIVE count) pair,
    * the dialect query asks for `avg(l_quantity)` with a HAVING over
    * its alias, and the serve path answers BOTH from the #groups-row
    * state — the QFn requires the plan never scans lineitem parquet
    * (q167's discipline). Served avg must be BIT-EQUAL to the base
    * decomposition: exact decimal sum (re-folded, still exact) cast
    * to double over the non-null count — the oracle replays that
    * arithmetic verbatim, so hash equality pins it. HAVING filters
    * group rows post-aggregate in the same plan position as the base
    * path; the one filtered-out group ('A'-flag avg below the
    * threshold at every SF... proven by the oracle, not assumed)
    * exercises the filter for real. */
  private val q178: QFn = (s, d) => {
    val cat = new graft.engine.Catalog(s)
    cat.registerTable("lineitem", s"$d/lineitem.parquet")
    val engine = new graft.engine.Engine(s, cat)
    val dir = java.nio.file.Files.createTempDirectory("q178mv")
      .resolve("mv").toString
    engine.execute(s"matview create where table = lineitem and " +
      s"""path = $dir and spec = {"keys":
        ["l_returnflag", "l_linestatus"], "aggs": [
        {"fn": "count", "alias": "cnt"},
        {"fn": "count", "expr": "l_quantity", "alias": "nq"},
        {"fn": "sum", "expr": "cast(l_quantity as decimal(18,2))",
         "alias": "sq"}]}""")
    val df = engine.query(
      """sql edge "select l_returnflag, count(*) as n, """ +
        """count(l_quantity) as n_qty, """ +
        """avg(l_quantity) as avg_qty from lineitem """ +
        """group by l_returnflag having avg_qty > 25.4 """ +
        """order by l_returnflag"""")
    require(!df.queryExecution.sparkPlan.toString
        .contains("lineitem.parquet"),
      "q178 fell back to the base plan — matview avg serving did not " +
        "engage")
    df
  }
  private val q178Sql = s"""
    SELECT l_returnflag, count(*) AS n, count(l_quantity) AS n_qty,
      ${oAvg("l_quantity")} AS avg_qty
    FROM lineitem
    GROUP BY l_returnflag
    HAVING ${oAvg("l_quantity")} > 25.4
    ORDER BY l_returnflag"""

  /** q183 — ingest AUTO-FOLD closing the serving loop under the
    * driver gate: a matview is created over a registered table, a
    * late batch arrives over the REST-PUT ingest path (NDJSON body,
    * schema-aligned), and WITHOUT any refresh command the
    * transparently-served `sql` GROUP BY answers from the #groups-row
    * state INCLUDING the batch — the QFn requires the served plan
    * never scans the base parquet (q167's discipline), and the oracle
    * is the one-shot GROUP BY over the FULL table: hash equality
    * proves the auto-fold left the view exactly equal to a rebuild.
    * This is the staleness gap transparent serving otherwise has: a
    * view that serves queries transparently must refresh
    * transparently, or every PUT silently corrupts dashboards. */
  private val q183: QFn = (s, d) => {
    val cat = new graft.engine.Catalog(s)
    val tmp = java.nio.file.Files.createTempDirectory("q183")
    val ord = s.read.parquet(s"$d/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"))
    ord.filter(pmod(col("o_orderkey"), lit(10)) =!= 3)
      .write.parquet(tmp.resolve("base.parquet").toString)
    cat.registerTable("ords", tmp.resolve("base.parquet").toString)
    val engine = new graft.engine.Engine(s, cat)
    val mv = tmp.resolve("mv").toString
    engine.execute(s"matview create where table = ords and " +
      s"""path = $mv and spec = {"keys": ["o_orderpriority"], "aggs": [
        {"fn": "count", "alias": "cnt"},
        {"fn": "sum", "expr": "cast(o_orderkey as decimal(18,2))",
         "alias": "sk"}]}""")
    val batch = ord.filter(pmod(col("o_orderkey"), lit(10)) === 3)
      .collect().map(r =>
        s"""{"o_orderkey": ${r.getLong(0)}, """ +
          s""""o_orderpriority": "${r.getString(1)}"}""").mkString("\n")
    engine.ingest("ords", batch) // append + auto-fold, no refresh cmd
    val df = engine.query(
      """sql edge "select o_orderpriority, count(*) as n, """ +
        """sum(o_orderkey) as sum_key from ords """ +
        """group by o_orderpriority order by o_orderpriority"""")
    require(!df.queryExecution.sparkPlan.toString
        .contains("base.parquet"),
      "q183 fell back to the base plan — matview serving did not engage")
    df
  }
  private val q183Sql = s"""
    SELECT o_orderpriority, count(*) AS n,
      ${oSum("o_orderkey")} AS sum_key
    FROM orders
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** q186 — RETENTION SYMMETRY under the oracle: a day-partitioned
    * copy of `events` carries a registered matview; `drop partition
    * ... before <horizon>` folds the dropped partitions' rows OUT of
    * the standing state (exactly-once drop-tag) before deleting the
    * directories, and the transparently-SERVED GROUP BY — the QFn
    * requires the plan never scans the base — answers over survivors
    * only. The oracle recomputes from the raw events table filtered to
    * the horizon: hash equality is drop-then-serve == rebuild-over-
    * survivors, closing the round-10 gap where retention left standing
    * artifacts serving forgotten rows (reference retention primitive:
    * cmd/member_cmd.py:21115). */
  private val q186: QFn = (s, d) => {
    val tmp = java.nio.file.Files.createTempDirectory("q186")
    val ev = Tables.load(s, d, "events")
      .select(col("ts"), col("event_type"), col("value"))
    val p = tmp.resolve("evp").toString
    graft.engine.TimePartitions.write(ev, "ts", "day", 1, p)
    val cat = new graft.engine.Catalog(s)
    cat.registerPartitionedTable("evp", p, "ts", "day", 1)
    val engine = new graft.engine.Engine(s, cat)
    val mv = tmp.resolve("mv").toString
    engine.execute(s"matview create where table = evp and path = $mv " +
      s"""and spec = {"keys": ["event_type"], "aggs": [
        {"fn": "count", "alias": "cnt"},
        {"fn": "count", "expr": "value", "alias": "nv"},
        {"fn": "sum", "expr": "cast(value as decimal(18,2))",
         "alias": "sv"}]}""")
    val msg = engine.execute("drop partition evp before 2024-01-08")
    require(msg.contains("tombstones folded"),
      s"q186 drop did not fold the matview: $msg")
    val df = engine.query(
      """sql edge "select event_type, count(*) as n, """ +
        """sum(value) as sum_value, avg(value) as avg_value """ +
        """from evp group by event_type order by event_type"""")
    require(!df.queryExecution.sparkPlan.toString.contains("/evp"),
      "q186 fell back to the base scan — serving did not engage")
    df
  }
  private val q186Sql = s"""
    SELECT event_type, count(*) AS n, ${oSum("value")} AS sum_value,
      ${oAvg("value")} AS avg_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-08'
    GROUP BY event_type ORDER BY event_type"""

  /** q187 — the dialect JOIN grammar, LIVE plan: `FROM a JOIN b ON
    * a.k = b.k` parses ([[EdgeSql.JoinSpec]]) and compiles to one
    * Catalyst inner equi-join + GROUP BY — WHERE (date-literal
    * normalization included), HAVING-free aggregates, ORDER BY all
    * composing over the joined frame exactly as over a single table.
    * BEYOND-PARITY: the reference's engines report joins unsupported
    * (`is_suport_join()` = False, dbms/sqlite_dbms.py:113,
    * psql_dbms.py:206) and SURVEY §2.3 declares exceeding that
    * desirable. The oracle is the identical SQL in DuckDB. */
  private val q187 = run(
    """sql edge "select o_orderpriority, l_returnflag, count(*) as n, """ +
      """sum(l_quantity) as sum_qty, max(l_quantity) as max_qty """ +
      """from orders join lineitem """ +
      """on orders.o_orderkey = lineitem.l_orderkey """ +
      """where o_orderdate >= '1996-01-01' """ +
      """group by o_orderpriority, l_returnflag """ +
      """order by o_orderpriority, l_returnflag"""")
  private val q187Sql = s"""
    SELECT o_orderpriority, l_returnflag, count(*) AS n,
      ${oSum("l_quantity")} AS sum_qty, max(l_quantity) AS max_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY o_orderpriority, l_returnflag
    ORDER BY o_orderpriority, l_returnflag"""

  /** q188 — TRANSPARENT join-matview serving: the q181 IVM machinery
    * reached from the `sql` front door. A join matview is registered
    * whose spec records the join (on-pairs), keys, and the dialect's
    * exact partials (count(*), null-sensitive count, decimal sum);
    * the SAME JOIN query q187 runs live is then answered from the
    * #groups-row artifact — [[JoinMatViewServe]] matches the FROM
    * shape, [[MatViewServe.servePlan]] proves the aggregates, and the
    * QFn REQUIRES the served plan scans NEITHER base table (the q183
    * discipline). avg serves as re-folded decimal sum / re-folded
    * count — bit-equal to the live decomposition. Oracle: the
    * one-shot join+GROUP BY. */
  private val q188: QFn = (s, d) => {
    val cat = new graft.engine.Catalog(s)
    cat.registerTable("orders", s"$d/orders.parquet")
    cat.registerTable("lineitem", s"$d/lineitem.parquet")
    val engine = new graft.engine.Engine(s, cat)
    val p = java.nio.file.Files.createTempDirectory("q188")
      .resolve("jmv").toString
    engine.execute(s"join matview create where path = $p " +
      s"""and spec = {"left": "orders", "right": "lineitem",
        "on": [["o_orderkey", "l_orderkey"]],
        "keys": ["o_orderpriority", "l_returnflag"], "aggs": [
        {"fn": "count", "expr": "1", "alias": "cnt"},
        {"fn": "count", "expr": "l_quantity", "alias": "nq"},
        {"fn": "sum", "expr": "cast(l_quantity as decimal(18,2))",
         "alias": "sq"}]}""")
    val df = engine.query(
      """sql edge "select o_orderpriority, l_returnflag, """ +
        """count(*) as n, sum(l_quantity) as sum_qty, """ +
        """avg(l_quantity) as avg_qty """ +
        """from orders join lineitem """ +
        """on orders.o_orderkey = lineitem.l_orderkey """ +
        """group by o_orderpriority, l_returnflag """ +
        """order by o_orderpriority, l_returnflag"""")
    val plan = df.queryExecution.sparkPlan.toString
    require(!plan.contains("orders.parquet") &&
        !plan.contains("lineitem.parquet"),
      "q188 fell back to the live join — join matview serving did " +
        "not engage")
    df
  }
  private val q188Sql = s"""
    SELECT o_orderpriority, l_returnflag, count(*) AS n,
      ${oSum("l_quantity")} AS sum_qty,
      ${oAvg("l_quantity")} AS avg_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority, l_returnflag
    ORDER BY o_orderpriority, l_returnflag"""

  /** q193 — LEFT JOIN through the dialect: customers keep their group
    * row even with zero orders; `count(*)` counts null-extended rows,
    * `count(o_orderkey)` only matches — the null-sensitivity split the
    * serve layer's count discipline is built on, here proven on the
    * live plan (LEFT joins never serve from the inner-join matview;
    * the matcher declines them). Oracle: identical SQL in DuckDB. */
  private val q193 = run(
    """sql edge "select c_mktsegment, count(*) as n, """ +
      """count(o_orderkey) as n_orders, """ +
      """sum(o_totalprice) as sum_price """ +
      """from customer left join orders """ +
      """on customer.c_custkey = orders.o_custkey """ +
      """group by c_mktsegment order by c_mktsegment"""")
  private val q193Sql = s"""
    SELECT c_mktsegment, count(*) AS n,
      count(o_orderkey) AS n_orders,
      ${oSum("o_totalprice")} AS sum_price
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** q195 — `nodes=main|all` (the cmd_instructions nodes option,
    * member_cmd.py:150-153) paired with the HA committed boundary: an
    * events copy carries two lineage epochs (tsd_id 1 = replicated on
    * all peers, 2 = this node only) and the safe id (dbms/ha.py:225)
    * sits at 1. `nodes=main` must answer from exactly the consensus
    * epoch — the QFn REQUIRES it row-equal to `committed=true` and to
    * the two options composed, and REQUIRES `nodes=all` to see the
    * full corpus. The oracle replays the epoch-1 predicate directly. */
  private val q195: QFn = (s, d) => {
    val tmp = java.nio.file.Files.createTempDirectory("q195")
    val evDir = tmp.resolve("evn.parquet").toString
    import org.apache.spark.sql.functions.when
    Tables.load(s, d, "events")
      .select(col("ts"), col("event_type"), col("value"), col("user_id"))
      .withColumn("tsd_id",
        when(pmod(col("user_id"), lit(4)) === 1, lit(2)).otherwise(lit(1)))
      .write.parquet(evDir)
    val cat = new graft.engine.Catalog(s)
    cat.registerTable("evn", evDir)
    val engine = new graft.engine.Engine(s, cat)
    engine.setSafeTsdId("evn", 1)
    def q(opts: String) = engine.query(s"""sql edge $opts """ +
      """"select event_type, count(*) as n, sum(value) as sum_value """ +
      """from evn group by event_type order by event_type"""")
    val main = q("nodes=main").collect().toSeq
    require(main == q("committed=true").collect().toSeq,
      "q195: nodes=main must equal the committed boundary")
    require(main == q("nodes=main committed=true").collect().toSeq,
      "q195: nodes=main and committed=true must compose")
    val nAll = q("nodes=all").agg(org.apache.spark.sql.functions
      .sum(col("n"))).head().getLong(0)
    require(nAll > main.map(_.getLong(1)).sum,
      "q195: nodes=all must also see the unreplicated epoch")
    q("nodes=main")
  }
  private val q195Sql = s"""
    SELECT event_type, count(*) AS n, ${oSum("value")} AS sum_value
    FROM events WHERE user_id % 4 <> 1
    GROUP BY event_type ORDER BY event_type"""

  /** q198 — CROSS-NODE ingest through the shared tsd ledger: two LIVE
    * engines over one catalog root (`sharedLedger = true` — the fleet
    * semantics the reference gets from tsd_info being a single DBMS
    * table with a UNIQUE hash index, dbms/db_info.py:1738/1750). The
    * documents corpus splits into three NDJSON batches; node A PUTs
    * batches 0 and 1, node B re-PUTs the IDENTICAL batch-1 payload —
    * which the shared ledger must REFUSE live, with no restart — then
    * PUTs batch 2. The oracle aggregates the whole corpus counted
    * exactly once: a double-ingested batch 1 (the failure this guards
    * against) doubles its source's counts and hash-mismatches. */
  private val q198: QFn = (s, d) => {
    val root = java.nio.file.Files.createTempDirectory("q198")
    val docs = Tables.load(s, d, "documents")
      .select(col("doc_id"), col("source"),
        org.apache.spark.sql.functions.length(col("text")).as("n"))
      .collect()
    def batch(k: Int): String = docs
      .filter(r => r.getLong(0) % 3 == k)
      .map(r => s"""{"doc_id": ${r.getLong(0)}, """ +
        s""""source": "${r.getString(1)}", "n": ${r.getInt(2)}}""")
      .mkString("\n")
    def node(): graft.engine.Engine = {
      val e = new graft.engine.Engine(s,
        new graft.engine.Catalog(s, Some(root)), sharedLedger = true)
      e.dataDir = Some(root.resolve("data").toString)
      e
    }
    val (a, b) = (node(), node())
    require(a.ingest("xdocs", batch(0)) > 0L)
    require(a.ingest("xdocs", batch(1)) > 0L)
    require(b.ingest("xdocs", batch(1)) == 0L,
      "q198: cross-node duplicate PUT was re-ingested")
    require(b.ingest("xdocs", batch(2)) > 0L)
    b.query("""sql edge "select source, count(*) as n_docs, """ +
      """sum(n) as sum_len from xdocs group by source """ +
      """order by source"""")
  }
  private val q198Sql = s"""
    SELECT source, count(*) AS n_docs,
      ${oSum("len(text)")} AS sum_len
    FROM documents GROUP BY source ORDER BY source"""

  /** q204 — the HA peer-sync ROUND under the oracle (`run ha sync`,
    * dbms/ha.py as one command; q198's shared-ledger scenario flipped
    * to the TRANSPORT side): two INDEPENDENT engines (separate
    * catalogs, separate ledgers, separate data roots) each ingest an
    * overlapping subset of the corpus via PUT — node A holds batches
    * {0,1}, node B {1,2} — then ONE `run ha sync` on B pulls batch 0
    * from A's hash-addressed archive and pushes batch 2 to A over
    * REST PUT. Both nodes then hold the corpus exactly once (the
    * shared batch 1 is refused by content hash on both sides during
    * the sync), and the SERVED aggregate on B hash-matches DuckDB
    * over the whole corpus. A double-applied or dropped batch breaks
    * the hash. The committed watermark advances to the consensus, so
    * the query runs committed=true — the replication-safe read. */
  private val q204: QFn = (s, d) => {
    val root = java.nio.file.Files.createTempDirectory("q204")
    val docs = Tables.load(s, d, "documents")
      .select(col("doc_id"), col("source"),
        org.apache.spark.sql.functions.length(col("text")).as("n"))
      .collect()
    def batch(k: Int): String = docs
      .filter(r => r.getLong(0) % 3 == k)
      .map(r => s"""{"doc_id": ${r.getLong(0)}, """ +
        s""""source": "${r.getString(1)}", "n": ${r.getInt(2)}}""")
      .mkString("\n")
    def node(name: String) = {
      val e = new graft.engine.Engine(s, new graft.engine.Catalog(s))
      e.dataDir = Some(root.resolve(name).toString)
      val fe = new graft.engine.HttpFrontend(e)
      (e, fe, fe.start())
    }
    val (a, feA, portA) = node("a")
    val (b, feB, _) = node("b")
    try {
      require(a.ingest("hdocs", batch(0)) > 0L)
      require(a.ingest("hdocs", batch(1)) > 0L)
      require(b.ingest("hdocs", batch(1)) > 0L)
      require(b.ingest("hdocs", batch(2)) > 0L)
      val out = b.execute(
        s"run ha sync where peer = localhost:$portA and table = hdocs")
      require(out.contains("pulled 1") && out.contains("pushed 1"),
        s"q204 sync moved the wrong batches: $out")
      require(b.execute(
        s"run ha sync where peer = localhost:$portA and table = hdocs")
        .contains("pulled 0, pushed 0"), "q204 second round must be empty")
      b.query("""sql edge committed=true "select source, """ +
        """count(*) as n_docs, sum(n) as sum_len from hdocs """ +
        """group by source order by source"""")
    } finally { feA.stop(); feB.stop() }
  }
  private val q204Sql = q198Sql

  /** q205 — the NATIVE Kafka ingest chain under the oracle (the §2.1
    * Kafka row's driver-gate closure; wire stack
    * streaming/KafkaNative.scala, consumer command
    * member_cmd.py:21481, producer al_kafka.py:50-121): the documents
    * corpus is PRODUCED to a v0 mini broker in three keyed batches,
    * `run kafka consumer` polls it over the wire protocol (reset =
    * earliest) landing one NDJSON file per message in a watch dir,
    * `run streamer` maps them through a mapping POLICY into a table
    * via the transactional sink, and the sql aggregate over that
    * table hash-matches DuckDB over the whole corpus — a lost,
    * duplicated, or mis-mapped message breaks the hash. The chain is
    * the MQTT client chain with the transport leg swapped, which is
    * the reference's architecture claim for its message buses. */
  private val q205: QFn = (s, d) => {
    val docs = Tables.load(s, d, "documents")
      .select(col("doc_id"), col("source"),
        org.apache.spark.sql.functions.length(col("text")).as("n"))
      .collect()
    val broker = new graft.streaming.KafkaMiniBroker()
    val port = broker.start()
    val producer = new graft.streaming.KafkaNativeClient("localhost", port)
    try {
      val root = java.nio.file.Files.createTempDirectory("q205")
      val land = root.resolve("land")
      val cat = new graft.engine.Catalog(s)
      val engine = new graft.engine.Engine(s, cat)
      engine.dataDir = Some(root.resolve("data").toString)
      engine.execute("""policy add kq {"mapping": {
        "dbms": "edge", "table": "kdocs",
        "schema": {
          "doc_id": {"type": "bigint", "bring": "[doc_id]"},
          "source": {"type": "varchar", "bring": "[source]"},
          "n": {"type": "bigint", "bring": "[n]"}
        }}}""")
      (0 until 3).foreach { k =>
        producer.produceStrings("kdocs",
          docs.filter(_.getLong(0) % 3 == k).map { r =>
            s"""{"doc_id": ${r.getLong(0)}, """ +
              s""""source": "${r.getString(1)}", "n": ${r.getInt(2)}}"""
          }.toSeq)
      }
      engine.execute(s"run kafka consumer where ip = localhost and " +
        s"port = $port and topic = kdocs and dir = $land " +
        "and reset = earliest and poll = 25")
      engine.execute(s"run streamer where dir = $land and " +
        "table = kdocs and policy = kq and flush = 1")
      val want = docs.length.toLong
      val q = engine.streamerQueries("kdocs")
      val deadline = System.currentTimeMillis + 120000
      def rows(): Long =
        try cat.table("kdocs").count() catch { case _: Exception => 0L }
      var have = rows()
      while (have < want && System.currentTimeMillis < deadline) {
        q.processAllAvailable()
        have = rows()
        if (have < want) Thread.sleep(50)
      }
      require(have == want, s"q205: $have of $want rows landed")
      engine.execute("exit kafka consumer")
      engine.execute("exit streamer")
      engine.query("""sql edge "select source, count(*) as n_docs, """ +
        """sum(n) as sum_len from kdocs group by source """ +
        """order by source"""")
    } finally { producer.close(); broker.stop() }
  }
  private val q205Sql = q198Sql

  /** q206 — a FOREIGN-engine table under the oracle (the §2.1
    * PI/OLEDB connector row's honest modern seam, SURVEY: "JDBC
    * source if ever"; `dbms/oledb_dbms.py:64-76` is a dialect tweak
    * on a remote cursor): the nation table is loaded into a LIVE
    * embedded Derby database over plain JDBC, `connect dbms`
    * registers it through the Spark JDBC source, and the engine's
    * sql dialect queries it like any table — filter pushdown and
    * column pruning reach the remote engine (asserted in
    * JdbcSourceSpec), and the aggregate hash-matches DuckDB over the
    * parquet original: a row lost or retyped crossing the JDBC
    * boundary breaks the hash. */
  private val q206: QFn = (s, d) => {
    val root = java.nio.file.Files.createTempDirectory("q206")
    // keep Derby's engine log out of the repo CWD (first use wins;
    // harmless if another suite already set it)
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home", root.toString)
    val url = s"jdbc:derby:$root/db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE nat (n_nationkey INT, " +
        "n_name VARCHAR(64), n_regionkey INT)")
      val ps = conn.prepareStatement("INSERT INTO nat VALUES (?, ?, ?)")
      Tables.load(s, d, "nation").collect().foreach { r =>
        ps.setInt(1, r.getInt(0)); ps.setString(2, r.getString(1))
        ps.setInt(3, r.getInt(2)); ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()
    val engine = new graft.engine.Engine(s, new graft.engine.Catalog(s))
    val reply = engine.execute(s"connect dbms nat_remote where " +
      s"type = jdbc and url = $url and dbtable = nat")
    require(reply.contains("connected"), reply)
    rotateDerby(s"$root/db", root.toString) // bound instances + disk
    engine.query(
      """sql edge "select n_regionkey, count(*) as n_nations """ +
        """from nat_remote where n_nationkey >= 5 group by n_regionkey """ +
        """order by n_regionkey"""")
  }
  private val q206Sql =
    "SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations " +
      "FROM nation WHERE n_nationkey >= 5 GROUP BY 1 ORDER BY 1"

  /** Temp embedded-Derby lifecycle for the JDBC fixture queries
    * (q206/q208): each invocation boots a fresh throwaway database.
    * Shutting it down INSIDE the QFn would force materialization (the
    * returned plan is a lazy JDBC scan) and hide the real
    * JDBCRelation plan from Plans/bench — so instead the PREVIOUS
    * fixture database shuts down when the next one boots. Repeated
    * Bench iterations therefore hold at most ONE booted instance
    * (the r14 accumulation concern), the caller's lazy plan stays
    * valid until the next fixture query runs, and the last instance
    * dies with the JVM (embedded Derby needs no clean shutdown for a
    * throwaway database). */
  private val lastDerby =
    new java.util.concurrent.atomic.AtomicReference[(String, String)](null)
  private def rotateDerby(dbPath: String, fixtureRoot: String): Unit = {
    val prev = lastDerby.getAndSet((dbPath, fixtureRoot))
    if (prev != null && prev._1 != dbPath) {
      try java.sql.DriverManager
        .getConnection(s"jdbc:derby:${prev._1};shutdown=true")
      catch { case _: java.sql.SQLException => () } // 08006 = stopped
      // bound DISK too, not just booted instances: each invocation
      // creates a whole fixture tree (Derby db + parquet copy) under
      // a fresh temp root — delete the previous one after shutdown
      try {
        import java.nio.file.{Files, Path}
        import scala.jdk.CollectionConverters._
        val r = java.nio.file.Paths.get(prev._2)
        if (Files.exists(r)) {
          val all = Files.walk(r)
          try all.sorted(java.util.Comparator.reverseOrder[Path]())
            .iterator().asScala.foreach(Files.deleteIfExists(_))
          finally all.close()
        }
      } catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** q208 — FEDERATED include=: ONE dialect query unions a local
    * parquet table with a JDBC-served foreign table (the reference's
    * include already treats foreign tables as the queried table,
    * cmd/member_cmd.py:110-113 — its shards are all remote cursors).
    * nation is SPLIT for the fixture: keys < 12 in a registered
    * parquet table, keys >= 12 in a live embedded Derby registered
    * via `connect dbms` (auto-derived parallel cursors); the oracle
    * aggregates the WHOLE parquet nation, so a row lost, duplicated,
    * or retyped on either side of the federation breaks the hash. */
  private val q208: QFn = (s, d) => {
    val root = java.nio.file.Files.createTempDirectory("q208")
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home", root.toString)
    val url = s"jdbc:derby:$root/db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE nat_hi (n_nationkey INT, " +
        "n_name VARCHAR(64), n_regionkey INT)")
      val ps = conn.prepareStatement("INSERT INTO nat_hi VALUES (?, ?, ?)")
      Tables.load(s, d, "nation").where("n_nationkey >= 12")
        .collect().foreach { r =>
          ps.setInt(1, r.getInt(0)); ps.setString(2, r.getString(1))
          ps.setInt(3, r.getInt(2)); ps.addBatch()
        }
      ps.executeBatch()
    } finally conn.close()
    val low = root.resolve("nation_low.parquet").toString
    Tables.load(s, d, "nation").where("n_nationkey < 12")
      .select("n_nationkey", "n_name", "n_regionkey").write.parquet(low)
    val cat = new graft.engine.Catalog(s)
    cat.registerTable("nation_low", low)
    val engine = new graft.engine.Engine(s, cat)
    val reply = engine.execute(s"connect dbms nat_hi_remote where " +
      s"type = jdbc and url = $url and dbtable = nat_hi")
    require(reply.contains("connected"), reply)
    rotateDerby(s"$root/db", root.toString) // bound instances + disk
    engine.query(
      """sql edge include = (nat_hi_remote) "select n_regionkey, """ +
        """count(*) as n_nations, min(n_nationkey) as min_key, """ +
        """max(n_nationkey) as max_key from nation_low """ +
        """group by n_regionkey order by n_regionkey"""")
  }
  private val q208Sql =
    "SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations, " +
      "min(n_nationkey) AS min_key, max(n_nationkey) AS max_key " +
      "FROM nation GROUP BY 1 ORDER BY 1"

  /** Fixture plumbing shared by the PLC chain queries (q209/q210) —
    * one definition of the landing counter and the two wait
    * disciplines, like rotateDerby for the JDBC fixtures. */
  private def jsonCount(dir: java.nio.file.Path): Int = {
    if (!java.nio.file.Files.isDirectory(dir)) return 0
    val st = java.nio.file.Files.list(dir)
    try st.filter(_.toString.endsWith(".json")).count().toInt
    finally st.close()
  }

  /** Poll `count` until it reaches `want` (30 s bound), else fail
    * with the query's context. */
  private def awaitLanding(want: Int, ctx: String)(count: => Int): Unit = {
    val deadline = System.currentTimeMillis + 30000
    while (count < want && System.currentTimeMillis < deadline)
      Thread.sleep(10)
    require(count == want, s"$ctx: landed $count of $want")
  }

  /** Drive the given streamer queries until every listed table holds
    * `want` rows (120 s bound). */
  private def drainStreamers(cat: graft.engine.Catalog,
      qs: Seq[org.apache.spark.sql.streaming.StreamingQuery],
      tables: Seq[String], want: Long, ctx: String): Unit = {
    def rows(t: String): Long =
      try cat.table(t).count() catch { case _: Exception => 0L }
    val deadline = System.currentTimeMillis + 120000
    while (tables.exists(rows(_) < want) &&
        System.currentTimeMillis < deadline) {
      qs.foreach(_.processAllAvailable())
      if (tables.exists(rows(_) < want)) Thread.sleep(50)
    }
    require(tables.forall(rows(_) == want),
      s"$ctx: ${tables.map(rows).mkString("/")} of $want rows landed")
  }

  /** q209 — the NATIVE Modbus TCP ingest chain under the oracle (the
    * §2.1 PLC row's driver-gate closure; wire stack
    * streaming/ModbusTcp.scala, `run plc client` per
    * cmd/member_cmd.py:21390 + api/plc_client.py:219, decode per
    * api/modbus_client.py:1183): each nation row is loaded into an
    * embedded Modbus server's register bank — the key as a plain
    * holding register, key×1e6 as a 2-register big-endian long, the
    * region as an input register, region+0.5 as a 2-register IEEE-754
    * float, and key-parity as a coil — and `run plc client` polls it
    * over the wire, decodes the map, and lands one wide NDJSON row
    * per poll. `run streamer` maps the landings through a mapping
    * policy into a table, and the aggregate hash-matches DuckDB over
    * the parquet nation: a poll lost or double-landed, or ANY decode
    * slip (sign, word order, float bits, bit unpack, scale) breaks
    * the hash. The 25 run/exit cycles double as a client-lifecycle
    * soak. */
  private val q209: QFn = (s, d) => {
    import graft.streaming.{ModbusBank, ModbusTcpServer}
    val nations = Tables.load(s, d, "nation")
      .select("n_nationkey", "n_regionkey")
      .collect().sortBy(_.getInt(0))
    val srv = new ModbusTcpServer()
    val port = srv.start()
    try {
      val root = java.nio.file.Files.createTempDirectory("q209")
      val land = root.resolve("land")
      val cat = new graft.engine.Catalog(s)
      val engine = new graft.engine.Engine(s, cat)
      engine.dataDir = Some(root.resolve("data").toString)
      engine.execute("""policy add pn {"mapping": {
        "dbms": "edge", "table": "plcnat",
        "schema": {
          "nkey": {"type": "bigint", "bring": "[nkey]"},
          "km": {"type": "bigint", "bring": "[km]"},
          "rkey": {"type": "bigint", "bring": "[rkey]"},
          "rf": {"type": "double", "bring": "[rf]"},
          "odd": {"type": "bigint", "bring": "[odd]"}}}}""")
      val runCmd = s"run plc client where type = modbus and " +
        s"hostname = localhost and port = $port and name = plcnat " +
        s"and frequency = 300 and dir = $land and table = plcnat and " +
        """map = [{"name":"nkey","register":0},""" +
        """{"name":"km","register":[2,3],"type":"long"},""" +
        """{"name":"rkey","inputRegister":0},""" +
        """{"name":"rf","inputRegister":[4,5],"type":"float"},""" +
        """{"name":"odd","coil":0}]"""
      nations.zipWithIndex.foreach { case (r, i) =>
        val (nkey, rkey) = (r.getInt(0), r.getInt(1))
        val km = nkey.toLong * 1000000L
        val fbits = java.lang.Float.floatToIntBits(rkey.toFloat + 0.5f)
        srv.setBank(ModbusBank(
          coils = Vector(nkey % 2),
          holding = Vector(nkey, 0,
            ((km >> 16) & 0xFFFF).toInt, (km & 0xFFFF).toInt),
          input = Vector(rkey, 0, 0, 0,
            (fbits >>> 16) & 0xFFFF, fbits & 0xFFFF)))
        engine.execute(runCmd)
        awaitLanding(i + 1, s"q209 poll $i")(jsonCount(land))
        engine.execute("exit plc plcnat")
      }
      engine.execute(s"run streamer where dir = $land and " +
        "table = plcnat and policy = pn and flush = 1")
      drainStreamers(cat, Seq(engine.streamerQueries("plcnat")),
        Seq("plcnat"), nations.length.toLong, "q209")
      engine.execute("exit streamer")
      engine.query("""sql edge "select rkey, """ +
        """count(*) as n_nations, sum(nkey) as sum_key, """ +
        """sum(km) as sum_km, max(rf) as max_rf, sum(odd) as n_odd """ +
        """from plcnat group by rkey order by rkey"""")
    } finally srv.stop()
  }
  private val q209Sql =
    "SELECT CAST(n_regionkey AS BIGINT) AS rkey, " +
      "CAST(count(*) AS BIGINT) AS n_nations, " +
      "sum(n_nationkey) AS sum_key, " +
      "sum(n_nationkey) * 1000000 AS sum_km, " +
      "CAST(max(n_regionkey) + 0.5 AS DOUBLE) AS max_rf, " +
      "sum(n_nationkey % 2) AS n_odd " +
      "FROM nation GROUP BY 1 ORDER BY 1"

  /** q210 — Modbus `dynamic = true` under the oracle: the PER-POINT
    * table mode (one table per map `name`, modbus_client.py:92
    * modbus_dynamic_table_name + :769 modbus_dynamic_publish_row).
    * Each poll lands each point as its own {timestamp, value} row in
    * `{client}_{field}`; two mapping policies rename the generic
    * columns, two streamers fold the two point tables, and the
    * dialect JOINS them back on the shared poll timestamp (every
    * point of one poll carries the poll's first-read stamp, the
    * reference's timestamp_first) — so the recombined (nkey, rkey)
    * pairs aggregate to the same hash DuckDB computes over parquet
    * nation. A dynamic-table misroute, a timestamp drifting between
    * points of one poll, or a lost per-point row all break the
    * hash. */
  private val q210: QFn = (s, d) => {
    import graft.streaming.{ModbusBank, ModbusTcpServer}
    val nations = Tables.load(s, d, "nation")
      .select("n_nationkey", "n_regionkey")
      .collect().sortBy(_.getInt(0))
    val srv = new ModbusTcpServer()
    val port = srv.start()
    try {
      val root = java.nio.file.Files.createTempDirectory("q210")
      val land = root.resolve("land")
      val cat = new graft.engine.Catalog(s)
      val engine = new graft.engine.Engine(s, cat)
      engine.dataDir = Some(root.resolve("data").toString)
      engine.execute("""policy add pnk {"mapping": {
        "dbms": "edge", "table": "plcdnk",
        "schema": {
          "ts": {"type": "timestamp", "bring": "[timestamp]"},
          "nkey": {"type": "bigint", "bring": "[value]"}}}}""")
      engine.execute("""policy add prk {"mapping": {
        "dbms": "edge", "table": "plcdrk",
        "schema": {
          "ts": {"type": "timestamp", "bring": "[timestamp]"},
          "rkey": {"type": "bigint", "bring": "[value]"}}}}""")
      val runCmd = s"run plc client where type = modbus and " +
        s"hostname = localhost and port = $port and name = plcd " +
        s"and frequency = 300 and dir = $land and dynamic = true and " +
        """map = [{"name":"nk","register":0},""" +
        """{"name":"rk","inputRegister":0}]"""
      def landedIn(sub: String): Int = jsonCount(land.resolve(sub))
      nations.zipWithIndex.foreach { case (r, i) =>
        srv.setBank(ModbusBank(
          holding = Vector(r.getInt(0)), input = Vector(r.getInt(1))))
        engine.execute(runCmd)
        awaitLanding(i + 1, s"q210 poll $i")(
          math.min(landedIn("plcd_nk"), landedIn("plcd_rk")))
        engine.execute("exit plc plcd")
        Thread.sleep(2) // distinct poll stamps at ms resolution
      }
      engine.execute(s"run streamer where dir = ${land.resolve("plcd_nk")} " +
        "and table = plcdnk and policy = pnk and flush = 1")
      engine.execute(s"run streamer where dir = ${land.resolve("plcd_rk")} " +
        "and table = plcdrk and policy = prk and flush = 1")
      drainStreamers(cat,
        Seq(engine.streamerQueries("plcdnk"),
          engine.streamerQueries("plcdrk")),
        Seq("plcdnk", "plcdrk"), nations.length.toLong, "q210")
      engine.execute("exit streamer")
      // the dialect join binds columns by bare name, so the shared
      // `ts` is renamed on one side through a view (the documented
      // recipe in the join's own refusal message)
      engine.execute("create view plcdrk_v on plcdrk " +
        "(ts as ts2, rkey)")
      engine.query("""sql edge "select rkey, count(*) as n_nations, """ +
        """sum(nkey) as sum_key from plcdnk join plcdrk_v """ +
        """on plcdnk.ts = plcdrk_v.ts2 """ +
        """group by rkey order by rkey"""")
    } finally srv.stop()
  }
  private val q210Sql =
    "SELECT CAST(n_regionkey AS BIGINT) AS rkey, " +
      "CAST(count(*) AS BIGINT) AS n_nations, " +
      "sum(n_nationkey) AS sum_key " +
      "FROM nation GROUP BY 1 ORDER BY 1"

  val queries: Map[String, QFn] = Map(
    "q210_modbus_dynamic_join" -> q210,
    "q209_modbus_chain" -> q209,
    "q208_federated_include" -> q208,
    "q206_jdbc_scan" -> q206,
    "q201_scheduled_sync" -> q201,
    "q204_ha_sync" -> q204,
    "q205_kafka_chain" -> q205,
    "q198_cross_node_ingest" -> q198,
    "q195_nodes_committed" -> q195,
    "q193_sql_left_join" -> q193,
    "q194_rollup_sync" -> q194,
    "q186_drop_partition_retention" -> q186,
    "q187_sql_join" -> q187,
    "q188_join_matview_served" -> q188,
    "q183_matview_autofold" -> q183,
    "q167_matview_served" -> q167,
    "q178_matview_served_avg" -> q178,
    "q102_rollup_served_dialect" -> q102,
    "q62_dialect_format_casts" -> q62,
    "q51_dialect_increments_month" -> q51,
    "q52_dialect_increments_year" -> q52,
    "q46_dialect_increments_auto" -> q46,
    "q39_dialect_group_aggs" -> q39,
    "q40_dialect_increments" -> q40,
    "q41_dialect_period" -> q41,
    "q42_dialect_period_filter" -> q42,
    "q43_dialect_limit_per" -> q43,
    "q44_dialect_extend_include" -> q44,
    "q45_dialect_casts" -> q45)

  val oracles: Map[String, String] = Map(
    "q210_modbus_dynamic_join" -> q210Sql,
    "q209_modbus_chain" -> q209Sql,
    "q208_federated_include" -> q208Sql,
    "q206_jdbc_scan" -> q206Sql,
    "q201_scheduled_sync" -> q201Sql,
    "q204_ha_sync" -> q204Sql,
    "q205_kafka_chain" -> q205Sql,
    "q198_cross_node_ingest" -> q198Sql,
    "q195_nodes_committed" -> q195Sql,
    "q193_sql_left_join" -> q193Sql,
    "q194_rollup_sync" -> q194Sql,
    "q186_drop_partition_retention" -> q186Sql,
    "q187_sql_join" -> q187Sql,
    "q188_join_matview_served" -> q188Sql,
    "q183_matview_autofold" -> q183Sql,
    "q167_matview_served" -> q167Sql,
    "q178_matview_served_avg" -> q178Sql,
    "q102_rollup_served_dialect" -> q102Sql,
    "q62_dialect_format_casts" -> q62Sql,
    "q51_dialect_increments_month" -> q51Sql,
    "q52_dialect_increments_year" -> q52Sql,
    "q46_dialect_increments_auto" -> q46Sql,
    "q39_dialect_group_aggs" -> q39Sql,
    "q40_dialect_increments" -> q40Sql,
    "q41_dialect_period" -> q41Sql,
    "q42_dialect_period_filter" -> q42Sql,
    "q43_dialect_limit_per" -> q43Sql,
    "q44_dialect_extend_include" -> q44Sql,
    "q45_dialect_casts" -> q45Sql)
}
