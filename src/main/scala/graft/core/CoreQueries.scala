package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.Tables

/** Core relational query inventory — one entry per operator row of
  * SURVEY.md §2 that is expressible over the testdata corpus, each with a
  * DuckDB oracle (SparkEntry.oracleSql).
  *
  * Cross-engine determinism rules (Spark result must hash-match DuckDB):
  *   - sums/avgs over the 2-decimal "money" columns go through
  *     DECIMAL(18,2) so they are exact and order-independent in both
  *     engines, then cast back to double;
  *   - raw event timestamps are emitted as epoch microseconds (both
  *     engines truncate the source's nanoseconds to micros on read);
  *   - every query has a deterministic ORDER BY (unique tiebreak) when
  *     row identity matters (limits, windows).
  */
object CoreQueries {
  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Exact decimal view of a 2-decimal double column. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  /** Order-independent exact sum of a 2-decimal double column. */
  private def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)
  /** avg = exact-decimal sum / count — identical double in both engines. */
  private def davg(c: Column): Column =
    sum(dec(c)).cast(DoubleType) / count(c)

  // Same building blocks in DuckDB SQL.
  private def oDsum(x: String) =
    s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"
  private def oDavg(x: String) =
    s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE) / COUNT($x)"

  // ---------------------------------------------------------------------
  // §2.1/§2.2 scans, projection, filters
  // ---------------------------------------------------------------------

  /** Plain scan + global sort + limit (reference: pass-through query with
    * `limit`, unify_results.py:1323). Parquet scan must show pushed limit /
    * pruned columns in explain. */
  private val q01: QFn = (s, d) =>
    t(s, d, "lineitem")
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .limit(100)
  private val q01Sql =
    "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100"

  /** Projection + AND/OR predicate tree + date literals
    * (reference WHERE tree utils_sql.py:149-375; pushdown
    * unify_results.py:1167). */
  private val q02: QFn = (s, d) =>
    t(s, d, "lineitem")
      .filter(
        col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") <  lit("1997-01-01") &&
        (col("l_returnflag") === "R" || col("l_discount") > 0.06))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  private val q02Sql = """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND (l_returnflag = 'R' OR l_discount > 0.06)
    ORDER BY l_orderkey, l_linenumber"""

  // ---------------------------------------------------------------------
  // §2.4 aggregation
  // ---------------------------------------------------------------------

  /** Global aggregates: count(*)/count(x)/sum/min/max/avg
    * (unify_results.py:190-277 remote/local decomposition — here one
    * Catalyst partial/final plan). */
  private val q03: QFn = (s, d) =>
    t(s, d, "lineitem").agg(
      count(lit(1)).as("n_rows"),
      count(col("l_quantity")).as("n_qty"),
      sum(col("l_quantity")).as("sum_qty"), // integer-valued double: exact
      dsum(col("l_extendedprice")).as("sum_price"),
      min(col("l_discount")).as("min_disc"),
      max(col("l_discount")).as("max_disc"),
      davg(col("l_extendedprice")).as("avg_price"))
  private val q03Sql = s"""
    SELECT count(*) AS n_rows, count(l_quantity) AS n_qty,
      sum(l_quantity) AS sum_qty, ${oDsum("l_extendedprice")} AS sum_price,
      min(l_discount) AS min_disc, max(l_discount) AS max_disc,
      ${oDavg("l_extendedprice")} AS avg_price
    FROM lineitem"""

  /** TPC-H Q1-shaped pricing summary: multi-key GROUP BY + derived
    * decimal aggregates + ORDER BY (the flagship slice, SURVEY §7.2). */
  private val q04: QFn = (s, d) =>
    t(s, d, "lineitem")
      .filter(col("l_shipdate") <= lit("2001-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast(DoubleType).as("sum_disc_price"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
          * (lit(1) + dec(col("l_tax")))).cast(DoubleType).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  private val q04Sql = s"""
    SELECT l_returnflag, l_linestatus,
      sum(l_quantity) AS sum_qty,
      ${oDsum("l_extendedprice")} AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      ${oDavg("l_quantity")} AS avg_qty,
      ${oDavg("l_extendedprice")} AS avg_price,
      count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  /** count(distinct x) — reference ships raw distinct values to the query
    * node and re-counts (unify_results.py:192-207); Spark plans a proper
    * two-phase distinct aggregate. */
  private val q05: QFn = (s, d) =>
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  private val q05Sql = """
    SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
      count(DISTINCT l_partkey) AS n_part, count(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** SELECT DISTINCT (al_parser.py:190-193). */
  private val q06: QFn = (s, d) =>
    t(s, d, "orders")
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .distinct()
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
  private val q06Sql = """
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    ORDER BY o_orderstatus, o_orderpriority"""

  /** EdgeLake `range(x)` = |max - min| (unify_results.py:283-307) —
    * composed from built-in min/max, per group. */
  private val q07: QFn = (s, d) =>
    t(s, d, "events")
      .groupBy(col("event_type"))
      .agg(abs(max(col("value")) - min(col("value"))).as("range_value"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  private val q07Sql = """
    SELECT event_type, abs(max(value) - min(value)) AS range_value,
      count(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type"""

  /** Group + ORDER BY aggregate DESC + LIMIT (top-N users by spend). */
  private val q08: QFn = (s, d) =>
    t(s, d, "events")
      .groupBy(col("user_id"))
      .agg(dsum(col("value")).as("total_value"), count(lit(1)).as("n"))
      .orderBy(col("total_value").desc, col("user_id"))
      .limit(20)
  private val q08Sql = s"""
    SELECT user_id, ${oDsum("value")} AS total_value, count(*) AS n
    FROM events GROUP BY user_id
    ORDER BY total_value DESC, user_id LIMIT 20"""

  // ---------------------------------------------------------------------
  // §2.4 time-series dialect: increments() / period()
  // ---------------------------------------------------------------------

  /** increments(minute, 10, ts): EdgeLake parity bucketing =
    * date_trunc(parent_unit) + floor(extract(unit)/n), NOT epoch-aligned
    * window() (unify_results.py:482-556; parent table utils_sql.py:18-26).
    */
  private val q09: QFn = (s, d) =>
    t(s, d, "events")
      .filter(col("ts") >= lit("2024-01-05") && col("ts") < lit("2024-01-06"))
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("bucket_hour"),
        floor(minute(col("ts")) / 10).as("bucket_min"))
      .agg(min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        davg(col("value")).as("avg_value"),
        count(lit(1)).as("n"))
      .orderBy(col("bucket_hour"), col("bucket_min"))
  private val q09Sql = s"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_hour,
      CAST(FLOOR(EXTRACT(minute FROM ts) / 10) AS BIGINT) AS bucket_min,
      min(value) AS min_value, max(value) AS max_value,
      ${oDavg("value")} AS avg_value, count(*) AS n
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-06'
    GROUP BY 1, 2 ORDER BY 1, 2"""

  /** increments(hour, 1, ts) over the whole table (parent unit = day). */
  private val q10: QFn = (s, d) =>
    t(s, d, "events")
      .groupBy(
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("bucket_day"),
        floor(hour(col("ts")) / 1).as("bucket_hour"))
      .agg(dsum(col("value")).as("sum_value"), count(lit(1)).as("n"))
      .orderBy(col("bucket_day"), col("bucket_hour"))
  private val q10Sql = s"""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS bucket_day,
      CAST(FLOOR(EXTRACT(hour FROM ts) / 1) AS BIGINT) AS bucket_hour,
      ${oDsum("value")} AS sum_value, count(*) AS n
    FROM events GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Auto-sized increments(ts): WHERE spans Jan 2024 (30 days), target =
    * 100 points → interval = span/points = 25920 s → unit hour, n = 7
    * (graft.dialect.Increments.resolve mirrors unify_results.py:339-459,
    * default points unify_results.py:352). Oracle hard-codes the resolved
    * (hour, 7). */
  private val q11: QFn = (s, d) => {
    val lo = "2024-01-01"; val hi = "2024-01-31"
    val (unit, n) = graft.dialect.Increments.resolve(
      java.time.LocalDateTime.parse(lo + "T00:00:00"),
      java.time.LocalDateTime.parse(hi + "T00:00:00"), points = 100)
    val parent = graft.dialect.Increments.parentUnit(unit)
    t(s, d, "events")
      .filter(col("ts") >= lit(lo) && col("ts") < lit(hi))
      .groupBy(
        date_format(date_trunc(parent, col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("bucket_parent"),
        floor(graft.dialect.Increments.extractUnit(unit, col("ts")) / n)
          .as("bucket_n"))
      .agg(count(lit(1)).as("n"), davg(col("value")).as("avg_value"))
      .orderBy(col("bucket_parent"), col("bucket_n"))
  }
  private val q11Sql = s"""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket_parent,
      CAST(FLOOR(EXTRACT(hour FROM ts) / 7) AS BIGINT) AS bucket_n,
      count(*) AS n, ${oDavg("value")} AS avg_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-31'
    GROUP BY 1, 2 ORDER BY 1, 2"""

  /** period(day, 1, anchor, ts): anchored trailing window — find
    * max(ts) <= anchor, keep rows in (max - 1 day, max]
    * (unify_results.py:695-770; two-phase leading query :733-754). */
  private val q12: QFn = (s, d) =>
    graft.dialect.Period.apply(
      t(s, d, "events"), "ts",
      anchor = "2024-01-15 12:00:00", unit = "day", n = 1, filter = None)
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"),
        unix_micros(min(col("ts"))).as("min_ts_us"),
        unix_micros(max(col("ts"))).as("max_ts_us"))
  private val q12Sql = s"""
    WITH m AS (SELECT max(ts) AS mx FROM events
               WHERE ts <= TIMESTAMP '2024-01-15 12:00:00')
    SELECT count(*) AS n, ${oDsum("value")} AS sum_value,
      epoch_us(min(ts)) AS min_ts_us, epoch_us(max(ts)) AS max_ts_us
    FROM events, m WHERE ts > m.mx - INTERVAL 1 DAY AND ts <= m.mx"""

  /** period(minute, 30, anchor, ts, and event_type='click') — the optional
    * filter applies to both the anchor search and the returned rows
    * (unify_results.py:797-834). */
  private val q13: QFn = (s, d) =>
    graft.dialect.Period.apply(
      t(s, d, "events"), "ts",
      anchor = "2024-01-20 00:00:00", unit = "minute", n = 30,
      filter = Some(col("event_type") === "click"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), unix_micros(max(col("ts"))).as("max_ts_us"))
  private val q13Sql = """
    WITH m AS (SELECT max(ts) AS mx FROM events
               WHERE ts <= TIMESTAMP '2024-01-20 00:00:00'
                 AND event_type = 'click')
    SELECT event_type, count(*) AS n, epoch_us(max(ts)) AS max_ts_us
    FROM events, m
    WHERE event_type = 'click'
      AND ts > m.mx - INTERVAL 30 MINUTE AND ts <= m.mx
    GROUP BY event_type"""

  // ---------------------------------------------------------------------
  // §2.5 per-key limit / windows; §2.7 extend; §2.3 include-union
  // ---------------------------------------------------------------------

  /** `LIMIT 1 PER user_id` with ORDER BY ts DESC (al_parser.py:327-336) —
    * latest row per key. Implemented as a hash aggregate
    * (max(struct(orderkeys..., payload))) instead of a window sort: one
    * shuffle, no per-partition sort — the scalable plan at 100 TB. */
  private val q14: QFn = (s, d) =>
    t(s, d, "events")
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
        col("value"))).as("last"))
      .select(col("user_id"), unix_micros(col("last.ts")).as("ts_us"),
        col("last.event_type").as("event_type"), col("last.value").as("value"))
      .orderBy(col("user_id"))
  private val q14Sql = """
    SELECT user_id, epoch_us(ts) AS ts_us, event_type, value FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
    WHERE rn = 1 ORDER BY user_id"""

  /** extend=(@table_name) + include=(...) — provenance column stamped per
    * source table, then unionByName and group by provenance
    * (member_cmd.py:110-113; unify_results.py:924-946). */
  private val q15: QFn = (s, d) => {
    val c = t(s, d, "customer").select(
      col("c_custkey").as("key"), col("c_acctbal").as("acctbal"),
      lit("customer").as("table_name"))
    val sup = t(s, d, "supplier").select(
      col("s_suppkey").as("key"), col("s_acctbal").as("acctbal"),
      lit("supplier").as("table_name"))
    c.unionByName(sup)
      .groupBy(col("table_name"))
      .agg(count(lit(1)).as("n"), dsum(col("acctbal")).as("sum_acctbal"),
        min(col("key")).as("min_key"), max(col("key")).as("max_key"))
      .orderBy(col("table_name"))
  }
  private val q15Sql = s"""
    SELECT table_name, count(*) AS n, ${oDsum("acctbal")} AS sum_acctbal,
      min(key) AS min_key, max(key) AS max_key
    FROM (
      SELECT c_custkey AS key, c_acctbal AS acctbal, 'customer' AS table_name FROM customer
      UNION ALL
      SELECT s_suppkey AS key, s_acctbal AS acctbal, 'supplier' AS table_name FROM supplier)
    GROUP BY table_name ORDER BY table_name"""

  // ---------------------------------------------------------------------
  // §2.6 scalar functions / casts / timezone
  // ---------------------------------------------------------------------

  /** date_trunc / extract projection functions (unify_results.py:115-184).
    */
  private val q16: QFn = (s, d) =>
    t(s, d, "events")
      .groupBy(
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("day"), col("hr"))
  private val q16Sql = """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hr, count(*) AS n
    FROM events GROUP BY 1, 2 ORDER BY 1, 2"""

  /** `::` casting chains (utils_columns.py:1963-1977): float(n), ljust,
    * rjust, replace, format. round() is only applied where the dropped
    * digits are exactly representable (2-decimal money), so both engines
    * agree. */
  private val q17: QFn = (s, d) =>
    t(s, d, "events")
      .select(
        col("event_id"),
        round(col("value"), 0).as("value_f0"),
        rpad(col("event_type"), 10, " ").as("type_ljust"),
        lpad(col("event_type"), 8, "*").as("type_rjust"),
        regexp_replace(col("event_type"), "click", "tap").as("type_repl"),
        format_string("%s:%d", col("event_type"), col("event_id"))
          .as("type_fmt"))
      .orderBy(col("event_id"))
      .limit(200)
  private val q17Sql = """
    SELECT event_id, round(value, 0) AS value_f0,
      rpad(event_type, 10, ' ') AS type_ljust,
      lpad(event_type, 8, '*') AS type_rjust,
      replace(event_type, 'click', 'tap') AS type_repl,
      printf('%s:%d', event_type, event_id) AS type_fmt
    FROM events ORDER BY event_id LIMIT 200"""

  /** Timezone presentation edge: storage UTC, caller timezone applied on
    * output only (utils_columns.py:1655-1712). Fixed offset +05:30. */
  private val q18: QFn = (s, d) =>
    t(s, d, "events")
      .select(col("event_id"),
        date_format(
          from_utc_timestamp(date_trunc("second", col("ts")), "+05:30"),
          "yyyy-MM-dd HH:mm:ss").as("ts_ist"))
      .orderBy(col("event_id"))
      .limit(100)
  private val q18Sql = """
    SELECT event_id,
      strftime(date_trunc('second', ts) + INTERVAL 330 MINUTE,
               '%Y-%m-%d %H:%M:%S') AS ts_ist
    FROM events ORDER BY event_id LIMIT 100"""

  /** JSON attribute extraction (ingest-side `bring` expressions compile to
    * get_json_object — mapping_policy.py:152-535). */
  private val q19: QFn = (s, d) =>
    t(s, d, "events")
      .select(get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .orderBy(col("k"))
  private val q19Sql = """
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
      count(*) AS n
    FROM events GROUP BY k ORDER BY k"""

  // ---------------------------------------------------------------------
  // §2.3 joins & set ops (beyond reference parity — it gates joins off;
  // sqlite_dbms.py:113 is_suport_join -> False)
  // ---------------------------------------------------------------------

  /** 3-way join: revenue per market segment × order priority. Dimension
    * side (customer) is broadcast-eligible; fact-fact join shuffles on the
    * key — the plan that survives 100 TB. */
  private val q20: QFn = (s, d) => {
    val li = t(s, d, "lineitem")
    val o = t(s, d, "orders")
    val c = t(s, d, "customer")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment"), col("o_orderpriority"))
  }
  private val q20Sql = """
    SELECT c_mktsegment, o_orderpriority,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      count(*) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment, o_orderpriority
    ORDER BY c_mktsegment, o_orderpriority"""

  /** Anti join (NOT EXISTS): parts with no shipment since 2001, by brand.
    * left_anti keeps the build side small (only the filtered join keys). */
  private val q21: QFn = (s, d) => {
    val p = t(s, d, "part")
    val li = t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("2001-01-01"))
    p.join(li, p("p_partkey") === li("l_partkey"), "left_anti")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_stale_parts"))
      .orderBy(col("p_brand"))
  }
  private val q21Sql = """
    SELECT p_brand, count(*) AS n_stale_parts
    FROM part
    WHERE NOT EXISTS (SELECT 1 FROM lineitem
      WHERE l_partkey = p_partkey AND l_shipdate >= TIMESTAMP '2001-01-01')
    GROUP BY p_brand ORDER BY p_brand"""

  /** Ranking/analytic window functions (absent in the reference —
    * SURVEY §2.5 "free in Spark"): row_number, lag, running sum. */
  private val q22: QFn = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    t(s, d, "events")
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"),
        row_number().over(w).as("rn"),
        lag(col("value"), 1).over(w).as("prev_value"),
        sum(dec(col("value")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DoubleType).as("running_value"))
      .orderBy(col("user_id"), col("rn"))
  }
  private val q22Sql = """
    SELECT user_id, event_id,
      row_number() OVER w AS rn,
      lag(value, 1) OVER w AS prev_value,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
        ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS running_value
    FROM events WHERE user_id < 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, rn"""

  /** ROLLUP + grouping id (absent in reference — SURVEY §2.4 last row). */
  private val q23: QFn = (s, d) =>
    t(s, d, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("returnflag"), col("linestatus"))
  private val q23Sql = """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      coalesce(l_linestatus, 'ALL') AS linestatus,
      count(*) AS n, sum(l_quantity) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus"""

  /** INTERSECT / EXCEPT set ops (absent in reference — SURVEY §2.3). */
  private val q24: QFn = (s, d) => {
    val li = t(s, d, "lineitem")
    val r = li.filter(col("l_returnflag") === "R")
      .select(col("l_suppkey")).distinct()
    val a = li.filter(col("l_returnflag") === "A")
      .select(col("l_suppkey")).distinct()
    r.intersect(a).orderBy(col("l_suppkey"))
  }
  private val q24Sql = """
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
    ORDER BY l_suppkey"""

  /** HAVING over grouped counts (free via .filter post-agg). */
  private val q25: QFn = (s, d) =>
    t(s, d, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"))
      .filter(col("n_lines") >= 5)
      .agg(count(lit(1)).as("n_big_orders"),
        sum(col("n_lines")).as("n_lines_total"))
  private val q25Sql = """
    SELECT count(*) AS n_big_orders,
      CAST(sum(n_lines) AS BIGINT) AS n_lines_total FROM (
      SELECT l_orderkey, count(*) AS n_lines FROM lineitem
      GROUP BY l_orderkey HAVING count(*) >= 5)"""

  /** Data-monitor shape (cmd/data_monitor.py:43-116): tumbling 1-minute
    * per-type intervals with min/max/sum/count + threshold alert — the
    * batch equivalent of the streaming monitor in graft.streaming. */
  private val q26: QFn = (s, d) =>
    t(s, d, "events")
      .filter(col("ts") >= lit("2024-01-10") && col("ts") < lit("2024-01-10 04:00:00"))
      .groupBy(
        date_format(date_trunc("minute", col("ts")), "yyyy-MM-dd HH:mm")
          .as("interval_start"),
        col("event_type"))
      .agg(min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        dsum(col("value")).as("sum_value"),
        count(lit(1)).as("n"),
        (davg(col("value")) > 100.0).as("alert_avg_gt_100"))
      .orderBy(col("interval_start"), col("event_type"))
  private val q26Sql = s"""
    SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M') AS interval_start,
      event_type, min(value) AS min_value, max(value) AS max_value,
      ${oDsum("value")} AS sum_value, count(*) AS n,
      (${oDavg("value")}) > 100.0 AS alert_avg_gt_100
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-10 04:00:00'
    GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Semi join (EXISTS): customers holding at least one urgent order.
    * left_semi ships only join keys — no payload duplication. */
  private val q53: QFn = (s, d) => {
    val c = t(s, d, "customer")
    val o = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }
  private val q53Sql = """
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** UNION (distinct) across two predicates — dedup across branches. */
  private val q54: QFn = (s, d) => {
    val li = t(s, d, "lineitem")
    li.filter(col("l_returnflag") === "R").select(col("l_orderkey"))
      .union(li.filter(col("l_discount") > 0.09).select(col("l_orderkey")))
      .distinct()
      .orderBy(col("l_orderkey"))
  }
  private val q54Sql = """
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    UNION
    SELECT l_orderkey FROM lineitem WHERE l_discount > 0.09
    ORDER BY l_orderkey"""

  /** Scalar subquery: parts priced above the global average retail
    * price — the 1-row aggregate broadcast against the scan (same
    * two-phase shape as period()). */
  private val q55: QFn = (s, d) => {
    val p = t(s, d, "part")
    val avgDf = p.agg(davg(col("p_retailprice")).as("avg_price"))
    p.crossJoin(broadcast(avgDf))
      .filter(col("p_retailprice") > col("avg_price"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_above"), dsum(col("p_retailprice")).as("sum_price"))
      .orderBy(col("p_brand"))
  }
  private val q55Sql = s"""
    SELECT p_brand, count(*) AS n_above,
      ${oDsum("p_retailprice")} AS sum_price
    FROM part
    WHERE p_retailprice > (SELECT ${oDavg("p_retailprice")} FROM part)
    GROUP BY p_brand ORDER BY p_brand"""

  /** Pivot-style conditional aggregation: one column per event type —
    * the wide-format rollup a dashboard asks for, expressed portably as
    * FILTER aggregates (one pass, one shuffle). */
  private val q56: QFn = (s, d) => {
    val types = Seq("click", "view", "purchase", "login", "logout")
    val aggs = types.map(tp =>
      count(when(col("event_type") === tp, 1)).as(s"n_$tp")) :+
      count(lit(1)).as("n_total")
    t(s, d, "events")
      .groupBy(col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("n_total") >= 40)
      .orderBy(col("user_id"))
  }
  private val q56Sql = """
    SELECT user_id,
      count(*) FILTER (event_type = 'click') AS n_click,
      count(*) FILTER (event_type = 'view') AS n_view,
      count(*) FILTER (event_type = 'purchase') AS n_purchase,
      count(*) FILTER (event_type = 'login') AS n_login,
      count(*) FILTER (event_type = 'logout') AS n_logout,
      count(*) AS n_total
    FROM events GROUP BY user_id HAVING count(*) >= 40
    ORDER BY user_id"""

  // ---------------------------------------------------------------------

  /** q148 — CUBE + GROUPING(): the full 2^k grouping-set lattice with
    * the standard grouping-id disambiguation (beyond-parity relational
    * surface next to q23's ROLLUP). Catalyst expands the cube into one
    * Expand + partial/final aggregate — a single pass over lineitem. */
  private val q148: QFn = (s, d) =>
    t(s, d, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
      .select(col("gid"),
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("gid"), col("returnflag"), col("linestatus"))
  private val q148Sql = """
    SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      coalesce(l_returnflag, 'ALL') AS returnflag,
      coalesce(l_linestatus, 'ALL') AS linestatus,
      count(*) AS n, sum(l_quantity) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY gid, returnflag, linestatus"""

  /** q154 — correlated aggregate subquery parity: orders priced above
    * their own customer's average (the classic correlated form,
    * written as the SQL text both engines plan natively — Catalyst
    * de-correlates each scalar subquery into an aggregate + join).
    * Determinism: the "above average" test is cross-multiplied onto
    * the integer-cent lattice — `cents * cnt > sum_cents` — so NO
    * division, NO double threshold, NO rounding exists anywhere.
    * The round-8 formulation funneled the threshold through
    * `CAST(avg(DECIMAL) AS DECIMAL(18,2))`, which DuckDB computes
    * via DOUBLE (avg(DECIMAL) -> DOUBLE) — boundary rows flipped
    * with the oracle engine's version. Cents themselves come from
    * `floor(o_totalprice * 100.0)` (shared IEEE expression text;
    * a bare CAST(double AS BIGINT) truncates in Spark but rounds
    * in DuckDB). */
  private val q154: QFn = (s, d) => {
    t(s, d, "orders").createOrReplaceTempView("orders_v")
    s.sql("""
      SELECT o_orderkey, o_custkey,
        CAST(floor(o_totalprice * 100.0) AS BIGINT) AS price_cents
      FROM orders_v o
      WHERE CAST(floor(o_totalprice * 100.0) AS BIGINT) *
          (SELECT count(*) FROM orders_v i
           WHERE i.o_custkey = o.o_custkey)
        > (SELECT CAST(sum(CAST(floor(i.o_totalprice * 100.0)
             AS BIGINT)) AS BIGINT)
           FROM orders_v i WHERE i.o_custkey = o.o_custkey)
      ORDER BY o_orderkey""")
  }
  private val q154Sql = """
    SELECT o_orderkey, o_custkey,
      CAST(floor(o_totalprice * 100.0) AS BIGINT) AS price_cents
    FROM orders o
    WHERE CAST(floor(o_totalprice * 100.0) AS BIGINT) *
        (SELECT count(*) FROM orders i
         WHERE i.o_custkey = o.o_custkey)
      > (SELECT CAST(sum(CAST(floor(i.o_totalprice * 100.0)
           AS BIGINT)) AS BIGINT)
         FROM orders i WHERE i.o_custkey = o.o_custkey)
    ORDER BY o_orderkey"""

  /** q163 — declarative data-quality constraint suite with an integer
    * receipt ([[graft.ops.Quality]], Deequ lineage — Schelter et al.
    * VLDB 2018): six constraints over lineitem/orders verified in ONE
    * row-local aggregate pass plus the two documented extra passes
    * (one distinct for `unique`, one anti-join for `ref`). Receipt =
    * (check_name, metric_num, metric_den, pass); pass is integer
    * cross-multiplied (num*100 >= min_pct*den) — no float threshold
    * anywhere, so the oracle replays it exactly. */
  private val q163: QFn = (s, d) => {
    import graft.ops.Quality
    import graft.ops.Quality._
    val li = t(s, d, "lineitem")
    val orders = t(s, d, "orders")
    Quality.verify(li, Seq(
      Complete("c1_shipdate_complete", "l_shipdate"),
      InRange("c2_discount_range", "l_discount", 0.0, 0.1),
      InSet("c3_returnflag_domain", "l_returnflag", Seq("A", "N", "R")),
      Satisfies("c4_price_positive", "l_extendedprice > 0", 100),
      Unique("c5_line_identity_unique",
        "concat(cast(l_orderkey as string), ':', " +
          "cast(l_linenumber as string))"),
      Ref("c6_orderkey_ref", "l_orderkey", orders, "o_orderkey")))
  }
  private val q163Sql = """
    WITH den AS (SELECT count(*) AS n FROM lineitem)
    SELECT * FROM (
      SELECT 'c1_shipdate_complete' AS check_name,
        CAST(count(l_shipdate) AS BIGINT) AS metric_num,
        CAST((SELECT n FROM den) AS BIGINT) AS metric_den,
        count(l_shipdate) * 100 >= 100 * (SELECT n FROM den) AS pass
      FROM lineitem
      UNION ALL
      SELECT 'c2_discount_range',
        CAST(sum(CASE WHEN l_discount IS NOT NULL AND l_discount >= 0.0
          AND l_discount <= 0.1 THEN 1 ELSE 0 END) AS BIGINT),
        CAST((SELECT n FROM den) AS BIGINT),
        sum(CASE WHEN l_discount IS NOT NULL AND l_discount >= 0.0
          AND l_discount <= 0.1 THEN 1 ELSE 0 END) * 100
          >= 100 * (SELECT n FROM den)
      FROM lineitem
      UNION ALL
      SELECT 'c3_returnflag_domain',
        CAST(sum(CASE WHEN l_returnflag IN ('A', 'N', 'R')
          THEN 1 ELSE 0 END) AS BIGINT),
        CAST((SELECT n FROM den) AS BIGINT),
        sum(CASE WHEN l_returnflag IN ('A', 'N', 'R')
          THEN 1 ELSE 0 END) * 100 >= 100 * (SELECT n FROM den)
      FROM lineitem
      UNION ALL
      SELECT 'c4_price_positive',
        CAST(sum(CASE WHEN l_extendedprice > 0 THEN 1 ELSE 0 END)
          AS BIGINT),
        CAST((SELECT n FROM den) AS BIGINT),
        sum(CASE WHEN l_extendedprice > 0 THEN 1 ELSE 0 END) * 100
          >= 100 * (SELECT n FROM den)
      FROM lineitem
      UNION ALL
      SELECT 'c5_line_identity_unique',
        CAST(count(DISTINCT CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR))
          + sum(CASE WHEN CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)
            IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        CAST((SELECT n FROM den) AS BIGINT),
        (count(DISTINCT CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR))
          + sum(CASE WHEN CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)
            IS NULL THEN 1 ELSE 0 END)) * 100
          >= 100 * (SELECT n FROM den)
      FROM lineitem
      UNION ALL
      SELECT 'c6_orderkey_ref',
        CAST((SELECT count(*) FROM lineitem l
          WHERE l.l_orderkey IS NOT NULL AND EXISTS (
            SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
          AS BIGINT),
        CAST((SELECT count(*) FROM lineitem
          WHERE l_orderkey IS NOT NULL) AS BIGINT),
        (SELECT count(*) FROM lineitem l
          WHERE l.l_orderkey IS NOT NULL AND EXISTS (
            SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
          * 100 >= 100 * (SELECT count(*) FROM lineitem
            WHERE l_orderkey IS NOT NULL)
    ) ORDER BY check_name"""

  /** q166 — general standing MATERIALIZED VIEW fold
    * ([[graft.ops.MatView]]): distributive GROUP BY aggregates
    * (count/sum/min/max over integer-cent money, plus an exact
    * floor-div average derived at serve time) built from HALF the
    * table, folded with the other half's partials, served from the
    * #groups-row state. The oracle is the ONE-SHOT GROUP BY over the
    * whole table — hash equality is the fold == rebuild proof, which
    * for this algebra is exactly distributivity (Gray et al. 1997).
    * The `matview create/refresh/get` command family serves the same
    * machinery from a crash-atomic IndexStore artifact with the spec
    * recorded beside the state. */
  private val q166: QFn = (s, d) => {
    import graft.ops.MatView
    import graft.ops.MatView.AggSpec
    val li = t(s, d, "lineitem").withColumn("cents",
      expr("cast(floor(l_extendedprice * 100.0) as bigint)"))
    val keys = Seq("l_returnflag", "l_linestatus")
    val aggs = Seq(AggSpec("count", "1", "n"),
      AggSpec("sum", "l_quantity", "sum_qty"),
      AggSpec("sum", "cents", "sum_cents"),
      AggSpec("min", "cents", "min_cents"),
      AggSpec("max", "cents", "max_cents"))
    val state = MatView.partials(
      li.filter(pmod(col("l_orderkey"), lit(2)) === 0), keys, aggs)
      .localCheckpoint(true)
    MatView.fold(state,
        MatView.partials(
          li.filter(pmod(col("l_orderkey"), lit(2)) =!= 0), keys, aggs),
        keys, aggs)
      .select(col("l_returnflag"), col("l_linestatus"), col("n"),
        col("sum_qty"), col("sum_cents"), col("min_cents"),
        col("max_cents"), expr("sum_cents div n").as("avg_cents_floor"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }
  private val q166Sql = """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
      sum(l_quantity) AS sum_qty,
      CAST(sum(CAST(floor(l_extendedprice * 100.0) AS BIGINT))
        AS BIGINT) AS sum_cents,
      min(CAST(floor(l_extendedprice * 100.0) AS BIGINT)) AS min_cents,
      max(CAST(floor(l_extendedprice * 100.0) AS BIGINT)) AS max_cents,
      CAST(sum(CAST(floor(l_extendedprice * 100.0) AS BIGINT))
        AS BIGINT) // count(*) AS avg_cents_floor
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  /** q177 — standing matview DELETE (the tombstone half of IVM,
    * [[graft.ops.MatView.foldDelete]]): the q166-shaped count/sum
    * state built over the whole table folds OUT a delete batch —
    * every 'R'-flag row (retiring whole groups) plus every
    * l_orderkey ≡ 1 (mod 3) row (partial subtraction) — and serves
    * the surviving #groups rows with the exact floor-div average
    * derived at read. The oracle is the one-shot GROUP BY over the
    * base minus the deletes: hash equality is fold-with-deletes ==
    * rebuild. min/max specs refuse this path loudly (the IVM
    * boundary — MatViewSpec proves the error, this query proves the
    * legal algebra). */
  private val q177: QFn = (s, d) => {
    import graft.ops.MatView
    import graft.ops.MatView.AggSpec
    val li = t(s, d, "lineitem").withColumn("cents",
      expr("cast(floor(l_extendedprice * 100.0) as bigint)"))
    val keys = Seq("l_returnflag", "l_linestatus")
    val aggs = Seq(AggSpec("count", "1", "n"),
      AggSpec("sum", "l_quantity", "sum_qty"),
      AggSpec("sum", "cents", "sum_cents"))
    val state = MatView.partials(li, keys, aggs).localCheckpoint(true)
    val dels = li.filter(col("l_returnflag") === "R" ||
      pmod(col("l_orderkey"), lit(3)) === 1)
    MatView.foldDelete(state, dels, keys, aggs)
      .select(col("l_returnflag"), col("l_linestatus"), col("n"),
        col("sum_qty"), col("sum_cents"),
        expr("sum_cents div n").as("avg_cents_floor"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }
  private val q177Sql = """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
      sum(l_quantity) AS sum_qty,
      CAST(sum(CAST(floor(l_extendedprice * 100.0) AS BIGINT))
        AS BIGINT) AS sum_cents,
      CAST(sum(CAST(floor(l_extendedprice * 100.0) AS BIGINT))
        AS BIGINT) // count(*) AS avg_cents_floor
    FROM lineitem
    WHERE NOT (l_returnflag = 'R' OR l_orderkey % 3 = 1)
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  /** q181 — standing JOIN matview fold ([[graft.ops.JoinMatView]]):
    * orders ⋈ lineitem grouped by (o_orderpriority, l_returnflag)
    * with distributive aggs, maintained by the Gupta–Mumick delta
    * rules. Both sides split deterministically into old + delta;
    * the state builds from (A_old ⋈ B_old) and then folds BOTH
    * deltas in one [[graft.ops.JoinMatView.refreshBoth]] commit —
    * ΔA⋈B_old ∪ (A_old∪ΔA)⋈ΔB, each delta-join broadcasting the
    * batch side so the big side never shuffles. The oracle is the
    * ONE-SHOT join+GROUP BY over the full tables: hash equality is
    * fold == rebuild under the hardest (both-sides) rule. min/max
    * ride along — legal for insert-only maintenance (the delete
    * path refuses them; q182 stays count/sum). */
  private val q181: QFn = (s, d) => {
    import graft.ops.JoinMatView
    import graft.ops.MatView.AggSpec
    val cents = "cast(floor(l_extendedprice * 100.0) as bigint)"
    val spec = JoinMatView.Spec(
      on = Seq(("o_orderkey", "l_orderkey")),
      keys = Seq("o_orderpriority", "l_returnflag"),
      aggs = Seq(AggSpec("count", "1", "n"),
        AggSpec("sum", "l_quantity", "sum_qty"),
        AggSpec("sum", cents, "sum_cents"),
        AggSpec("min", cents, "min_cents"),
        AggSpec("max", cents, "max_cents")))
    val ord = t(s, d, "orders")
    val li = t(s, d, "lineitem")
    val ordOld = ord.filter(pmod(col("o_orderkey"), lit(3)) =!= 1)
    val ordNew = ord.filter(pmod(col("o_orderkey"), lit(3)) === 1)
    val liOld = li.filter(pmod(col("l_partkey"), lit(2)) === 0)
    val liNew = li.filter(pmod(col("l_partkey"), lit(2)) =!= 0)
    val state = JoinMatView.create(ordOld, liOld, spec)
      .localCheckpoint(true)
    JoinMatView.refreshBoth(state, ordNew, liNew, ordOld, liOld, spec)
      .select(col("o_orderpriority"), col("l_returnflag"), col("n"),
        col("sum_qty"), col("sum_cents"), col("min_cents"),
        col("max_cents"), expr("sum_cents div n").as("avg_cents_floor"))
      .orderBy(col("o_orderpriority"), col("l_returnflag"))
  }
  private val q181Sql = """
    SELECT o_orderpriority, l_returnflag, count(*) AS n,
      sum(l_quantity) AS sum_qty,
      CAST(sum(CAST(floor(l_extendedprice * 100.0) AS BIGINT))
        AS BIGINT) AS sum_cents,
      min(CAST(floor(l_extendedprice * 100.0) AS BIGINT)) AS min_cents,
      max(CAST(floor(l_extendedprice * 100.0) AS BIGINT)) AS max_cents,
      CAST(sum(CAST(floor(l_extendedprice * 100.0) AS BIGINT))
        AS BIGINT) // count(*) AS avg_cents_floor
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority, l_returnflag
    ORDER BY o_orderpriority, l_returnflag"""

  /** q182 — JOIN matview DELETE ([[graft.ops.JoinMatView.delete]]):
    * the q181-shaped count/sum state built over the FULL join folds
    * OUT a left-side delete batch — every 'F'-status order (retiring
    * order keys wholesale) plus every o_orderkey ≡ 2 (mod 5) —
    * by subtracting the partials of `deletes ⋈ lineitem_current`
    * (the disjoint-partition identity (A−D)⋈B = A⋈B − D⋈B).
    * Zero-count groups retire; the oracle is the one-shot join+GROUP
    * BY over (orders − deletes) ⋈ lineitem: hash equality is
    * fold-with-deletes == rebuild. min/max specs refuse this path
    * loudly (JoinMatViewSpec proves the error; this query proves the
    * legal algebra). */
  private val q182: QFn = (s, d) => {
    import graft.ops.JoinMatView
    import graft.ops.MatView.AggSpec
    val cents = "cast(floor(l_extendedprice * 100.0) as bigint)"
    val spec = JoinMatView.Spec(
      on = Seq(("o_orderkey", "l_orderkey")),
      keys = Seq("o_orderpriority", "l_returnflag"),
      aggs = Seq(AggSpec("count", "1", "n"),
        AggSpec("sum", "l_quantity", "sum_qty"),
        AggSpec("sum", cents, "sum_cents")))
    val ord = t(s, d, "orders")
    val li = t(s, d, "lineitem")
    val state = JoinMatView.create(ord, li, spec).localCheckpoint(true)
    val dels = ord.filter(col("o_orderstatus") === "F" ||
      pmod(col("o_orderkey"), lit(5)) === 2)
    JoinMatView.delete(state, dels, li, spec, "left")
      .select(col("o_orderpriority"), col("l_returnflag"), col("n"),
        col("sum_qty"), col("sum_cents"),
        expr("sum_cents div n").as("avg_cents_floor"))
      .orderBy(col("o_orderpriority"), col("l_returnflag"))
  }
  private val q182Sql = """
    SELECT o_orderpriority, l_returnflag, count(*) AS n,
      sum(l_quantity) AS sum_qty,
      CAST(sum(CAST(floor(l_extendedprice * 100.0) AS BIGINT))
        AS BIGINT) AS sum_cents,
      CAST(sum(CAST(floor(l_extendedprice * 100.0) AS BIGINT))
        AS BIGINT) // count(*) AS avg_cents_floor
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE NOT (o_orderstatus = 'F' OR o_orderkey % 5 = 2)
    GROUP BY o_orderpriority, l_returnflag
    ORDER BY o_orderpriority, l_returnflag"""

  /** q184 — AS-OF (time-travel) reads over a standing artifact's
    * version history ([[graft.ops.IndexStore.readVersion]] +
    * [[graft.ops.IndexStore.setRetention]]): a matview folds three
    * cumulative batches into versions v1..v3 with retention deepened
    * to 4 (the default 2 would have pruned v1 — this query reads
    * PAST the default window), then reads every version back and
    * labels it. The oracle recomputes each snapshot from scratch
    * (GROUP BY over the cumulative slice): hash equality proves each
    * retained version IS the exact state its commit produced — the
    * audit guarantee behind "what did this dashboard serve before
    * batch N folded / after the delete landed" (`index versions` /
    * `index get version =` on the command surface). */
  private val q184: QFn = (s, d) => {
    import graft.ops.{IndexStore, MatView}
    import graft.ops.MatView.AggSpec
    val li = t(s, d, "lineitem")
    val keys = Seq("l_returnflag", "l_linestatus")
    val aggs = Seq(AggSpec("count", "1", "n"),
      AggSpec("sum", "l_quantity", "sum_qty"))
    val dir = java.nio.file.Files.createTempDirectory("q184")
      .resolve("mv").toString
    IndexStore.setRetention(s, dir, 4)
    def slice(m: Int) = li.filter(pmod(col("l_orderkey"), lit(3)) === m)
    val v1 = IndexStore.write(
      MatView.partials(slice(0), keys, aggs).localCheckpoint(true), dir)
    val v2 = IndexStore.write(MatView.fold(
      IndexStore.read(s, dir).get,
      MatView.partials(slice(1), keys, aggs), keys, aggs)
      .localCheckpoint(true), dir)
    val v3 = IndexStore.write(MatView.fold(
      IndexStore.read(s, dir).get,
      MatView.partials(slice(2), keys, aggs), keys, aggs)
      .localCheckpoint(true), dir)
    Seq(v1, v2, v3).zipWithIndex.map { case (v, i) =>
      IndexStore.readVersion(s, dir, v).withColumn("ver", lit(i + 1))
    }.reduce(_ unionByName _)
      .select(col("ver"), col("l_returnflag"), col("l_linestatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("ver"), col("l_returnflag"), col("l_linestatus"))
  }
  private val q184Sql = """
    SELECT * FROM (
      SELECT 1 AS ver, l_returnflag, l_linestatus, count(*) AS n,
        sum(l_quantity) AS sum_qty
      FROM lineitem WHERE l_orderkey % 3 = 0 GROUP BY 2, 3
      UNION ALL
      SELECT 2 AS ver, l_returnflag, l_linestatus, count(*) AS n,
        sum(l_quantity) AS sum_qty
      FROM lineitem WHERE l_orderkey % 3 IN (0, 1) GROUP BY 2, 3
      UNION ALL
      SELECT 3 AS ver, l_returnflag, l_linestatus, count(*) AS n,
        sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY 2, 3
    ) ORDER BY ver, l_returnflag, l_linestatus"""

  /** q189 — `join matview sync` (per-side lineage watermarks): a
    * standing join matview is created over two lineage-stamped
    * registered tables, deltas land on BOTH sides while auto refresh
    * is unavailable (plain parquet appends — the crash/off window),
    * and one sync reconciles: it folds, per side, exactly the rows
    * above that side's recorded watermark using the disjoint
    * decomposition ΔL⋈R_old ∪ ΔR⋈(L_old∪ΔL), so the cross delta
    * ΔL⋈ΔR folds exactly once. The oracle is the one-shot join+GROUP
    * BY over the FULL tables: hash equality is sync == rebuild under
    * the hardest (both-sides-pending) schedule — the crash-reconcile
    * contract q183 proves for single-table matviews, extended to the
    * Gupta–Mumick delta family. */
  private val q189: QFn = (s, d) => {
    val tmp = java.nio.file.Files.createTempDirectory("q189")
    val ordDir = tmp.resolve("ord.parquet").toString
    val liDir = tmp.resolve("li.parquet").toString
    val ord = t(s, d, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val li = t(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"),
        col("l_quantity"))
    // epoch state: tsd_id 1 on both sides; deltas land as tsd_id 2
    ord.filter(pmod(col("o_orderkey"), lit(3)) =!= 1)
      .withColumn("tsd_id", lit(1)).write.parquet(ordDir)
    li.filter(pmod(col("l_suppkey"), lit(2)) === 0)
      .withColumn("tsd_id", lit(1)).write.parquet(liDir)
    val cat = new graft.engine.Catalog(s)
    cat.registerTable("ords189", ordDir)
    cat.registerTable("lis189", liDir)
    val engine = new graft.engine.Engine(s, cat)
    val p = tmp.resolve("jmv").toString
    engine.execute(s"join matview create where path = $p " +
      s"""and spec = {"left": "ords189", "right": "lis189",
        "on": [["o_orderkey", "l_orderkey"]],
        "keys": ["o_orderpriority", "l_returnflag"], "aggs": [
        {"fn": "count", "expr": "1", "alias": "n"},
        {"fn": "sum", "expr": "l_quantity", "alias": "sum_qty"}]}""")
    // both-side deltas append UNDERNEATH the engine (no fold runs)
    ord.filter(pmod(col("o_orderkey"), lit(3)) === 1)
      .withColumn("tsd_id", lit(2)).write.mode("append").parquet(ordDir)
    li.filter(pmod(col("l_suppkey"), lit(2)) =!= 0)
      .withColumn("tsd_id", lit(2)).write.mode("append").parquet(liDir)
    val msg = engine.execute(s"join matview sync where path = $p")
    require(msg.contains("synced"), s"q189 sync did not fold: $msg")
    require(engine.execute(s"join matview sync where path = $p")
      .contains("in sync"), "q189 second sync must be a no-op")
    graft.ops.IndexStore.read(s, p).get
      .drop(graft.ops.JoinMatView.WmLeftCol,
        graft.ops.JoinMatView.WmRightCol)
      .select(col("o_orderpriority"), col("l_returnflag"), col("n"),
        col("sum_qty"))
      .orderBy(col("o_orderpriority"), col("l_returnflag"))
  }
  private val q189Sql = """
    SELECT o_orderpriority, l_returnflag, count(*) AS n,
      sum(l_quantity) AS sum_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority, l_returnflag
    ORDER BY o_orderpriority, l_returnflag"""

  /** q168 — column profiling ([[graft.ops.Profile]]): the
    * what-is-in-this-table receipt, every column's row/null/distinct
    * counts and string length stats from ONE aggregate pass (all
    * metrics ride one `agg`; `profile table` serves the same frame on
    * the command surface, with approx HLL distincts as the 100 TB
    * mode). The oracled projection keeps only engine-stable columns —
    * min/max rendered AS STRINGS stay on the command receipt because
    * double/timestamp formatting is engine-private (the q154 lesson
    * applied preemptively: never hash what an engine formats). */
  private val q168: QFn = (s, d) => {
    // widen a fewer-splits-than-cores scan (the PipelineQueries.wide
    // contract): the profile's Expand x(#distinct cols + 1) partial
    // aggregate was serialized onto the single input split's one task
    // (2.9 s of 4.5 s at sf0.1); on a real layout the file splits
    // exceed `cores` and this branch never fires. Aggregates are
    // partition-order-free, so the result is identical.
    val src = t(s, d, "orders")
    val cores = s.sparkContext.defaultParallelism
    val widened =
      if (src.rdd.getNumPartitions < cores)
        src.repartition(cores, col("o_orderkey"))
      else src
    graft.ops.Profile.profile(widened)
      .select(col("col_name"), col("col_type"), col("n_rows"),
        col("n_nulls"), col("n_distinct"), col("len_min"),
        col("len_max"), col("len_avg"))
      .orderBy(col("col_name"))
  }
  private val q168Sql = {
    val cols = Seq(
      ("o_orderkey", "bigint", false), ("o_custkey", "bigint", false),
      ("o_orderstatus", "string", true),
      ("o_totalprice", "double", false),
      ("o_orderdate", "timestamp", false),
      ("o_orderpriority", "string", true))
    cols.map { case (c, ty, isStr) =>
      val lens =
        if (isStr)
          s"CAST(min(length($c)) AS BIGINT) AS len_min, " +
            s"CAST(max(length($c)) AS BIGINT) AS len_max, " +
            s"CAST(sum(length($c)) AS BIGINT) // count($c) AS len_avg"
        else "CAST(NULL AS BIGINT) AS len_min, " +
          "CAST(NULL AS BIGINT) AS len_max, " +
          "CAST(NULL AS BIGINT) AS len_avg"
      s"""SELECT '$c' AS col_name, '$ty' AS col_type,
        count(*) AS n_rows,
        CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_nulls,
        CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
        $lens
      FROM orders"""
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
      "\n) ORDER BY col_name")
  }

  val queries: Map[String, QFn] = Map(
    "q189_join_matview_sync" -> q189,
    "q184_matview_asof" -> q184,
    "q181_join_matview" -> q181,
    "q182_join_matview_delete" -> q182,
    "q168_column_profile" -> q168,
    "q166_matview_fold" -> q166,
    "q177_matview_delete" -> q177,
    "q163_quality_constraints" -> q163,
    "q154_correlated_subquery" -> q154,
    "q56_pivot_conditional" -> q56,
    "q148_cube_grouping" -> q148,
    "q53_semi_join" -> q53,
    "q54_union_distinct" -> q54,
    "q55_scalar_subquery" -> q55,
    "q01_scan_limit" -> q01,
    "q02_filter_project" -> q02,
    "q03_global_aggs" -> q03,
    "q04_pricing_summary" -> q04,
    "q05_count_distinct" -> q05,
    "q06_select_distinct" -> q06,
    "q07_range_agg" -> q07,
    "q08_topn_groups" -> q08,
    "q09_increments_minute10" -> q09,
    "q10_increments_hour" -> q10,
    "q11_increments_auto" -> q11,
    "q12_period_day" -> q12,
    "q13_period_filter" -> q13,
    "q14_limit_per_key" -> q14,
    "q15_extend_include_union" -> q15,
    "q16_date_parts" -> q16,
    "q17_cast_chain" -> q17,
    "q18_timezone_out" -> q18,
    "q19_json_extract" -> q19,
    "q20_join_3way" -> q20,
    "q21_anti_join" -> q21,
    "q22_window_funcs" -> q22,
    "q23_rollup" -> q23,
    "q24_intersect" -> q24,
    "q25_having" -> q25,
    "q26_data_monitor_batch" -> q26)

  val oracles: Map[String, String] = Map(
    "q189_join_matview_sync" -> q189Sql,
    "q184_matview_asof" -> q184Sql,
    "q181_join_matview" -> q181Sql,
    "q182_join_matview_delete" -> q182Sql,
    "q168_column_profile" -> q168Sql,
    "q166_matview_fold" -> q166Sql,
    "q177_matview_delete" -> q177Sql,
    "q163_quality_constraints" -> q163Sql,
    "q154_correlated_subquery" -> q154Sql,
    "q56_pivot_conditional" -> q56Sql,
    "q148_cube_grouping" -> q148Sql,
    "q53_semi_join" -> q53Sql,
    "q54_union_distinct" -> q54Sql,
    "q55_scalar_subquery" -> q55Sql,
    "q01_scan_limit" -> q01Sql,
    "q02_filter_project" -> q02Sql,
    "q03_global_aggs" -> q03Sql,
    "q04_pricing_summary" -> q04Sql,
    "q05_count_distinct" -> q05Sql,
    "q06_select_distinct" -> q06Sql,
    "q07_range_agg" -> q07Sql,
    "q08_topn_groups" -> q08Sql,
    "q09_increments_minute10" -> q09Sql,
    "q10_increments_hour" -> q10Sql,
    "q11_increments_auto" -> q11Sql,
    "q12_period_day" -> q12Sql,
    "q13_period_filter" -> q13Sql,
    "q14_limit_per_key" -> q14Sql,
    "q15_extend_include_union" -> q15Sql,
    "q16_date_parts" -> q16Sql,
    "q17_cast_chain" -> q17Sql,
    "q18_timezone_out" -> q18Sql,
    "q19_json_extract" -> q19Sql,
    "q20_join_3way" -> q20Sql,
    "q21_anti_join" -> q21Sql,
    "q22_window_funcs" -> q22Sql,
    "q23_rollup" -> q23Sql,
    "q24_intersect" -> q24Sql,
    "q25_having" -> q25Sql,
    "q26_data_monitor_batch" -> q26Sql)
}
