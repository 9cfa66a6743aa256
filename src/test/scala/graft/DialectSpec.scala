package graft

import java.time.LocalDateTime

import org.apache.spark.sql.functions._

import graft.dialect._
import graft.engine.Tables

class DateLiteralsSpec extends SparkSpec {
  private val clock = () => LocalDateTime.parse("2024-06-15T10:30:45")

  test("now() folds to the clock instant") {
    assert(DateLiterals.evalFunction("now()", clock) === "2024-06-15 10:30:45")
  }

  test("date('now','start of month','-1 day') per the reference modifiers") {
    assert(DateLiterals.evalFunction(
      "date('now','start of month','-1 day')", clock) === "2024-05-31")
    assert(DateLiterals.evalFunction(
      "timestamp('now','start of day','+2 hour')", clock) ===
      "2024-06-15 02:00:00")
    assert(DateLiterals.evalFunction(
      "timestamp('now','-1 month')", clock) === "2024-05-15 10:30:45")
  }

  test("rewrite replaces date functions inside a WHERE text") {
    val out = DateLiterals.rewrite(
      "ts >= now() and ts < timestamp('now', '+1 day') and x = 3", clock)
    assert(out ===
      "ts >= '2024-06-15 10:30:45' and ts < '2024-06-16 10:30:45' and x = 3")
  }

  test("explicit base timestamp") {
    assert(DateLiterals.evalFunction(
      "timestamp('2024-01-10 00:00:00', '+90 minute')", clock) ===
      "2024-01-10 01:30:00")
  }
}

class IncrementsSpec extends SparkSpec {
  test("parent-unit chain second->minute->hour->day->month->year") {
    assert(Increments.parentUnit("second") === "minute")
    assert(Increments.parentUnit("minute") === "hour")
    assert(Increments.parentUnit("hour") === "day")
    assert(Increments.parentUnit("day") === "month")
    assert(Increments.parentUnit("month") === "year")
  }

  test("auto-sizing picks (unit, n) giving ~points buckets") {
    // 30 days / 100 points = 25920 s -> hour unit, n = 7
    val (u, n) = Increments.resolve(
      LocalDateTime.parse("2024-01-01T00:00:00"),
      LocalDateTime.parse("2024-01-31T00:00:00"), points = 100)
    assert((u, n) === ("hour", 7))
    // 1 hour / 60 points = 60 s -> minute, 1
    val (u2, n2) = Increments.resolve(
      LocalDateTime.parse("2024-01-01T00:00:00"),
      LocalDateTime.parse("2024-01-01T01:00:00"), points = 60)
    assert((u2, n2) === ("minute", 1))
  }

  test("bucket keys partition all rows exactly once (count invariance)") {
    val ev = Tables.load(spark, sfDir, "events")
    val total = ev.count()
    val bucketed = ev.groupBy(Increments.keys("minute", 10, col("ts")): _*)
      .count().agg(sum("count")).head().getLong(0)
    assert(bucketed === total)
  }
}

class PeriodSpec extends SparkSpec {
  test("window is (max-n*unit, max] under the anchor") {
    val ev = Tables.load(spark, sfDir, "events")
    val out = Period.apply(ev, "ts", "2024-01-15 12:00:00", "day", 1, None)
    val row = out.agg(max(col("ts")), min(col("ts")), count(lit(1))).head()
    val mx = row.getTimestamp(0)
    val mn = row.getTimestamp(1)
    assert(!mx.after(java.sql.Timestamp.valueOf("2024-01-15 12:00:00")))
    // strict > lower bound: min must be within (mx - 1 day, mx]
    assert(mn.after(new java.sql.Timestamp(
      mx.getTime - 24L * 3600 * 1000)))
  }

  test("empty anchor set returns no rows (reference behavior)") {
    val ev = Tables.load(spark, sfDir, "events")
    val out = Period.apply(ev, "ts", "1999-01-01 00:00:00", "day", 1, None)
    assert(out.count() === 0)
  }

  test("filter narrows the anchor search too") {
    val ev = Tables.load(spark, sfDir, "events")
    val out = Period.apply(ev, "ts", "2024-01-20 00:00:00", "minute", 30,
      Some(col("event_type") === "click"))
    assert(out.filter(col("event_type") =!= "click").count() === 0)
  }
}

class EdgeSqlSpec extends SparkSpec {
  private def load(n: String) = Tables.load(spark, sfDir, n)

  test("parseCommand splits dbms / options / select") {
    val c = EdgeSql.parseCommand(
      """sql edge format=json extend = (@table_name) "select * from t"""")
    assert(c.dbms === "edge")
    assert(c.options === Map("format" -> "json", "extend" -> "@table_name"))
    assert(c.select === "select * from t")
  }

  test("parseSelect captures all clauses") {
    val s = EdgeSql.parseSelect(
      "select a, count(*) as n from t where x > 3 and y = 'from me' " +
        "group by a order by n desc, a limit 10 per a")
    assert(s.projection.map(_.raw) === Seq("a", "count(*)"))
    assert(s.projection(1).alias === Some("n"))
    assert(s.table === "t")
    assert(s.where === Some("x > 3 and y = 'from me'"))
    assert(s.groupBy === Seq("a"))
    assert(s.orderBy === Seq(("n", true), ("a", false)))
    assert(s.limit === Some(10))
    assert(s.limitPer === Some("a"))
  }

  test("having: parses between group by and order by, filters group " +
      "rows over output aliases, requires a grouped query") {
    val s = EdgeSql.parseSelect(
      "select a, count(*) as n from t group by a having n > 3 " +
        "order by a limit 5")
    assert(s.groupBy === Seq("a"))
    assert(s.having === Some("n > 3"))
    assert(s.orderBy === Seq(("a", false)))
    assert(s.limit === Some(5))
    // end-to-end: equals the hand-written post-agg filter
    val viaDialect = EdgeSql.query(spark, load,
      """sql edge "select event_type, count(*) as n from events """ +
        """group by event_type having n > 100 order by event_type"""")
    val direct = load("events")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 100).orderBy(col("event_type"))
    assert(viaDialect.collect().toSeq === direct.collect().toSeq)
    assert(viaDialect.count() > 0)
    // HAVING without GROUP BY is rejected loudly
    val e = intercept[IllegalArgumentException] {
      EdgeSql.parseSelect("select a from t having a > 3")
    }
    assert(e.getMessage.contains("GROUP BY"), e.getMessage)
  }

  test("JOIN grammar: parses both qualifier orientations, bare " +
      "columns default to written order, non-equality and foreign " +
      "qualifiers are rejected") {
    val s = EdgeSql.parseSelect(
      "select a, count(*) as n from t1 join t2 on t1.x = t2.y group by a")
    assert(s.table === "t1")
    assert(s.join === Some(EdgeSql.JoinSpec("t2", Seq(("x", "y")))))
    // swapped qualifiers normalize to (left, right)
    val s2 = EdgeSql.parseSelect(
      "select a from t1 inner join t2 on t2.y = t1.x and t1.p = t2.q")
    assert(s2.join === Some(EdgeSql.JoinSpec("t2",
      Seq(("x", "y"), ("p", "q")))))
    // bare columns: first is left, second right
    val s3 = EdgeSql.parseSelect("select a from t1 join t2 on x = y")
    assert(s3.join === Some(EdgeSql.JoinSpec("t2", Seq(("x", "y")))))
    // left join parses with its type; inner is the default
    val s4 = EdgeSql.parseSelect(
      "select a from t1 left join t2 on t1.x = t2.y")
    assert(s4.join ===
      Some(EdgeSql.JoinSpec("t2", Seq(("x", "y")), "left")))
    assert(s.join.get.joinType === "inner")
    intercept[IllegalArgumentException] {
      EdgeSql.parseSelect("select a from t1 join t2 on t1.x > t2.y")
    }
    intercept[IllegalArgumentException] {
      EdgeSql.parseSelect("select a from t1 join t2 on t3.x = t2.y")
    }
  }

  test("JOIN compiles to the hand-written inner equi-join plan; " +
      "include=/extend= and overlapping column names are rejected") {
    val viaDialect = EdgeSql.query(spark, load,
      """sql edge "select o_orderpriority, count(*) as n """ +
        """from orders join lineitem """ +
        """on orders.o_orderkey = lineitem.l_orderkey """ +
        """group by o_orderpriority order by o_orderpriority"""")
    val direct = load("orders").join(load("lineitem"),
        col("o_orderkey") === col("l_orderkey"), "inner")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
    assert(viaDialect.collect().toSeq === direct.collect().toSeq)
    intercept[IllegalArgumentException] {
      EdgeSql.query(spark, load,
        """sql edge include=(part) "select o_orderpriority from """ +
          """orders join lineitem """ +
          """on orders.o_orderkey = lineitem.l_orderkey"""")
    }
    // same table on both sides -> every column name overlaps
    val e = intercept[IllegalArgumentException] {
      EdgeSql.query(spark, load,
        """sql edge "select o_orderpriority from orders join orders """ +
          """on orders.o_orderkey = orders.o_orderkey"""").collect()
    }
    // rejected at parse: either the same-table ON-conjunct guard
    // (fires first) or the overlapping-column check — both are loud
    assert(e.getMessage.contains("same table") ||
      e.getMessage.contains("share column name"), e.getMessage)
    // an ON conjunct whose two sides qualify to ONE table of a
    // two-table join hits the same-table guard specifically — the
    // documented dialect divergence (such predicates belong in WHERE)
    val e2 = intercept[IllegalArgumentException] {
      EdgeSql.query(spark, load,
        """sql edge "select o_orderpriority from orders join lineitem """ +
          """on orders.o_orderkey = orders.o_custkey"""")
    }
    assert(e2.getMessage.contains("same table"), e2.getMessage)
  }

  test("compiled dialect query equals the hand-written plan") {
    val viaDialect = EdgeSql.query(spark, load,
      """sql edge "select event_type, count(*) as n from events """ +
        """where value > 50 group by event_type order by event_type"""")
    val direct = load("events").filter(col("value") > 50)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"))
    assert(viaDialect.collect().toSeq === direct.collect().toSeq)
  }

  test("period inside WHERE composes with other predicates") {
    val (spec, rest) = EdgeSql.extractPeriod(
      "user_id < 10 and period(minute, 5, '2024-01-02 00:00:00', ts)")
    assert(spec === Some(("minute", 5, "2024-01-02 00:00:00", "ts", None)))
    assert(rest === Some("user_id < 10"))
  }

  test("casting chain compiles") {
    val df = EdgeSql.query(spark, load,
      """sql edge "select event_id::str as id_s, value::float(0) as v0 """ +
        """from events order by event_id limit 3"""")
    val rows = df.collect()
    assert(rows.length === 3)
    assert(rows.head.schema("id_s").dataType.typeName === "string")
  }

  test("::function exposes a safe SQL-expression subset over `value`") {
    val df = EdgeSql.query(spark, load,
      """sql edge "select event_id, """ +
        """value::function(round(value * 2, 0) + 1)::int as doubled, """ +
        """event_type::function(upper(value))::str as typ """ +
        """from events order by event_id limit 3"""")
    val rows = df.collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getAs[String]("typ").forall(ch => !ch.isLower))
    }
    // chains compose: the function output feeds the next cast
    assert(rows.head.schema("doubled").dataType.typeName === "long")
  }

  test("::function rejects non-allowlisted functions and subqueries") {
    def q(fn: String) = EdgeSql.query(spark, load,
      s"""sql edge "select value::function($fn) as x """ +
        """from events limit 1"""")
    // reflect()/java_method() reach arbitrary static Java — rejected
    // at parse time, BEFORE any resolution against the registry
    val e1 = intercept[IllegalArgumentException](
      q("reflect('java.lang.System', 'getenv')"))
    assert(e1.getMessage.contains("allowlist"))
    val e2 = intercept[IllegalArgumentException](
      q("java_method('java.lang.Runtime', 'getRuntime')"))
    assert(e2.getMessage.contains("allowlist"))
    // scalar subqueries reach the whole catalog — rejected
    val e3 = intercept[IllegalArgumentException](
      q("(select max(value) from events)"))
    assert(e3.getMessage.contains("subquery"))
    // nesting inside an allowed call does not smuggle one through
    val e4 = intercept[IllegalArgumentException](
      q("abs(reflect('a', 'b'))"))
    assert(e4.getMessage.contains("allowlist"))
    // allowlisted builtins still work
    assert(q("greatest(abs(value), 1.0)").collect().length === 1)
    // unix_timestamp: deterministic one-arg form allowed, zero-arg
    // (current wall clock) arity-gated
    val e5 = intercept[IllegalArgumentException](q("unix_timestamp()"))
    assert(e5.getMessage.contains("zero-arg"))
    // bare CURRENT_TIMESTAMP/CURRENT_DATE parse as ATTRIBUTES, not
    // function calls, and Spark's literal-function resolution would turn
    // them into wall-clock values — the attribute gate rejects any
    // identifier other than `value`
    for (lit <- Seq("current_timestamp", "CURRENT_DATE", "now",
        "localtimestamp", "current_user", "session_user")) {
      val e = intercept[IllegalArgumentException](q(lit))
      assert(e.getMessage.contains("unknown identifier"), lit)
    }
    // ...and the same gate catches stray column references
    val e6 = intercept[IllegalArgumentException](q("value + other_col"))
    assert(e6.getMessage.contains("unknown identifier"))
  }

  test("just/replace casts match the reference's exact semantics") {
    import spark.implicits._
    // ljust truncates keeping the FIRST n chars; rjust keeps the LAST n
    // (cast_to_just utils_columns.py:1816-1827); replace substitutes the
    // FIRST occurrence only (str.replace(a, b, 1), :1863)
    val df = Seq(("abcdef", "x-y-x-y")).toDF("s", "r")
      .createOrReplaceTempView("just_t")
    val out = EdgeSql.query(spark,
      n => spark.table("just_t"),
      """sql edge "select s::ljust(3) as lj, s::rjust(3) as rj, """ +
        """s::ljust(8) as ljp, s::rjust(8) as rjp, """ +
        """r::replace(x by z) as rep from just_t"""").head()
    assert(out.getAs[String]("lj") === "abc")
    assert(out.getAs[String]("rj") === "def")
    assert(out.getAs[String]("ljp") === "abcdef  ")
    assert(out.getAs[String]("rjp") === "  abcdef")
    assert(out.getAs[String]("rep") === "z-y-x-y")
  }
}

class TimezoneLiteralsSpec extends SparkSpec {
  import graft.dialect.{DateLiterals, EdgeSql}
  import graft.engine.Tables

  test("localizeLiterals shifts caller-tz literals to UTC") {
    val out = DateLiterals.localizeLiterals(
      "ts >= '2024-01-01 05:30:00' and ts < '2024-01-02'", "+05:30")
    assert(out ===
      "ts >= '2024-01-01 00:00:00' and ts < '2024-01-01 18:30:00'")
  }

  test("timezone option converts WHERE literals before planning") {
    def load(n: String) = Tables.load(spark, sfDir, n)
    val viaTz = EdgeSql.query(spark, load,
      """sql edge timezone=+05:30 "select count(*) as n from events """ +
        """where ts >= '2024-01-05 05:30:00' and ts < '2024-01-06 05:30:00'"""")
    val utc = EdgeSql.query(spark, load,
      """sql edge "select count(*) as n from events """ +
        """where ts >= '2024-01-05 00:00:00' and ts < '2024-01-06 00:00:00'"""")
    assert(viaTz.head().getLong(0) === utc.head().getLong(0))
    assert(viaTz.head().getLong(0) > 0)
  }
}

class DistinctDialectSpec extends SparkSpec {
  import graft.dialect.EdgeSql
  import graft.engine.Tables
  private def load(n: String) = Tables.load(spark, sfDir, n)

  test("distinct(x) projection function dedups (unify_results.py:78-110)") {
    val df = EdgeSql.query(spark, load,
      """sql edge "select distinct(event_type) from events order by event_type"""")
    val expected = load("events").select("event_type").distinct().count()
    assert(df.count() === expected)
  }

  test("SELECT DISTINCT prefix") {
    val df = EdgeSql.query(spark, load,
      """sql edge "select distinct event_type, user_id from events """ +
        """where user_id < 5 order by event_type, user_id"""")
    val expected = load("events").filter(col("user_id") < 5)
      .select("event_type", "user_id").distinct().count()
    assert(df.count() === expected)
  }
}

class WherePredicateSpec extends SparkSpec {
  import graft.dialect.EdgeSql
  import graft.engine.Tables
  private def load(n: String) = Tables.load(spark, sfDir, n)

  test("IN lists and BETWEEN pass through to Catalyst") {
    val df = EdgeSql.query(spark, load,
      """sql edge "select count(*) as n from events """ +
        """where event_type in ('click', 'view') and user_id between 10 and 20"""")
    val direct = load("events")
      .filter(col("event_type").isin("click", "view") &&
        col("user_id").between(10, 20)).count()
    assert(df.head().getLong(0) === direct)
  }

  test("parenthesised OR groups") {
    val df = EdgeSql.query(spark, load,
      """sql edge "select count(*) as n from events """ +
        """where (event_type = 'click' or event_type = 'view') and value > 50"""")
    val direct = load("events")
      .filter((col("event_type") === "click" || col("event_type") === "view")
        && col("value") > 50).count()
    assert(df.head().getLong(0) === direct)
  }
}

class HardPartsSpec extends SparkSpec {
  import graft.dialect.EdgeSql
  import graft.engine.Tables
  private def load(n: String) = Tables.load(spark, sfDir, n)

  test("increments(week, 1, ts) folds to 7-day buckets") {
    val viaWeek = EdgeSql.query(spark, load,
      """sql edge "select increments(week, 1, ts), count(*) as n """ +
        """from events order by day_parent, day_bucket"""")
    val viaDays = EdgeSql.query(spark, load,
      """sql edge "select increments(day, 7, ts), count(*) as n """ +
        """from events order by day_parent, day_bucket"""")
    assert(viaWeek.collect().toSeq === viaDays.collect().toSeq)
  }

  test("duplicate projected names are rejected") {
    val e = intercept[IllegalArgumentException] {
      EdgeSql.query(spark, load,
        """sql edge "select count(*) as n, sum(value) as n from events"""")
        .collect()
    }
    assert(e.getMessage.contains("duplicate"))
  }
}
