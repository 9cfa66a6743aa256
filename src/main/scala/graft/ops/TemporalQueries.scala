package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Temporal operators over the `events` stream table (q66, q67, q71):
  * as-of join, banded range join, and batch sessionization — the
  * event-time primitives a telemetry/training-data lake queries
  * constantly and Spark has no built-in operator for.
  *
  * Determinism across engines: `events.ts` is micro-aligned (no
  * sub-microsecond residue in the corpus) and (user_id, ts) is unique,
  * so every window order below is total and both engines agree on ties
  * by construction. All outputs are integers, timestamps, or raw stored
  * doubles — no float arithmetic that could diverge.
  */
object TemporalQueries {
  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** q66 — as-of join: each purchase picks the user's LATEST click at or
    * before the purchase time (backward-inclusive), left-outer. The
    * classic "attribute the conversion to the click" query. ONE shuffle
    * on user_id (TemporalJoins.asOf union+sort formulation) — at 100 TB
    * this is a sort-merge pass, never a per-row probe. */
  private val q66: QFn = (s, d) => {
    val ev = t(s, d, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"), col("value").as("p_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
    TemporalJoins.asOf(purchases, clicks, Seq("user_id"), "p_ts", "c_ts")
      .withColumn("gap_us",
        unix_micros(col("p_ts")) - unix_micros(col("c_ts")))
      .orderBy(col("purchase_id"))
  }
  private val q66Sql = """
    WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts,
        value AS p_value FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, event_id AS click_id, ts AS c_ts
        FROM events WHERE event_type = 'click')
    SELECT purchase_id, p.user_id, p_ts, p_value, click_id, c_ts,
      epoch_us(p_ts) - epoch_us(c_ts) AS gap_us
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.p_ts >= c.c_ts
    ORDER BY purchase_id"""

  /** q67 — banded range join: per error event, how many clicks the same
    * user made in the preceding 5 minutes `[ts-300s, ts)`. The banded
    * equi-join (TemporalJoins.rangeCount) shuffles on (user, 5-min bin)
    * — candidate pairs are bounded by bin population, so the plan never
    * degenerates to the BroadcastNestedLoopJoin a naive inequality join
    * produces. */
  private val q67: QFn = (s, d) => {
    val ev = t(s, d, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
    TemporalJoins.rangeCount(errors, clicks, Seq("user_id"), "ts", "ts",
        lowerSec = -300, upperSec = 0, countName = "n_clicks_5m")
      .orderBy(col("event_id"))
  }
  private val q67Sql = """
    WITH e AS (SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'error'),
    c AS (SELECT user_id, ts AS cts FROM events WHERE event_type = 'click')
    SELECT e.event_id, e.user_id, e.ts,
      CAST(count(c.cts) AS BIGINT) AS n_clicks_5m
    FROM e LEFT JOIN c ON e.user_id = c.user_id
      AND epoch_us(c.cts) >= epoch_us(e.ts) - 300000000
      AND epoch_us(c.cts) < epoch_us(e.ts)
    GROUP BY e.event_id, e.user_id, e.ts
    ORDER BY e.event_id"""

  /** q71 — batch sessionization: 30-minute-gap sessions per user (the
    * batch twin of StreamOps.sessionize), then per-user session shape
    * stats. Window + running sum over user_id — the groupBy(user, sid)
    * reuses the window's hash partitioning, so the whole query is ONE
    * shuffle. Integer-only outputs. */
  private val q71: QFn = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts")
    val gapUs = 1800L * 1000000L
    val sess = t(s, d, "events").select(col("user_id"), col("ts"))
      .withColumn("brk", when(
        lag(col("ts"), 1).over(w).isNull ||
          unix_micros(col("ts")) -
            unix_micros(lag(col("ts"), 1).over(w)) > gapUs, 1L)
        .otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sess.groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n"),
        (unix_micros(max(col("ts"))) -
          unix_micros(min(col("ts")))).as("span_us"))
      .groupBy(col("user_id"))
      .agg(sum(col("n")).as("n_events"),
        count(lit(1)).as("n_sessions"),
        max(col("n")).as("max_session_events"),
        max(col("span_us")).as("max_session_span_us"))
      .orderBy(col("user_id"))
  }
  private val q71Sql = """
    WITH o AS (SELECT user_id, ts,
        lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      FROM events),
    b AS (SELECT user_id, ts, CASE WHEN prev IS NULL
        OR epoch_us(ts) - epoch_us(prev) > 1800000000
        THEN 1 ELSE 0 END AS brk FROM o),
    s AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id
        ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        AS sid FROM b),
    ps AS (SELECT user_id, sid, count(*) AS n,
        epoch_us(max(ts)) - epoch_us(min(ts)) AS span_us
      FROM s GROUP BY 1, 2)
    SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events,
      count(*) AS n_sessions, max(n) AS max_session_events,
      max(span_us) AS max_session_span_us
    FROM ps GROUP BY user_id ORDER BY user_id"""

  // =====================================================================
  // q162 — STANDING sessionization fold: q71's 30-minute-gap sessions
  // maintained as a standing artifact that composes EXACTLY across
  // strictly-later batches — the batch twin of Structured Streaming's
  // mapGroupsWithState session state. The state is (closed sessions +
  // one OPEN TAIL per user); folding a later batch re-sessionizes ONLY
  // (tails ∪ batch): the gap rule is local to consecutive events, so a
  // batch can merge into or extend the tail but can never touch a
  // closed session. Unlike q158's honest per-batch-lead caveat, this
  // fold is exact BY CONSTRUCTION — the oracle is q71's ONE-SHOT
  // sessionization verbatim, so the hash gate itself proves
  // fold == rebuild. The tail travels as one pseudo-event at its end
  // time carrying (start, n): the merge test only needs the last
  // event time, and min(carry_start)/sum(carry_n) restore the rest.
  // =====================================================================

  private val q162: QFn = (s, d) => {
    val gapUs = 1800L * 1000000L
    // batch boundary: 2024-01-22T00:00:00Z (3 weeks into the 30-day
    // corpus) — batch 2 is strictly later than every batch-1 event
    val splitUs = 1705881600000000L
    val ev = t(s, d, "events").select(col("user_id"),
      unix_micros(col("ts")).as("tu"), col("event_id").as("eid"))
    def sessionize(rows: DataFrame): DataFrame = {
      val w = Window.partitionBy("user_id").orderBy("tu", "eid")
      rows
        .withColumn("brk", when(
          lag(col("tu"), 1).over(w).isNull ||
            col("tu") - lag(col("tu"), 1).over(w) > gapUs, 1L)
          .otherwise(0L))
        .withColumn("sid", sum(col("brk")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(sum(col("carry_n")).as("n"),
          min(col("carry_start")).as("s_start"),
          max(col("tu")).as("s_end"))
        .drop("sid")
    }
    def asEvents(df: DataFrame) = df.select(col("user_id"), col("tu"),
      col("eid"), lit(1L).as("carry_n"), col("tu").as("carry_start"))
    // standing state after batch 1 (checkpointed: the artifact)
    val st1 = sessionize(asEvents(ev.filter(col("tu") < splitUs)))
      .localCheckpoint(true)
    // open tail = each user's latest session (windowless argmax)
    val tails = st1.groupBy("user_id")
      .agg(max(struct(col("s_end"), col("s_start"), col("n"))).as("t"))
      .select(col("user_id"), col("t.s_end").as("tu"),
        lit(-1L).as("eid"), col("t.n").as("carry_n"),
        col("t.s_start").as("carry_start"))
    val closed = st1.join(
      tails.select(col("user_id"), col("tu").as("s_end")),
      Seq("user_id", "s_end"), "left_anti")
    // fold: re-sessionize ONLY tails ∪ the later batch
    val boundary = sessionize(tails.unionByName(
      asEvents(ev.filter(col("tu") >= splitUs))))
    closed.select("user_id", "n", "s_start", "s_end")
      .unionByName(boundary.select("user_id", "n", "s_start", "s_end"))
      .groupBy("user_id")
      .agg(sum(col("n")).as("n_events"),
        count(lit(1)).as("n_sessions"),
        max(col("n")).as("max_session_events"),
        max(col("s_end") - col("s_start")).as("max_session_span_us"))
      .orderBy(col("user_id"))
  }
  // the oracle is q71's ONE-SHOT sessionization — hash equality IS the
  // fold == rebuild proof
  private val q162Sql = q71Sql

  // =====================================================================
  // q169 — k-STEP chained funnel (sequential pattern match, the
  // match_recognize workload class): users who did signup -> view ->
  // purchase IN ORDER, each step within 7 days of the previous, with
  // per-stage user counts and integer-ppm conversion rates. q76 is the
  // 2-step special case; the general k-step chain is k-1 per-user
  // min-timestamp joins — every join and aggregate keyed on user_id,
  // so at 100 TB the whole funnel is ONE shuffle key reused k times
  // (AQE coalesces the repeated exchanges), never a per-user window
  // over the full event stream. Earliest-qualifying-event semantics
  // (min ts after the previous stage) make the result deterministic.
  // =====================================================================

  private val q169: QFn = (s, d) => {
    val weekUs = 7L * 86400L * 1000000L
    val ev = t(s, d, "events").select(col("user_id"),
      col("event_type").as("etype"), unix_micros(col("ts")).as("tu"))
    val s1 = ev.filter(col("etype") === "signup")
      .groupBy("user_id").agg(min(col("tu")).as("t1"))
    val s2 = ev.filter(col("etype") === "view").join(s1, "user_id")
      .filter(col("tu") > col("t1") && col("tu") <= col("t1") + weekUs)
      .groupBy("user_id").agg(min(col("tu")).as("t2"))
    val s3 = ev.filter(col("etype") === "purchase").join(s2, "user_id")
      .filter(col("tu") > col("t2") && col("tu") <= col("t2") + weekUs)
      .groupBy("user_id").agg(min(col("tu")).as("t3"))
    val (n1, n2, n3) = (s1.count(), s2.count(), s3.count())
    val rows = Seq(
      (1L, "signup", n1, 1000000L),
      (2L, "view_within_7d", n2,
        if (n1 > 0) n2 * 1000000L / n1 else 0L),
      (3L, "purchase_within_7d", n3,
        if (n2 > 0) n3 * 1000000L / n2 else 0L))
    import s.implicits._
    rows.toDF("stage", "step", "n_users", "conv_ppm")
      .orderBy(col("stage"))
  }
  private val q169Sql = """
    WITH ev AS (SELECT user_id, event_type AS etype, epoch_us(ts) AS tu
      FROM events),
    s1 AS (SELECT user_id, min(tu) AS t1 FROM ev
      WHERE etype = 'signup' GROUP BY 1),
    s2 AS (SELECT ev.user_id, min(tu) AS t2 FROM ev JOIN s1 USING (user_id)
      WHERE etype = 'view' AND tu > t1 AND tu <= t1 + 604800000000
      GROUP BY 1),
    s3 AS (SELECT ev.user_id, min(tu) AS t3 FROM ev JOIN s2 USING (user_id)
      WHERE etype = 'purchase' AND tu > t2 AND tu <= t2 + 604800000000
      GROUP BY 1),
    n AS (SELECT (SELECT count(*) FROM s1) AS n1,
      (SELECT count(*) FROM s2) AS n2, (SELECT count(*) FROM s3) AS n3)
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS stage, 'signup' AS step,
        CAST(n1 AS BIGINT) AS n_users,
        CAST(1000000 AS BIGINT) AS conv_ppm FROM n
      UNION ALL
      SELECT CAST(2 AS BIGINT), 'view_within_7d', CAST(n2 AS BIGINT),
        CAST(CASE WHEN n1 > 0 THEN n2 * 1000000 // n1 ELSE 0 END
          AS BIGINT) FROM n
      UNION ALL
      SELECT CAST(3 AS BIGINT), 'purchase_within_7d', CAST(n3 AS BIGINT),
        CAST(CASE WHEN n2 > 0 THEN n3 * 1000000 // n2 ELSE 0 END
          AS BIGINT) FROM n
    ) ORDER BY stage"""

  // =====================================================================
  // q170 — INTERVAL OVERLAP JOIN via time-bin bucketing: which user
  // pairs were "online together" (their 30-min-gap sessions overlap in
  // wall time), top-20 pairs by overlapping-session-pair count. The
  // operator class Spark lacks natively: a naive `a.start <= b.end AND
  // b.start <= a.end` join plans a BroadcastNestedLoopJoin; here every
  // session EXPLODES into the hour bins it spans, candidates share a
  // bin (equi-join), a session pair straddling several bins dedups by
  // its identity, and the exact inclusive-overlap predicate verifies —
  // candidate volume is Σ per-bin-population², bounded by concurrency,
  // never N². Same binning idea as q67's banded range join, lifted
  // from point-in-band to interval×interval.
  // =====================================================================

  private val q170: QFn = (s, d) => {
    val gapUs = 1800L * 1000000L
    val binUs = 3600L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("tu", "eid")
    val sess = t(s, d, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("tu"),
        col("event_id").as("eid"))
      .withColumn("brk", when(
        lag(col("tu"), 1).over(w).isNull ||
          col("tu") - lag(col("tu"), 1).over(w) > gapUs, 1L)
        .otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min(col("tu")).as("s0"), max(col("tu")).as("s1"))
    val binned = sess.select(col("user_id"), col("s0"), col("s1"),
      explode(sequence(expr(s"s0 div $binUs"),
        expr(s"s1 div $binUs"))).as("bin"))
    val b2 = binned.toDF("user_b", "b0", "b1", "bin")
    binned.join(b2, Seq("bin"))
      .filter(col("user_id") < col("user_b"))
      .select(col("user_id").as("user_a"), col("s0"), col("s1"),
        col("user_b"), col("b0"), col("b1"))
      .distinct() // a pair straddling k shared bins appears k times
      .filter(col("s0") <= col("b1") && col("b0") <= col("s1"))
      .groupBy("user_a", "user_b")
      .agg(count(lit(1)).as("n_overlaps"))
      .orderBy(col("n_overlaps").desc, col("user_a"), col("user_b"))
      .limit(20)
  }
  private val q170Sql = """
    WITH o AS (SELECT user_id, epoch_us(ts) AS tu, event_id AS eid,
        lag(epoch_us(ts)) OVER (PARTITION BY user_id
          ORDER BY epoch_us(ts), event_id) AS prev
      FROM events),
    b AS (SELECT user_id, tu, eid, CASE WHEN prev IS NULL
        OR tu - prev > 1800000000 THEN 1 ELSE 0 END AS brk FROM o),
    sd AS (SELECT user_id, tu, sum(brk) OVER (PARTITION BY user_id
        ORDER BY tu, eid ROWS BETWEEN UNBOUNDED PRECEDING AND
        CURRENT ROW) AS sid FROM b),
    sess AS (SELECT user_id, sid, min(tu) AS s0, max(tu) AS s1
      FROM sd GROUP BY 1, 2),
    binned AS (SELECT user_id, s0, s1, unnest(range(s0 // 3600000000,
        s1 // 3600000000 + 1)) AS bin FROM sess),
    cand AS (SELECT DISTINCT a.user_id AS user_a, a.s0, a.s1,
        b.user_id AS user_b, b.s0 AS b0, b.s1 AS b1
      FROM binned a JOIN binned b
        ON a.bin = b.bin AND a.user_id < b.user_id)
    SELECT user_a, user_b, count(*) AS n_overlaps
    FROM cand WHERE s0 <= b1 AND b0 <= s1
    GROUP BY 1, 2
    ORDER BY n_overlaps DESC, user_a, user_b LIMIT 20"""

  /** q75 — rate-anomaly flags: per (event_type, minute) counts compared
    * against the trailing hour, flagged when the minute runs at more
    * than 2x the trailing per-minute rate. The alert rule of the data
    * monitor family, made INTEGER-EXACT for the cross-engine gate:
    * `n * 60 > 2 * trailing_sum` avoids the order-sensitive float
    * average entirely (the trailing window is a RANGE frame over epoch
    * seconds, [-3600, -60] inclusive = minutes t-60..t-1, 60 buckets,
    * current excluded). One aggregate plus one window, both keyed on
    * event_type. */
  private val q75: QFn = (s, d) => {
    val perMin = t(s, d, "events")
      .groupBy(col("event_type"),
        date_trunc("minute", col("ts")).as("minute"))
      .agg(count(lit(1)).as("n"))
      .withColumn("epoch_s", unix_seconds(col("minute")))
    val w = Window.partitionBy("event_type").orderBy("epoch_s")
      .rangeBetween(-3600, -60)
    perMin
      .withColumn("trailing_sum",
        coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("trailing_mins", count(lit(1)).over(w))
      // full-history gate: only flag once a complete trailing hour of
      // buckets exists ([-3600s, -60s] inclusive = minutes t-60..t-1,
      // 60 one-minute buckets)
      .withColumn("anomaly",
        col("trailing_mins") === 60 &&
          col("n") * 60 > col("trailing_sum") * 2)
      .select(col("event_type"), col("minute"), col("n"),
        col("trailing_sum"), col("anomaly"))
      .orderBy(col("event_type"), col("minute"))
  }
  private val q75Sql = """
    WITH pm AS (SELECT event_type, date_trunc('minute', ts) AS minute,
        count(*) AS n FROM events GROUP BY 1, 2),
    e AS (SELECT *, epoch_us(minute) // 1000000 AS epoch_s FROM pm),
    tw AS (SELECT event_type, minute, n,
        COALESCE(CAST(sum(n) OVER w AS BIGINT), 0) AS trailing_sum,
        count(*) OVER w AS trailing_mins
      FROM e WINDOW w AS (PARTITION BY event_type ORDER BY epoch_s
        RANGE BETWEEN 3600 PRECEDING AND 60 PRECEDING))
    SELECT event_type, minute, n, trailing_sum,
      (trailing_mins = 60 AND n * 60 > trailing_sum * 2) AS anomaly
    FROM tw ORDER BY event_type, minute"""

  /** q76 — conversion funnel: each signup attributed to the user's FIRST
    * purchase at-or-after it (forward as-of), then rolled up per signup
    * day: signups, conversions within 24 h, and the integer-exact
    * median-free latency sum (micros) for the converted. Exercises the
    * forward direction of TemporalJoins.asOf through the driver gate
    * (q66 covers backward); same one-shuffle union+window plan. */
  private val q76: QFn = (s, d) => {
    val ev = t(s, d, "events")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"),
        col("ts").as("s_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
    TemporalJoins.asOf(signups, purchases, Seq("user_id"), "s_ts", "p_ts",
        direction = "forward")
      .withColumn("gap_us",
        unix_micros(col("p_ts")) - unix_micros(col("s_ts")))
      .withColumn("converted",
        col("gap_us").isNotNull && col("gap_us") <= 86400L * 1000000L)
      // day key as a STRING: DuckDB's date_trunc('day') yields DATE
      // where Spark yields TIMESTAMP — the repo-wide convention
      // (q10/q16) renders day buckets via strftime/date_format
      .groupBy(date_format(col("s_ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_signups"),
        sum(when(col("converted"), 1L).otherwise(0L)).as("n_converted"),
        sum(when(col("converted"), col("gap_us")).otherwise(0L))
          .as("latency_us_sum"))
      .orderBy(col("day"))
  }
  private val q76Sql = """
    WITH s AS (SELECT event_id AS signup_id, user_id, ts AS s_ts
        FROM events WHERE event_type = 'signup'),
    p AS (SELECT user_id, ts AS p_ts FROM events
        WHERE event_type = 'purchase'),
    m AS (SELECT signup_id, s.user_id, s_ts, p_ts,
        epoch_us(p_ts) - epoch_us(s_ts) AS gap_us
      FROM s ASOF LEFT JOIN p
        ON s.user_id = p.user_id AND s.s_ts <= p.p_ts),
    c AS (SELECT *, (gap_us IS NOT NULL AND gap_us <= 86400000000)
        AS converted FROM m)
    SELECT strftime(date_trunc('day', s_ts), '%Y-%m-%d') AS day,
      count(*) AS n_signups,
      CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT)
        AS n_converted,
      CAST(sum(CASE WHEN converted THEN gap_us ELSE 0 END) AS BIGINT)
        AS latency_us_sum
    FROM c GROUP BY 1 ORDER BY day"""

  /** q77 — weekly cohort retention: users grouped by first-seen week,
    * counted as retained in each later week they were active. The
    * classic engagement matrix, all-integer: distinct (user, week)
    * activity with the per-user cohort minimum taken as a WINDOW over
    * the same pass (no self-join, one scan), week offsets by exact
    * epoch floor-division. Each user contributes at most one row per
    * (cohort, week_n) group by construction, so the final count is a
    * plain count — no distinct-aggregate expand. */
  private val q77: QFn = (s, d) => {
    val active = t(s, d, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    val wc = Window.partitionBy("user_id")
    active
      .withColumn("cohort", min(col("week")).over(wc))
      .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
        ((unix_seconds(col("week")) - unix_seconds(col("cohort"))) /
          604800L).cast("long").as("week_n"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_n"))
  }
  private val q77Sql = """
    WITH a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week
        FROM events),
    w AS (SELECT user_id, week,
        min(week) OVER (PARTITION BY user_id) AS cohort FROM a)
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
      (epoch_us(week) - epoch_us(cohort)) // 604800000000 AS week_n,
      count(*) AS n_users
    FROM w GROUP BY 1, 2 ORDER BY cohort_week, week_n"""

  /** q79 — inter-event gap distribution: per event_type, the exact
    * median / min / max of the gap (micros) between a user's
    * consecutive events of that type. Lag window per (type, user) —
    * total order guaranteed by (user_id, ts) uniqueness. The median is
    * the SORT-BASED interpolated formulation (row_number over an
    * in-type sort; average the two middle rows): identical values to
    * `percentile`/`quantile_cont` on integer micros, but bounded-state
    * — an exact `percentile` aggregate builds a value→count map per
    * group, and gap_us is near-all-distinct with only ~5 groups, so at
    * corpus scale one reducer would hold O(N/5) map entries; a sort
    * spills gracefully instead. */
  private val q79: QFn = (s, d) => {
    val wl = Window.partitionBy("event_type", "user_id").orderBy("ts")
    val gaps = t(s, d, "events")
      .select(col("event_type"), col("user_id"), col("ts"))
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(wl)))
      .filter(col("gap_us").isNotNull)
    val ws = Window.partitionBy("event_type").orderBy("gap_us")
    val wn = Window.partitionBy("event_type")
    gaps
      .withColumn("rn", row_number().over(ws))
      .withColumn("n", count(lit(1)).over(wn))
      // continuous-quantile positions for q=0.5: k=(n-1)/2 0-based →
      // rows floor(k)+1 and ceil(k)+1 (equal when n is odd); their
      // mean over ≤2 longs is exact in double
      .withColumn("lo", (((col("n") - 1) / 2).cast("long")) + 1)
      .withColumn("hi", (col("n") / 2).cast("long") + 1)
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n_gaps"),
        (sum(when(col("rn") === col("lo") || col("rn") === col("hi"),
          col("gap_us"))).cast("double") /
          sum(when(col("rn") === col("lo") || col("rn") === col("hi"), 1)))
          .as("median_gap_us"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"))
      .orderBy(col("event_type"))
  }
  private val q79Sql = """
    WITH g AS (SELECT event_type,
        epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY event_type,
          user_id ORDER BY ts)) AS gap_us
      FROM events)
    SELECT event_type, count(*) AS n_gaps,
      quantile_cont(gap_us, 0.5) AS median_gap_us,
      min(gap_us) AS min_gap_us, max(gap_us) AS max_gap_us
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY event_type ORDER BY event_type"""

  /** q100 — increments() served from an INCREMENTALLY MAINTAINED rollup:
    * events fold into a minute-grain standing rollup in three disjoint
    * deltas (event_id mod 3 — three "days" of ingest), then an
    * increments(hour, 6) query with per-type count/sum/min/max/avg is
    * answered from the rollup alone. The oracle is the DIRECT full-scan
    * aggregate — equality proves both the incremental maintenance
    * (merge after build-per-delta) and rollup serving are exact, which
    * only holds because the maintained sum is DECIMAL (the q86/q94
    * arithmetic-design lesson: floats would drift under regrouping).
    * At 100 TB this is the difference between scanning history per
    * dashboard refresh and scanning each delta once ([[Rollup]]). */
  private val q100: QFn = (s, d) => {
    val ev = t(s, d, "events")
    val dims = Seq("event_type")
    val roll = (1 until 3).foldLeft(
      Rollup.build(ev.filter(pmod(col("event_id"), lit(3)) === 0),
        "ts", "minute", dims, "value")) { (r, i) =>
      Rollup.refresh(r, ev.filter(pmod(col("event_id"), lit(3)) === i),
        "ts", dims, "value")
    }
    Rollup.serve(roll, "hour", 6, dims)
      .select(col("event_type"),
        date_format(col("bucket_ts"), "yyyy-MM-dd").as("bucket_day"),
        col("bucket_i"), col("n"), col("sum_value"), col("min_value"),
        col("max_value"), col("avg_value"))
      .orderBy(col("event_type"), col("bucket_day"), col("bucket_i"))
  }
  private val q100Sql = """
    SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS bucket_day,
      CAST(FLOOR(EXTRACT(hour FROM ts) / 6) AS BIGINT) AS bucket_i,
      count(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      min(value) AS min_value, max(value) AS max_value,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
    FROM events GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  /** q180 — standing rollup DELETE via targeted re-aggregation: the
    * q100-shaped minute rollup forgets every user_id ≡ 2 (mod 5) row
    * ([[Rollup.deleteRows]] — rollups always carry min/max, so row
    * deletes CROSS the IVM self-maintainability boundary; the repair
    * is the textbook one: recompute ONLY the touched buckets from the
    * post-delete base, splice, leave every untouched bucket alone —
    * base reads stay partition-prunable to the touched time range).
    * Then the same increments(hour, 6) serve as q100. The oracle is
    * the full-scan aggregate over the surviving rows: hash equality
    * proves delete == rebuild for count/sum/min/max/avg TOGETHER —
    * the min/max legs are exactly what subtraction could never give.
    * (`rollup delete where … before =` is the cheaper bucket-aligned
    * retention form; RollupIngestSpec covers it.) */
  private val q180: QFn = (s, d) => {
    val ev = t(s, d, "events")
    val dims = Seq("event_type")
    val roll = Rollup.build(ev, "ts", "minute", dims, "value")
      .localCheckpoint(true)
    val deleted = ev.filter(pmod(col("user_id"), lit(5)) === 2)
    val base = ev.filter(pmod(col("user_id"), lit(5)) =!= 2)
    val after = Rollup.deleteRows(roll, deleted, base, dims,
      Seq("value"))
    Rollup.serve(after, "hour", 6, dims)
      .select(col("event_type"),
        date_format(col("bucket_ts"), "yyyy-MM-dd").as("bucket_day"),
        col("bucket_i"), col("n"), col("sum_value"), col("min_value"),
        col("max_value"), col("avg_value"))
      .orderBy(col("event_type"), col("bucket_day"), col("bucket_i"))
  }
  private val q180Sql = """
    SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS bucket_day,
      CAST(FLOOR(EXTRACT(hour FROM ts) / 6) AS BIGINT) AS bucket_i,
      count(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      min(value) AS min_value, max(value) AS max_value,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
    FROM events WHERE user_id % 5 != 2
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  // =====================================================================
  // q137 — Z-order layout audit: code every event's (user, time-ms) into
  // a 10+10-bit Morton space, bucket into 64 files two ways — Z-order
  // quads (top Morton bits) vs the default time-sorted log layout — and
  // measure what a 2-D box predicate (users [320,447] x time [320,447],
  // quantized) would scan under each layout's zone maps. All integer bit
  // arithmetic: the oracle replays codes, buckets, and zone maps
  // bit-for-bit. The point on 100 TB: the box touches O(box area) quads
  // under Z-order but O(time-selectivity) files under the log layout.
  // =====================================================================

  private val q137: QFn = (s, d) => {
    val ev = t(s, d, "events")
    val base = ev.select(col("user_id").as("u"),
      expr("unix_micros(ts) div 1000").as("tm"))
    val coded = Layout.zorderCode(base, "u", "tm", bits = 10,
      numBuckets = 64)
    val layouts = coded
      .select(col("zq_x"), col("zq_y"), col("zbucket").as("bucket"),
        lit("zorder").as("layout"))
      .unionByName(coded.select(col("zq_x"), col("zq_y"),
        expr("zq_y div 16").as("bucket"), lit("linear").as("layout")))
    val zones = layouts.groupBy("layout", "bucket").agg(
      min("zq_x").as("xm"), max("zq_x").as("xx"),
      min("zq_y").as("ym"), max("zq_y").as("yx"),
      count(lit(1)).as("cnt"))
    val scan = zones.withColumn("hit",
      col("xm") <= 447 && col("xx") >= 320 &&
        col("ym") <= 447 && col("yx") >= 320)
    val agg = scan.groupBy("layout").agg(
      count(lit(1)).as("buckets_total"),
      sum(when(col("hit"), 1L).otherwise(0L)).as("buckets_scanned"),
      sum(when(col("hit"), col("cnt")).otherwise(0L)).as("rows_scanned"))
    val matching = layouts
      .filter(col("zq_x").between(320, 447) &&
        col("zq_y").between(320, 447))
      .groupBy("layout").agg(count(lit(1)).as("rows_matching"))
    agg.join(matching, Seq("layout"), "left")
      .withColumn("rows_matching", coalesce(col("rows_matching"), lit(0L)))
      .orderBy("layout")
  }

  private val q137Sql = s"""
    WITH base AS (SELECT user_id AS u, epoch_us(ts) // 1000 AS tm
      FROM events),
    st AS (SELECT min(u) AS xmin, max(u) AS xmax,
        min(tm) AS ymin, max(tm) AS ymax FROM base),
    q AS (SELECT ((u - xmin) * 1024) // (xmax - xmin + 1) AS zq_x,
        ((tm - ymin) * 1024) // (ymax - ymin + 1) AS zq_y
      FROM base, st),
    zc AS (SELECT zq_x, zq_y,
        ${Layout.mortonSql("zq_x", "zq_y", 10)} AS z FROM q),
    lay AS (SELECT zq_x, zq_y, z // 16384 AS bucket, 'zorder' AS layout
        FROM zc
      UNION ALL SELECT zq_x, zq_y, zq_y // 16 AS bucket, 'linear' AS layout
        FROM zc),
    zones AS (SELECT layout, bucket, min(zq_x) AS xm, max(zq_x) AS xx,
        min(zq_y) AS ym, max(zq_y) AS yx, count(*) AS cnt
      FROM lay GROUP BY 1, 2),
    sc AS (SELECT layout, count(*) AS buckets_total,
        CAST(sum(CASE WHEN xm <= 447 AND xx >= 320 AND ym <= 447
          AND yx >= 320 THEN 1 ELSE 0 END) AS BIGINT) AS buckets_scanned,
        CAST(sum(CASE WHEN xm <= 447 AND xx >= 320 AND ym <= 447
          AND yx >= 320 THEN cnt ELSE 0 END) AS BIGINT) AS rows_scanned
      FROM zones GROUP BY 1),
    mt AS (SELECT layout, count(*) AS rows_matching FROM lay
      WHERE zq_x BETWEEN 320 AND 447 AND zq_y BETWEEN 320 AND 447
      GROUP BY 1)
    SELECT sc.layout, buckets_total, buckets_scanned, rows_scanned,
      coalesce(mt.rows_matching, 0) AS rows_matching
    FROM sc LEFT JOIN mt USING (layout) ORDER BY layout"""

  // =====================================================================
  // q146 — CUSUM drift detection (Page 1954) per event type: the
  // one-sided cumulative-sum statistic over per-minute counts, in the
  // PREFIX-MIN form that makes the sequential recursion
  // C_t = max(0, C_{t-1} + x_t - k) window-parallel:
  // C_t = S_t - min(0, min_{i<=t} S_i) with S_t = Σ(x_i - k). All
  // integer on a x100 lattice (k = floor(100*mean)/100 per type), so
  // the oracle replays the windows bit-for-bit. Output: the 20
  // strongest drift points — the data-monitor alarm the reference's
  // IoT story wants, without order-sensitive float recursions.
  // =====================================================================

  private val q146: QFn = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val m = t(s, d, "events")
      .select(col("event_type").as("etype"),
        expr("unix_micros(ts) div 60000000").as("m"))
      .groupBy("etype", "m").agg(count(lit(1)).as("x"))
    val k = m.groupBy("etype")
      .agg(expr("(sum(x) * 100) div count(1)").as("k100"))
    val w = Window.partitionBy("etype").orderBy("m")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    m.join(broadcast(k), "etype")
      .withColumn("s", sum(col("x") * 100 - col("k100")).over(w))
      .withColumn("cusum",
        col("s") - least(min(col("s")).over(w), lit(0L)))
      .select(col("etype"), col("m"), col("x"), col("cusum"))
      .orderBy(col("cusum").desc, col("etype"), col("m"))
      .limit(20)
  }

  private val q146Sql = """
    WITH m AS (SELECT event_type AS etype, epoch_us(ts) // 60000000 AS m,
        count(*) AS x
      FROM events GROUP BY 1, 2),
    k AS (SELECT etype, (sum(x) * 100) // count(*) AS k100
      FROM m GROUP BY 1),
    sc AS (SELECT m.etype, m.m, m.x,
        CAST(sum(m.x * 100 - k.k100) OVER (PARTITION BY m.etype
          ORDER BY m.m ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS BIGINT) AS s
      FROM m JOIN k USING (etype)),
    cu AS (SELECT etype, m, x,
        s - least(CAST(min(s) OVER (PARTITION BY etype ORDER BY m
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT),
          0) AS cusum
      FROM sc)
    SELECT etype, m, x, cusum FROM cu
    ORDER BY cusum DESC, etype, m LIMIT 20"""

  // =====================================================================
  // q152 — first-order Markov next-event model: per-user transition
  // pairs via ONE lead window, split train/test by the deterministic
  // event_id parity, model = argmax next-type per type (windowless
  // min(struct) — the q130 argmax), accuracy on held-out transitions in
  // ppm. The sequence-model audit of the event stream — all integer,
  // both engines replay the identical windows.
  // =====================================================================

  private val q152: QFn = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val tr = t(s, d, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("etype"))
      .withColumn("next", lead(col("etype"), 1).over(w))
      .filter(col("next").isNotNull)
      .withColumn("is_train", pmod(col("event_id"), lit(2)) === 0)
    val model = tr.filter(col("is_train"))
      .groupBy("etype", "next").agg(count(lit(1)).as("c"))
      .groupBy("etype")
      .agg(min(struct((-col("c")).as("nc"), col("next").as("p")))
        .as("top"))
      .select(col("etype"), col("top.p").as("pred"))
    tr.filter(!col("is_train"))
      .join(broadcast(model), Seq("etype"))
      .groupBy("etype")
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("next") === col("pred"), 1L).otherwise(0L))
          .as("n_correct"))
      .withColumn("acc_ppm", expr("(n_correct * 1000000) div n_test"))
      .orderBy(col("etype"))
  }

  private val q152Sql = """
    WITH tr AS (SELECT event_type AS etype,
        lead(event_type) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS next,
        event_id % 2 = 0 AS is_train
      FROM events),
    tt AS (SELECT * FROM tr WHERE next IS NOT NULL),
    cnt AS (SELECT etype, next, count(*) AS c FROM tt
      WHERE is_train GROUP BY 1, 2),
    model AS (SELECT etype, next AS pred FROM (SELECT etype, next,
        row_number() OVER (PARTITION BY etype ORDER BY c DESC, next)
          AS rn FROM cnt) WHERE rn = 1)
    SELECT t.etype, count(*) AS n_test,
      CAST(sum(CASE WHEN t.next = m.pred THEN 1 ELSE 0 END) AS BIGINT)
        AS n_correct,
      (CAST(sum(CASE WHEN t.next = m.pred THEN 1 ELSE 0 END) AS BIGINT)
        * 1000000) // count(*) AS acc_ppm
    FROM tt t JOIN model m USING (etype)
    WHERE NOT t.is_train
    GROUP BY 1 ORDER BY 1"""

  // =====================================================================
  // q153 — exact 2-D eps-neighborhood join ([[Clustering.epsPairs]] —
  // the spatial self-join primitive under DBSCAN): events on the
  // quantized (value, time) lattice, eps = 4; output = the neighbor-
  // count histogram (how many events sit in dense pockets vs isolation).
  // The join is a grid-cell equi-join (cell side = eps, 3x3 candidate
  // explosion, each qualifying pair produced exactly once) — candidates
  // are local-density-bounded, never N². All integer; the oracle
  // replays cells, pairs, and counts.
  // =====================================================================

  private val q153: QFn = (s, d) => {
    val base = t(s, d, "events").select(col("event_id").as("id"),
      expr("cast(floor(value * 1000) as bigint)").as("v"),
      expr("unix_micros(ts) div 1000").as("tm"))
    val st = base.agg(min("v").as("xmin"), max("v").as("xmax"),
      min("tm").as("ymin"), max("tm").as("ymax"))
    val pts = base.crossJoin(broadcast(st)).select(col("id"),
      expr("((v - xmin) * 1024) div (xmax - xmin + 1)").as("x"),
      expr("((tm - ymin) * 1024) div (ymax - ymin + 1)").as("y"))
    val pairs = Clustering.epsPairs(pts, eps = 4)
    val deg = pairs.select(col("id_a").as("id"))
      .unionByName(pairs.select(col("id_b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("n_neighbors"))
    pts.join(deg, Seq("id"), "left")
      .withColumn("n_neighbors", coalesce(col("n_neighbors"), lit(0L)))
      .groupBy("n_neighbors").agg(count(lit(1)).as("n_events"))
      .orderBy(col("n_neighbors"))
  }

  private val q153Sql = """
    WITH base AS (SELECT event_id AS id,
        CAST(floor(value * 1000) AS BIGINT) AS v,
        epoch_us(ts) // 1000 AS tm FROM events),
    st AS (SELECT min(v) AS xmin, max(v) AS xmax,
        min(tm) AS ymin, max(tm) AS ymax FROM base),
    pt AS MATERIALIZED (SELECT id,
        ((v - xmin) * 1024) // (xmax - xmin + 1) AS x,
        ((tm - ymin) * 1024) // (ymax - ymin + 1) AS y FROM base, st),
    cells AS MATERIALIZED (SELECT id, x, y, x // 4 AS cx, y // 4 AS cy
      FROM pt),
    pairs AS MATERIALIZED (SELECT a.id AS ia, b.id AS ib FROM
      (SELECT c.id, c.x, c.y, c.cx + k.k // 3 - 1 AS cx,
         c.cy + k.k % 3 - 1 AS cy FROM cells c, range(9) k(k)) a
      JOIN cells b ON a.cx = b.cx AND a.cy = b.cy AND a.id < b.id
      WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 16),
    deg AS (SELECT id, count(*) AS n_neighbors FROM
      (SELECT ia AS id FROM pairs UNION ALL SELECT ib AS id FROM pairs)
      GROUP BY 1)
    SELECT coalesce(d.n_neighbors, 0) AS n_neighbors,
      count(*) AS n_events
    FROM pt p LEFT JOIN deg d USING (id)
    GROUP BY 1 ORDER BY 1"""

  // =====================================================================
  // q155 — time-weighted average for IRREGULAR samples (the IoT
  // aggregate a plain avg() gets wrong when sensors report on change,
  // not on schedule): each reading holds until the next one, so
  // TWA = Σ v_i·(t_{i+1}−t_i) / (t_n − t_1) per type — ONE lead window,
  // all integer (values on the ×1000 lattice, µs hold durations, floor
  // division), next to the naive mean it corrects.
  // =====================================================================

  private val q155: QFn = (s, d) => {
    val w = Window.partitionBy("etype").orderBy("tu", "event_id")
    t(s, d, "events")
      .select(col("event_type").as("etype"), col("event_id"),
        unix_micros(col("ts")).as("tu"),
        expr("cast(floor(value * 1000) as bigint)").as("vq"))
      .withColumn("hold", lead(col("tu"), 1).over(w) - col("tu"))
      .groupBy("etype")
      .agg(count(lit(1)).as("n"),
        sum(col("vq") * col("hold")).as("wsum"),
        (max(col("tu")) - min(col("tu"))).as("span"),
        sum(col("vq")).as("vsum"))
      .select(col("etype"), col("n"),
        expr("wsum div span").as("twa_q"),
        expr("vsum div n").as("avg_q"))
      .orderBy(col("etype"))
  }

  private val q155Sql = """
    WITH e AS (SELECT event_type AS etype, event_id,
        epoch_us(ts) AS tu, CAST(floor(value * 1000) AS BIGINT) AS vq
      FROM events),
    h AS (SELECT etype, tu, vq,
        lead(tu) OVER (PARTITION BY etype ORDER BY tu, event_id) - tu
          AS hold FROM e)
    SELECT etype, count(*) AS n,
      CAST(sum(vq * hold) AS BIGINT) // (max(tu) - min(tu)) AS twa_q,
      CAST(sum(vq) AS BIGINT) // count(*) AS avg_q
    FROM h GROUP BY etype ORDER BY etype"""

  // =====================================================================
  // q157 — recency-weighted activity: exponential decay with a 7-day
  // half-life as PURE BIT ARITHMETIC — weight = 2^20 >> (age_days div
  // 7) — so the decayed sums are exact int64 in both engines (the
  // usual exp() decay is order-sensitive float). Per event type: the
  // recency score next to the raw count it re-ranks; per-user top
  // contributor under the same weights via the windowless argmax.
  // =====================================================================

  private val q157: QFn = (s, d) => {
    val ev = t(s, d, "events")
      .select(col("event_type").as("etype"), col("user_id"),
        unix_micros(col("ts")).as("tu"))
    val mx = ev.agg(max(col("tu")).as("mxt"))
    // Clamp the shift at 21: JVM int shifts use `n & 31`, so an
    // unclamped shift of 32+ weeks would WRAP back to full weight
    // (DuckDB's >> saturates to 0 — a silent cross-engine fork on
    // any corpus spanning >= 32 weeks). 2^20 >> 21 is already 0, so
    // clamping at age > 20 weeks is exact, not an approximation.
    ev.crossJoin(broadcast(mx))
      .withColumn("aw", expr("cast((mxt - tu) div 604800000000 as int)"))
      .withColumn("w", expr(
        "case when aw > 20 then 0 else shiftright(1048576, aw) end"))
      .groupBy("etype")
      .agg(count(lit(1)).as("n"), sum(col("w")).as("recency_q"),
        max(struct(col("w").as("ww"), col("user_id").as("u")))
          .getField("u").as("hottest_user"))
      .orderBy(col("etype"))
  }

  private val q157Sql = """
    WITH ev AS (SELECT event_type AS etype, user_id,
        epoch_us(ts) AS tu FROM events),
    mx AS (SELECT max(tu) AS mxt FROM ev),
    wts AS (SELECT etype, user_id,
        CASE WHEN CAST((mxt - tu) // 604800000000 AS INT) > 20 THEN 0
          ELSE 1048576 >> CAST((mxt - tu) // 604800000000 AS INT)
        END AS w
      FROM ev, mx),
    agg AS (SELECT etype, count(*) AS n,
        CAST(sum(w) AS BIGINT) AS recency_q FROM wts GROUP BY 1),
    hot AS (SELECT etype, user_id AS hottest_user FROM (
      SELECT etype, user_id, row_number() OVER (PARTITION BY etype
        ORDER BY w DESC, user_id DESC) AS rn FROM wts) WHERE rn = 1)
    SELECT agg.etype, n, recency_q, hottest_user
    FROM agg JOIN hot USING (etype) ORDER BY agg.etype"""

  // =====================================================================
  // q158 — STANDING Markov transition model: per-user transition counts
  // on the first half of the stream (by event_id parity within the
  // train split) fold the second half by integer addition, then the
  // argmax next-type model serves from the folded artifact alone. The
  // oracle trains over the whole split in one shot: fold == rebuild
  // (transition counts are integer histograms — the q131 NB property,
  // transposed to sequences). NOTE the transitions themselves are
  // computed ONCE over the full ordered stream (a per-batch lead would
  // miss batch-boundary pairs — that composition caveat is the honest
  // difference from the count fold, stated here and in the scaladoc).
  // =====================================================================

  private val q158: QFn = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val tr = t(s, d, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("etype"))
      .withColumn("next", lead(col("etype"), 1).over(w))
      .filter(col("next").isNotNull)
      .filter(pmod(col("event_id"), lit(2)) === 0) // the train split
    def counts(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("etype", "next").agg(count(lit(1)).as("c"))
    // fold two batches of the train transitions by integer addition
    val folded = counts(tr.filter(pmod(col("event_id"), lit(4)) === 0))
      .unionByName(counts(tr.filter(pmod(col("event_id"), lit(4)) =!= 0)))
      .groupBy("etype", "next").agg(sum(col("c")).as("c"))
    folded
      .groupBy("etype")
      .agg(sum(col("c")).as("n_trans"),
        min(struct((-col("c")).as("nc"), col("next").as("p")))
          .as("top"))
      .select(col("etype"), col("n_trans"), col("top.p").as("pred"),
        (-col("top.nc")).as("pred_c"))
      .orderBy(col("etype"))
  }

  private val q158Sql = """
    WITH tr AS (SELECT event_type AS etype,
        lead(event_type) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS next,
        event_id
      FROM events),
    tt AS (SELECT etype, next FROM tr
      WHERE next IS NOT NULL AND event_id % 2 = 0),
    cnt AS (SELECT etype, next, count(*) AS c FROM tt GROUP BY 1, 2),
    top AS (SELECT etype, next AS pred, c AS pred_c FROM (
      SELECT etype, next, c, row_number() OVER (PARTITION BY etype
        ORDER BY c DESC, next) AS rn FROM cnt) WHERE rn = 1),
    agg AS (SELECT etype, CAST(sum(c) AS BIGINT) AS n_trans FROM cnt
      GROUP BY 1)
    SELECT agg.etype, n_trans, pred, pred_c
    FROM agg JOIN top USING (etype) ORDER BY agg.etype"""

  val queries: Map[String, QFn] = Map(
    "q137_zorder_layout" -> q137,
    "q146_cusum_drift" -> q146,
    "q152_markov_accuracy" -> q152,
    "q153_eps_neighborhood" -> q153,
    "q155_time_weighted_avg" -> q155,
    "q157_recency_decay" -> q157,
    "q158_markov_standing_fold" -> q158,
    "q100_rollup_increments" -> q100,
    "q180_rollup_delete" -> q180,
    "q79_interevent_gaps" -> q79,
    "q77_cohort_retention" -> q77,
    "q76_funnel_conversion" -> q76,
    "q66_asof_join" -> q66,
    "q67_range_join_count" -> q67,
    "q71_sessionize_batch" -> q71,
    "q162_session_standing_fold" -> q162,
    "q169_funnel_stages" -> q169,
    "q170_session_overlap" -> q170,
    "q75_rate_anomaly" -> q75)

  val oracles: Map[String, String] = Map(
    "q137_zorder_layout" -> q137Sql,
    "q146_cusum_drift" -> q146Sql,
    "q152_markov_accuracy" -> q152Sql,
    "q153_eps_neighborhood" -> q153Sql,
    "q155_time_weighted_avg" -> q155Sql,
    "q157_recency_decay" -> q157Sql,
    "q158_markov_standing_fold" -> q158Sql,
    "q100_rollup_increments" -> q100Sql,
    "q180_rollup_delete" -> q180Sql,
    "q79_interevent_gaps" -> q79Sql,
    "q77_cohort_retention" -> q77Sql,
    "q76_funnel_conversion" -> q76Sql,
    "q66_asof_join" -> q66Sql,
    "q67_range_join_count" -> q67Sql,
    "q71_sessionize_batch" -> q71Sql,
    "q162_session_standing_fold" -> q162Sql,
    "q169_funnel_stages" -> q169Sql,
    "q170_session_overlap" -> q170Sql,
    "q75_rate_anomaly" -> q75Sql)
}
