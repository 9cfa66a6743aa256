package graft.dialect

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EdgeLake `period(unit, n, anchor, ts [, filter])` — anchored trailing
  * window (dbms/unify_results.py:695-770).
  *
  * Semantics (unify_results.py:797-834): find mx = max(ts) among rows with
  * ts <= anchor (and matching the optional filter), then return rows with
  * ts in the half-open-below window (mx - n*unit, mx] — strict `>` lower
  * bound, inclusive upper. The optional filter restricts both the anchor
  * search and the returned rows.
  *
  * Implementation mirrors the reference's two-phase "leading query"
  * (utils_sql.py:900-933, job/leading_query.py): phase 1 is a tiny
  * all-partial max aggregation (collects ONE row to the driver — constant
  * cost at any scale); phase 2 is a plain pushed-down range filter, so the
  * main scan prunes partitions/row-groups on ts like any other predicate.
  */
object Period {
  private val unitSeconds: Map[String, Long] = Map(
    "second" -> 1L, "minute" -> 60L, "hour" -> 3600L, "day" -> 86400L,
    "week" -> 604800L)

  def apply(df: DataFrame, tsCol: String, anchor: String, unit: String,
      n: Int, filter: Option[Column]): DataFrame = {
    require(n >= 1, "period n must be >= 1")
    val base = filter.map(df.filter).getOrElse(df)
    val anchored = base.filter(col(tsCol) <= lit(anchor))
    val mxRow = anchored.agg(max(col(tsCol))).head()
    if (mxRow.isNullAt(0)) {
      // No row at-or-before the anchor: empty window (reference returns
      // no rows in this case).
      base.filter(lit(false))
    } else {
      val mx = lit(mxRow.getTimestamp(0))
      val span = unitSeconds.getOrElse(unit,
        throw new IllegalArgumentException(s"unknown period unit $unit"))
      val loBound = mx - expr(s"INTERVAL ${span * n} SECOND")
      base.filter(col(tsCol) > loBound && col(tsCol) <= mx)
    }
  }
}
