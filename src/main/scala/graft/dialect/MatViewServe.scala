package graft.dialect

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.ops.{IndexStore, MatView}

/** Serve a plain GROUP BY dialect query from a REGISTERED standing
  * materialized view ([[graft.ops.MatView]]) — aggregate-rewrite
  * generalizing [[RollupServe]] (which serves `increments()` time
  * buckets) to arbitrary grouping keys. At 100 TB a dashboard's
  * `GROUP BY region` rescans the fact table per refresh; the matview
  * plan re-aggregates a #groups-row artifact.
  *
  * QUALIFICATION IS STRICTLY CONSERVATIVE — `tryServe` returns None
  * (the Engine falls back to the always-correct base plan) unless it
  * can PROVE the state serves exactly:
  *  - GROUP BY: a non-empty subset of the view's recorded keys
  *    (distributivity lets the state re-aggregate to any coarser
  *    grouping); projected keys must be grouped.
  *  - Aggregates: `count(*)` needs a recorded count; `count(x)`
  *    (null-sensitive) needs a recorded `count` over exactly `x`;
  *    `min(x)`/`max(x)` need a recorded min/max over exactly `x`;
  *    `sum(x)` needs the recorded partial `cast(x as decimal(18,2))`
  *    — the dialect's money-sum discipline — so the served decimal
  *    fold is bit-equal to the base plan's; `range(x)` needs both min
  *    and max; `avg(x)` needs BOTH the recorded decimal sum and the
  *    recorded null-sensitive `count(x)` — the serve divides the
  *    re-folded exact decimal sum (cast to double) by the re-folded
  *    non-null count, the IDENTICAL arithmetic the base plan's
  *    sum/count decomposition runs, so served avg is bit-equal
  *    (PERF lesson 16: store (sum, count), divide at serve time; a
  *    recorded count(*) does NOT qualify — it diverges on NULLs).
  *    DISTINCT and `::` casts are NOT served.
  *  - HAVING: served when every identifier in the predicate is an
  *    OUTPUT column of the served projection (group key or agg
  *    alias) — the filter then runs over group rows that are
  *    value-identical to the base plan's, in the same plan position
  *    (post-aggregate, pre-order). Anything else falls back.
  *  - WHERE: absent, or a predicate whose every identifier is a
  *    recorded KEY column (then it filters state rows — group
  *    semantics make that exact); any value-column reference rejects.
  *  - No include= / extend= / committed=true / approx=true /
  *    limit-per / distinct.
  * Output column names and order reproduce the base dialect plan's
  * (alias, or the dialect's default `fn(arg)` name), so serve ==
  * fallback schema-for-schema — proven by `MatViewServeSpec`. */
object MatViewServe {
  final case class Meta(path: String, keys: Seq[String],
      aggs: Seq[MatView.AggSpec])

  private val identRe = "[A-Za-z_][A-Za-z0-9_]*"
  private val aggRe = "(?i)^(count|sum|min|max|range|avg)\\s*\\((.+)\\)$".r

  private val whereKeywords = Set("and", "or", "not", "in", "is",
    "null", "between", "like", "true", "false")

  /** Every identifier in `w` (outside string literals) is a recorded
    * key or a boolean-algebra keyword. */
  private def whereOverKeys(w: String, keys: Set[String]): Boolean = {
    val noStrings = w.replaceAll("'[^']*'", " ")
    identRe.r.findAllIn(noStrings).forall(id =>
      keys.contains(id) || whereKeywords.contains(id.toLowerCase))
  }

  def tryServe(spark: SparkSession, meta: Meta,
      cmd: EdgeSql.Command): Option[DataFrame] = {
    val sel = EdgeSql.parseSelect(cmd.select)
    if (sel.join.nonEmpty) return None // single-table artifact
    servePlan(spark, meta.path, meta.keys, meta.aggs, sel, cmd)
  }

  /** The artifact-agnostic serve planner: qualify `sel` against a
    * recorded (keys, aggs) state at `path` and build the re-aggregation
    * plan, or None. Shared by the single-table matcher above and the
    * join-matview matcher ([[JoinMatViewServe]]) — the state algebra
    * (distributive re-aggregation over a #groups-row artifact) is
    * identical once the FROM shape has been matched by the caller. */
  private[dialect] def servePlan(spark: SparkSession, path: String,
      keys: Seq[String], aggs: Seq[MatView.AggSpec],
      sel: EdgeSql.Select, cmd: EdgeSql.Command): Option[DataFrame] = {
    val meta = Meta(path, keys, aggs)
    if (sel.distinct || sel.limitPer.nonEmpty) return None
    if (cmd.options.contains("include") || cmd.options.contains("extend") ||
        cmd.options.get("committed").contains("true") ||
        cmd.options.get("approx").contains("true")) return None
    val gb = sel.groupBy.map(_.trim)
    if (gb.isEmpty || !gb.forall(meta.keys.contains)) return None
    if (sel.where.exists(w => !whereOverKeys(w, meta.keys.toSet)))
      return None

    def recorded(fn: String, exprTxt: String): Option[MatView.AggSpec] =
      meta.aggs.find(a => a.fn == fn &&
        a.expr.replaceAll("\\s+", "") == exprTxt.replaceAll("\\s+", ""))

    // build (outputName, Column) per projection item; None -> not servable
    val planned = sel.projection.map { item =>
      val raw = item.raw.trim
      if (raw.matches(identRe)) {
        if (!gb.contains(raw)) return None // ungrouped key -> base plan
        Some(Left(item.alias.getOrElse(raw) -> raw))
      } else raw match {
        case aggRe(fn0, arg0) =>
          val (fn, arg) = (fn0.toLowerCase, arg0.trim)
          if (raw.contains("::")) return None
          val name = item.alias.getOrElse(
            s"$fn(${arg.replaceAll("\\s+", "")})".replace("*", "star"))
          val c: Option[Column] = fn match {
            case "count" if arg == "*" =>
              recorded("count", "1").map(a => sum(col(a.alias)))
            case "count" => // null-sensitive count(x): needs the
              // recorded count over exactly x (count(*) diverges on
              // NULLs and never qualifies — expr "1" can't match an
              // identifier arg)
              recorded("count", arg).map(a => sum(col(a.alias)))
            case "sum" =>
              recorded("sum", s"cast($arg as decimal(18,2))")
                .map(a => sum(col(a.alias)).cast(DoubleType))
            case "min" => recorded("min", arg).map(a => min(col(a.alias)))
            case "max" => recorded("max", arg).map(a => max(col(a.alias)))
            case "range" =>
              for (mx <- recorded("max", arg); mn <- recorded("min", arg))
                yield abs(max(col(mx.alias)) - min(col(mn.alias)))
            case "avg" =>
              // EXACTLY the base plan's decomposition: exact decimal
              // sum (re-folded, still exact) cast to double, divided
              // by the re-folded NON-NULL count — bit-equal by IEEE
              // (both operands are value-identical to the base's)
              for (s <- recorded("sum", s"cast($arg as decimal(18,2))");
                   c <- recorded("count", arg))
                yield sum(col(s.alias)).cast(DoubleType) /
                  sum(col(c.alias))
            case _ => None
          }
          c match {
            case Some(column) => Some(Right(name -> column))
            case None => return None
          }
        case _ => return None
      }
    }
    val items = planned.map(_.getOrElse(return None))
    val aggItems = items.collect { case Right((n, c)) => c.as(n) }
    if (aggItems.isEmpty) return None // plain distinct-keys query -> base

    // HAVING serves only when every identifier is an OUTPUT column of
    // this projection (group key or agg name): the served group rows
    // are value-identical to the base plan's, so the same filter in
    // the same position (post-aggregate, pre-order) is exact
    val outNames = items.map {
      case Left((n, _)) => n
      case Right((n, _)) => n
    }.toSet
    if (sel.having.exists(h => !whereOverKeys(h, outNames)))
      return None

    var st = IndexStore.read(spark, meta.path).getOrElse(return None)
      // engine lineage riders (single-table + per-side), never served
      .drop(MatView.WatermarkCol, graft.ops.JoinMatView.WmLeftCol,
        graft.ops.JoinMatView.WmRightCol)
    sel.where.foreach(w => st = st.filter(expr(w)))
    val grouped = st.groupBy(gb.map(col): _*)
      .agg(aggItems.head, aggItems.tail: _*)
    // project in the query's column order under the base plan's names
    var out = grouped.select(items.map {
      case Left((name, key)) => col(key).as(name)
      case Right((name, _)) => col(name)
    }: _*)
    sel.having.foreach(h => out = out.filter(expr(h)))
    if (sel.orderBy.nonEmpty)
      out = out.orderBy(sel.orderBy.map { case (e, desc) =>
        if (desc) col(e).desc else col(e).asc
      }: _*)
    sel.limit.foreach(n => out = out.limit(n))
    Some(out)
  }
}
