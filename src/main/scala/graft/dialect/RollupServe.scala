package graft.dialect

import java.time.LocalDateTime

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.ops.{IndexStore, Rollup}

/** Serve a dialect `increments()` query from a REGISTERED standing
  * rollup instead of the base table — materialized-view matching for the
  * one query family a time-series engine answers constantly. At 100 TB
  * the base plan rescans event history per dashboard refresh; the rollup
  * plan reads ~10^5 bucket rows. The reference has no such rewrite (its
  * remote nodes rescan partitions per query); this is the Spark-native
  * value-add the [[graft.ops.Rollup]] scaladoc promises.
  *
  * QUALIFICATION IS STRICTLY CONSERVATIVE — `tryServe` returns None (and
  * the Engine falls back to the base plan, which is always correct) on
  * ANYTHING it cannot prove serves exactly:
  *  - one `increments(unit, n, ts)` projection (auto-sized forms
  *    resolve first), `ts` = the rollup's time column, `unit` at least
  *    as coarse as the rollup grain;
  *  - every aggregate ∈ count(*) / count(v) / sum(v) / min(v) / max(v) /
  *    avg(v) / range(v) with `v` the rollup's value column, no `::`
  *    casts, no DISTINCT;
  *  - plain projections / GROUP BY refs only over the rollup's dims;
  *  - WHERE absent, or a pure conjunction of `ts >= 'lit'` / `ts < 'lit'`
  *    bounds whose literals sit ON grain boundaries (`>` or `<=` or an
  *    unaligned literal would include/exclude a partial bucket the
  *    rollup cannot split — rejected);
  *  - no include= / extend= / committed=true / limit-per options.
  *
  * The served frame reproduces the dialect path's schema EXACTLY (same
  * bucket-column names and formats, same aggregate aliases and types):
  * count(*) re-aggregates as sum(n) (LongType, like count), sum as
  * sum(sum_dec_m) cast double (decimal partials are order-exact — the
  * same arithmetic-design argument as q100's oracle), avg as exact-sum /
  * sum(nv_m), min/max/range fold. `RollupServeSpec` proves equality
  * name-for-name and value-for-value against the base dialect plan, and
  * that the served plan never touches the base table's files.
  */
object RollupServe {

  /** A registered rollup: the standing artifact at `path` (an
    * [[IndexStore]] dir maintained by [[Rollup.refreshStore]]) built
    * over `tsCol` with `dims` and `valueCols` measures, at `grain`. */
  final case class Meta(path: String, tsCol: String, grain: String,
      dims: Seq[String], valueCols: Seq[String])

  private def isIdent(s: String): Boolean =
    s.matches("[A-Za-z_][A-Za-z0-9_]*")

  /** Truncate to a grain boundary (the dialect units). */
  private def truncated(t: LocalDateTime, grain: String): LocalDateTime =
    grain match {
      case "second" => t.withNano(0)
      case "minute" => t.withNano(0).withSecond(0)
      case "hour" => t.withNano(0).withSecond(0).withMinute(0)
      case "day" => t.toLocalDate.atStartOfDay
      case "month" => t.toLocalDate.withDayOfMonth(1).atStartOfDay
      case "year" => t.toLocalDate.withDayOfYear(1).atStartOfDay
      case _ => t.minusNanos(1) // unknown grain: never "aligned"
    }

  /** The WHERE serves iff it is a pure conjunction of (a) `ts >= 'lit'` /
    * `ts < 'lit'` bounds whose literals sit ON grain boundaries (`>` or
    * `<=` or an unaligned literal cuts INSIDE a bucket — a `>` lower
    * excludes the boundary instant but not the rest of its bucket) and
    * (b) `dim = / != / <> literal` predicates over the rollup's dims
    * (dims are group keys, so key filters commute with the
    * re-aggregation and apply verbatim to bucket rows). Anything left
    * after stripping those conjuncts and the ANDs disqualifies. */
  private def servableWhere(where: String, tsCol: String, grain: String,
      dims: Seq[String]): Boolean = {
    val tsRx = ("(?i)\\b" + java.util.regex.Pattern.quote(tsCol) +
      "\\s*(>=|<=|<|>)\\s*'([^']+)'").r
    def parse(s: String): Option[LocalDateTime] =
      try Some(
        if (s.matches("\\d{4}-\\d{2}-\\d{2}"))
          java.time.LocalDate.parse(s).atStartOfDay
        else LocalDateTime.parse(s.replace(' ', 'T')))
      catch { case _: Exception => None }
    var ok = true
    tsRx.findAllMatchIn(where).foreach { m =>
      val aligned = parse(m.group(2)).exists(t => truncated(t, grain) == t)
      m.group(1) match {
        case ">=" | "<" => ok &&= aligned
        case _ => ok = false
      }
    }
    if (!ok) return false
    var residual = tsRx.replaceAllIn(where, " ")
    if (dims.nonEmpty) {
      val dimRx = ("(?i)\\b(" +
        dims.map(java.util.regex.Pattern.quote).mkString("|") +
        ")\\s*(=|!=|<>)\\s*('[^']*'|-?\\d+(\\.\\d+)?)").r
      residual = dimRx.replaceAllIn(residual, " ")
    }
    residual.replaceAll("(?i)\\band\\b", " ").trim.isEmpty
  }

  /** Attempt the rewrite. None = not qualified; the caller falls back. */
  def tryServe(spark: SparkSession, meta: Meta, cmd: EdgeSql.Command)
      : Option[DataFrame] = {
    val disqualifyingOpts =
      Seq("include", "extend", "committed", "distinct")
    if (disqualifyingOpts.exists(cmd.options.contains)) return None
    val sel =
      try EdgeSql.parseSelect(cmd.select)
      catch { case _: Exception => return None }
    if (sel.distinct || sel.limitPer.nonEmpty) return None
    if (sel.join.nonEmpty) return None // single-table artifact
    if (sel.where.exists(_.toLowerCase.contains("period"))) return None

    val tz = cmd.options.get("timezone")
    val whereNorm = sel.where.map { w =>
      val folded = DateLiterals.rewrite(w)
      tz.map(z => DateLiterals.localizeLiterals(folded, z)).getOrElse(folded)
    }
    whereNorm.foreach { w =>
      if (!servableWhere(w, meta.tsCol, meta.grain, meta.dims)) return None
    }

    // ---- classify the projection exactly like compileSelect; keys
    // keep projection order (the dialect's output column order) ----
    var keyCols = Seq.empty[Column]
    var dimCols = Seq.empty[String]
    var aggCols = Seq.empty[Column]
    var sawIncrements = false

    sel.projection.foreach { item =>
      val raw = item.raw
      if (raw.contains("::")) return None
      EdgeSql.functionName(raw) match {
        case Some("increments") =>
          if (sawIncrements) return None
          val args = EdgeSql.splitTopLevel(EdgeSql.argsOf(raw), ',')
            .map(_.trim)
          def autoSize(c: String, points: Int): (String, Int, String) =
            whereNorm.flatMap(w => EdgeSql.timeBounds(w, c)) match {
              case Some((lo, hi)) =>
                val (u, n) = Increments.resolve(lo, hi, points)
                (u, n, c)
              case None => ("hour", 1, c)
            }
          val (unit0, n0, tsCol) = args match {
            case Seq(u, nn, c) if nn.forall(_.isDigit) => (u, nn.toInt, c)
            case Seq(p, c) if p.forall(_.isDigit) => autoSize(c, p.toInt)
            case Seq(c) => autoSize(c, 1000)
            case _ => return None
          }
          val (unit, n) =
            if (unit0 == "week") ("day", n0 * 7) else (unit0, n0)
          if (tsCol != meta.tsCol) return None
          if (!Seq("second", "minute", "hour", "day", "month", "year")
              .contains(unit)) return None
          if (Increments.unitSeconds(unit) <
              Increments.unitSeconds(meta.grain)) return None
          val ts = col(meta.tsCol)
          keyCols ++=
            (if (unit == "year") Seq(
              (floor(year(ts) / n) * n).cast("int").as("year_bucket"))
            else Seq(
              date_format(date_trunc(Increments.parentUnit(unit), ts),
                EdgeSql.bucketFormat(Increments.parentUnit(unit)))
                .as(s"${unit}_parent"),
              floor(Increments.extractUnit(unit, ts) / n)
                .as(s"${unit}_bucket")))
          sawIncrements = true
        case Some(f) if EdgeSql.aggFns(f) =>
          val arg = EdgeSql.argsOf(raw).trim
          val alias = item.alias.getOrElse(
            s"$f(${arg.replaceAll("\\s+", "")})".replace("*", "star"))
          val isM = meta.valueCols.contains(arg)
          val served: Column = (f, arg) match {
            case ("count", "*") => sum(col("n"))
            case ("count", m) if isM => sum(col(s"nv_$m"))
            case ("sum", m) if isM => sum(col(s"sum_dec_$m")).cast(DoubleType)
            case ("min", m) if isM => min(col(s"min_$m"))
            case ("max", m) if isM => max(col(s"max_$m"))
            case ("avg", m) if isM =>
              sum(col(s"sum_dec_$m")).cast(DoubleType) / sum(col(s"nv_$m"))
            case ("range", m) if isM =>
              abs(max(col(s"max_$m")) - min(col(s"min_$m")))
            case _ => return None
          }
          aggCols :+= served.as(alias)
        case None if isIdent(raw.trim) && meta.dims.contains(raw.trim) &&
            item.alias.isEmpty =>
          dimCols :+= raw.trim
          keyCols :+= col(raw.trim)
        case _ => return None
      }
    }
    if (!sawIncrements || aggCols.isEmpty) return None
    if (!sel.groupBy.map(_.trim).forall(g =>
        dimCols.contains(g) || meta.dims.contains(g))) return None
    val extraGroup = sel.groupBy.map(_.trim)
      .filter(g => !dimCols.contains(g))

    // ---- the served plan ----
    val stored = IndexStore.read(spark, meta.path).getOrElse(return None)
    if (!meta.valueCols.forall(m =>
        stored.columns.contains(s"nv_$m"))) return None // stale artifact
    if (Rollup.grainOf(stored) != meta.grain) return None
    var df = stored.withColumnRenamed("grain_ts", meta.tsCol)
    whereNorm.foreach(w => df = df.filter(expr(w)))
    val keys = keyCols ++ extraGroup.distinct.map(col)
    var out = df.groupBy(keys: _*).agg(aggCols.head, aggCols.tail: _*)
    val servedNames = out.columns.toSet
    // HAVING: servable only over the served OUTPUT columns (the
    // MatViewServe rule) — the group rows are value-identical to the
    // base plan's, so the same filter in the same position is exact.
    // Anything else (or a non-identifier function name) declines:
    // serving while IGNORING a HAVING clause would be silently wrong.
    sel.having.foreach { h =>
      val ident = "[A-Za-z_][A-Za-z0-9_]*".r
      val kw = Set("and", "or", "not", "in", "is", "null", "between",
        "like", "true", "false")
      if (!ident.findAllIn(h.replaceAll("'[^']*'", " ")).forall(id =>
          servedNames.contains(id) || kw.contains(id.toLowerCase)))
        return None
      out = out.filter(expr(h))
    }
    if (sel.orderBy.nonEmpty) {
      if (!sel.orderBy.forall { case (e, _) => servedNames.contains(e.trim) })
        return None
      out = out.orderBy(sel.orderBy.map { case (e, desc) =>
        if (desc) col(e.trim).desc else col(e.trim).asc }: _*)
    }
    sel.limit.foreach(l => out = out.limit(l))
    Some(out)
  }
}
