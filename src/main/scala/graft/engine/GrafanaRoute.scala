package graft.engine

import org.apache.spark.sql.DataFrame

/** Grafana JSON-datasource route — translates a panel payload into a
  * dialect command and runs it (the reference's api/al_grafana.py:
  * `range` parsing :140-153, request types query/increments/period
  * :288-291, auto-detection :343-370, time_range pushdown :416).
  */
object GrafanaRoute {

  /** Payload model (the SimpleJson-datasource shape the reference
    * consumes): time range + one target. `functions` is the panel's
    * aggregate override (al_grafana.py:385-389) — when present it
    * replaces the default min/max/avg/count set in increments/period
    * statements with `<f>(value) as <f>_val` columns plus the
    * `max(ts) as timestamp` axis (the reference's
    * get_increments_timeseries_stmt / get_period_timeseries_stmt
    * functions branch). */
  final case class Request(
      fromTs: String, toTs: String,
      dbms: String, table: String,
      requestType: String, // "query" | "increments" | "period"
      sql: Option[String], // raw SQL for request_type=query
      tsColumn: String = "ts",
      valueColumn: String = "value",
      dataPoints: Int = 1000,
      timeRange: Boolean = true,
      functions: Option[Seq[String]] = None)

  /** The validated aggregate set (al_grafana.py:50 aggregation_func_). */
  private val AllowedFunctions = Set("count", "avg", "min", "max")

  def parse(json: String): Request = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val root = JsonMethods.parse(json)
    def iso(p: String): String =
      (root \ "range" \ p).extract[String]
        .replace("T", " ").takeWhile(_ != '.').take(19)
    val tgt = (root \ "targets") match {
      case JArray(t :: _) => t
      case other => other
    }
    val payload = tgt \ "payload"
    Request(
      fromTs = iso("from"), toTs = iso("to"),
      dbms = (payload \ "dbms").extractOpt[String].getOrElse("edge"),
      table = (tgt \ "target").extractOpt[String].getOrElse("events"),
      requestType = (payload \ "type").extractOpt[String]
        .getOrElse("increments"),
      sql = (payload \ "sql").extractOpt[String],
      tsColumn = (payload \ "time_column").extractOpt[String].getOrElse("ts"),
      valueColumn = (payload \ "value_column").extractOpt[String]
        .getOrElse("value"),
      dataPoints = (root \ "maxDataPoints").extractOpt[Int].getOrElse(1000),
      timeRange = (payload \ "time_range").extractOpt[Boolean]
        .getOrElse(true),
      functions = ((payload \ "functions") match {
        case JArray(fs) => Some(fs.collect { case JString(f) =>
          f.toLowerCase })
        case _ => None
      }).filter(_.nonEmpty).map { fs =>
        // reject typos loudly (the reference's aggregations-path
        // validation, al_grafana.py:437-442) instead of compiling a
        // panel that fails later in the dialect
        val bad = fs.filterNot(AllowedFunctions)
        require(bad.isEmpty, s"functions override: ${bad.mkString(",")} " +
          s"not in ${AllowedFunctions.toSeq.sorted.mkString("/")}")
        fs
      })
  }

  /** The functions-override SELECT list: the time axis + one
    * `<f>(value) as <f>_val` per requested aggregate. */
  private def overrideCols(r: Request): String =
    s"max(${r.tsColumn}) as timestamp, " +
      r.functions.get.map(f =>
        s"$f(${r.valueColumn}) as ${f}_val").mkString(", ")

  /** Positions of `needle` in `s` (both lowercased by the caller)
    * that sit at paren depth 0 and OUTSIDE single-quoted literals —
    * the only places a spliced range filter belongs. */
  private def depth0Positions(s: String, needle: String): Seq[Int] = {
    val out = Seq.newBuilder[Int]
    var depth = 0
    var inQuote = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuote) { if (c == '\'') inQuote = false }
      else c match {
        case '\'' => inQuote = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && s.startsWith(needle, i)) out += i
      }
      i += 1
    }
    out.result()
  }

  /** Splice the range predicate into the panel SQL at TOP level:
    * plain index arithmetic (never a regex replacement — a `$` in a
    * column name must not become a group reference), whitespace
    * normalized so newline-delimited panel SQL still finds its
    * clauses, and paren-depth-0 matching so a subquery's WHERE is
    * never mistaken for the outer one. */
  private def spliceRange(base0: String, range: String): String = {
    // newlines/tabs -> spaces: clause detection is single-space based
    val base = base0.map(c =>
      if (c == '\n' || c == '\r' || c == '\t') ' ' else c)
    val lower = base.toLowerCase
    depth0Positions(lower, " where ").headOption match {
      case Some(i) =>
        val at = i + " where ".length
        base.substring(0, at) + range + " and " + base.substring(at)
      case None =>
        val cut = Seq(" group by ", " order by ", " limit ")
          .flatMap(k => depth0Positions(lower, k).headOption)
          .minOption
        cut match {
          case Some(i) =>
            base.substring(0, i) + s" where $range" + base.substring(i)
          case None => base + s" where $range"
        }
    }
  }

  /** period() geometry from the panel's own range: the trailing
    * window anchored at `to` must COVER [from, to] — the reference
    * derives unit/count from the panel interval the same way
    * (al_grafana.py:108-115); the old hardcoded period(minute, 1)
    * silently showed one minute of data whatever range was picked. */
  private def periodSpec(r: Request): String = {
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
    val sec = java.time.Duration.between(
      java.time.LocalDateTime.parse(r.fromTs, fmt),
      java.time.LocalDateTime.parse(r.toTs, fmt)).getSeconds.max(60L)
    val (unit, n) =
      if (sec >= 86400) ("day", (sec + 86399) / 86400)
      else if (sec >= 3600) ("hour", (sec + 3599) / 3600)
      else ("minute", (sec + 59) / 60)
    s"period($unit, $n, '${r.toTs}', ${r.tsColumn})"
  }

  /** Build the dialect command for a request (the reference splices
    * increments()/period() into the SQL the same way). */
  def toCommand(r: Request): String = {
    val range =
      s"${r.tsColumn} >= '${r.fromTs}' and ${r.tsColumn} < '${r.toTs}'"
    r.requestType match {
      case "query" =>
        val base = r.sql.getOrElse(
          s"select * from ${r.table}")
        val withRange =
          if (!r.timeRange) base else spliceRange(base, range)
        s"""sql ${r.dbms} "$withRange""""
      case "increments" if r.functions.nonEmpty =>
        s"""sql ${r.dbms} "select increments(${r.dataPoints}, ${r.tsColumn}), """ +
          overrideCols(r) + s" from ${r.table} where $range\""
      case "increments" =>
        s"""sql ${r.dbms} "select increments(${r.dataPoints}, ${r.tsColumn}), """ +
          s"min(${r.valueColumn}) as min_value, " +
          s"max(${r.valueColumn}) as max_value, " +
          s"avg(${r.valueColumn}) as avg_value, count(*) as n " +
          s"from ${r.table} where $range\""
      case "period" if r.functions.nonEmpty =>
        s"""sql ${r.dbms} "select """ + overrideCols(r) +
          s" from ${r.table} where ${periodSpec(r)}\""
      case "period" =>
        s"""sql ${r.dbms} "select * from ${r.table} where """ +
          periodSpec(r) + "\""
      case other =>
        throw new IllegalArgumentException(s"request type $other")
    }
  }

  /** End-to-end: payload JSON -> DataFrame. */
  def run(engine: Engine, payloadJson: String): DataFrame =
    engine.query(toCommand(parse(payloadJson)))
}
