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
          if (!r.timeRange) base
          else if (base.toLowerCase.contains(" where "))
            base.replaceFirst("(?i) where ", s" where $range and ")
          else {
            // insert before group/order/limit if present
            val lower = base.toLowerCase
            val cut = Seq(" group by ", " order by ", " limit ")
              .map(lower.indexOf).filter(_ >= 0).sorted.headOption
            cut match {
              case Some(i) =>
                base.substring(0, i) + s" where $range" + base.substring(i)
              case None => base + s" where $range"
            }
          }
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
          s" from ${r.table} where " +
          s"period(minute, 1, '${r.toTs}', ${r.tsColumn})\""
      case "period" =>
        s"""sql ${r.dbms} "select * from ${r.table} where """ +
          s"period(minute, 1, '${r.toTs}', ${r.tsColumn})\""
      case other =>
        throw new IllegalArgumentException(s"request type $other")
    }
  }

  /** End-to-end: payload JSON -> DataFrame. */
  def run(engine: Engine, payloadJson: String): DataFrame =
    engine.query(toCommand(parse(payloadJson)))
}
