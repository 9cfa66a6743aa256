package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declarative ingest mapping policies compiled to Column expressions —
  * the one genuinely custom ingest piece (SURVEY §2.8).
  *
  * Reference (/root/reference/edge_lake/json_to_sql/mapping_policy.py):
  * a policy maps an arriving JSON document to table rows: per-column
  * `bring` path expressions over the doc (:152-535), a `readings` array
  * fanned out to one row per element (:283 `process_event`), regex
  * extraction (:1153), python `if` conditions (:747) and defaults. The
  * reference evals python per value; we compile the whole policy ONCE to
  * Catalyst expressions (`get_json_object`, `from_json` + `explode`,
  * `regexp_extract`, `coalesce`, `filter`) so ingest mapping runs inside
  * codegen at full scan speed — no per-row interpreter.
  */
object MappingPolicy {

  /** One output column: JSON path (reference `bring "[a][b]"` syntax),
    * target type (EdgeLake DDL names), optional regex (group 1 kept),
    * optional default when the path is missing. */
  final case class ColumnSpec(
      name: String,
      dtype: String,
      bring: String,
      regex: Option[String] = None,
      default: Option[String] = None)

  /** A mapping policy: target table, optional readings-array path,
    * per-column specs, optional row filter (SQL over mapped columns —
    * replaces the reference's python `if` conditions). */
  final case class Policy(
      dbms: String,
      table: String,
      readings: Option[String],
      columns: Seq[ColumnSpec],
      condition: Option[String] = None)

  /** Parse the reference's JSON policy shape:
    * {"mapping": {"dbms":..., "table":..., "readings":...,
    *   "schema": {col: {"type":..., "bring":..., "default":...}}}} */
  def fromJson(json: String): Policy = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val root = JsonMethods.parse(json)
    val m = (root \ "mapping")
    val schema = (m \ "schema") match {
      case JObject(fields) => fields.map { case (name, spec) =>
        ColumnSpec(
          name = name,
          dtype = (spec \ "type").extractOpt[String].getOrElse("varchar"),
          bring = (spec \ "bring").extractOpt[String].getOrElse(s"[$name]"),
          regex = (spec \ "regex").extractOpt[String],
          default = (spec \ "default").extractOpt[String])
      }
      case _ => Nil
    }
    Policy(
      dbms = (m \ "dbms").extractOpt[String].getOrElse("default"),
      table = (m \ "table").extractOpt[String].getOrElse("default"),
      readings = (m \ "readings").extractOpt[String],
      columns = schema,
      condition = (m \ "condition").extractOpt[String])
  }

  /** `[a][b]` -> Seq("a","b"). */
  private[ingest] def pathSegments(bring: String): Seq[String] =
    "\\[([^\\]]+)\\]".r.findAllMatchIn(bring).map(_.group(1)).toSeq

  private def sparkType(dtype: String): DataType =
    dtype.toLowerCase.takeWhile(_ != '(') match {
      case "int" => IntegerType
      case "bigint" => LongType
      case "float" | "decimal" | "double" => DoubleType
      case "bool" | "boolean" => BooleanType
      case "timestamp" => TimestampType
      case "date" => DateType
      case _ => StringType
    }

  /** Compile the policy over a DataFrame holding raw JSON documents in
    * `jsonCol`. Returns one row per document (or per readings element),
    * columns per spec, filtered by the policy condition. */
  def compile(policy: Policy, df: DataFrame, jsonCol: String = "value")
      : DataFrame = {
    val doc = col(jsonCol)

    // readings fan-out: parse the array once with an all-string struct
    // (Jackson renders any JSON value to text for StringType fields),
    // then explode — one shuffle-free generator, not a per-row loop
    val (base, readingCol): (DataFrame, Option[Column]) =
      policy.readings match {
        case Some(path) =>
          val fields = policy.columns
            .map(c => pathSegments(c.bring).headOption.getOrElse(c.name))
            .distinct
          val elem = StructType(fields.map(StructField(_, StringType)))
          val arr = from_json(get_json_object(doc, s"$$.$path"),
            ArrayType(elem))
          val b = df.withColumn("__reading", explode(arr))
          (b, Some(col("__reading")))
        case None => (df, None)
      }

    val outCols = policy.columns.map { spec =>
      val segs = pathSegments(spec.bring)
      val raw: Column = (readingCol, segs) match {
        case (Some(r), Seq(one)) => r.getField(one)
        case (Some(r), head +: tail) =>
          // nested path under a reading: re-extract from the element text
          get_json_object(r.getField(head), "$." + tail.mkString("."))
        case (None, s) if s.nonEmpty =>
          get_json_object(doc, "$." + s.mkString("."))
        case _ => lit(null).cast(StringType)
      }
      val extracted = spec.regex match {
        case Some(rx) =>
          // regexp_extract yields '' (not NULL) on no-match, which would
          // defeat the coalesce default below and cast to NULL for
          // numeric/timestamp targets — normalize no-match to NULL
          val e = regexp_extract(raw, rx, 1)
          when(length(e) === 0, lit(null).cast(StringType)).otherwise(e)
        case None => raw
      }
      val defaulted = spec.default match {
        case Some(d) =>
          val dl = if (d == "now()") date_format(current_timestamp(),
            "yyyy-MM-dd HH:mm:ss") else lit(d)
          coalesce(extracted, dl)
        case None => extracted
      }
      defaulted.cast(sparkType(spec.dtype)).as(spec.name)
    }

    val projected = base.select(outCols: _*)
    policy.condition.map(c => projected.filter(expr(c))).getOrElse(projected)
  }
}
