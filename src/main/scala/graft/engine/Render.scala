package graft.engine

import org.apache.spark.sql.DataFrame

/** Output rendering — the reference's OutputManager surface
  * (/root/reference/edge_lake/generic/output_data.py:35-128; formats
  * `json`, `json:output` rows, `json:list`, `table`
  * cmd/member_cmd.py:136-141; stat footer output_data.py:636).
  *
  * Rendering collects ONLY what it prints — callers cap rows before
  * rendering (`limit`); nothing here pulls an unbounded result to the
  * driver.
  */
object Render {

  /** One JSON string literal, fully escaped (backslash, quote, and
    * ALL control chars) — the single helper every hand-assembled JSON
    * body in the engine goes through, so a quote or newline in a
    * user-supplied name can never truncate or corrupt an output
    * (three divergent partial escapers predated this; see the r14
    * review). */
  def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Error reply as actual JSON — the REST routes declare
    * application/json, so the body must parse as JSON. */
  def errorJson(msg: String): String = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    JsonMethods.compact(JsonMethods.render(
      "error" -> Option(msg).getOrElse("")))
  }

  /** `format=json` — {"Query": [ {col: value, ...}, ... ]}. */
  def json(df: DataFrame, maxRows: Int = 10000): String = {
    val rows = df.limit(maxRows).toJSON.collect()
    rows.mkString("{\"Query\": [", ",", "]}")
  }

  /** `format=json:output` — bare JSON array of row objects
    * (output_data.py "json:output" = rows only). */
  def jsonOutput(df: DataFrame, maxRows: Int = 10000): String =
    df.limit(maxRows).toJSON.collect().mkString("[", ",", "]")

  /** `format=json:list` — one JSON object per line. */
  def jsonList(df: DataFrame, maxRows: Int = 10000): String =
    df.limit(maxRows).toJSON.collect().mkString("\n")

  /** `format=table` — fixed-width ASCII table like the reference CLI. */
  def table(df: DataFrame, maxRows: Int = 10000): String = {
    val cols = df.columns
    val data = df.limit(maxRows).collect()
      .map(_.toSeq.map(v => if (v == null) "" else v.toString))
    val widths = cols.indices.map { i =>
      (cols(i).length +: data.map(_(i).length)).max
    }
    def line(vals: Seq[String]): String =
      vals.zip(widths).map { case (v, w) => v.padTo(w, ' ') }
        .mkString("| ", " | ", " |")
    val sep = widths.map("-" * _).mkString("+-", "-+-", "-+")
    (Seq(sep, line(cols.toSeq), sep) ++ data.map(l => line(l)) :+ sep)
      .mkString("\n")
  }

  /** `stat=true` footer: row count + elapsed time
    * (output_data.py:636 output_test_footer shape). */
  def withStat(df: DataFrame, render: DataFrame => String): String = {
    val t0 = System.nanoTime()
    val body = render(df)
    val rows = df.count()
    val secs = (System.nanoTime() - t0) / 1e9
    f"$body%s%n{\"Statistics\":[{\"Count\": $rows%d, \"Time\":\"$secs%.2f seconds\"}]}"
  }
}
