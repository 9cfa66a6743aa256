package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming-side operators (work identically on batch DataFrames and
  * Structured Streaming DataFrames — all are plain declarative
  * transforms).
  *
  * Reference mapping (/root/reference):
  *  - streaming conditions `generic/streaming_conditions.py:31`
  *    (`set_streaming_condition` / `:291 apply_conditions`): per-table
  *    `if <cond> then <action>` rules applied to arriving rows.
  *  - data monitor `cmd/data_monitor.py:43-116`: in-memory tumbling
  *    intervals keeping Min/Max/Sum/Count per table, with threshold
  *    alerts (:398-466). Interval count was capped at 100 in-memory; with
  *    a watermark Spark bounds the state the same way.
  *  - ingest buffering `generic/streaming_data.py:29-32`: 60 s / 10 KB
  *    flush thresholds -> micro-batch trigger interval (applied at the
  *    writeStream site, see StreamIngest).
  */
object StreamOps {

  sealed trait Action
  /** Drop matching rows before they reach storage. */
  case object Drop extends Action
  /** Keep the row but emit it on the alert stream tagged with `tag`. */
  final case class Alert(tag: String) extends Action

  final case class Condition(whenSql: String, action: Action)

  /** Apply streaming conditions: returns (rows to store, alert rows).
    * Alert rows carry an `alert_tag` column. Both outputs are plain
    * filters — fully pushdown-friendly, no state. */
  def applyConditions(df: DataFrame, conds: Seq[Condition])
      : (DataFrame, DataFrame) = {
    val dropPred = conds.collect { case Condition(w, Drop) => expr(w) }
      .reduceOption(_ || _).getOrElse(lit(false))
    // null-safe negation: a NULL predicate (e.g. `value > 100` on a NULL
    // value) means "matched no Drop rule" -> KEEP the row. Plain
    // !NULL = NULL would silently drop it at ingest.
    val kept = df.filter(!coalesce(dropPred, lit(false)))
    val alerts = conds.collect { case Condition(w, Alert(tag)) =>
      // NULL alert predicate = no alert, explicitly
      df.filter(coalesce(expr(w), lit(false))).withColumn("alert_tag", lit(tag))
    } match {
      case Nil => df.filter(lit(false)).withColumn("alert_tag", lit(""))
      case seq => seq.reduce(_.unionByName(_))
    }
    (kept, alerts)
  }

  /** Session windows (absent in the reference — SURVEY §2.8 "free if
    * wanted"): group events into gap-separated sessions per key. Works on
    * batch and streams (add a watermark upstream for streaming). */
  def sessionize(df: DataFrame, tsCol: String, keyCol: String,
      gapSeconds: Int): DataFrame =
    df.groupBy(session_window(col(tsCol), s"$gapSeconds seconds")
        .as("session"), col(keyCol))
      .agg(count(lit(1)).as("n_events"))

  /** Data-monitor aggregation: tumbling `intervalSec`-second windows per
    * key with min/max/sum/count and a derived alert flag. On a stream,
    * add `withWatermark(tsCol, ...)` upstream (the reference keeps the
    * last N intervals in memory; the watermark is Spark's bounded-state
    * equivalent — SURVEY §2.8 watermark row). */
  def monitor(df: DataFrame, tsCol: String, keyCol: String, valueCol: String,
      intervalSec: Int, alertAvgAbove: Option[Double] = None): DataFrame = {
    val w = window(col(tsCol), s"$intervalSec seconds")
    val base = df.groupBy(w.as("interval"), col(keyCol))
      .agg(
        min(col(valueCol)).as("min_value"),
        max(col(valueCol)).as("max_value"),
        sum(col(valueCol)).as("sum_value"),
        count(lit(1)).as("events_count"))
    val withAvg = base.withColumn("avg_value",
      col("sum_value") / col("events_count"))
    alertAvgAbove match {
      case Some(t) => withAvg.withColumn("alert", col("avg_value") > t)
      case None => withAvg
    }
  }
}
