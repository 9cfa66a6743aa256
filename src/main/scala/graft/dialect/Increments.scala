package graft.dialect

import java.time.LocalDateTime
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** EdgeLake `increments(unit, n, ts)` time-bucketing.
  *
  * Reference semantics (dbms/unify_results.py:482-556): the bucket key is
  * NOT an epoch-aligned window but the pair
  * (date_trunc(parent_unit, ts), floor(extract(unit from ts) / n)),
  * with the parent-unit chain second→minute→hour→day→month→year
  * (generic/utils_sql.py:18-26; week folds to 7 days,
  * unify_results.py:321-323; year is extract-only, :535-550).
  *
  * Auto-sizing (`increments(ts)` / `increments(points, ts)`,
  * unify_results.py:339-459): choose (unit, n) so the WHERE time range
  * yields ≈ `points` buckets (default 1000, unify_results.py:352):
  * interval = span/points seconds, unit = largest whose length ≤ interval,
  * n = floor(interval / unit_length), min 1.
  *
  * Spark-first: both keys are plain Catalyst expressions, so the whole
  * query stays one partial/final hash aggregate — no custom operator, and
  * it scales with the shuffle like any GROUP BY.
  */
object Increments {
  /** unit -> (seconds, parent unit for date_trunc) */
  private val units: Seq[(String, Long)] = Seq(
    "second" -> 1L, "minute" -> 60L, "hour" -> 3600L,
    "day" -> 86400L, "month" -> 2592000L, "year" -> 31536000L)

  private val parents: Map[String, String] = Map(
    "second" -> "minute", "minute" -> "hour", "hour" -> "day",
    "day" -> "month", "month" -> "year", "year" -> "year")

  def parentUnit(unit: String): String = parents(unit)

  /** Nominal unit length in seconds (the auto-sizing table). */
  def unitSeconds(unit: String): Long = units.toMap.getOrElse(unit,
    throw new IllegalArgumentException(s"unknown unit $unit"))

  /** extract(unit from ts) as a Column (day is 1-based like SQL EXTRACT). */
  def extractUnit(unit: String, ts: Column): Column = unit match {
    case "second" => second(ts)
    case "minute" => minute(ts)
    case "hour"   => hour(ts)
    case "day"    => dayofmonth(ts)
    case "month"  => month(ts)
    case "year"   => year(ts)
    case u => throw new IllegalArgumentException(s"unknown unit $u")
  }

  /** Bucket key columns for increments(unit, n, ts). */
  def keys(unit: String, n: Int, ts: Column): Seq[Column] = {
    require(n >= 1, "increments n must be >= 1")
    if (unit == "year") Seq(floor(year(ts) / n))
    else Seq(date_trunc(parentUnit(unit), ts),
      floor(extractUnit(unit, ts) / n))
  }

  /** Auto-size (unit, n) for a bounded time range and a target bucket
    * count (reference default 1000 data points). */
  def resolve(lo: LocalDateTime, hi: LocalDateTime,
      points: Int = 1000): (String, Int) = {
    require(points > 0)
    val span = math.max(1L, ChronoUnit.SECONDS.between(lo, hi))
    val interval = math.max(1L, span / points)
    val (unit, unitSec) = units.reverse.find(_._2 <= interval)
      .getOrElse(units.head)
    (unit, math.max(1L, interval / unitSec).toInt)
  }
}
