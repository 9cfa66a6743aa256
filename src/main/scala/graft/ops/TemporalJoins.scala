package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins: as-of join and
  * banded range join. Both avoid the O(|L|·|R|) cross product that a
  * naive `l.join(r, inequality)` plan degenerates to (Spark executes a
  * non-equi join as BroadcastNestedLoopJoin):
  *
  *  - `asOf` is the union+sort formulation: ONE shuffle on the key
  *    columns, an in-partition sort, and a running `last(ignoreNulls)`
  *    window — the distributed merge-join every time-series store uses.
  *    No per-row probe, no nested loop; scales as sort-merge does.
  *  - `rangeCount` buckets both sides into fixed-width time bins sized
  *    to the query window, equi-joins on (keys, bin) — each left row
  *    lands in at most TWO bins — then applies the exact range filter.
  *    The equi-join shuffles on (key, bin), so Catalyst plans a plain
  *    SortMergeJoin/ShuffledHashJoin; candidate fan-out is bounded by
  *    bin population, never by |R|.
  *
  * Both require timestamps at microsecond precision (graft stores UTC
  * micros — engine.Tables truncates parquet nanos the same way DuckDB
  * does, so cross-engine comparisons are exact).
  */
object TemporalJoins {

  /** Backward-inclusive as-of join: each left row picks the LATEST right
    * row with `rightTs <= leftTs` sharing `keys` (DuckDB/pandas
    * `ASOF JOIN` semantics). Left rows with no prior right row keep null
    * right fields (left-outer shape).
    *
    * Output columns: every left column, then every non-key right column.
    * Caller must ensure those names don't collide (rename before the
    * call) and that right rows are unique per (keys, rightTs) — the
    * match is otherwise ambiguous in ANY engine.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      direction: String = "backward"): DataFrame = {
    val backward = direction match {
      case "backward" => true
      case "forward" => false
      case other => throw new IllegalArgumentException(
        s"asOf direction must be backward|forward, got '$other'")
    }
    val rightPayload = right.columns.filterNot(keys.contains).toSeq
    val rStruct = struct(rightPayload.map(right(_)): _*)
    val lStruct = struct(left.columns.toSeq.map(left(_)): _*)
    val rType = right.select(rStruct.as("s")).schema.head.dataType
    val lType = left.select(lStruct.as("s")).schema.head.dataType
    val r2 = right.select(keys.map(col) ++ Seq(
      col(rightTs).as("__ts"), lit(0).as("__side"),
      rStruct.as("__r"), lit(null).cast(lType).as("__l")): _*)
    val l2 = left.select(keys.map(col) ++ Seq(
      col(leftTs).as("__ts"), lit(1).as("__side"),
      lit(null).cast(rType).as("__r"), lStruct.as("__l")): _*)
    // backward: right rows sort BEFORE left at equal ts (__side 0 < 1)
    // and the frame looks back — a right row exactly at leftTs is
    // visible (inclusive). forward: mirror everything (descending time,
    // frame still "preceding" = later timestamps), same inclusivity.
    val ord =
      if (backward) Seq(col("__ts").asc, col("__side").asc)
      else Seq(col("__ts").desc, col("__side").asc)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r2.unionByName(l2)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.toSeq.map(n => col("__l").getField(n).as(n)) ++
        rightPayload.map(n => col("__m").getField(n).as(n)): _*)
  }

  /** Count of right rows with `rightTs` in the half-open window
    * `[leftTs + lowerSec, leftTs + upperSec)` seconds, per left row,
    * matched on `keys`. Left rows must be distinct (carry an id).
    *
    * Banded equi-join: bin width = window span, so each left window
    * overlaps at most 2 bins and each right row belongs to exactly 1 —
    * every candidate pair is generated once, then exact-filtered.
    */
  def rangeCount(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, lowerSec: Long, upperSec: Long,
      countName: String = "n_in_range"): DataFrame = {
    require(upperSec > lowerSec, "empty range window")
    val binMicros = (upperSec - lowerSec) * 1000000L
    val lo = col("__lm") + lit(lowerSec * 1000000L)
    val hi = col("__lm") + lit(upperSec * 1000000L)
    // floor(), not cast-truncation: pre-1970 timestamps have negative
    // epoch micros, where truncation rounds toward zero and would put
    // rows one bin too high (micros stay < 2^53, so the double
    // division is exact before flooring)
    val l2 = left
      .withColumn("__lm", unix_micros(col(leftTs)))
      .withColumn("__bin", explode(array_distinct(array(
        floor(lo / binMicros).cast("long"),
        floor((hi - 1) / binMicros).cast("long")))))
    val r2 = right.select(keys.map(col) :+
      unix_micros(col(rightTs)).as("__rm"): _*)
      .withColumn("__bin", floor(col("__rm") / binMicros).cast("long"))
    val hit = col("__rm").isNotNull && col("__rm") >= lo && col("__rm") < hi
    l2.join(r2, keys :+ "__bin", "left_outer")
      .groupBy(left.columns.toSeq.map(col): _*)
      .agg(sum(when(hit, 1L).otherwise(0L)).as(countName))
  }
}
