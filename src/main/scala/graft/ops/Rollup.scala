package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.dialect.Increments

/** Standing time rollup — incremental materialization of the decomposable
  * aggregates (`count / sum / min / max`, hence `avg`) at a fixed time
  * grain, so that `increments(unit, n, ts)` queries at ANY coarser unit
  * are answered from the rollup instead of rescanning event history.
  *
  * Reference behavior: EdgeLake re-aggregates raw rows on every
  * increments() query (dbms/unify_results.py:482-556 — the remote nodes
  * scan their partitions each time). At 100 TB of event history that
  * rescan IS the query cost; a minute-grain rollup is ~10^5 rows per dim
  * combination per year — five orders of magnitude less input for every
  * dashboard refresh, maintained by scanning ONLY each ingest delta.
  *
  * Exactness discipline (the q86/q94 lessons): the measure sum is kept as
  * DECIMAL(28,2) — exact under ANY partial-aggregation order and ANY
  * regrouping, so serving from the rollup is bit-identical to a direct
  * full scan in every engine (float sums would drift on the re-aggregate;
  * see CoreQueries `dsum`). `avg` is derived as exact-sum / exact-count
  * at serve time, never maintained directly (averages don't compose).
  *
  * Late data needs no watermark: a delta row at ANY timestamp merges into
  * its bucket (a streaming windowed agg would have dropped it). Each
  * refresh shuffles O(delta-agg + rollup) rows on the bucket key — the
  * rollup side is tiny by construction, so refresh cost is dominated by
  * the one pass over the delta.
  *
  * The rollup records its own grain in a constant `grain` column (the
  * geometry discipline of [[Dedup.embeddingIndex]]): [[serve]] and
  * [[merge]] read it and fail loudly on a mixed-grain union or a query
  * unit finer than the grain — never a silently wrong answer.
  * Persist/refresh the standing artifact crash-atomically with
  * [[IndexStore]] via [[refreshStore]].
  */
object Rollup {

  /** Rollup schema: `grain_ts` (ts truncated to `grain`), `dims...`,
    * `n` row count, `n_val` non-null value count (count(v)/avg(v) serve
    * exactly under NULLs), `sum_dec` exact sum, `min_v`, `max_v`,
    * `grain`. */
  def build(df: DataFrame, tsCol: String, grain: String,
      dims: Seq[String], valueCol: String): DataFrame = {
    Increments.unitSeconds(grain) // validates the unit name
    df.groupBy(date_trunc(grain, col(tsCol)).as("grain_ts") +: dims.map(col): _*)
      .agg(count(lit(1)).as("n"),
        count(col(valueCol)).as("n_val"),
        sum(col(valueCol).cast(DecimalType(18, 2)))
          .cast(DecimalType(28, 2)).as("sum_dec"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))
      .withColumn("grain", lit(grain))
  }

  /** The recorded grain of a rollup; fails loudly on a mixed-grain
    * union (a rollup carries exactly one grain by construction). */
  def grainOf(rollup: DataFrame): String = {
    val gs = rollup.select(col("grain")).distinct().take(2)
    require(gs.length <= 1, "mixed-grain rollup: " +
      gs.map(_.getString(0)).sorted.mkString(", "))
    gs.headOption.map(_.getString(0)).getOrElse("second")
  }

  /** Merge two rollups of the same grain and dims: counts and exact sums
    * add, min/max fold — decomposability is the whole design. The grain
    * check runs ONCE on the union (a mixed-grain pair surfaces as two
    * distinct values there and fails just as loudly as checking each
    * side, at half the jobs). */
  def merge(a: DataFrame, b: DataFrame, dims: Seq[String]): DataFrame = {
    val u = a.unionByName(b)
    val ga = grainOf(u) // loud on a mixed-grain pair
    u
      .groupBy(col("grain_ts") +: dims.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sum(col("n_val")).as("n_val"),
        sum(col("sum_dec")).cast(DecimalType(28, 2)).as("sum_dec"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
      .withColumn("grain", lit(ga))
  }

  /** Fold a raw delta into a standing rollup — the delta is the ONLY
    * event data scanned. */
  def refresh(rollup: DataFrame, delta: DataFrame, tsCol: String,
      dims: Seq[String], valueCol: String): DataFrame = {
    val g = grainOf(rollup)
    merge(rollup, build(delta, tsCol, g, dims, valueCol), dims)
  }

  /** Answer `increments(unit, n, grain_ts)` from the rollup. Output: the
    * increments key columns (`bucket_ts` parent-trunc timestamp and
    * `bucket_i` — single `bucket_i` for year), `dims...`, then
    * `n, sum_value, min_value, max_value, avg_value` with the exact
    * CoreQueries `dsum`/`davg` arithmetic. Fails if the query unit is
    * finer than the rollup grain (those buckets are gone by design). */
  def serve(rollup: DataFrame, unit: String, n: Int,
      dims: Seq[String] = Seq.empty): DataFrame = {
    val g = grainOf(rollup)
    require(Increments.unitSeconds(unit) >= Increments.unitSeconds(g),
      s"increments unit $unit is finer than the rollup grain $g")
    val keyCols: Seq[Column] = Increments.keys(unit, n, col("grain_ts")) match {
      case Seq(single) => Seq(single.as("bucket_i"))
      case Seq(parent, idx) => Seq(parent.as("bucket_ts"), idx.as("bucket_i"))
    }
    rollup
      .groupBy(keyCols ++ dims.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sum(col("sum_dec")).cast(DoubleType).as("sum_value"),
        min(col("min_v")).as("min_value"),
        max(col("max_v")).as("max_value"),
        (sum(col("sum_dec")).cast(DoubleType) / sum(col("n")))
          .as("avg_value"))
  }

  /** Crash-atomic standing-rollup refresh: read the live version from
    * `dir`, fold `delta` in (or [[build]] at `grain` when none exists),
    * commit the result, return it. The 100 TB ingest loop calls this
    * per batch; event history is never re-read. */
  def refreshStore(spark: SparkSession, dir: String, delta: DataFrame,
      tsCol: String, grain: String, dims: Seq[String],
      valueCol: String): DataFrame = {
    val next = IndexStore.read(spark, dir) match {
      case Some(cur) => refresh(cur, delta, tsCol, dims, valueCol)
      case None => build(delta, tsCol, grain, dims, valueCol)
    }
    val out = next.localCheckpoint()
    IndexStore.write(out, dir)
    out
  }
}
