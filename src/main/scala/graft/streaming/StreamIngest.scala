package graft.streaming

import java.util.concurrent.TimeUnit

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.ingest.MappingPolicy

/** Structured-Streaming ingest pipeline: watch-dir JSON files (or any
  * streaming source) -> mapping policy -> conditions -> partitioned
  * parquet append.
  *
  * Reference mapping (/root/reference):
  *  - watch-dir consumption `members/aloperator.py` + dispatch
  *    `generic/streaming_data.py:397` -> Spark's file streaming source
  *    (native archiving via `cleanSource`/`sourceArchiveDir`).
  *  - flush thresholds 60 s / 10,000 B (`streaming_data.py:29-30`) ->
  *    micro-batch `Trigger.ProcessingTime`; `write_immediate` (:32) ->
  *    a short trigger. Volume thresholds have no direct trigger analog;
  *    `maxFilesPerTrigger` bounds batch size instead.
  *  - time partitioning `dbms/partitions.py` -> `partitionBy` on a
  *    derived date column; partition pruning replaces the reference's
  *    partition-name matching at query time.
  */
object StreamIngest {

  /** Build the file-watch source (one JSON document per line). */
  def watchDir(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream
      .format("text")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)

  /** Compile the full ingest flow on any streaming (or batch) frame of
    * raw JSON documents. Returns (rows, alerts). */
  def pipeline(raw: DataFrame, policy: MappingPolicy.Policy,
      conditions: Seq[StreamOps.Condition] = Nil)
      : (DataFrame, DataFrame) = {
    val mapped = MappingPolicy.compile(policy, raw)
    StreamOps.applyConditions(mapped, conditions)
  }

  /** Start the append sink: micro-batches land as parquet partitioned by
    * the given column, with the reference's 60 s default flush cadence. */
  def startParquetSink(rows: DataFrame, outDir: String,
      checkpoint: String, partitionCol: Option[String] = None,
      flushSeconds: Long = 60, name: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w0: DataStreamWriter[Row] = rows.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(flushSeconds, TimeUnit.SECONDS))
      .outputMode("append")
    // a named query shows up in `get streaming` (Engine) by that name
    val w = name.map(w0.queryName).getOrElse(w0)
    partitionCol.map(c => w.partitionBy(c)).getOrElse(w).start()
  }

  /** The STREAMING twin of the PUT auto-fold: keep every registered
    * standing aggregate artifact (matview / rollup / join matview)
    * fresh as a stream lands in `table`. Pair it with
    * [[startParquetSink]] on the SAME rows frame:
    *
    *   - the parquet file sink owns the TABLE append (Spark's file-sink
    *     commit log makes that leg exactly-once on its own checkpoint);
    *   - this sink owns the VIEW folds, exactly-once through the
    *     IndexStore batch-tag protocol
    *     ([[graft.engine.Engine.foldStandingViews]] with
    *     `stream_<table>_<batchId>` — a replayed batch whose tag is
    *     live skips; the two-version lookback covers checkpointed
    *     retry-the-last-batch).
    *
    * Each leg is exactly-once; the two run on separate checkpoints, so
    * a view may LEAD or LAG the table by up to one micro-batch — the
    * documented eventual-consistency window (the alternative, one
    * foreachBatch doing both, would make the table append at-least-once
    * under replay and double-ingest rows: lagging views reconcile,
    * duplicated rows never do). Fold errors never kill the stream —
    * they record in the engine's auto-fold error log (`get view auto
    * refresh`). */
  def startViewFoldSink(engine: graft.engine.Engine, table: String,
      rows: DataFrame, checkpoint: String, flushSeconds: Long = 60,
      name: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w0 = rows.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        engine.foldStandingViews(table, b,
          batchTag = Some(s"stream_${table}_$id"))
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(flushSeconds, TimeUnit.SECONDS))
    name.map(w0.queryName).getOrElse(w0).start()
  }
}
