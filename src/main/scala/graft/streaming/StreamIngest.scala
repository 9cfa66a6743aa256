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
}
