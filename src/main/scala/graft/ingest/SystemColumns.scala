package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** System-column stamping at ingest — every operator table in the
  * reference gets `row_id`, `insert_timestamp`, `tsd_name`, `tsd_id`
  * (/root/reference/edge_lake/json_to_sql/suggest_create_table.py:255):
  * the TSD pair links each row to the ingest-ledger entry used for HA
  * replication, and the `committed` query option filters on it
  * (dbms/ha.py:225 safe ids; Engine.loadWithOptions applies the filter).
  *
  * `monotonically_increasing_id` is partition-local-unique (the Spark
  * replacement for a SERIAL — no global sequence bottleneck at scale);
  * uniqueness is per ingest batch, which is exactly the reference's
  * per-file TSD granularity.
  */
object SystemColumns {

  /** Stamp the four system columns onto an ingest batch. `tsdName` is the
    * 3-char source-node tag, `tsdId` the ingest-ledger entry id. */
  def stamp(df: DataFrame, tsdName: String, tsdId: Int): DataFrame =
    df.withColumn("row_id", monotonically_increasing_id())
      .withColumn("insert_timestamp", current_timestamp())
      .withColumn("tsd_name", lit(tsdName.take(3)))
      .withColumn("tsd_id", lit(tsdId))
}
