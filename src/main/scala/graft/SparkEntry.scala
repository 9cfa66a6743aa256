package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's representative query
  * (one per SURVEY §2 inventory row); `oracleSql` holds the equivalent
  * DuckDB SQL for the driver's differential-correctness gate.
  */
object SparkEntry {
  /** Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001;
    * driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    core.CoreQueries.queries("q04_pricing_summary")(
      spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * training-data pipeline operators (dedup / similarity / text
    * analysis) over documents+embeddings. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    core.CoreQueries.queries ++ ops.PipelineQueries.queries ++
      ops.TemporalQueries.queries ++ dialect.DialectQueries.queries ++
      ops.CurationQueries.queries ++ ops.QuantQueries.queries ++
      ops.RetrievalQueries.queries ++ ops.SketchQueries.queries ++
      ops.GraphQueries.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    core.CoreQueries.oracles ++ ops.PipelineQueries.oracles ++
      ops.TemporalQueries.oracles ++ dialect.DialectQueries.oracles ++
      ops.CurationQueries.oracles ++ ops.QuantQueries.oracles ++
      ops.RetrievalQueries.oracles ++ ops.SketchQueries.oracles ++
      ops.GraphQueries.oracles
}
