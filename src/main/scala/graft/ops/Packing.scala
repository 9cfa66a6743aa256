package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-sequence packing (GPT-style concat-and-chop): docs are
  * concatenated in a deterministic per-shard order and chopped into
  * fixed-`seqLen`-token sequences; each doc is attributed to the
  * sequence holding its FIRST token.
  *
  * Scale shape: packing is SHARDED — a content-hash (or caller-chosen)
  * shard key bounds every running sum to one shard's window, so the
  * plan is one exchange on the shard key + a per-shard sort, parallel
  * across shards, and NEVER a global single-partition window.
  * Cross-shard waste is at most one partial sequence per shard; raise
  * `shards` to the cluster's parallelism at scale. The oracle-checked
  * q86 aggregates this assignment per (shard, seq).
  */
object Packing {

  /** Per-doc sequence assignment: input columns plus (shard, seq_id,
    * start_offset) — `start_offset` is the doc's first-token position
    * within its sequence. `nTokens` is any integer token-count column
    * expression; order within a shard follows `orderCol` (must be
    * unique per shard for a deterministic packing). */
  def sequencePack(df: DataFrame, nTokens: Column, orderCol: String,
      seqLen: Int, shards: Int = 64,
      shardExpr: Option[Column] = None): DataFrame = {
    require(seqLen > 0 && shards > 0, "seqLen and shards must be positive")
    require(!df.columns.contains("shard") && !df.columns.contains("seq_id")
      && !df.columns.contains("start_offset"),
      "input already has a shard/seq_id/start_offset column; rename it first")
    val shard = shardExpr.getOrElse(
      pmod(xxhash64(col(orderCol)), lit(shards)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__shard").orderBy(orderCol)
    df.withColumn("__shard", shard)
      .withColumn("__n_tok", nTokens.cast("long"))
      .withColumn("__cum", sum(col("__n_tok")).over(w))
      // integer `div`: exact for any long cumulative sum (a double
      // intermediate loses exactness past 2^53 and diverges from an
      // integer-division oracle spec)
      .withColumn("seq_id", expr(s"(`__cum` - `__n_tok`) div $seqLen"))
      .withColumn("start_offset",
        (col("__cum") - col("__n_tok")) % seqLen)
      .withColumnRenamed("__shard", "shard")
      .drop("__n_tok", "__cum")
  }

  /** Packing efficiency summary: sequences, docs, token fill per shard
    * (the q86 rollup over an arbitrary `sequencePack` result). */
  def packingStats(packed: DataFrame): DataFrame =
    packed.groupBy(col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_seqs"),
        sum(col("n_docs")).as("n_docs"),
        max(col("n_docs")).as("max_docs_per_seq"))
}
