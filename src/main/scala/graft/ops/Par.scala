package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Explicit-parallelism pin for EXPANSION joins (optimization round,
  * guide §2.4/§2.5).
  *
  * AQE sizes every coalescible post-shuffle stage by its INPUT bytes
  * (`advisoryPartitionSizeInBytes` / `minPartitionSize`). That is the
  * wrong currency for the candidate-generation joins of the similarity
  * kernels: their per-row downstream cost (pair expansion, popcount /
  * levenshtein / intersect verifies) is orders of magnitude above the
  * byte cost, so a sub-megabyte key frame — the NORMAL case for a
  * prefix/band/variant frame at bench scale, and for the tail of a
  * partition-pruned incremental fold at any scale — collapses to ONE
  * task and the whole expansion runs on one core of the cluster.
  *
  * `pin` repartitions by the join key with an EXPLICIT partition count
  * (REPARTITION_BY_NUM), which AQE is contractually not allowed to
  * coalesce. Keyed on the join key it IS the join's own shuffle — the
  * join's ENSURE_REQUIREMENTS exchange is satisfied and no extra pass
  * is added. Floor = cluster default parallelism: on a real layout the
  * data-driven partition count is larger and the floor is inert; skew
  * inside these kernels is bounded by construction (df-capped buckets,
  * band occupancy, deletion near-cliques), so losing AQE's skew-split
  * on the pinned exchange gives up nothing.
  */
object Par {
  def pin(df: DataFrame, keys: Column*): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, keys: _*)

  /** [[pin]] at `factor` x cluster parallelism — for a join whose BUILD
    * side must stay hash-buildable inside a task's execution-memory
    * share even when co-scheduled with memory-hungry stages: an AQE
    * SMJ→shuffled-hash rewrite sizes builds by the PARTITION, so more
    * partitions = proportionally smaller, safer builds (a shuffled-hash
    * build cannot spill; an underestimate is an OOM, not a slowdown).
    * The extra partitions only add scheduling on the already-pinned
    * exchange — no extra shuffle. */
  def pinFine(df: DataFrame, factor: Int, keys: Column*): DataFrame =
    df.repartition(
      df.sparkSession.sparkContext.defaultParallelism * factor, keys: _*)
}
