package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge DataFrames — the link-structure
  * counterpart of the text/vector curation stack (reference-free corpus
  * quality signals: a page's link centrality is a classic crawl-quality
  * prior, and connected components already drive the dedup keep-lists —
  * [[Dedup]]'s pointer-jumping).
  *
  * PageRank (Page, Brin, Motwani & Winograd 1999): the damped power
  * iteration R'(v) = (1-d) + d * Σ_{u→v} R(u)/outdeg(u), here in the
  * non-normalized per-node "random surfer" form. Everything is on a
  * 2^20 integer lattice — ranks start at 2^20, the damping step is
  * `(r * 85 div 100) div outdeg` — so every iteration is exact int64
  * arithmetic: order-independent under any partial aggregation, and a
  * DuckDB oracle unrolling the same iterations reproduces ranks
  * bit-for-bit (floats would drift by reduction order on both sides).
  *
  * Scale shape per iteration: ONE join of ranks against the static
  * (src, dst, outdeg) edge frame on `src`, then ONE hash-aggregate of
  * contributions on `dst` — partial map-side sums collapse each
  * partition to its distinct dst set before the exchange. The edge
  * frame is localCheckpoint'ed once (it is reused every iteration);
  * each iteration's ranks are checkpointed so lineage stays flat (the
  * [[Dedup]] pointer-jumping discipline). On a real layout the edge
  * table is bucketed by `src`, making the per-iteration join
  * shuffle-free on the (much larger) edge side — ranks alone move.
  */
object Graph {
  /** `iters` rounds of integer-lattice PageRank over directed edges
    * `(src, dst)` (distinct; every node reachable as BOTH src and dst —
    * symmetrize one-way graphs first, the standard dangling-node fix).
    * Returns `(node, rank_q)` on the 2^20 lattice. */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 50, "iters must be in [1, 50]")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("od"))
    val e = edges.join(deg, "src").localCheckpoint(true)
    var ranks = e.select(col("src").as("node")).distinct()
      .withColumn("r", lit(1048576L))
    for (_ <- 1 to iters) {
      ranks = step(e, ranks).localCheckpoint(true)
    }
    ranks.select(col("node"), col("r").as("rank_q"))
  }

  /** One power iteration (un-checkpointed — the plan the PlanSpec gate
    * inspects, since localCheckpoint truncates lineage to an RDD scan):
    * join ranks to the degree-annotated edges on src, partial-sum
    * contributions on dst. */
  private[graft] def step(e: DataFrame, ranks: DataFrame): DataFrame =
    e.join(ranks, e("src") === ranks("node"))
      .select(col("dst"), expr("((r * 85) div 100) div od").as("c"))
      .groupBy(col("dst"))
      .agg((lit(157286L) + sum(col("c"))).as("r"))
      .select(col("dst").as("node"), col("r"))
}
