package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches (count-min) over string streams —
  * bounded-state frequency estimation for corpus telemetry (heavy
  * hitters, term-traffic monitoring at ingest) where an exact term
  * aggregate would shuffle the whole token stream by key.
  *
  * Count-min (Cormode & Muthukrishnan 2005, "An improved data stream
  * summary: the count-min sketch and its applications"): depth*width
  * counters, row r counting occurrences at bucket h_r(x); the estimate
  * is min over rows, always an OVERestimate (one-sided error <=
  * e*N/width with probability 1 - e^-depth).
  *
  * Determinism: h_r(x) = ((polyHash(x) * (1 + 7919 r) + (1 + 104729 r))
  * mod P) mod width — the [[TextOps.minHash]] universal-hash family, so
  * estimates are bit-identical in Spark and the DuckDB oracle and the
  * sketch is reproducible across engines (no murmur/xxhash divergence).
  *
  * Scale shape: counters are bounded state (depth*width cells). The
  * build explodes each occurrence into `depth` (row, bucket) pairs and
  * hash-aggregates — map-side partials collapse every partition to at
  * most depth*width cells before the exchange, so shuffle volume is
  * partitions x cells regardless of corpus size. Sketches MERGE by
  * cell-wise addition ([[cmsMerge]]) — the distributed/streaming fold.
  */
object Sketches {
  private val P = TextOps.P

  private def bucketExpr(h: org.apache.spark.sql.Column,
      r: org.apache.spark.sql.Column, width: Int) =
    ((h * (lit(1L) + lit(7919L) * r) + (lit(1L) + lit(104729L) * r))
      % P) % width

  /** Build the (r, b, c) counter cells of a count-min sketch over one
    * occurrence per row of `valueCol`. Missing cells are zero (sparse
    * representation — depth*width is only the upper bound). */
  def cmsCounters(items: DataFrame, valueCol: String, depth: Int,
      width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, "depth and width must be >= 1")
    items
      .select(TextOps.polyHash(col(valueCol)).as("h"))
      .select(col("h"),
        explode(sequence(lit(0L), lit(depth - 1L))).as("r"))
      .select(col("r"), bucketExpr(col("h"), col("r"), width).as("b"))
      .groupBy(col("r"), col("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** Merge two sketches built with the SAME (depth, width): cell-wise
    * addition. Exactly the partial-aggregate fold, so a sketch of a
    * union == the merge of the parts' sketches. */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("r"), col("b"))
      .agg(sum(col("c")).as("c"))

  /** Point-estimate the frequency of each `terms` row: min over the
    * depth rows of the counter at h_r(term), 0 when the cell is absent.
    * Counters broadcast (bounded depth*width cells); the term frame can
    * be any size. Returns (term, est_c); est_c >= true count always. */
  def cmsEstimate(counters: DataFrame, terms: DataFrame, termCol: String,
      depth: Int, width: Int): DataFrame =
    terms
      .select(col(termCol).as("term"),
        TextOps.polyHash(col(termCol)).as("h"))
      .select(col("term"), col("h"),
        explode(sequence(lit(0L), lit(depth - 1L))).as("r"))
      .select(col("term"), col("r"),
        bucketExpr(col("h"), col("r"), width).as("b"))
      .join(broadcast(counters), Seq("r", "b"), "left")
      .groupBy(col("term"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est_c"))
}
