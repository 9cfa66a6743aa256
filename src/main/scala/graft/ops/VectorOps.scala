package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic vector primitives for embedding similarity search.
  *
  * Float sums are order-sensitive, so every reduction here is an explicit
  * left-fold in array-index order — the DuckDB oracle replays the same
  * IEEE-754 operation sequence with `list_reduce` and gets bit-identical
  * doubles. (Never group-sum doubles across rows: Spark's partial-agg
  * order is nondeterministic; all cross-row reductions in the queries use
  * counts / min / max / decimal.)
  */
object VectorOps {
  /** Left-fold dot product of two float-array columns, accumulated in
    * double: ((0 + a1*b1) + a2*b2) + ... */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm, same fold order. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity with the exact fold order the oracle replays. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** b-bit random-hyperplane LSH signature of a float-array column:
    * bit j = 1 iff dot(v, plane_j) > 0, where plane_j's component at
    * dimension i is the deterministic pseudo-random value
    * ((i + J*64) * 2654435761 mod P mod 2001 - 1000) / 1000.0 with
    * J = table*bits + j — pure integer arithmetic then one exact
    * division, identical in both engines. `table` picks an independent
    * plane family (OR-amplified LSH); table 0 is the historical
    * signature. */
  def lshSignature(v: Column, bits: Int, table: Int = 0): Column =
    aggregate(sequence(lit(0), lit(bits - 1)), lit(0L),
      (acc, j) => {
        val d = aggregate(
          zip_with(v, sequence(lit(0L), size(v).cast("long") - 1L),
            (x, i) => x.cast("double") *
              ((i + (j.cast("long") + lit(table.toLong * bits)) * 64L)
                * 2654435761L % TextOps.P % 2001L
                - 1000L).cast("double") / 1000.0),
          lit(0.0), (a, p) => a + p)
        acc + when(d > 0, call_function("shiftleft", lit(1L), j)).otherwise(0L)
      })
}
