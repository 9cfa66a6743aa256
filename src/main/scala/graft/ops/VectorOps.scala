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
    * dimension i is the QUADRATIC congruential mix of x = i + J*64
    * (J = table*bits + j): with y = x*2654435761 mod P,
    * ((y^2 mod P + x) * 2654435761 mod P mod 2001 - 1000) / 1000.0 —
    * pure integer arithmetic (every intermediate < 2^63, safe in
    * checked-BIGINT engines) then one exact division, identical in both
    * engines. The squaring breaks the LCG lattice a plain
    * multiplicative hash has (measured near-duplicate planes that
    * capped OR-amplified recall — see VecLshExpr). `table` picks an
    * independent plane family; table 0 is the default signature. */
  def lshSignature(v: Column, bits: Int, table: Int = 0): Column =
    aggregate(sequence(lit(0), lit(bits - 1)), lit(0L),
      (acc, j) => {
        val d = aggregate(
          zip_with(v, sequence(lit(0L), size(v).cast("long") - 1L),
            (xv, i) => {
              val x = i + (j.cast("long") + lit(table.toLong * bits)) * 64L
              val y = x * 2654435761L % TextOps.P
              xv.cast("double") *
                ((y * y % TextOps.P + x) * 2654435761L % TextOps.P
                  % 2001L - 1000L).cast("double") / 1000.0
            }),
          lit(0.0), (a, p) => a + p)
        acc + when(d > 0, call_function("shiftleft", lit(1L), j)).otherwise(0L)
      })
}
