package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering and
  * zone-map file pruning — the physical-design lever that decides how
  * much of a 100 TB table a 2-D predicate actually reads. A time-sorted
  * log layout prunes time ranges only; interleaving the bits of two
  * quantized dimensions makes every file a small aligned rectangle of
  * the (x, y) space, so a box predicate touches O(box area) files
  * instead of O(x-selectivity) — the same reasoning as public
  * lakehouse `ZORDER BY` clustering (Morton 1966; Orenstein & Merrett
  * PODS 1984 for the range-query analysis).
  *
  * Everything is exact int64 bit arithmetic — quantization is integer
  * affine (`((v - min) * 2^bits) div (range + 1)`), the code an unrolled
  * bit interleave — so the DuckDB oracle replays codes, bucket
  * assignments, and zone maps bit-for-bit ([[mortonSql]]).
  *
  * Scale shape: stats are one tiny global aggregate (broadcast); the
  * code is a map-only expression; bucketing is `z div 2^(2*bits -
  * log2(buckets))` — top Morton bits, i.e. aligned quads. The write
  * path directory-partitions by bucket, so a reader prunes with
  * PARTITION filters ([[candidateBuckets]] — computed on the driver
  * from the box alone, no data access) before any file is opened.
  */
object Layout {
  /** Bit-interleaved Morton code of two `bits`-bit nonnegative ints:
    * x in even positions, y in odd. Unrolled sum — native codegen,
    * no UDF. */
  def morton(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** [[morton]] as DuckDB SQL text over expressions `x`, `y`. */
  def mortonSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** Scalar Morton decode (driver-side): the (x, y) of code `z`. */
  def mortonDecode(z: Long, bits: Int): (Long, Long) = {
    var x = 0L; var y = 0L; var i = 0
    while (i < bits) {
      x |= ((z >> (2 * i)) & 1L) << i
      y |= ((z >> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (x, y)
  }

  /** The buckets (top-Morton-bit quads) a box predicate `[x0,x1] x
    * [y0,y1]` (quantized coordinates) can touch — computed on the
    * DRIVER from the box alone: each bucket is an aligned quad whose
    * corner is the decode of its first code. O(buckets) scalar work,
    * zero data access; the result feeds a partition-pruning IN filter. */
  def candidateBuckets(x0: Long, x1: Long, y0: Long, y1: Long,
      bits: Int, numBuckets: Int): Seq[Long] = {
    require(numBuckets >= 1 && (numBuckets & (numBuckets - 1)) == 0,
      "numBuckets must be a power of two")
    val shift = 2 * bits - Integer.numberOfTrailingZeros(numBuckets)
    require(shift >= 0 && shift % 2 == 0,
      s"numBuckets=$numBuckets must split $bits-bit codes on a quad " +
        "boundary (even shift)")
    val side = 1L << (shift / 2) // quad edge length in quantized units
    (0L until numBuckets.toLong).filter { b =>
      val (qx, qy) = mortonDecode(b << shift, bits)
      qx <= x1 && qx + side - 1 >= x0 && qy <= y1 && qy + side - 1 >= y0
    }
  }

  /** Quantize-and-code `df`: adds `zq_x`, `zq_y` (the `bits`-bit
    * quantized dims), `z` (Morton code) and `zbucket` (top-bit quad id,
    * `numBuckets` total). `xCol`/`yCol` must be int64 columns (cast
    * timestamps to epoch units first). Stats are one global aggregate,
    * broadcast into a map-only coding pass. */
  /** Quantization is `((v - min) * 2^bits) div (range + 1)` in int64:
    * the product silently overflows (and corrupts codes AND bucket
    * assignment) once `range * 2^bits > 2^63` — e.g. an epoch-MICROS
    * column spanning years with bits > 10. Fail loud at build/append
    * time instead: the caller must coarsen the column's unit (micros
    * -> seconds/minutes) or lower `bits`. */
  private def requireLatticeFits(lo: Long, hi: Long, bits: Int,
      colName: String): Unit = {
    val range = BigInt(hi) - BigInt(lo)
    require(range * BigInt(2).pow(bits) <= BigInt(Long.MaxValue),
      s"zorder: $colName range $range * 2^$bits overflows int64 — " +
        "coarsen the column's unit or lower bits")
  }

  /** One-row min/max stats, collected on the driver (a tiny global
    * aggregate — Blocking.globalRank precedent) so the coding pass is
    * map-only with LITERAL bounds, and the lattice-fit guard runs
    * before any data is written. */
  private def bounds(df: DataFrame, xCol: String, yCol: String,
      bits: Int): (Long, Long, Long, Long) = {
    val r = df.agg(
      min(col(xCol)), max(col(xCol)), min(col(yCol)), max(col(yCol)))
      .head()
    require(!r.isNullAt(0), "zorder: empty input, no stats")
    val (xmin, xmax, ymin, ymax) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    requireLatticeFits(xmin, xmax, bits, xCol)
    requireLatticeFits(ymin, ymax, bits, yCol)
    (xmin, xmax, ymin, ymax)
  }

  def zorderCode(df: DataFrame, xCol: String, yCol: String, bits: Int,
      numBuckets: Int): DataFrame = {
    val n = 1L << bits
    val shift = 2 * bits - Integer.numberOfTrailingZeros(numBuckets)
    val (xmin, xmax, ymin, ymax) = bounds(df, xCol, yCol, bits)
    df
      .withColumn("zq_x",
        expr(s"(($xCol - ${xmin}L) * $n) div ${xmax - xmin + 1}L"))
      .withColumn("zq_y",
        expr(s"(($yCol - ${ymin}L) * $n) div ${ymax - ymin + 1}L"))
      .withColumn("z", morton(col("zq_x"), col("zq_y"), bits))
      .withColumn("zbucket", expr(s"z div ${1L << shift}"))
  }

  /** Write `df` Z-order-clustered: directory-partitioned by `zbucket`,
    * rows sorted by `z` within each file — so directory pruning skips
    * quads and parquet row-group stats prune within a file. The
    * quantization stats are persisted alongside (`_zstats` sidecar) so
    * appends code against the SAME grid. */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, path: String,
      bits: Int = 10, numBuckets: Int = 64): Unit = {
    val coded = zorderCode(df, xCol, yCol, bits, numBuckets)
    coded.repartition(col("zbucket"))
      .sortWithinPartitions(col("zbucket"), col("z"))
      .write.mode("overwrite").partitionBy("zbucket").parquet(path)
    df.agg(min(col(xCol)).as("zx_min"), max(col(xCol)).as("zx_max"),
        min(col(yCol)).as("zy_min"), max(col(yCol)).as("zy_max"))
      .write.mode("overwrite").parquet(statsPath(path))
  }

  private def statsPath(path: String): String =
    path.stripSuffix("/") + "_zstats"

  /** Append a batch to a standing Z-order layout, coding against the
    * RECORDED quantization grid (the frozen-baseline discipline every
    * standing artifact follows — re-deriving min/max from drifted data
    * would silently re-grid old quads). Out-of-range values CLAMP to
    * the edge quads, so late-arriving outliers land in the boundary
    * buckets instead of corrupting the lattice. New files join the
    * existing quad directories — pruning semantics unchanged. */
  def zorderAppend(df: DataFrame, xCol: String, yCol: String,
      path: String, bits: Int = 10, numBuckets: Int = 64): Unit = {
    val n = 1L << bits
    val shift = 2 * bits - Integer.numberOfTrailingZeros(numBuckets)
    val st = df.sparkSession.read.parquet(statsPath(path)).head()
    val (xmin, xmax, ymin, ymax) =
      (st.getAs[Long]("zx_min"), st.getAs[Long]("zx_max"),
        st.getAs[Long]("zy_min"), st.getAs[Long]("zy_max"))
    requireLatticeFits(xmin, xmax, bits, xCol)
    requireLatticeFits(ymin, ymax, bits, yCol)
    // clamp BEFORE the product too: an outlier (v - lo) could itself
    // overflow the multiply even when the recorded grid fits
    def q(v: String, lo: Long, hi: Long) =
      s"greatest(0, least(${n - 1}, " +
        s"((greatest(${lo}L, least(${hi}L, $v)) - ${lo}L) * $n) " +
        s"div ${hi - lo + 1}L))"
    df
      .withColumn("zq_x", expr(q(xCol, xmin, xmax)))
      .withColumn("zq_y", expr(q(yCol, ymin, ymax)))
      .withColumn("z", morton(col("zq_x"), col("zq_y"), bits))
      .withColumn("zbucket", expr(s"z div ${1L << shift}"))
      .repartition(col("zbucket"))
      .sortWithinPartitions(col("zbucket"), col("z"))
      .write.mode("append").partitionBy("zbucket").parquet(path)
  }
}
