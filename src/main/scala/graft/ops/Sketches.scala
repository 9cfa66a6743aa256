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

  // ------------------------------------------------------------------
  // HyperLogLog (Flajolet, Fusy, Gandouet & Meunier 2007): m registers,
  // register j = max rank (leading-zero run + 1) of hashes landing in
  // bucket j; cardinality from the harmonic mean of 2^-M_j. Mergeable
  // by register-wise MAX — union semantics, the streaming fold.
  //
  // Cross-engine determinism: rank comes from the polyHash bit pattern
  // via length(bin(w)) — identical string semantics in Spark and
  // DuckDB — and the harmonic sum is EXACT in both engines: each
  // 2^-M_j is a dyadic rational on the 2^-(bits+1) grid and there are
  // at most m terms, so every partial double sum is exactly
  // representable and the reduction is order-independent (the same
  // argument as the integer lattice, transposed to dyadics). Spark's
  // own approx_count_distinct is the production choice when the
  // estimate never leaves Spark; this form exists for estimates that
  // must replay bit-identically in another engine (the oracle, or a
  // serving tier that recomputes from stored registers).
  // ------------------------------------------------------------------

  /** Supported register counts -> the standard bias constant alpha_m. */
  private[ops] def hllAlpha(m: Int): String = m match {
    case 16 => "0.673"
    case 32 => "0.697"
    case 64 => "0.709"
    case _ => s"(0.7213 / (1.0 + 1.079 / $m))" // m >= 128
  }

  private def hllBits(m: Int): Int = {
    require(m >= 16 && m <= 4096 && (m & (m - 1)) == 0,
      "m must be a power of two in [16, 4096]")
    31 - Integer.numberOfTrailingZeros(m)
  }

  /** Present (nonzero) HLL registers `(b, mreg)` over one occurrence
    * per row of `valueCol`. Absent buckets are register 0; the build
    * is one hash-aggregate to at most m cells (map-side partials, the
    * [[cmsCounters]] scale shape).
    *
    * The polynomial hash gets a murmur-style 31-bit avalanche finisher
    * first (three xorshift-multiply rounds, masked to 31 bits so every
    * intermediate fits both engines' int64): polyHash concentrates its
    * HIGH bits by string shape (shared prefix/length ⇒ same
    * magnitude), which is harmless for modulo bucketing (the CMS
    * family) but fatal for HLL's leading-zero rank statistic — without
    * the finisher, 5000 structured keys estimated as ~136. */
  def hllRegisters(items: DataFrame, valueCol: String,
      m: Int): DataFrame = {
    val bits = hllBits(m)
    items
      .select(TextOps.polyHash(col(valueCol)).as("h0"))
      .withColumn("h1", expr("h0 ^ shiftright(h0, 15)"))
      .withColumn("h2", expr("(h1 * 739982445) & 2147483647"))
      .withColumn("h3", expr("h2 ^ shiftright(h2, 12)"))
      .withColumn("h4", expr("(h3 * 695872825) & 2147483647"))
      .withColumn("h", expr("h4 ^ shiftright(h4, 15)"))
      .select((col("h") % m).as("b"),
        expr(s"case when (h div $m) = 0 then ${bits + 1} " +
          s"else $bits - length(bin(h div $m)) + 1 end").as("rho"))
      .groupBy(col("b"))
      .agg(max(col("rho")).as("mreg"))
  }

  /** Merge two register sets built with the SAME m: register-wise max
    * (set-union semantics — merge of parts == registers of the whole). */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("b")).agg(max(col("mreg")).as("mreg"))

  /** The standard HLL estimator with linear-counting small-range
    * correction, as ONE expression text shared with the DuckDB oracle:
    * raw E = alpha_m * m^2 / (sum 2^-M_j + empties), switched to
    * m * ln(m / empties) when E <= 2.5m and empties exist; floored
    * onto bigint. `s` and `present` are column names. */
  private[ops] def hllEstimateSql(m: Int, s: String,
      present: String): String = {
    val raw = s"(${hllAlpha(m)} * $m * $m) / " +
      s"($s + (cast($m as double) - $present) * 1.0)"
    s"cast(floor(case when $raw <= 2.5 * $m and $present < $m " +
      s"then $m * ln(cast($m as double) / ($m - $present)) " +
      s"else $raw end) as bigint)"
  }

  /** Estimate the distinct count from present registers: one row
    * `(hll_est, nonzero_regs)`. */
  def hllEstimate(registers: DataFrame, m: Int): DataFrame = {
    hllBits(m) // validate m
    registers
      .agg(count(lit(1)).cast("double").as("present"),
        sum(expr("pow(2.0, -mreg)")).as("s_present"))
      .select(expr(hllEstimateSql(m, "s_present", "present"))
          .as("hll_est"),
        col("present").cast("long").as("nonzero_regs"))
  }

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
