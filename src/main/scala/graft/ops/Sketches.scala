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

  /** 31-bit murmur-style avalanche finisher over a polyHash value: three
    * xorshift-multiply rounds, every intermediate masked to 31 bits so
    * both engines stay inside int64. polyHash concentrates its HIGH bits
    * by string shape — harmless for modulo bucketing (CMS) but fatal for
    * anything that reads hash MAGNITUDE as a uniform variate (HLL's rank
    * statistic, KMV's order statistics); this chain restores uniformity.
    * The DuckDB replica is [[avalanche31Sql]] — keep the two in sync. */
  def avalanche31(h0: org.apache.spark.sql.Column):
      org.apache.spark.sql.Column = {
    val h1 = h0.bitwiseXOR(shiftright(h0, 15))
    val h2 = (h1 * lit(739982445L)).bitwiseAND(lit(2147483647L))
    val h3 = h2.bitwiseXOR(shiftright(h2, 12))
    val h4 = (h3 * lit(695872825L)).bitwiseAND(lit(2147483647L))
    h4.bitwiseXOR(shiftright(h4, 15))
  }

  /** [[avalanche31]] as DuckDB lateral-alias column chain: emit inside a
    * SELECT that already defines `h0`; the avalanched value lands in `h`
    * (DuckDB resolves prior aliases within the same SELECT list). */
  val avalanche31ColsSql: String =
    "xor(h0, h0 >> 15) AS h1, " +
      "(h1 * 739982445) & 2147483647 AS h2, " +
      "xor(h2, h2 >> 12) AS h3, " +
      "(h3 * 695872825) & 2147483647 AS h4, " +
      "xor(h4, h4 >> 15) AS h"

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
      .withColumn("h", avalanche31(col("h0")))
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

  // ------------------------------------------------------------------
  // KMV (bottom-k) distinct-value sketches — [[graft.functions.KmvAgg]]
  // builds them (k smallest distinct avalanched hashes, bounded state,
  // map-side combine); the algebra below composes them. Estimator and
  // union/intersection forms: Beyer et al. SIGMOD 2007 §4-5. All
  // arithmetic is integer order statistics + one int64 division, so the
  // DuckDB oracle replays it bit-for-bit.
  // ------------------------------------------------------------------

  import org.apache.spark.sql.Column

  /** Hash-space size for 31-bit avalanched hashes: estimates read the
    * k-th minimum as the fraction kth/2^31 of the unit interval. */
  private val KmvSpace = 2147483648L

  /** Exact int64 floor division for nonnegative operands, Column-level
    * (the SQL `div` operator needs expr-text names): subtract the
    * remainder first, so the double division's dividend is an exact
    * multiple of the divisor and the integer quotient (<= 2^53 for every
    * use here) is returned EXACTLY by IEEE round-to-nearest — bit-equal
    * to DuckDB's `//`. */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Unbiased distinct-count estimate from a KMV sketch column: a
    * partially-filled sketch saw the whole set (estimate = its size);
    * a full one estimates (k-1) * 2^31 div kth_min. */
  def kmvDistinctEst(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("long"))
      .otherwise(idiv(lit((k - 1).toLong * KmvSpace),
        element_at(sk, k)))

  /** Bottom-k of a set union, from the parts' sketches alone: the k
    * smallest of the merged value sets (both already ascending). */
  def kmvUnionK(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Jaccard estimate between the sets behind sketches `a` and `b`, in
    * parts-per-million: members of the union's bottom-k present in BOTH
    * sketches, over the union sketch size (Beyer et al. §5 — the union
    * bottom-k is a uniform sample of A ∪ B, membership in both sketches
    * decides x ∈ A ∩ B exactly for sampled x). */
  def kmvJaccardPpm(a: Column, b: Column, k: Int): Column = {
    val u = kmvUnionK(a, b, k)
    idiv(size(array_intersect(array_intersect(u, a), b)).cast("long")
      * lit(1000000L), size(u).cast("long"))
  }

  // ------------------------------------------------------------------
  // Log-lattice quantile histogram (the HDR-histogram bucketing: exact
  // below 8, 8 sub-buckets per octave above — every bucket's width is
  // <= 12.5% of its lower bound). A BOUNDED, MERGEABLE quantile
  // summary: ~8*63 buckets cover all of int64, histograms merge by
  // addition, and the q-quantile estimate is the lower bound of the
  // first bucket whose cumulative count reaches ceil(q*N) — pure
  // integer bit arithmetic, bit-identical in DuckDB. The sketch-family
  // completion next to CMS (frequency), HLL/KMV (cardinality).
  // ------------------------------------------------------------------

  /** Bucket index of nonnegative int64 expression `x` (Spark SQL text;
    * the DuckDB twin is [[logBucketDuck]]). */
  def logBucketSpark(x: String): String =
    s"case when $x < 8 then $x else (length(bin($x)) - 1) * 8 + " +
      s"(shiftright($x, length(bin($x)) - 4) & 7) end"

  /** [[logBucketSpark]] in DuckDB syntax. */
  def logBucketDuck(x: String): String =
    s"CASE WHEN $x < 8 THEN $x ELSE (length(bin($x)) - 1) * 8 + " +
      s"(($x >> (length(bin($x)) - 4)) & 7) END"

  /** Lower bound of bucket `b` (Spark SQL text). */
  def bucketLbSpark(b: String): String =
    s"case when $b < 8 then $b else " +
      s"shiftleft(($b % 8) + 8, ($b div 8) - 3) end"

  /** [[bucketLbSpark]] in DuckDB syntax. */
  def bucketLbDuck(b: String): String =
    s"CASE WHEN $b < 8 THEN $b ELSE " +
      s"((($b % 8) + 8) << (($b // 8) - 3)) END"

  /** Per-key bucket histogram `(key, b, c)` over `valueCol`
    * (nonnegative int64) — one hash-aggregate, map-side combined to at
    * most #buckets cells per key. Merge = [[cmsMerge]]-style addition
    * (unionByName + re-sum). */
  def quantileHistogram(items: DataFrame, keyCol: String,
      valueCol: String): DataFrame =
    items.select(col(keyCol).as("key"),
        expr(logBucketSpark(valueCol)).as("b"))
      .groupBy("key", "b").agg(count(lit(1)).as("c"))

  /** Nearest-rank quantile estimates from a histogram: for each key
    * and each q in `pctsX100` (percent), the LOWER BOUND of the first
    * bucket whose cumulative count reaches ceil(q*N/100). The running
    * sum's window is per key over at most #buckets rows — bounded
    * state, never corpus-sized. Returns (key, pct, est). */
  def quantileEst(hist: DataFrame, pctsX100: Seq[Int],
      lb: String => String = bucketLbSpark): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("key").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("c")).over(w))
    val tot = hist.groupBy("key").agg(sum(col("c")).as("n"))
    val pcts = hist.sparkSession.range(1)
      .select(explode(array(pctsX100.map(p => lit(p)): _*)).as("pct"))
    cum.join(broadcast(tot), "key")
      .join(broadcast(pcts),
        col("cum") * 100 >= col("pct") * col("n"))
      .groupBy("key", "pct")
      .agg(min(expr(lb("b"))).as("est"))
  }

  /** Per-key KMV sketches `(key, sk)` over a hash-occurrence stream —
    * one bounded-state hash-aggregate ([[graft.functions.KmvAgg]]
    * dedups inside its buffer; no distinct shuffle). */
  def kmvKeyed(items: DataFrame, keyCol: String, hashCol: String,
      k: Int): DataFrame =
    items.groupBy(col(keyCol).as("key"))
      .agg(graft.functions.F.kmvAgg(col(hashCol), k).as("sk"))

  /** Fold two per-key sketch frames: per key, bottom-k of the union of
    * retained values. Bottom-k is an idempotent, commutative,
    * associative lattice join, so fold == rebuild under ANY batch
    * order — the standing-artifact property q138 proves differentially.
    * Keys present on one side pass through (explode_outer +
    * re-aggregate: a key whose stored sketch is EMPTY — all-NULL hash
    * column in its build batch — must survive the fold too; a plain
    * explode would drop its row and the key would vanish from the
    * standing artifact on the next refresh. KmvAgg ignores NULL
    * inputs, so the outer row folds back to an empty sketch). */
  def kmvMergeKeyed(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    a.unionByName(b)
      .select(col("key"), explode_outer(col("sk")).as("h"))
      .groupBy("key")
      .agg(graft.functions.F.kmvAgg(col("h"), k).as("sk"))

  /** Population stability index between two per-key bucket histograms
    * `(key, b, c)` (PSI — the standard model-monitoring drift score).
    * Laplace +1 smoothing kills ln(0); each bucket's term is floored
    * onto the 2^-14 lattice FIRST (shared expression text — the
    * pmiQ/nbLp precedent) then integer-summed, so there is no float
    * reduction order anywhere and a DuckDB oracle replays it exactly.
    * Returns (key, n1, n2, n_buckets, psi_q, drift); drift flags
    * psi_q > floor(0.2 * 2^14) = 3276 (the conventional PSI 0.2
    * action threshold). Cost: arithmetic over <= #buckets rows per
    * key — composes with the standing quantile-histogram index
    * (the baseline histogram IS the artifact). */
  def psi(h1: DataFrame, h2: DataFrame): DataFrame = {
    val j = h1.select(col("key"), col("b"), col("c").as("c1"))
      .join(h2.select(col("key"), col("b"), col("c").as("c2")),
        Seq("key", "b"), "full_outer")
      .select(col("key"), col("b"),
        coalesce(col("c1"), lit(0L)).as("c1"),
        coalesce(col("c2"), lit(0L)).as("c2"))
    val tot = j.groupBy("key").agg(sum(col("c1")).as("n1"),
      sum(col("c2")).as("n2"), count(lit(1)).as("nb"))
    val p = "(cast(c1 + 1 as double) / (n1 + nb))"
    val q = "(cast(c2 + 1 as double) / (n2 + nb))"
    j.join(tot, "key")
      .withColumn("tq", expr(
        s"cast(floor(16384.0 * (($p - $q) * ln($p / $q))) as bigint)"))
      .groupBy("key", "n1", "n2", "nb")
      .agg(sum(col("tq")).as("psi_q"))
      .select(col("key"), col("n1"), col("n2"),
        col("nb").cast("long").as("n_buckets"), col("psi_q"),
        (col("psi_q") > 3276).as("drift"))
  }
}
