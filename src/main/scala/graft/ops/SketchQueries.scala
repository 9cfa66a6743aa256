package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch queries (q121): count-min heavy hitters under the exact
  * differential oracle — the estimate arithmetic is pure integer mod
  * P, so DuckDB replays the identical counters and minima. The exact
  * per-term counts appear ONLY to measure the sketch's one-sided error
  * under the oracle; a production pipeline would serve estimates alone
  * (the whole point is never shuffling the token stream by term).
  */
object SketchQueries {
  type QFn = (SparkSession, String) => DataFrame

  private val P = "2147483647"

  /** DuckDB polynomial codepoint hash, = TextOps.polyHash. */
  private def dPoly(x: String) =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($x, ''), " +
      s"c -> CAST(unicode(c) AS BIGINT))), (a, c) -> (a*31 + c) % $P)"

  // ===================================================================
  // q121 — CMS heavy hitters: a depth=4 x width=512 count-min sketch
  // over every token occurrence; the corpus's true top-20 terms with
  // their exact and estimated counts. est_c >= true_c always (one-sided
  // error); at sf0.01 most heavy hitters estimate exactly.
  // ===================================================================

  private val q121: QFn = (s, d) => {
    val docs = PipelineQueries.wide(s, d, "documents", "doc_id")
    val tok = docs.select(
      explode(TextOps.tokens(col("text"))).as("term"))
    val counters = Sketches.cmsCounters(tok, "term", depth = 4,
      width = 512)
    val top = tok.groupBy("term").agg(count(lit(1)).as("true_c"))
      .orderBy(col("true_c").desc, col("term")).limit(20)
    Sketches.cmsEstimate(counters, top, "term", depth = 4, width = 512)
      .join(top, "term")
      .select(col("term"), col("true_c"), col("est_c"))
      .orderBy(col("true_c").desc, col("term"))
  }

  private val q121Sql = s"""
    WITH tok AS (SELECT unnest(list_filter(string_split(text, ' '),
        t -> t != '')) AS term FROM documents),
    th AS (SELECT term, ${dPoly("term")} AS h FROM tok),
    counters AS (SELECT t.r AS r,
        ((h * (1 + 7919 * t.r) + (1 + 104729 * t.r)) % $P) % 512 AS b,
        count(*) AS c
      FROM th, range(4) t(r) GROUP BY 1, 2),
    top AS (SELECT term, min(h) AS h, count(*) AS true_c FROM th
      GROUP BY 1 ORDER BY true_c DESC, term LIMIT 20),
    est AS (SELECT p.term, p.true_c, min(c.c) AS est_c
      FROM top p, range(4) t(r) JOIN counters c ON c.r = t.r
        AND c.b = ((p.h * (1 + 7919 * t.r) + (1 + 104729 * t.r))
          % $P) % 512
      GROUP BY 1, 2)
    SELECT term, true_c, est_c FROM est ORDER BY true_c DESC, term"""

  // ===================================================================
  // q123 — HyperLogLog distinct terms: m=64 registers over every token
  // occurrence; output = (exact_distinct, hll_est, nonzero_regs). The
  // exact count exists ONLY to expose the estimation error under the
  // oracle; the register build shuffles <= m cells at any corpus size.
  // ===================================================================

  private val q123: QFn = (s, d) => {
    val docs = PipelineQueries.wide(s, d, "documents", "doc_id")
    val tok = docs.select(
      explode(TextOps.tokens(col("text"))).as("term"))
    val est = Sketches.hllEstimate(
      Sketches.hllRegisters(tok, "term", m = 64), m = 64)
    val exact = tok.agg(countDistinct(col("term")).as("exact_distinct"))
    exact.crossJoin(est)
      .select(col("exact_distinct"), col("hll_est"),
        col("nonzero_regs"))
  }

  private val q123Sql = s"""
    WITH tok AS (SELECT unnest(list_filter(string_split(text, ' '),
        t -> t != '')) AS term FROM documents),
    th AS (SELECT term, ${dPoly("term")} AS h0,
        xor(h0, h0 >> 15) AS h1,
        (h1 * 739982445) & 2147483647 AS h2,
        xor(h2, h2 >> 12) AS h3,
        (h3 * 695872825) & 2147483647 AS h4,
        xor(h4, h4 >> 15) AS h
      FROM tok),
    reg AS (SELECT h % 64 AS b,
        max(CASE WHEN h // 64 = 0 THEN 26
          ELSE 25 - length(bin(h // 64)) + 1 END) AS mreg
      FROM th GROUP BY 1),
    agg AS (SELECT CAST(count(*) AS DOUBLE) AS present,
        sum(pow(2.0, -mreg)) AS s_present FROM reg),
    ex AS (SELECT count(DISTINCT term) AS exact_distinct FROM tok)
    SELECT exact_distinct,
      ${Sketches.hllEstimateSql(64, "s_present", "present")} AS hll_est,
      CAST(present AS BIGINT) AS nonzero_regs
    FROM ex, agg"""

  // ===================================================================
  // q134 — KMV cross-source overlap: a k=128 bottom-k sketch of each
  // source's shingle set, then every source pair's union cardinality and
  // Jaccard estimated FROM THE SKETCHES ALONE (Beyer et al. 2007 §4-5),
  // next to the exact values. The exact columns exist only to expose the
  // estimation error under the oracle — the production path shuffles
  // #partitions * k longs per source (map-side combined bounded state),
  // never the shingle sets; HLL (q123) cannot answer the intersection
  // question at all.
  // ===================================================================

  private val KmvK = 128

  private val q134: QFn = (s, d) => {
    import graft.functions.F
    val docs = PipelineQueries.wide(s, d, "documents", "doc_id")
    val sh0 = docs.select(col("source"),
        explode(TextOps.shingleHashes(col("text"), 3)).as("h0"))
      .select(col("source"), Sketches.avalanche31(col("h0")).as("h"))
    // The sketch consumes the RAW occurrence stream — KmvAgg dedups
    // inside its bounded state, so no distinct shuffle exists on the
    // production path. The distinct frame below feeds ONLY the
    // exact-truth columns.
    val sk = sh0.groupBy("source").agg(F.kmvAgg(col("h"), KmvK).as("sk"))
    // exact-truth path pinned on h (Par doc): HashPartitioning(h)
    // satisfies the distinct's (source, h) clustering AND the
    // intersection self-join's h key, so one explicit-N exchange keeps
    // the whole exact-pair chain at cluster parallelism — AQE's
    // byte-sized coalesce ran it on one core (3 x ~3 s single-task
    // jobs measured). The production KMV path above is untouched.
    val sh = Par.pin(sh0, col("h")).distinct()
    val ed = sh.groupBy("source").agg(count(lit(1)).as("ed"))
    val xi = sh.as("a").join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("sa"), col("b.source").as("sb"))
      .agg(count(lit(1)).as("ic"))
    val skm = sk.join(ed, "source")
    val pairs = skm.as("a").join(skm.as("b"),
        col("a.source") < col("b.source"))
      .select(col("a.source").as("sa"), col("b.source").as("sb"),
        col("a.sk").as("ska"), col("b.sk").as("skb"),
        (col("a.ed") + col("b.ed")).as("edsum"))
      .join(xi, Seq("sa", "sb"), "left")
      .withColumn("ic", coalesce(col("ic"), lit(0L)))
    pairs.select(
        col("sa").as("src_a"), col("sb").as("src_b"),
        (col("edsum") - col("ic")).as("exact_union"),
        Sketches.kmvDistinctEst(
          Sketches.kmvUnionK(col("ska"), col("skb"), KmvK), KmvK)
          .as("kmv_union_est"),
        expr("(ic * 1000000) div (edsum - ic)").as("exact_jacc_ppm"),
        Sketches.kmvJaccardPpm(col("ska"), col("skb"), KmvK)
          .as("kmv_jacc_ppm"))
      .orderBy(col("src_a"), col("src_b"))
  }

  private val q134Sql = s"""
    WITH toks AS (SELECT source,
        list_filter(string_split(text, ' '), x -> x != '') AS t
      FROM documents),
    sgl AS (SELECT source, unnest(CASE WHEN len(t) < 3
        THEN [array_to_string(t, ' ')]
        ELSE list_transform(range(len(t) - 2),
          i -> array_to_string(list_slice(t, i + 1, i + 3), ' ')) END) AS g
      FROM toks),
    sh AS (SELECT DISTINCT source, h FROM (SELECT source,
        ${dPoly("g")} AS h0, ${Sketches.avalanche31ColsSql} FROM sgl)),
    sk AS (SELECT source, h,
        row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM sh),
    skk AS (SELECT source, h FROM sk WHERE rn <= $KmvK),
    ed AS (SELECT source, count(*) AS ed FROM sh GROUP BY 1),
    srcs AS (SELECT DISTINCT source FROM sh),
    pairs AS (SELECT a.source sa, b.source sb FROM srcs a
      JOIN srcs b ON a.source < b.source),
    uk AS (SELECT sa, sb, h,
        row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn FROM
      (SELECT DISTINCT p.sa, p.sb, s.h FROM pairs p
        JOIN skk s ON s.source = p.sa OR s.source = p.sb)),
    ukk AS (SELECT sa, sb, h FROM uk WHERE rn <= $KmvK),
    umeta AS (SELECT sa, sb, count(*) AS uc, max(h) AS ukth
      FROM ukk GROUP BY 1, 2),
    m AS (SELECT u.sa, u.sb, count(*) AS mc FROM ukk u
      JOIN skk x ON x.source = u.sa AND x.h = u.h
      JOIN skk y ON y.source = u.sb AND y.h = u.h GROUP BY 1, 2),
    xi AS (SELECT a.source sa, b.source sb, count(*) ic FROM sh a
      JOIN sh b ON a.h = b.h AND a.source < b.source GROUP BY 1, 2)
    SELECT p.sa AS src_a, p.sb AS src_b,
      ea.ed + eb.ed - coalesce(xi.ic, 0) AS exact_union,
      CASE WHEN um.uc < $KmvK THEN um.uc
        ELSE (${KmvK - 1} * 2147483648) // um.ukth END AS kmv_union_est,
      (coalesce(xi.ic, 0) * 1000000)
        // (ea.ed + eb.ed - coalesce(xi.ic, 0)) AS exact_jacc_ppm,
      (coalesce(m.mc, 0) * 1000000) // um.uc AS kmv_jacc_ppm
    FROM pairs p
    JOIN ed ea ON ea.source = p.sa
    JOIN ed eb ON eb.source = p.sb
    JOIN umeta um ON um.sa = p.sa AND um.sb = p.sb
    LEFT JOIN xi ON xi.sa = p.sa AND xi.sb = p.sb
    LEFT JOIN m ON m.sa = p.sa AND m.sb = p.sb
    ORDER BY 1, 2"""

  // ===================================================================
  // q138 — STANDING per-source KMV index: sketches built on doc_id <
  // 250 fold the 250.. batch via per-key bottom-k union (an idempotent
  // lattice join), then the per-source cardinality summary is served
  // from the folded artifact ALONE. The oracle sketches the whole
  // corpus in one shot: fold == rebuild, cross-engine. (The ingest-gate
  // replay discipline is StreamOps.kmvIngestBatchOnce — spec-covered.)
  // ===================================================================

  private val q138: QFn = (s, d) => {
    val docs = PipelineQueries.wide(s, d, "documents", "doc_id")
    def hashes(df: org.apache.spark.sql.DataFrame) = df.select(
        col("source"),
        explode(TextOps.shingleHashes(col("text"), 3)).as("h0"))
      .select(col("source"), Sketches.avalanche31(col("h0")).as("h"))
    val idx = Sketches.kmvMergeKeyed(
      Sketches.kmvKeyed(hashes(docs.filter(col("doc_id") < 250)),
        "source", "h", KmvK),
      Sketches.kmvKeyed(hashes(docs.filter(col("doc_id") >= 250)),
        "source", "h", KmvK),
      KmvK)
    idx.select(col("key").as("source"),
        size(col("sk")).cast("long").as("kmv_size"),
        element_at(col("sk"), size(col("sk"))).as("kmv_kth"),
        Sketches.kmvDistinctEst(col("sk"), KmvK).as("kmv_est"))
      .orderBy(col("source"))
  }

  private val q138Sql = s"""
    WITH toks AS (SELECT source,
        list_filter(string_split(text, ' '), x -> x != '') AS t
      FROM documents),
    sgl AS (SELECT source, unnest(CASE WHEN len(t) < 3
        THEN [array_to_string(t, ' ')]
        ELSE list_transform(range(len(t) - 2),
          i -> array_to_string(list_slice(t, i + 1, i + 3), ' ')) END) AS g
      FROM toks),
    sh AS (SELECT DISTINCT source, h FROM (SELECT source,
        ${dPoly("g")} AS h0, ${Sketches.avalanche31ColsSql} FROM sgl)),
    sk AS (SELECT source, h,
        row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM sh),
    skk AS (SELECT source, h FROM sk WHERE rn <= $KmvK)
    SELECT source, count(*) AS kmv_size, max(h) AS kmv_kth,
      CASE WHEN count(*) < $KmvK THEN count(*)
        ELSE (${KmvK - 1} * 2147483648) // max(h) END AS kmv_est
    FROM skk GROUP BY source ORDER BY source"""

  // ===================================================================
  // q140 — log-lattice quantile histogram: per-source p50/p90/p99 of
  // doc token counts from a BOUNDED mergeable bucket histogram (HDR
  // bucketing: exact < 8, 8 sub-buckets/octave, bucket width <= 12.5%
  // of its lower bound), next to the exact nearest-rank values. The
  // histogram shuffles <= #buckets cells per source at any corpus
  // size; the exact columns exist to expose quantization error under
  // the oracle.
  // ===================================================================

  private val q140: QFn = (s, d) => {
    val docs = PipelineQueries.wide(s, d, "documents", "doc_id")
    val toks = docs.select(col("source"),
      size(TextOps.tokens(col("text"))).cast("long").as("n"))
    val est = Sketches.quantileEst(
      Sketches.quantileHistogram(toks, "source", "n"), Seq(50, 90, 99))
    val vhist = toks.groupBy(col("source").as("key"), col("n").as("b"))
      .agg(count(lit(1)).as("c"))
    val exact = Sketches.quantileEst(vhist, Seq(50, 90, 99), b => b)
    est.withColumnRenamed("est", "q_est")
      .join(exact.withColumnRenamed("est", "q_exact"), Seq("key", "pct"))
      .select(col("key").as("source"), col("pct"), col("q_est"),
        col("q_exact"))
      .orderBy(col("source"), col("pct"))
  }

  private val q140Sql = s"""
    WITH tk AS (SELECT source, CAST(len(list_filter(
        string_split(text, ' '), t -> t != '')) AS BIGINT) AS n
      FROM documents),
    hist AS (SELECT source, ${Sketches.logBucketDuck("n")} AS b,
        count(*) AS c FROM tk GROUP BY 1, 2),
    cum AS (SELECT source, b, sum(c) OVER (PARTITION BY source ORDER BY b
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM hist),
    tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM hist
      GROUP BY 1),
    pcts AS (SELECT unnest([50, 90, 99]) AS pct),
    est AS (SELECT cum.source, pct,
        min(${Sketches.bucketLbDuck("b")}) AS q_est
      FROM cum JOIN tot USING (source)
      JOIN pcts ON cum.cum * 100 >= pct * tot.n GROUP BY 1, 2),
    vcum AS (SELECT source, v, sum(c) OVER (PARTITION BY source ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM (SELECT source, n AS v, count(*) AS c FROM tk GROUP BY 1, 2)),
    ex AS (SELECT vcum.source, pct, min(v) AS q_exact
      FROM vcum JOIN tot USING (source)
      JOIN pcts ON vcum.cum * 100 >= pct * tot.n GROUP BY 1, 2)
    SELECT source, pct, q_est, q_exact FROM est
    JOIN ex USING (source, pct) ORDER BY source, pct"""

  // ===================================================================
  // q151 — STANDING quantile-histogram index: per-source histograms on
  // doc_id < 250 fold the 250.. batch by cell-wise addition, then the
  // p50/p90/p99 summary serves from the folded artifact ALONE. The
  // oracle builds the histogram over the whole corpus in one shot:
  // fold == rebuild (integer cell addition), cross-engine — the q138
  // discipline for the quantile sketch. (Replay safety is
  // StreamOps.quantileIngestBatchOnce — spec-covered.)
  // ===================================================================

  private val q151: QFn = (s, d) => {
    val docs = PipelineQueries.wide(s, d, "documents", "doc_id")
    def toks(df: org.apache.spark.sql.DataFrame) = df.select(
      col("source"), size(TextOps.tokens(col("text"))).cast("long")
        .as("n"))
    val folded = Sketches
      .quantileHistogram(toks(docs.filter(col("doc_id") < 250)),
        "source", "n")
      .unionByName(Sketches.quantileHistogram(
        toks(docs.filter(col("doc_id") >= 250)), "source", "n"))
      .groupBy("key", "b").agg(sum(col("c")).as("c"))
    Sketches.quantileEst(folded, Seq(50, 90, 99))
      .select(col("key").as("source"), col("pct"),
        col("est").as("q_est"))
      .orderBy(col("source"), col("pct"))
  }

  private val q151Sql = s"""
    WITH tk AS (SELECT source, CAST(len(list_filter(
        string_split(text, ' '), t -> t != '')) AS BIGINT) AS n
      FROM documents),
    hist AS (SELECT source, ${Sketches.logBucketDuck("n")} AS b,
        count(*) AS c FROM tk GROUP BY 1, 2),
    cum AS (SELECT source, b, sum(c) OVER (PARTITION BY source ORDER BY b
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM hist),
    tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM hist
      GROUP BY 1),
    pcts AS (SELECT unnest([50, 90, 99]) AS pct)
    SELECT cum.source, pct, min(${Sketches.bucketLbDuck("b")}) AS q_est
    FROM cum JOIN tot USING (source)
    JOIN pcts ON cum.cum * 100 >= pct * tot.n
    GROUP BY 1, 2 ORDER BY 1, 2"""

  // ===================================================================
  // q164 — PSI distribution drift between two time batches (population
  // stability index — the standard model-monitoring drift score, e.g.
  // Siddiqi, "Credit Risk Scorecards", 2006): per event type, PSI of
  // the value distribution between the first three weeks and the rest,
  // over the SAME bounded log-lattice buckets the quantile-histogram
  // family uses (HDR octave buckets — so the two inputs are exactly
  // the mergeable histograms a q151-style standing index already
  // maintains; drift detection composes with the standing artifact for
  // free). Determinism: Laplace +1 smoothing kills ln(0); each
  // bucket's term is floored onto the 2^-14 lattice FIRST (shared
  // expression text, the pmiQ/nbLp precedent), then integer-summed —
  // no float reduction order anywhere. Scale: two <= #buckets-cell
  // histograms + arithmetic on bucket rows only; the corpus is
  // touched exactly twice, map-side combined.
  // ===================================================================

  private val q164: QFn = (s, d) => {
    val splitUs = 1705881600000000L // 2024-01-22T00:00:00Z, q162's split
    val base = graft.engine.Tables.load(s, d, "events")
      .select(col("event_type").as("key"),
        unix_micros(col("ts")).as("tu"),
        expr("cast(floor(value * 1000) as bigint)").as("vq"))
    val lb = Sketches.logBucketSpark("vq")
    def hist(df: DataFrame, cn: String) =
      df.select(col("key"), expr(lb).as("b"))
        .groupBy("key", "b").agg(count(lit(1)).as(cn))
    Sketches.psi(
        hist(base.filter(col("tu") < splitUs), "c")
          .select(col("key"), col("b"), col("c")),
        hist(base.filter(col("tu") >= splitUs), "c")
          .select(col("key"), col("b"), col("c")))
      .withColumnRenamed("key", "etype")
      .orderBy(col("etype"))
  }

  private val q164Sql = s"""
    WITH ev AS (SELECT event_type AS key, epoch_us(ts) AS tu,
        CAST(floor(value * 1000) AS BIGINT) AS vq FROM events),
    h1 AS (SELECT key, ${Sketches.logBucketDuck("vq")} AS b,
        count(*) AS c1 FROM ev WHERE tu < 1705881600000000
      GROUP BY 1, 2),
    h2 AS (SELECT key, ${Sketches.logBucketDuck("vq")} AS b,
        count(*) AS c2 FROM ev WHERE tu >= 1705881600000000
      GROUP BY 1, 2),
    j AS (SELECT coalesce(h1.key, h2.key) AS key,
        coalesce(h1.b, h2.b) AS b,
        CAST(coalesce(c1, 0) AS BIGINT) AS c1,
        CAST(coalesce(c2, 0) AS BIGINT) AS c2
      FROM h1 FULL JOIN h2 ON h1.key = h2.key AND h1.b = h2.b),
    tot AS (SELECT key, CAST(sum(c1) AS BIGINT) AS n1,
        CAST(sum(c2) AS BIGINT) AS n2, count(*) AS nb FROM j
      GROUP BY 1),
    term AS (SELECT j.key, n1, n2, nb,
        CAST(floor(16384.0 * (((CAST(c1 + 1 AS DOUBLE) / (n1 + nb)) -
          (CAST(c2 + 1 AS DOUBLE) / (n2 + nb))) *
          ln((CAST(c1 + 1 AS DOUBLE) / (n1 + nb)) /
            (CAST(c2 + 1 AS DOUBLE) / (n2 + nb))))) AS BIGINT) AS tq
      FROM j JOIN tot ON j.key = tot.key)
    SELECT key AS etype, n1, n2, CAST(nb AS BIGINT) AS n_buckets,
      CAST(sum(tq) AS BIGINT) AS psi_q,
      CAST(sum(tq) AS BIGINT) > 3276 AS drift
    FROM term GROUP BY key, n1, n2, nb ORDER BY etype"""

  val queries: Map[String, QFn] = Map(
    "q164_psi_drift" -> q164,
    "q121_cms_heavy_hitters" -> q121,
    "q123_hll_distinct" -> q123,
    "q134_kmv_overlap" -> q134,
    "q138_kmv_standing_index" -> q138,
    "q140_quantile_histogram" -> q140,
    "q151_quantile_standing_index" -> q151)
  val oracles: Map[String, String] = Map(
    "q164_psi_drift" -> q164Sql,
    "q121_cms_heavy_hitters" -> q121Sql,
    "q123_hll_distinct" -> q123Sql,
    "q134_kmv_overlap" -> q134Sql,
    "q138_kmv_standing_index" -> q138Sql,
    "q140_quantile_histogram" -> q140Sql,
    "q151_quantile_standing_index" -> q151Sql)
}
