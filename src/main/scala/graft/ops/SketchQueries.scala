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

  val queries: Map[String, QFn] = Map(
    "q121_cms_heavy_hitters" -> q121,
    "q123_hll_distinct" -> q123)
  val oracles: Map[String, String] = Map(
    "q121_cms_heavy_hitters" -> q121Sql,
    "q123_hll_distinct" -> q123Sql)
}
