package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Corpus-curation queries (q104-q106) over [[Curation]]: DSIR hashed
  * n-gram importance selection, BPE merge-rule training, and DoReMi-style
  * domain mixture reweighting. Same cross-engine determinism contract as
  * PipelineQueries: polynomial hashing mod 2^31-1, integer aggregates,
  * explicit left-folds for the few float reductions, and `ln` fenced
  * behind a single per-bucket integer quantization (weight sums are then
  * exact BIGINT arithmetic in both engines).
  */
object CurationQueries {
  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Widen a single-split scan to the cluster's parallelism (same
    * rationale as PipelineQueries.wide: the testdata tables are one
    * small parquet file -> one input split, which would serialize the
    * CPU-bound per-doc hashing; on a real layout this is the identity). */
  private def wide(s: SparkSession, dir: String, n: String, key: String): DataFrame = {
    val df = t(s, dir, n)
    val cores = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(col(key)) else df
  }

  private val P = "2147483647"

  /** DuckDB twins of TextOps.tokens / TextOps.polyHash (same fragments as
    * PipelineQueries; kept private there by design — the duplication is
    * the two-dialect contract, not shared code). */
  private def dToks(x: String) =
    s"list_filter(string_split($x, ' '), t -> t != '')"
  private def dPoly(x: String) =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($x, ''), c -> CAST(unicode(c) AS BIGINT))), " +
      s"(a, c) -> (a*31 + c) % $P)"

  /** Curation.featureBuckets twin: unigram then bigram buckets, text
    * order, polyHash mod b. */
  private def dFeat(toks: String, b: Int) =
    s"list_transform(list_concat($toks, CASE WHEN len($toks) < 2 THEN [] " +
      s"ELSE list_transform(range(len($toks) - 1), " +
      s"i -> ($toks)[i+1] || ' ' || ($toks)[i+2]) END), g -> ${dPoly("g")} % $b)"

  // =====================================================================
  // q104 — DSIR importance selection (Xie et al. 2023): target = English
  // docs, raw = whole pool; keep the 40 most target-like raw docs by
  // integer-quantized hashed-bigram log-ratio weight.
  // =====================================================================

  private val q104: QFn = (s, d) => {
    val docs = wide(s, d, "documents", "doc_id")
    Curation.dsirSelect(docs.filter(col("lang") === "en"), docs,
      "text", "doc_id", numBuckets = 512, topK = 40)
  }

  /** DSIR oracle builder: target/raw histogram predicates, scoring-pool
    * predicate, top-k. The oracle always builds the histograms over the
    * FULL target/raw ranges in one shot — against the Spark side's
    * batch-folded index (q107) this differentially proves
    * fold == rebuild, the property integer histograms guarantee. */
  private def dsirSql(targetPred: String, rawPred: String,
      scorePred: String, k: Int) = s"""
WITH fb AS (
  SELECT doc_id, lang, ${dFeat(dToks("text"), 512)} AS fs
  FROM documents),
tcounts AS (SELECT b, count(*) AS tc
  FROM (SELECT unnest(fs) AS b FROM fb WHERE $targetPred) GROUP BY 1),
rcounts AS (SELECT b, count(*) AS rc
  FROM (SELECT unnest(fs) AS b FROM fb WHERE $rawPred) GROUP BY 1),
tots AS (SELECT CAST((SELECT sum(tc) FROM tcounts) AS BIGINT) AS tn,
                CAST((SELECT sum(rc) FROM rcounts) AS BIGINT) AS rn),
lr AS (SELECT r.b, CAST(floor(16384.0 * ln(
    (CAST(coalesce(t.tc, 0) + 1 AS DOUBLE) / (tots.tn + 512)) /
    (CAST(coalesce(r2.rc, 0) + 1 AS DOUBLE) / (tots.rn + 512))
  )) AS BIGINT) AS w
  FROM range(512) r(b)
  LEFT JOIN tcounts t ON r.b = t.b
  LEFT JOIN rcounts r2 ON r.b = r2.b, tots),
ws AS (SELECT list(w ORDER BY b) AS ws FROM lr),
scored AS (SELECT doc_id,
  list_reduce(list_prepend(CAST(0 AS BIGINT),
    list_transform(fs, f -> ws.ws[f+1])), (a, x) -> a + x) AS weight_q
  FROM fb, ws WHERE $scorePred)
SELECT CAST(row_number() OVER (ORDER BY weight_q DESC, doc_id) AS INT) AS rank,
  doc_id, weight_q
FROM scored ORDER BY weight_q DESC, doc_id LIMIT $k"""

  private val q104Sql = dsirSql("lang = 'en'", "TRUE", "TRUE", 40)

  // =====================================================================
  // q107 — STANDING DSIR index through the driver gate: the corpus
  // index (doc_id < 200) folds in a second batch (200..399) via
  // refreshDsirIndex — exact integer histogram addition — then scores
  // an unseen pool (doc_id >= 400) from the artifact alone. The oracle
  // builds the histograms over the full 0..399 range in one shot:
  // fold == rebuild, cross-engine.
  // =====================================================================

  private val q107: QFn = (s, d) => {
    val docs = wide(s, d, "documents", "doc_id")
    def en(df: DataFrame) = df.filter(col("lang") === "en")
    val c1 = docs.filter(col("doc_id") < 200)
    val c2 = docs.filter(col("doc_id") >= 200 && col("doc_id") < 400)
    val idx = Curation.refreshDsirIndex(
      Curation.dsirIndex(en(c1), c1, "text", numBuckets = 512),
      en(c2), c2, "text")
    Curation.dsirScoreFromIndex(idx, docs.filter(col("doc_id") >= 400),
      "text", "doc_id", topK = 30)
  }

  private val q107Sql = dsirSql("lang = 'en' AND doc_id < 400",
    "doc_id < 400", "doc_id >= 400", 30)

  // =====================================================================
  // q105 — BPE merge training (Sennrich et al. 2016): first 6 merge rules
  // over the corpus word dictionary. The oracle unrolls the 6 iterations
  // as chained CTEs (pair counts -> argmax -> sentinel-preserving
  // replace), replaying Curation.bpeMerges step for step.
  // =====================================================================

  private val bpeK = 6

  private val q105: QFn = (s, d) =>
    Curation.bpeMerges(t(s, d, "documents"), "text", bpeK)

  private def dPairs(dict: String) =
    s"SELECT pair, CAST(sum(cnt) AS BIGINT) AS pc FROM " +
      s"(SELECT unnest(CASE WHEN len(toks) < 2 THEN [] " +
      s"ELSE list_transform(range(len(toks) - 1), " +
      s"i -> '|' || toks[i+1] || '|' || toks[i+2]) END) AS pair, cnt " +
      s"FROM (SELECT string_split(seq[2:], '|') AS toks, cnt FROM $dict)) " +
      s"GROUP BY 1"

  /** The unrolled BPE training chain d1 -> (p_i, b_i, d_i+1) shared by
    * the train (q105) and encode (q108) oracles. */
  private def bpeCtes(k: Int): Seq[String] = {
    val base = s"d1 AS (SELECT '|' || array_to_string(string_split(word, ''), '|') AS seq, cnt" +
      s" FROM (SELECT word, count(*) AS cnt FROM" +
      s" (SELECT unnest(${dToks("text")}) AS word FROM documents) GROUP BY 1))"
    base +: (1 to k).flatMap { i =>
      val step = Seq(
        s"p$i AS (${dPairs(s"d$i")})",
        s"b$i AS (SELECT pair, pc FROM p$i ORDER BY pc DESC, pair LIMIT 1)")
      if (i < k) step :+ (s"d${i + 1} AS (SELECT replace(seq, b$i.pair, " +
        s"'|' || replace(b$i.pair[2:], '|', '')) AS seq, cnt FROM d$i, b$i)")
      else step
    }
  }

  private val q105Sql: String = {
    val sels = (1 to bpeK).map { i =>
      s"SELECT $i AS step, replace(pair[2:], '|', '~') AS pair, " +
        s"replace(pair, '|', '') AS merged, pc AS pair_count FROM b$i"
    }
    "WITH " + bpeCtes(bpeK).mkString(",\n") + "\n" +
      sels.mkString(" UNION ALL ") + " ORDER BY step"
  }

  // =====================================================================
  // q108 — BPE ENCODE with the trained merges: per doc (doc_id < 60),
  // whitespace-token count and BPE symbol count after applying the six
  // q105 merges in training order. The merge list rides as one
  // broadcast row; the encode pass is map-only. The oracle re-trains
  // the merges (shared CTE chain) and replays the same per-word fold.
  // =====================================================================

  private val q108: QFn = (s, d) => {
    val docs = wide(s, d, "documents", "doc_id")
    Curation.bpeEncode(docs, Curation.bpeMerges(docs, "text", bpeK),
        "text", "doc_id")
      .filter(col("doc_id") < 60)
      .orderBy(col("doc_id"))
  }

  private val q108Sql: String = {
    val marr = "marr AS (SELECT [" +
      (1 to bpeK).map(i => s"(SELECT pair FROM b$i)").mkString(", ") +
      "] AS ms)"
    val enc = s"""enc AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok,
  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(toks, w ->
    len(string_split(list_reduce(
      list_prepend('|' || array_to_string(string_split(w, ''), '|'), ms),
      (acc, m) -> replace(acc, m, '|' || replace(m[2:], '|', ''))), '|')) - 1)),
    (a, x) -> a + x) AS BIGINT) AS n_sym
  FROM (SELECT doc_id, ${dToks("text")} AS toks FROM documents), marr)"""
    "WITH " + (bpeCtes(bpeK) ++ Seq(marr, enc)).mkString(",\n") +
      "\nSELECT doc_id, n_tok, n_sym FROM enc WHERE doc_id < 60 ORDER BY doc_id"
  }

  // =====================================================================
  // q106 — DoReMi-flavoured domain mixture: per-source token totals,
  // sqrt-tempered shares, basis-point sampling rates under a 0.6 global
  // budget, and the deterministic content-hash sample drawn at each rate.
  // =====================================================================

  private val q106: QFn = (s, d) =>
    Curation.domainMixture(t(s, d, "documents"),
      "text", "doc_id", "source", budgetBp = 6000)

  private val q106Sql = s"""
WITH tok AS (SELECT source, doc_id AS id, text,
    CAST(len(${dToks("text")}) AS BIGINT) AS n_tok FROM documents),
src AS (SELECT source, count(*) AS n_docs,
    CAST(sum(n_tok) AS BIGINT) AS tokens FROM tok GROUP BY 1),
tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS tt FROM src),
tempered AS (SELECT src.*, tot.tt,
    sqrt(CAST(tokens AS DOUBLE) / tt) AS r FROM src, tot),
norm AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
    list(r ORDER BY source)), (a, x) -> a + x) AS rs FROM tempered),
wts AS (SELECT source, n_docs, tokens,
    CAST(floor(6000.0 * (r / rs) / (CAST(tokens AS DOUBLE) / tt)) AS BIGINT)
      AS rate_bp
  FROM tempered, norm),
sel AS (SELECT t.source, count(*) AS n_sampled
  FROM tok t JOIN wts w ON t.source = w.source
  WHERE ${dPoly("t.text || '|' || CAST(t.id AS VARCHAR)")} % 10000
    < least(w.rate_bp, 10000)
  GROUP BY 1)
SELECT w.source, w.n_docs, w.tokens, w.rate_bp,
  CAST(coalesce(s.n_sampled, 0) AS BIGINT) AS n_sampled
FROM wts w LEFT JOIN sel s ON w.source = s.source"""

  // =====================================================================
  // q109 — bigram-LM quality outliers (CCNet-style perplexity filter):
  // add-one-smoothed bigram conditionals trained on the corpus itself,
  // docs ranked by mean quantized surprisal, 25 least predictable.
  // =====================================================================

  private val q109: QFn = (s, d) =>
    Curation.lmQuality(wide(s, d, "documents", "doc_id"),
      "text", "doc_id", topK = 25)

  private val q109Sql = s"""
WITH dt AS (SELECT doc_id, ${dToks("text")} AS ts FROM documents),
db AS (SELECT doc_id, bg[1] AS w1, bg[2] AS w2 FROM
  (SELECT doc_id, unnest(CASE WHEN len(ts) < 2 THEN []
    ELSE list_transform(range(len(ts) - 1), i -> [ts[i+1], ts[i+2]]) END) AS bg
   FROM dt)),
uni AS (SELECT w1, count(*) AS c1 FROM (SELECT unnest(ts) AS w1 FROM dt)
  GROUP BY 1),
big AS (SELECT w1, w2, count(*) AS c2 FROM db GROUP BY 1, 2),
vocab AS (SELECT count(*) AS v FROM uni),
lp AS (SELECT doc_id,
    -CAST(floor(16384.0 * ln(CAST(c2 + 1 AS DOUBLE) / (c1 + v))) AS BIGINT)
      AS lp
  FROM db JOIN big USING (w1, w2) JOIN uni USING (w1), vocab),
sc AS (SELECT doc_id, count(*) AS n_big,
    CAST(sum(lp) // count(*) AS BIGINT) AS score_q FROM lp GROUP BY 1)
SELECT CAST(row_number() OVER (ORDER BY score_q DESC, doc_id) AS INT) AS rank,
  doc_id, n_big, score_q
FROM sc ORDER BY score_q DESC, doc_id LIMIT 25"""

  // =====================================================================
  // q130 — Naive Bayes language classifier (the fastText-style
  // supervised filter of production curation stacks): train per-lang
  // token counts on doc_id < 250, classify the held-out 250.. pool by
  // quantized-lattice argmax. The oracle replays the identical smoothed
  // log-prob expression (Curation.nbLp / nbPrior — one shared text).
  // =====================================================================

  private val q130: QFn = (s, d) => {
    val docs = wide(s, d, "documents", "doc_id")
    val counts = Curation.nbCounts(docs.filter(col("doc_id") < 250),
      "text", "lang")
    Curation.nbClassify(counts, docs.filter(col("doc_id") >= 250),
        "text", "doc_id")
      .join(t(s, d, "documents").select(col("doc_id"), col("lang")),
        Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("pred_label").as("pred_lang"),
        col("n_tok"), col("score_q"))
      .orderBy(col("doc_id"))
  }

  /** NB oracle builder: one-shot train over `trainPred`, classify
    * `scorePred` — against q131's batch-folded Spark artifact this
    * differentially proves fold == rebuild (integer count histograms,
    * the dsirSql discipline). */
  private def nbSql(trainPred: String, scorePred: String) = s"""
WITH dt AS (SELECT doc_id, lang, ${dToks("text")} AS ts FROM documents),
tr AS (SELECT lang AS label, unnest(ts) AS w FROM dt WHERE $trainPred),
wc AS (SELECT label, w, count(*) AS c FROM tr GROUP BY 1, 2),
dc AS (SELECT lang AS label, count(*) AS dc FROM dt WHERE $trainPred
  GROUP BY 1),
tot AS (SELECT label, CAST(sum(c) AS BIGINT) AS tot FROM wc GROUP BY 1),
nv AS (SELECT (SELECT CAST(sum(dc) AS BIGINT) FROM dc) AS n,
              (SELECT count(DISTINCT w) FROM wc) AS v),
lbl AS (SELECT t.label, t.tot FROM tot t),
vocab AS (SELECT DISTINCT w FROM wc),
model AS (SELECT vocab.w, lbl.label,
    ${Curation.nbLp("coalesce(wc.c, 0)", "lbl.tot", "nv.v")} AS lp
  FROM vocab CROSS JOIN lbl CROSS JOIN nv
  LEFT JOIN wc ON wc.w = vocab.w AND wc.label = lbl.label),
pri AS (SELECT label, ${Curation.nbPrior("dc", "nv.n")} AS pq
  FROM dc CROSS JOIN nv),
doctok AS (SELECT doc_id, lang, unnest(ts) AS w FROM dt WHERE $scorePred),
parts AS (SELECT d.doc_id, d.lang, m.label, count(*) AS n_tok,
    CAST(sum(m.lp) AS BIGINT) AS s
  FROM doctok d JOIN model m ON d.w = m.w GROUP BY 1, 2, 3),
sc AS (SELECT p.doc_id, p.lang, p.label, p.n_tok, p.s + pri.pq AS score_q
  FROM parts p JOIN pri ON p.label = pri.label),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
    ORDER BY score_q DESC, label) AS rn FROM sc)
SELECT doc_id, lang, label AS pred_lang, n_tok, score_q
FROM r WHERE rn = 1 ORDER BY doc_id"""

  private val q130Sql = nbSql("doc_id < 250", "doc_id >= 250")

  // =====================================================================
  // q131 — STANDING NB classifier index through the driver gate: counts
  // on doc_id < 150 fold a second labeled batch (150..299) via
  // refreshNbCounts — exact integer addition — then the held-out
  // 300.. pool is classified from the artifact alone. The oracle trains
  // 0..299 in one shot: fold == rebuild, cross-engine.
  // =====================================================================

  private val q131: QFn = (s, d) => {
    val docs = wide(s, d, "documents", "doc_id")
    val idx = Curation.refreshNbCounts(
      Curation.nbCounts(docs.filter(col("doc_id") < 150), "text", "lang"),
      docs.filter(col("doc_id") >= 150 && col("doc_id") < 300),
      "text", "lang")
    Curation.nbClassify(idx, docs.filter(col("doc_id") >= 300),
        "text", "doc_id")
      .join(t(s, d, "documents").select(col("doc_id"), col("lang")),
        Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("pred_label").as("pred_lang"),
        col("n_tok"), col("score_q"))
      .orderBy(col("doc_id"))
  }

  private val q131Sql = nbSql("doc_id < 300", "doc_id >= 300")

  // =====================================================================
  // q132 — stupid-backoff trigram LM held-out scoring (Brants et al.
  // 2007): trigram/bigram/unigram counts trained on doc_id < 300
  // (trigrams pruned to count >= 2 — the production Zipf move), the
  // 300.. pool scored by mean quantized surprisal with the 0.4-per-level
  // backoff chain. One shared CASE/ln expression text (Curation.sbLp).
  // =====================================================================

  private val q132: QFn = (s, d) => {
    val docs = wide(s, d, "documents", "doc_id")
    Curation.backoffScores(docs.filter(col("doc_id") < 300),
        docs.filter(col("doc_id") >= 300), "text", "doc_id", minCount = 2)
      .orderBy(col("doc_id"))
  }

  private val q132Sql = s"""
WITH dt AS (SELECT doc_id, ${dToks("text")} AS ts FROM documents),
uni AS (SELECT w, count(*) AS cu FROM
  (SELECT unnest(ts) AS w FROM dt WHERE doc_id < 300) GROUP BY 1),
big AS (SELECT g[1] AS w1, g[2] AS w2, count(*) AS cb FROM
  (SELECT unnest(CASE WHEN len(ts) < 2 THEN []
     ELSE list_transform(range(len(ts) - 1), i -> [ts[i+1], ts[i+2]]) END)
     AS g FROM dt WHERE doc_id < 300) GROUP BY 1, 2),
tri AS (SELECT g[1] AS w1, g[2] AS w2, g[3] AS w3, count(*) AS c3 FROM
  (SELECT unnest(CASE WHEN len(ts) < 3 THEN []
     ELSE list_transform(range(len(ts) - 2),
       i -> [ts[i+1], ts[i+2], ts[i+3]]) END)
     AS g FROM dt WHERE doc_id < 300) GROUP BY 1, 2, 3
  HAVING count(*) >= 2),
nv AS (SELECT (SELECT CAST(sum(cu) AS BIGINT) FROM uni) AS n,
              (SELECT count(*) FROM uni) AS v),
doctri AS (SELECT doc_id, g[1] AS w1, g[2] AS w2, g[3] AS w3 FROM
  (SELECT doc_id, unnest(CASE WHEN len(ts) < 3 THEN []
     ELSE list_transform(range(len(ts) - 2),
       i -> [ts[i+1], ts[i+2], ts[i+3]]) END)
     AS g FROM dt WHERE doc_id >= 300)),
j AS (SELECT doc_id, ${Curation.sbLp("coalesce(t.c3, 0)",
    "coalesce(b12.cb, 0)", "coalesce(b23.cb, 0)", "coalesce(u2.cu, 0)",
    "coalesce(u3.cu, 0)", "nv.n", "nv.v")} AS lp
  FROM doctri d
  LEFT JOIN tri t ON d.w1 = t.w1 AND d.w2 = t.w2 AND d.w3 = t.w3
  LEFT JOIN big b12 ON d.w1 = b12.w1 AND d.w2 = b12.w2
  LEFT JOIN big b23 ON d.w2 = b23.w1 AND d.w3 = b23.w2
  LEFT JOIN uni u2 ON d.w2 = u2.w
  LEFT JOIN uni u3 ON d.w3 = u3.w
  CROSS JOIN nv)
SELECT doc_id, count(*) AS n_tri, CAST(sum(lp) // count(*) AS BIGINT)
  AS score_q
FROM j GROUP BY 1 ORDER BY 1"""

  // =====================================================================
  // q135 — Efraimidis–Spirakis weighted sampling without replacement:
  // draw 100 docs with inverse-frequency source weights (equal weight
  // mass per source => source-flat sample from a skewed pool). The
  // selection is a global top-k by the integer exponential-race key —
  // TakeOrderedAndProject, never a full sort; the single ln sits on the
  // 2^-20 lattice with the expression text shared with the oracle.
  // =====================================================================

  private val q135: QFn = (s, d) => {
    val docs = wide(s, d, "documents", "doc_id")
    Curation.weightedSample(docs, "text", "doc_id", "source",
        Curation.flatteningWeights(docs, "source"), k = 100)
      .withColumnRenamed("id", "doc_id")
  }

  private val q135Sql = s"""
WITH base AS (SELECT doc_id, source, h FROM (SELECT doc_id, source,
    ${dPoly("text")} AS h0, ${Sketches.avalanche31ColsSql}
  FROM documents)),
wts AS (SELECT source, 1000000000 // count(*) AS w
  FROM base GROUP BY source),
keyed AS (SELECT doc_id, b.source, w,
    ${Curation.esElnqSql} AS elnq,
    (elnq * 1000000) // w AS skey
  FROM base b JOIN wts USING (source))
SELECT doc_id, source, w, skey FROM keyed
ORDER BY skey, doc_id LIMIT 100"""

  // =====================================================================
  // q147 — PMI co-occurrence mining (Church & Hanks 1990): pointwise
  // mutual information of token pairs within a ±2 window, the classic
  // association table behind embedding prep / collocation analysis.
  // Counts are pure hash-aggregates (pairs materialize map-only from
  // per-doc arrays — no self-join); the single ln lands on the 2^-14
  // lattice with its expression text shared with the oracle, and every
  // division sequence runs in DOUBLE (ratio form, no int64 N² overflow
  // at any corpus size). Output: top 30 pairs with count >= 5.
  // =====================================================================

  /** The quantized-PMI expression, ONE text shared with DuckDB:
    * pmi_q = floor(2^14 * ln(((cp/P) / (na/N)) / (nb/N))). */
  private def pmiQ(cp: String, p: String, na: String, nb: String,
      n: String) =
    s"cast(floor(16384.0 * ln(((cast($cp as double) / $p) / " +
      s"(cast($na as double) / $n)) / (cast($nb as double) / $n))) " +
      "as bigint)"

  private val q147: QFn = (s, d) => {
    val docs = wide(s, d, "documents", "doc_id")
    val tk = docs.select(TextOps.tokens(col("text")).as("ts"))
    val pairs = tk.select(explode(expr(
        """concat(
          |  case when size(ts) < 2 then array()
          |    else transform(sequence(0, size(ts) - 2),
          |      i -> array(ts[i], ts[i + 1])) end,
          |  case when size(ts) < 3 then array()
          |    else transform(sequence(0, size(ts) - 3),
          |      i -> array(ts[i], ts[i + 2])) end)""".stripMargin))
        .as("pr"))
      .select(least(col("pr")(0), col("pr")(1)).as("w1"),
        greatest(col("pr")(0), col("pr")(1)).as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cp"))
    val uni = tk.select(explode(col("ts")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val tots = pairs.agg(sum(col("cp")).as("bp"))
      .crossJoin(broadcast(uni.agg(sum(col("c")).as("bn"))))
    pairs.filter(col("cp") >= 5)
      .join(uni.select(col("w").as("w1"), col("c").as("na")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("nb")), "w2")
      .crossJoin(broadcast(tots))
      .select(col("w1"), col("w2"), col("cp"),
        expr(pmiQ("cp", "bp", "na", "nb", "bn")).as("pmi_q"))
      .orderBy(col("pmi_q").desc, col("w1"), col("w2"))
      .limit(30)
  }

  private val q147Sql = s"""
WITH tk AS (SELECT ${dToks("text")} AS ts FROM documents),
pairs AS (SELECT least(pr[1], pr[2]) AS w1, greatest(pr[1], pr[2]) AS w2,
    count(*) AS cp
  FROM (SELECT unnest(list_concat(
      CASE WHEN len(ts) < 2 THEN []
        ELSE list_transform(range(len(ts) - 1),
          i -> [ts[i + 1], ts[i + 2]]) END,
      CASE WHEN len(ts) < 3 THEN []
        ELSE list_transform(range(len(ts) - 2),
          i -> [ts[i + 1], ts[i + 3]]) END)) AS pr FROM tk)
  GROUP BY 1, 2),
uni AS (SELECT w, count(*) AS c FROM
  (SELECT unnest(ts) AS w FROM tk) GROUP BY 1),
tots AS (SELECT (SELECT CAST(sum(cp) AS BIGINT) FROM pairs) AS bp,
  (SELECT CAST(sum(c) AS BIGINT) FROM uni) AS bn)
SELECT p.w1, p.w2, p.cp,
  ${pmiQ("p.cp", "bp", "a.c", "b.c", "bn")} AS pmi_q
FROM pairs p JOIN uni a ON a.w = p.w1 JOIN uni b ON b.w = p.w2, tots
WHERE p.cp >= 5
ORDER BY pmi_q DESC, p.w1, p.w2 LIMIT 30"""

  // =====================================================================
  // q159 — token-budget greedy selection WITHOUT a global sort: keep the
  // highest-quality docs until a 30%-of-corpus token budget is spent
  // (the "select best data under budget" pass every pretraining mix
  // does — C4/quality-filter lineage, Raffel et al. JMLR 2020). The
  // 100 TB shape is the point: a naive implementation global-sorts the
  // corpus by quality; here quality lives on a 1001-level integer
  // lattice (distinct-token ratio, (n_dist*1000) div n_tok), so the
  // selection threshold comes from a LEVEL HISTOGRAM — bounded state,
  // one window over <= 1001 rows — and only the single boundary level
  // pays an ordered running sum (partitioned BY that level). Whole
  // levels above the threshold are admitted by a hash join, never
  // sorted. Deterministic: all-integer lattice; boundary fill in
  // doc_id order.
  // =====================================================================

  private val q159: QFn = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val docs0 = wide(s, d, "documents", "doc_id")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) > 0)
      .select(col("doc_id"),
        size(col("tk")).cast("long").as("n_tok"),
        size(array_distinct(col("tk"))).cast("long").as("n_dist"))
      .select(col("doc_id"), col("n_tok"),
        expr("(n_dist * 1000) div n_tok").as("q"))
    val tot = docs0.agg(sum(col("n_tok")).as("tot"))
      .select(expr("(tot * 3) div 10").as("budget"))
    val lvl = docs0.groupBy("q").agg(sum(col("n_tok")).as("lvl_tok"))
    val wq = Window.orderBy(col("q").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = lvl
      .withColumn("cum_tok", sum(col("lvl_tok")).over(wq))
      .withColumn("prev_cum", col("cum_tok") - col("lvl_tok"))
      .select(col("q"), col("cum_tok"), col("prev_cum"))
    val wd = Window.partitionBy(col("q")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = docs0.join(broadcast(cum), "q").crossJoin(broadcast(tot))
    // whole levels above the threshold: admitted by the join alone
    val whole = joined.filter(col("cum_tok") <= col("budget"))
    // ONLY the single boundary level (prev_cum < budget < cum_tok)
    // reaches the window — the filter sits BELOW it, so no other
    // level ever pays the ordered running sum
    val boundary = joined
      .filter(col("prev_cum") < col("budget") &&
        col("cum_tok") > col("budget"))
      .withColumn("run_tok", sum(col("n_tok")).over(wd))
      .filter(col("run_tok") <= col("budget") - col("prev_cum"))
    whole.select(col("doc_id"), col("q"), col("n_tok"))
      .unionByName(boundary.select(col("doc_id"), col("q"), col("n_tok")))
      .orderBy(col("doc_id"))
  }
  private val q159Sql = s"""
    WITH dd AS (SELECT doc_id, ${dToks("text")} AS tk FROM documents),
    d3 AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tok,
        (CAST(len(list_distinct(tk)) AS BIGINT) * 1000)
          // CAST(len(tk) AS BIGINT) AS q
      FROM dd WHERE len(tk) > 0),
    tot AS (SELECT (CAST(sum(n_tok) AS BIGINT) * 3) // 10 AS budget
      FROM d3),
    lvl AS (SELECT q, CAST(sum(n_tok) AS BIGINT) AS lvl_tok FROM d3
      GROUP BY q),
    cum AS (SELECT q,
        CAST(sum(lvl_tok) OVER (ORDER BY q DESC ROWS BETWEEN UNBOUNDED
          PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok,
        lvl_tok FROM lvl),
    c2 AS (SELECT q, cum_tok, cum_tok - lvl_tok AS prev_cum FROM cum),
    run AS (SELECT d3.doc_id, d3.q, d3.n_tok, c2.cum_tok, c2.prev_cum,
        CAST(sum(d3.n_tok) OVER (PARTITION BY d3.q ORDER BY d3.doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS run_tok
      FROM d3 JOIN c2 USING (q))
    SELECT doc_id, q, n_tok FROM run, tot
    WHERE cum_tok <= budget
      OR (prev_cum < budget AND run_tok <= budget - prev_cum)
    ORDER BY doc_id"""

  // q207 — Gopher repetition signals (Rae et al. 2021 A1.1): per-doc
  // top/duplicate n-gram occurrence fractions for n = 2 and 3, on the
  // integer ppm lattice. The filters every pretraining mix applies to
  // shed machine-generated/boilerplate repetition, as a signals table
  // a pipeline can threshold on (see the repetition_max stage).
  // =====================================================================

  private val q207: QFn = (s, d) =>
    Curation.repetitionSignals(wide(s, d, "documents", "doc_id"),
      "text", "doc_id").orderBy(col("doc_id"))

  private val q207Sql = s"""
WITH toks AS (SELECT doc_id, ${dToks("text")} AS tk FROM documents),
g2 AS (SELECT doc_id, unnest(CASE WHEN len(tk) < 2
      THEN CAST([] AS VARCHAR[])
      ELSE list_transform(range(len(tk)-1),
        i -> array_to_string(tk[i+1:i+2], ' ')) END) AS g
  FROM toks),
c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
a2 AS (SELECT doc_id, sum(c) AS tot, max(c) AS top,
    sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup
  FROM c2 GROUP BY 1),
g3 AS (SELECT doc_id, unnest(CASE WHEN len(tk) < 3
      THEN CAST([] AS VARCHAR[])
      ELSE list_transform(range(len(tk)-2),
        i -> array_to_string(tk[i+1:i+3], ' ')) END) AS g
  FROM toks),
c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
a3 AS (SELECT doc_id, sum(c) AS tot, max(c) AS top,
    sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup
  FROM c3 GROUP BY 1)
SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tok,
  CAST(coalesce(a2.top * 1000000 // a2.tot, 0) AS BIGINT) AS top2_ppm,
  CAST(coalesce(a2.dup * 1000000 // a2.tot, 0) AS BIGINT) AS dup2_ppm,
  CAST(coalesce(a3.top * 1000000 // a3.tot, 0) AS BIGINT) AS top3_ppm,
  CAST(coalesce(a3.dup * 1000000 // a3.tot, 0) AS BIGINT) AS dup3_ppm
FROM toks t LEFT JOIN a2 USING (doc_id) LEFT JOIN a3 USING (doc_id)
ORDER BY doc_id"""

  val queries: Map[String, QFn] = Map(
    "q207_repetition_signals" -> q207,
    "q159_budget_select" -> q159,
    "q104_dsir_select" -> q104,
    "q105_bpe_merges" -> q105,
    "q106_domain_mixture" -> q106,
    "q107_dsir_standing_index" -> q107,
    "q108_bpe_encode" -> q108,
    "q109_lm_quality" -> q109,
    "q130_nb_classifier" -> q130,
    "q131_nb_standing_index" -> q131,
    "q132_backoff_lm" -> q132,
    "q135_weighted_sample" -> q135,
    "q147_pmi_pairs" -> q147)

  val oracles: Map[String, String] = Map(
    "q207_repetition_signals" -> q207Sql,
    "q159_budget_select" -> q159Sql,
    "q104_dsir_select" -> q104Sql,
    "q105_bpe_merges" -> q105Sql,
    "q106_domain_mixture" -> q106Sql,
    "q107_dsir_standing_index" -> q107Sql,
    "q108_bpe_encode" -> q108Sql,
    "q109_lm_quality" -> q109Sql,
    "q130_nb_classifier" -> q130Sql,
    "q131_nb_standing_index" -> q131Sql,
    "q132_backoff_lm" -> q132Sql,
    "q135_weighted_sample" -> q135Sql,
    "q147_pmi_pairs" -> q147Sql)
}
