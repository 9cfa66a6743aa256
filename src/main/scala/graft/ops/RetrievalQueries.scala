package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-text retrieval queries (q117-q119) over [[Retrieval]]'s standing
  * positional postings index: BM25 top-k serving, the standing-index
  * fold (refresh == rebuild, so the whole-corpus SQL is the oracle), and
  * positional phrase search. BM25 contributions are quantized to the
  * 2^-14 integer lattice through ONE expression text shared between the
  * Spark plan and the DuckDB oracle ([[Retrieval.bm25Contrib]]), so the
  * driver hash-matches exact int64 sums.
  */
object RetrievalQueries {
  type QFn = (SparkSession, String) => DataFrame

  // ===================================================================
  // Shared DuckDB CTE prefix: whitespace tokens -> positional token
  // rows -> postings (term, doc_id, tf) + doc lengths. Mirrors the
  // map-only TokenPositionsExpr index build.
  // ===================================================================

  private val dTokPrefix = s"""
    WITH tk AS (SELECT doc_id,
        list_filter(string_split(text, ' '), t -> t != '') AS toks
      FROM documents),
    tok AS (SELECT doc_id, unnest(list_transform(range(len(toks)),
        p -> {'p': p, 'term': toks[CAST(p AS INT) + 1]})) AS u FROM tk),
    pos AS (SELECT doc_id, CAST(u.p AS BIGINT) AS p, u.term AS term
      FROM tok),
    post AS (SELECT term, doc_id, count(*) AS tf FROM pos GROUP BY 1, 2),
    lens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tk)"""

  /** BM25 candidate scoring + top-k SQL against probe predicate
    * `$probeWhere` with `LIMIT`-free window top-`$k`. */
  private def dBm25(probeWhere: String, k: Int): String = {
    val contrib = Retrieval.bm25Contrib("p.tf", "df", "l.dl", "n_docs",
      "avgdl", Retrieval.k1Lit(12), Retrieval.bLit(75))
    s"""$dTokPrefix,
    stats AS (SELECT count(*) AS n_docs,
        CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
      FROM lens),
    qt AS (SELECT doc_id AS q_id, unnest(list_distinct(toks)) AS term
      FROM tk WHERE $probeWhere),
    dfq AS (SELECT term, count(*) AS df FROM post
      WHERE term IN (SELECT term FROM qt) GROUP BY 1),
    c AS (SELECT q.q_id, p.doc_id, $contrib AS c
      FROM post p JOIN qt q USING (term) JOIN dfq USING (term)
        JOIN lens l ON l.doc_id = p.doc_id, stats
      WHERE p.doc_id != q.q_id),
    sc AS (SELECT q_id, doc_id, CAST(sum(c) AS BIGINT) AS score_q
      FROM c GROUP BY 1, 2)
    SELECT q_id, rank, doc_id, score_q FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY q_id
        ORDER BY score_q DESC, doc_id) AS INT) AS rank FROM sc)
    WHERE rank <= $k ORDER BY q_id, rank"""
  }

  // ===================================================================
  // q117 — BM25 top-k: probe docs (doc_id < 5) rank the corpus by
  // quantized Okapi BM25 (k1=1.2, b=0.75), k=5, ties by doc_id.
  // Candidate generation = the broadcast query-term semi-join; df is
  // derived from the pruned postings.
  // ===================================================================

  private val q117: QFn = (s, d) => {
    val docs = PipelineQueries.wide(s, d, "documents", "doc_id")
    val idx = Retrieval.postingsIndex(docs, "text", "doc_id")
    Retrieval.bm25TopK(idx, docs.filter(col("doc_id") < 5),
        "text", "doc_id", k = 5)
      .withColumnRenamed("id", "doc_id")
      .select(col("q_id"), col("rank"), col("doc_id"), col("score_q"))
      .orderBy(col("q_id"), col("rank"))
  }

  private val q117Sql = dBm25("doc_id < 5", 5)

  // ===================================================================
  // q118 — STANDING postings index: build on doc_id < 400, fold the
  // doc_id >= 400 batch in with refreshPostingsIndex, serve BM25 from
  // the folded artifact. Fold == rebuild exactly (everything in the
  // index is per-doc; df/N/avgdl derive at query time), so the oracle
  // is the whole-corpus SQL — the same differential discipline as the
  // standing PQ index (q113).
  // ===================================================================

  private val q118: QFn = (s, d) => {
    val docs = PipelineQueries.wide(s, d, "documents", "doc_id")
    val idx = Retrieval.refreshPostingsIndex(
      Retrieval.postingsIndex(docs.filter(col("doc_id") < 400),
        "text", "doc_id"),
      docs.filter(col("doc_id") >= 400), "text", "doc_id")
    Retrieval.bm25TopK(idx,
        docs.filter(col("doc_id") >= 5 && col("doc_id") < 10),
        "text", "doc_id", k = 3)
      .withColumnRenamed("id", "doc_id")
      .select(col("q_id"), col("rank"), col("doc_id"), col("score_q"))
      .orderBy(col("q_id"), col("rank"))
  }

  private val q118Sql = dBm25("doc_id >= 5 AND doc_id < 10", 3)

  // ===================================================================
  // q176 — standing postings-index DELETE (tombstones): q118's folded
  // artifact forgets every doc_id ≡ 1 (mod 4) via
  // Retrieval.deleteFromPostingsIndex, then serves the same BM25
  // probes. Everything in the index is per-doc and df / N / avgdl
  // derive from SURVIVING rows at query time, so the oracle is simply
  // BM25 over the corpus minus the tombstones — hash equality IS the
  // delete == rebuild proof (note n_docs/avgdl/df all shift with the
  // deletion: the stats legs are re-proved, not just the row drop).
  // Probes stay drawn from the full table — a deleted doc may still
  // QUERY the index; it just can no longer be retrieved (doc_id 5 and
  // 9 are themselves tombstoned, exercising exactly that).
  // ===================================================================

  private val q176: QFn = (s, d) => {
    val docs = PipelineQueries.wide(s, d, "documents", "doc_id")
    val idx = Retrieval.refreshPostingsIndex(
      Retrieval.postingsIndex(docs.filter(col("doc_id") < 400),
        "text", "doc_id"),
      docs.filter(col("doc_id") >= 400), "text", "doc_id")
    val afterDelete = Retrieval.deleteFromPostingsIndex(idx,
      docs.filter(col("doc_id") % 4 === 1).select(col("doc_id")))
    Retrieval.bm25TopK(afterDelete,
        docs.filter(col("doc_id") >= 5 && col("doc_id") < 10),
        "text", "doc_id", k = 3)
      .withColumnRenamed("id", "doc_id")
      .select(col("q_id"), col("rank"), col("doc_id"), col("score_q"))
      .orderBy(col("q_id"), col("rank"))
  }

  private val q176Sql = {
    val contrib = Retrieval.bm25Contrib("p.tf", "df", "l.dl", "n_docs",
      "avgdl", Retrieval.k1Lit(12), Retrieval.bLit(75))
    s"""$dTokPrefix,
    postd AS (SELECT * FROM post WHERE doc_id % 4 != 1),
    lensd AS (SELECT * FROM lens WHERE doc_id % 4 != 1),
    stats AS (SELECT count(*) AS n_docs,
        CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
      FROM lensd),
    qt AS (SELECT doc_id AS q_id, unnest(list_distinct(toks)) AS term
      FROM tk WHERE doc_id >= 5 AND doc_id < 10),
    dfq AS (SELECT term, count(*) AS df FROM postd
      WHERE term IN (SELECT term FROM qt) GROUP BY 1),
    c AS (SELECT q.q_id, p.doc_id, $contrib AS c
      FROM postd p JOIN qt q USING (term) JOIN dfq USING (term)
        JOIN lensd l ON l.doc_id = p.doc_id, stats
      WHERE p.doc_id != q.q_id),
    sc AS (SELECT q_id, doc_id, CAST(sum(c) AS BIGINT) AS score_q
      FROM c GROUP BY 1, 2)
    SELECT q_id, rank, doc_id, score_q FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY q_id
        ORDER BY score_q DESC, doc_id) AS INT) AS rank FROM sc)
    WHERE rank <= 3 ORDER BY q_id, rank"""
  }

  // ===================================================================
  // q190 — tindex AUTO-FOLD on ingest: the q118 fold contract driven
  // through the ENGINE's PUT path. The table is created by its first
  // REST-PUT batch (doc_id < 400), `tindex create` registers the
  // standing postings index, and the second PUT (doc_id >= 400)
  // auto-folds it with NO refresh command — round 10 left the index
  // families on manual refresh, so a PUT silently staled BM25 serving.
  // BM25 probes then serve from the artifact AS COMMITTED BY THE
  // AUTO-FOLD; the oracle is whole-corpus BM25 (fold == rebuild since
  // everything in the index is per-doc and df/N/avgdl derive at query
  // time) — hash equality proves the auto-fold left the index exactly
  // equal to a rebuild over the full table.
  // ===================================================================

  private val q190: QFn = (s, d) => {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val docs = PipelineQueries.wide(s, d, "documents", "doc_id")
      .select(col("doc_id"), col("text"))
    def nd(df: org.apache.spark.sql.DataFrame): String =
      df.collect().map { r =>
        JsonMethods.compact(JsonMethods.render(
          ("doc_id" -> r.getLong(0)) ~ ("text" -> r.getString(1))))
      }.mkString("\n")
    val tmp = java.nio.file.Files.createTempDirectory("q190")
    val cat = new graft.engine.Catalog(s)
    val engine = new graft.engine.Engine(s, cat)
    engine.dataDir = Some(tmp.resolve("data").toString)
    engine.ingest("docs190", nd(docs.filter(col("doc_id") < 400)))
    val tx = tmp.resolve("tx").toString
    engine.execute(s"tindex create where table = docs190 and " +
      s"path = $tx and id = doc_id and text = text")
    // the late batch arrives over PUT — the auto-fold must keep the
    // standing index serving it, with no refresh command
    engine.ingest("docs190", nd(docs.filter(col("doc_id") >= 400)))
    require(engine.execute("get view auto refresh")
      .contains("no fold errors"), "q190 auto-fold recorded an error")
    val stored = IndexStore.read(s, tx).getOrElse(
      throw new IllegalStateException("q190: no tindex artifact"))
    Retrieval.bm25TopK(stored,
        docs.filter(col("doc_id") >= 5 && col("doc_id") < 10),
        "text", "doc_id", k = 3)
      .withColumnRenamed("id", "doc_id")
      .select(col("q_id"), col("rank"), col("doc_id"), col("score_q"))
      .orderBy(col("q_id"), col("rank"))
  }

  private val q190Sql = dBm25("doc_id >= 5 AND doc_id < 10", 3)

  // ===================================================================
  // q191 — `tindex sync` (index-family lineage watermarks): the q190
  // fixture, but the late batch lands while auto refresh is OFF (the
  // crash/off window), leaving the standing index stale — ONE sync
  // replays exactly the rows above the artifact's wm_ lineage tag
  // (committed atomically with every fold as an IndexStore version
  // tag) and a second sync is a no-op. Oracle: whole-corpus BM25 —
  // hash equality is sync == rebuild, the matview-sync crash contract
  // extended to the index families.
  // ===================================================================

  private val q191: QFn = (s, d) => {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val docs = PipelineQueries.wide(s, d, "documents", "doc_id")
      .select(col("doc_id"), col("text"))
    def nd(df: org.apache.spark.sql.DataFrame): String =
      df.collect().map { r =>
        JsonMethods.compact(JsonMethods.render(
          ("doc_id" -> r.getLong(0)) ~ ("text" -> r.getString(1))))
      }.mkString("\n")
    val tmp = java.nio.file.Files.createTempDirectory("q191")
    val cat = new graft.engine.Catalog(s)
    val engine = new graft.engine.Engine(s, cat)
    engine.dataDir = Some(tmp.resolve("data").toString)
    engine.ingest("docs191", nd(docs.filter(col("doc_id") < 400)))
    val tx = tmp.resolve("tx").toString
    engine.execute(s"tindex create where table = docs191 and " +
      s"path = $tx and id = doc_id and text = text")
    engine.execute("set view auto refresh = off")
    engine.ingest("docs191", nd(docs.filter(col("doc_id") >= 400)))
    val msg = engine.execute("tindex sync where table = docs191")
    require(msg.contains("synced"), s"q191 sync folded nothing: $msg")
    require(engine.execute("tindex sync where table = docs191")
      .contains("in sync"), "q191 second sync must be a no-op")
    val stored = IndexStore.read(s, tx).getOrElse(
      throw new IllegalStateException("q191: no tindex artifact"))
    Retrieval.bm25TopK(stored,
        docs.filter(col("doc_id") >= 5 && col("doc_id") < 10),
        "text", "doc_id", k = 3)
      .withColumnRenamed("id", "doc_id")
      .select(col("q_id"), col("rank"), col("doc_id"), col("score_q"))
      .orderBy(col("q_id"), col("rank"))
  }

  private val q191Sql = dBm25("doc_id >= 5 AND doc_id < 10", 3)

  // ===================================================================
  // q119 — positional phrase search: the corpus's most frequent bigram
  // (ties to the lexicographically smallest), then every doc containing
  // it as an EXACT phrase with its phrase frequency, from position-list
  // adjacency in the standing index — never re-reading text. Top 20 by
  // (phrase_tf desc, doc_id).
  // ===================================================================

  private val q119: QFn = (s, d) => {
    val docs = PipelineQueries.wide(s, d, "documents", "doc_id")
    val idx = Retrieval.postingsIndex(docs, "text", "doc_id")
    Retrieval.phraseMatch(idx, topBigram(idx))
      .withColumnRenamed("id", "doc_id")
      .select(col("doc_id"), col("w1"), col("w2"), col("phrase_tf"))
      .orderBy(col("phrase_tf").desc, col("doc_id"))
      .limit(20)
  }

  private val q119Sql = s"""$dTokPrefix,
    big AS (SELECT a.term AS w1, b.term AS w2, count(*) AS cnt
      FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.p = a.p + 1
      GROUP BY 1, 2),
    top1 AS (SELECT w1, w2 FROM big
      ORDER BY cnt DESC, w1, w2 LIMIT 1),
    m AS (SELECT a.doc_id, t.w1, t.w2, count(*) AS phrase_tf
      FROM top1 t
        JOIN pos a ON a.term = t.w1
        JOIN pos b ON b.doc_id = a.doc_id AND b.term = t.w2
          AND b.p = a.p + 1
      GROUP BY 1, 2, 3)
    SELECT doc_id, w1, w2, phrase_tf FROM m
    ORDER BY phrase_tf DESC, doc_id LIMIT 20"""

  // ===================================================================
  // q124 — KWIC snippets: the 3-token context window around the FIRST
  // occurrence of the corpus's most frequent bigram, per matching doc.
  // Matching and positions come from the index; only matched docs'
  // text is fetched. Top 20 by doc_id.
  // ===================================================================

  private val q124: QFn = (s, d) => {
    val docs = PipelineQueries.wide(s, d, "documents", "doc_id")
    val idx = Retrieval.postingsIndex(docs, "text", "doc_id")
    Retrieval.snippets(idx, docs, topBigram(idx),
        "text", "doc_id", window = 3)
      .withColumnRenamed("id", "doc_id")
      .select(col("doc_id"), col("w1"), col("w2"), col("p0"),
        col("snippet"))
      .orderBy(col("doc_id"))
      .limit(20)
  }

  private val q124Sql = s"""$dTokPrefix,
    big AS (SELECT a.term AS w1, b.term AS w2, count(*) AS cnt
      FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.p = a.p + 1
      GROUP BY 1, 2),
    top1 AS (SELECT w1, w2 FROM big
      ORDER BY cnt DESC, w1, w2 LIMIT 1),
    m AS (SELECT a.doc_id, t.w1, t.w2, min(a.p) AS p0
      FROM top1 t
        JOIN pos a ON a.term = t.w1
        JOIN pos b ON b.doc_id = a.doc_id AND b.term = t.w2
          AND b.p = a.p + 1
      GROUP BY 1, 2, 3)
    SELECT m.doc_id, m.w1, m.w2, m.p0,
      array_to_string(list_slice(tk.toks,
        CAST(greatest(m.p0 - 3, 0) + 1 AS BIGINT),
        CAST(m.p0 + 5 AS BIGINT)), ' ') AS snippet
    FROM m JOIN tk ON tk.doc_id = m.doc_id
    ORDER BY m.doc_id LIMIT 20"""

  /** Top-1 corpus bigram (cnt desc, then lexicographic) from the
    * positional index — the shared deterministic "query" of the
    * phrase/snippet/proximity/LIKE demonstrations. */
  private def topBigram(idx: DataFrame): DataFrame = {
    val pr = Retrieval.positionRows(idx)
    pr.as("a").join(pr.as("b"),
        col("a.id") === col("b.id") && col("b.p") === col("a.p") + 1)
      .groupBy(col("a.term").as("w1"), col("b.term").as("w2"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w1"), col("w2"))
      .limit(1)
      .select(col("w1"), col("w2"))
  }

  // ===================================================================
  // q125 — unordered proximity (NEAR/5): docs where the top bigram's
  // two words co-occur within 5 tokens in EITHER order; per-doc pair
  // count and closest distance. Top 30 by doc_id.
  // ===================================================================

  private val q125: QFn = (s, d) => {
    val docs = PipelineQueries.wide(s, d, "documents", "doc_id")
    val idx = Retrieval.postingsIndex(docs, "text", "doc_id")
    Retrieval.proximityMatch(idx, topBigram(idx), w = 5)
      .withColumnRenamed("id", "doc_id")
      .select(col("doc_id"), col("w1"), col("w2"), col("n_pairs"),
        col("min_dist"))
      .orderBy(col("doc_id"))
      .limit(30)
  }

  private val q125Sql = s"""$dTokPrefix,
    big AS (SELECT a.term AS w1, b.term AS w2, count(*) AS cnt
      FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.p = a.p + 1
      GROUP BY 1, 2),
    top1 AS (SELECT w1, w2 FROM big
      ORDER BY cnt DESC, w1, w2 LIMIT 1),
    m AS (SELECT a.doc_id, t.w1, t.w2, count(*) AS n_pairs,
        min(abs(b.p - a.p)) AS min_dist
      FROM top1 t
        JOIN pos a ON a.term = t.w1
        JOIN pos b ON b.doc_id = a.doc_id AND b.term = t.w2
          AND abs(b.p - a.p) <= 5 AND b.p != a.p
      GROUP BY 1, 2, 3)
    SELECT doc_id, w1, w2, n_pairs, min_dist FROM m
    ORDER BY doc_id LIMIT 30"""

  // ===================================================================
  // q126 — trigram-accelerated substring search: docs whose raw text
  // contains the top bigram as a literal substring ("w1 w2"). The
  // trigram index prunes to docs holding EVERY pattern trigram; the
  // exact contains() verify touches candidates only. Oracle = the
  // plain corpus contains() scan (same rows, different cost shape).
  // ===================================================================

  private val q126: QFn = (s, d) => {
    val docs = PipelineQueries.wide(s, d, "documents", "doc_id")
    val pidx = Retrieval.postingsIndex(docs, "text", "doc_id")
    val gidx = Retrieval.trigramIndex(docs, "text", "doc_id")
    val pat = topBigram(pidx)
      .select(concat(col("w1"), lit(" "), col("w2")).as("pat"))
    Retrieval.likeSearch(gidx, docs, pat, "text", "doc_id")
      .withColumnRenamed("id", "doc_id")
      .select(col("doc_id"), col("pat"))
      .orderBy(col("doc_id"))
  }

  private val q126Sql = s"""$dTokPrefix,
    big AS (SELECT a.term AS w1, b.term AS w2, count(*) AS cnt
      FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.p = a.p + 1
      GROUP BY 1, 2),
    top1 AS (SELECT w1 || ' ' || w2 AS pat FROM big
      ORDER BY cnt DESC, w1, w2 LIMIT 1)
    SELECT d.doc_id, t.pat FROM documents d, top1 t
    WHERE contains(d.text, t.pat) ORDER BY d.doc_id"""

  // ===================================================================
  // q129 — HYBRID search (RRF): the BM25 text leg and the exact
  // quantized-L2 vector leg (documents and embeddings share the id
  // space by construction) each rank top-10 for probes id < 5; fusion
  // = quantized reciprocal-rank sum, re-ranked top-5. The standard
  // two-tower serving combiner, end-to-end under the oracle.
  // ===================================================================

  private val q129: QFn = (s, d) => {
    val docs = PipelineQueries.wide(s, d, "documents", "doc_id")
    val vecs = PipelineQueries.wide(s, d, "embeddings", "vec_id")
    val bm = Retrieval.bm25TopK(
      Retrieval.postingsIndex(docs, "text", "doc_id"),
      docs.filter(col("doc_id") < 5), "text", "doc_id", k = 10)
    val vq = vecs.select(col("vec_id").as("id"), expr(
      "transform(embedding, x -> cast(floor(x * 1000) as bigint))")
      .as("vq"))
    val d2 = "aggregate(zip_with(a_vq, b_vq, (x, y) -> (x - y) * (x - y)), " +
      "cast(0 as bigint), (acc, v) -> acc + v)"
    val vr = vq.filter(col("id") < 5)
      .select(col("id").as("q_id"), col("vq").as("a_vq"))
      .crossJoin(vq.select(col("id"), col("vq").as("b_vq")))
      .filter(col("q_id") =!= col("id"))
      .select(col("q_id"), col("id"), expr(d2).as("d2"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id")).orderBy(col("d2"), col("id"))))
      .filter(col("rank") <= 10)
      .select(col("q_id"), col("rank"), col("id"))
    Retrieval.rrfFuse(bm.select(col("q_id"), col("rank"), col("id")),
        vr, k = 5)
      .withColumnRenamed("id", "doc_id")
      .select(col("q_id"), col("rank"), col("doc_id"), col("rrf_q"))
      .orderBy(col("q_id"), col("rank"))
  }

  private val q129Sql = {
    val contrib = Retrieval.bm25Contrib("p.tf", "df", "l.dl", "n_docs",
      "avgdl", Retrieval.k1Lit(12), Retrieval.bLit(75))
    val dD2 = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(range(len(a.vq)), " +
      "i -> (a.vq[i+1] - b.vq[i+1]) * (a.vq[i+1] - b.vq[i+1]))), " +
      "(acc, v) -> acc + v)"
    s"""$dTokPrefix,
    stats AS (SELECT count(*) AS n_docs,
        CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
      FROM lens),
    qt AS (SELECT doc_id AS q_id, unnest(list_distinct(toks)) AS term
      FROM tk WHERE doc_id < 5),
    dfq AS (SELECT term, count(*) AS df FROM post
      WHERE term IN (SELECT term FROM qt) GROUP BY 1),
    c AS (SELECT q.q_id, p.doc_id, $contrib AS c
      FROM post p JOIN qt q USING (term) JOIN dfq USING (term)
        JOIN lens l ON l.doc_id = p.doc_id, stats
      WHERE p.doc_id != q.q_id),
    sc AS (SELECT q_id, doc_id, CAST(sum(c) AS BIGINT) AS score_q
      FROM c GROUP BY 1, 2),
    bm AS (SELECT q_id, doc_id, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY q_id
        ORDER BY score_q DESC, doc_id) AS INT) AS rank FROM sc)
      WHERE rank <= 10),
    ve AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(floor(x*1000) AS BIGINT)) AS vq
      FROM embeddings),
    vr AS (SELECT q_id, doc_id, rank FROM (
      SELECT a.vec_id AS q_id, b.vec_id AS doc_id,
        CAST(row_number() OVER (PARTITION BY a.vec_id
          ORDER BY $dD2, b.vec_id) AS INT) AS rank
      FROM ve a JOIN ve b ON b.vec_id != a.vec_id
      WHERE a.vec_id < 5) WHERE rank <= 10),
    fused AS (SELECT coalesce(bm.q_id, vr.q_id) AS q_id,
        coalesce(bm.doc_id, vr.doc_id) AS doc_id,
        coalesce(${Retrieval.rrfContrib("bm.rank", 60)}, 0) +
          coalesce(${Retrieval.rrfContrib("vr.rank", 60)}, 0) AS rrf_q
      FROM bm FULL OUTER JOIN vr
        ON vr.q_id = bm.q_id AND vr.doc_id = bm.doc_id)
    SELECT q_id, rank, doc_id, rrf_q FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY q_id
        ORDER BY rrf_q DESC, doc_id) AS INT) AS rank FROM fused)
    WHERE rank <= 5 ORDER BY q_id, rank"""
  }

  val queries: Map[String, QFn] = Map(
    "q190_tindex_autofold" -> q190,
    "q191_tindex_sync" -> q191,
    "q129_hybrid_rrf" -> q129,
    "q117_bm25_topk" -> q117,
    "q118_postings_standing_index" -> q118,
    "q176_postings_index_delete" -> q176,
    "q119_phrase_search" -> q119,
    "q124_phrase_snippets" -> q124,
    "q125_proximity_near" -> q125,
    "q126_trigram_like" -> q126)

  val oracles: Map[String, String] = Map(
    "q190_tindex_autofold" -> q190Sql,
    "q191_tindex_sync" -> q191Sql,
    "q129_hybrid_rrf" -> q129Sql,
    "q117_bm25_topk" -> q117Sql,
    "q118_postings_standing_index" -> q118Sql,
    "q176_postings_index_delete" -> q176Sql,
    "q119_phrase_search" -> q119Sql,
    "q124_phrase_snippets" -> q124Sql,
    "q125_proximity_near" -> q125Sql,
    "q126_trigram_like" -> q126Sql)
}
