package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.F

/** BM25 full-text retrieval over a STANDING positional postings index —
  * the text-side twin of [[Similarity]]'s standing vector indexes
  * (same role-tagged single-artifact discipline, same [[IndexStore]]
  * commit path, same fold-equals-rebuild refresh contract).
  *
  * The reference has no full-text ranking surface; this family is the
  * beyond-parity retrieval layer a training-data pipeline needs for
  * targeted curation (seed-query corpus selection, near-query mining)
  * and contamination audits. Ranking is Okapi BM25 (Robertson &
  * Zaragoza 2009, "The Probabilistic Relevance Framework: BM25 and
  * Beyond", §3.3) with the Lucene-style `ln(1 + (N-df+0.5)/(df+0.5))`
  * non-negative idf.
  *
  * Float discipline: every per-(query,term,doc) BM25 contribution is
  * quantized to the 2^-14 integer lattice (`floor(16384 * idf * tfnorm)`
  * as bigint — the [[Curation.lmScores]] precedent), so per-doc scores
  * are exact int64 SUMS: order-independent under any partial
  * aggregation, and the DuckDB oracle replays the identical arithmetic
  * from the identical expression text ([[bm25Contrib]] is shared with
  * the oracle builder).
  *
  * Index layout (one role-tagged frame, so the whole artifact commits
  * through a single [[IndexStore]] version):
  *  - role="post": (term, id, tf, pos, dl) — one row per (doc, distinct
  *    term); `pos` = ascending 0-based token positions (phrase queries),
  *    `dl` = doc token count carried WITH the posting so serving never
  *    joins a corpus-sized length table (the Lucene norms-in-postings
  *    shape).
  *  - role="len": (id, dl) — one row per doc, including empty docs; the
  *    corpus stats source (N, avgdl) and the refresh id ledger.
  *
  * Scale shape: the index build is MAP-ONLY (native
  * [[graft.functions.TokenPositionsExpr]] — one hash-map pass per row,
  * no corpus shuffle of token occurrences); serving prunes postings to
  * the broadcast query-term set FIRST, so every downstream join and
  * aggregate is candidate-sized (Σ_t df(t) rows), never corpus-sized.
  * df is derived from the pruned postings at query time (pruning keeps
  * every row of a surviving term, so pruned df == corpus df).
  */
object Retrieval {

  /** Build the standing positional postings index over `docs`.
    * One map-only pass; no shuffle. See the object doc for layout. */
  def postingsIndex(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val tp = docs
      .select(col(idCol).cast("long").as("id"),
        F.tokenPositions(col(textCol)).as("tp"))
      .select(col("id"),
        expr("aggregate(tp, cast(0 as bigint), (a, x) -> a + x.tf)")
          .as("dl"),
        col("tp"))
    val post = tp
      .select(col("id"), col("dl"), explode(col("tp")).as("e"))
      .select(lit("post").as("role"), col("e.t").as("term"), col("id"),
        col("e.tf").as("tf"), col("e.pos").as("pos"), col("dl"))
    val lens = tp.select(lit("len").as("role"),
      lit(null).cast("string").as("term"), col("id"),
      lit(null).cast("bigint").as("tf"),
      lit(null).cast("array<int>").as("pos"), col("dl"))
    post.unionByName(lens)
  }

  /** Fold a batch of docs into the standing index. Postings, tf,
    * positions and dl are all per-doc and df/N/avgdl are derived at
    * query time, so fold == rebuild EXACTLY for any batch split — no
    * global state moves. A batch id that already exists REPLACES its
    * previous rows (anti-join, the [[Similarity.refreshPqIndex]]
    * discipline), so re-folding a batch is idempotent; exactly-once
    * under streaming replay is `StreamOps.postingsIngestBatchOnce`'s
    * batch-tag gate. */
  def refreshPostingsIndex(index: DataFrame, newDocs: DataFrame,
      textCol: String, idCol: String): DataFrame = {
    val fresh = postingsIndex(newDocs, textCol, idCol)
    index
      .join(fresh.filter(col("role") === "len")
          .select(col("id").as("__bid")),
        col("id") === col("__bid"), "left_anti")
      .unionByName(fresh)
  }

  /** DELETE a set of doc ids from the standing postings index
    * (tombstones — a retention drop or right-to-be-forgotten on the
    * corpus must also forget the docs' postings, or BM25 / phrase /
    * NEAR keep surfacing deleted documents). Every index row (both
    * the "post" and "len" roles) is per-doc and df / N / avgdl derive
    * from the surviving rows at query time, so delete == rebuild over
    * the surviving corpus EXACTLY — the q176 oracle. Works unchanged
    * on the trigram sidecar (also keyed by per-doc `id` rows).
    * `deleteIds`: any one-column frame of doc ids. */
  def deleteFromPostingsIndex(index: DataFrame,
      deleteIds: DataFrame): DataFrame =
    index.join(
      deleteIds.select(col(deleteIds.columns.head).cast("long")
        .as("__did")).distinct(),
      col("id") === col("__did"), "left_anti")

  /** The quantized BM25 per-(query,term,doc) contribution — ONE
    * expression text used verbatim by BOTH the Spark plan and the
    * DuckDB oracle, so the double arithmetic (cast order, association,
    * the single `ln`) is identical in the two engines before the floor
    * onto the 2^-14 lattice. */
  private[ops] def bm25Contrib(tf: String, df: String, dl: String,
      nDocs: String, avgdl: String, k1: String, b: String): String =
    s"cast(floor(16384.0 * " +
      s"ln(1.0 + ((cast($nDocs as double) - cast($df as double)) + 0.5) " +
      s"/ (cast($df as double) + 0.5)) * " +
      s"((cast($tf as double) * ($k1 + 1.0)) / " +
      s"(cast($tf as double) + $k1 * ((1.0 - $b) + $b * " +
      s"(cast($dl as double) / $avgdl)))) " +
      s") as bigint)"

  /** k1 as an exact integer-derived double expression (tenths), so both
    * engines compute the identical value — no decimal-literal parsing
    * differences. */
  private[ops] def k1Lit(k1Tenths: Int): String =
    s"(cast($k1Tenths as double) / 10.0)"

  /** b as an exact integer-derived double expression (hundredths). */
  private[ops] def bLit(bHundredths: Int): String =
    s"(cast($bHundredths as double) / 100.0)"

  /** Un-ranked BM25 scores `(q_id, id, score_q)` of every candidate doc
    * (>= 1 shared term) against every query — the threshold form a
    * cleaning gate filters on ([[bm25TopK]] adds the ranking).
    *
    * `queries` shares the doc id space (self-matches are excluded, the
    * [[Similarity.bruteForceTopK]] convention). Defaults k1=1.2, b=0.75
    * (the standard Robertson settings), passed as integer tenths /
    * hundredths to keep the oracle arithmetic exactly replayable.
    *
    * Plan: broadcast the distinct query terms, semi-join-prune the
    * postings (candidate-sized from here on), derive df from the pruned
    * postings (== corpus df), broadcast the tiny df + one-row stats
    * frames, quantize each contribution map-side, ONE hash aggregate on
    * (q_id, id). The only corpus-sized work is the stats scan over the
    * one-long-per-doc len rows. */
  def bm25Scores(index: DataFrame, queries: DataFrame, textCol: String,
      idCol: String, k1Tenths: Int = 12, bHundredths: Int = 75): DataFrame = {
    require(k1Tenths >= 0 && bHundredths >= 0 && bHundredths <= 100,
      "k1 must be >= 0 tenths; b in [0, 100] hundredths")
    val post = index.filter(col("role") === "post")
      .select(col("term"), col("id"), col("tf"), col("dl"))
    val lens = index.filter(col("role") === "len")
      .select(col("id"), col("dl"))
    val stats = lens
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs").cast("double"))
          .as("avgdl"))
    val qterms = queries.select(col(idCol).cast("long").as("q_id"),
      explode(array_distinct(TextOps.tokens(col(textCol)))).as("term"))
    val pruned = post.join(broadcast(qterms.select("term").distinct()),
      "term")
    val dfreq = pruned.groupBy("term").agg(count(lit(1)).as("df"))
    pruned.join(broadcast(qterms), "term")
      .filter(col("id") =!= col("q_id"))
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .select(col("q_id"), col("id"),
        expr(bm25Contrib("tf", "df", "dl", "n_docs", "avgdl",
          k1Lit(k1Tenths), bLit(bHundredths))).as("c"))
      .groupBy("q_id", "id")
      .agg(sum(col("c")).as("score_q"))
  }

  /** BM25 top-k per query: `(q_id, rank, id, score_q)`, ties ranked by
    * ascending id. One per-query top-k window over the candidate-sized
    * score frame (WindowGroupLimit caps each partition map-side). */
  def bm25TopK(index: DataFrame, queries: DataFrame, textCol: String,
      idCol: String, k: Int, k1Tenths: Int = 12,
      bHundredths: Int = 75): DataFrame = {
    require(k >= 1, "k must be >= 1")
    bm25Scores(index, queries, textCol, idCol, k1Tenths, bHundredths)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("score_q").desc, col("id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("id"), col("score_q"))
  }

  /** BM25 scores of a LARGE doc stream against a SMALL standing SEED
    * index — the cleaning-gate orientation of [[bm25Scores]], with the
    * broadcast flipped: seed postings (+df +stats) broadcast, the doc
    * stream tokenizes map-side and is never shuffled until the final
    * (doc, seed) partial aggregate. Returns `(q_id, id, score_q)` with
    * `q_id` = stream doc id, `id` = seed doc id; the id spaces are
    * independent (no self-exclusion — a gate compares different
    * corpora). Seed-set contract: small enough to broadcast (it is the
    * curation target description, thousands of docs at most). */
  def bm25ScoresVsSeedIndex(index: DataFrame, docs: DataFrame,
      textCol: String, idCol: String, k1Tenths: Int = 12,
      bHundredths: Int = 75): DataFrame = {
    val post = index.filter(col("role") === "post")
      .select(col("term"), col("id"), col("tf"), col("dl"))
    val lens = index.filter(col("role") === "len")
      .select(col("id"), col("dl"))
    val stats = lens
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs").cast("double"))
          .as("avgdl"))
    val dfreq = post.groupBy("term").agg(count(lit(1)).as("df"))
    val enriched = post.join(dfreq, "term")
    docs.select(col(idCol).cast("long").as("q_id"),
        explode(array_distinct(TextOps.tokens(col(textCol)))).as("term"))
      .join(broadcast(enriched), "term")
      .crossJoin(broadcast(stats))
      .select(col("q_id"), col("id"),
        expr(bm25Contrib("tf", "df", "dl", "n_docs", "avgdl",
          k1Lit(k1Tenths), bLit(bHundredths))).as("c"))
      .groupBy("q_id", "id")
      .agg(sum(col("c")).as("score_q"))
  }

  /** Flatten the index back to positional occurrence rows
    * `(id, term, p)` — the bigram/proximity mining view. Linear in
    * corpus token count; shuffle-free (explode is per-row). */
  def positionRows(index: DataFrame): DataFrame =
    index.filter(col("role") === "post")
      .select(col("id"), col("term"), explode(col("pos")).as("p"))

  /** Exact two-token phrase match against the positional index:
    * `(id, w1, w2, phrase_tf)` for every doc where `w2` immediately
    * follows `w1`. `phrases` (w1, w2) is broadcast (a query set, always
    * small); the position join shuffles only the matched terms'
    * occurrence rows (df(w1)+df(w2) per phrase), never the corpus. */
  /** All phrase-match start positions `(id, w1, w2, p)`: w1 at p, w2
    * at p+1. The shared kernel of [[phraseMatch]], [[phraseFirstPos]]
    * and [[snippets]]. */
  private def phrasePositions(index: DataFrame,
      phrases: DataFrame): DataFrame = {
    val post = index.filter(col("role") === "post")
    val p1 = post.join(broadcast(phrases), col("term") === col("w1"))
      .select(col("w1"), col("w2"), col("id"),
        explode(col("pos")).as("p"))
    val p2 = post.join(broadcast(phrases), col("term") === col("w2"))
      .select(col("w1").as("w1b"), col("w2").as("w2b"),
        col("id").as("idb"), explode(col("pos")).as("pb"))
    p1.join(p2, col("w1") === col("w1b") && col("w2") === col("w2b") &&
        col("id") === col("idb") && col("pb") === col("p") + 1)
      .select(col("id"), col("w1"), col("w2"), col("p"))
  }

  def phraseMatch(index: DataFrame, phrases: DataFrame): DataFrame =
    phrasePositions(index, phrases)
      .groupBy(col("id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("phrase_tf"))

  /** First match position per (doc, phrase) — [[phraseMatch]] with
    * min(p) instead of count: `(id, w1, w2, p0)`. */
  def phraseFirstPos(index: DataFrame, phrases: DataFrame): DataFrame =
    phrasePositions(index, phrases)
      .groupBy(col("id"), col("w1"), col("w2"))
      .agg(min(col("p")).as("p0"))

  /** Unordered proximity match (the NEAR/w operator): docs where `w1`
    * and `w2` occur within `w` tokens of each other, in either order —
    * `(id, w1, w2, n_pairs, min_dist)` over all qualifying position
    * pairs. Same broadcast/matched-terms-only shape as
    * [[phraseMatch]]; `w = 1` ordered is the phrase case. */
  def proximityMatch(index: DataFrame, pairs: DataFrame,
      w: Int): DataFrame = {
    require(w >= 1, "w must be >= 1")
    val post = index.filter(col("role") === "post")
    val p1 = post.join(broadcast(pairs), col("term") === col("w1"))
      .select(col("w1"), col("w2"), col("id"),
        explode(col("pos")).as("p"))
    val p2 = post.join(broadcast(pairs), col("term") === col("w2"))
      .select(col("w1").as("w1b"), col("w2").as("w2b"),
        col("id").as("idb"), explode(col("pos")).as("pb"))
    p1.join(p2, col("w1") === col("w1b") && col("w2") === col("w2b") &&
        col("id") === col("idb") &&
        abs(col("pb") - col("p")) <= w && col("pb") =!= col("p"))
      .groupBy(col("id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_pairs"),
        min(abs(col("pb") - col("p"))).as("min_dist"))
  }

  /** The quantized reciprocal-rank-fusion contribution of one ranked
    * list — ONE expression text shared with the DuckDB oracle
    * (floor(2^14 / (kRrf + rank)), the [[bm25Contrib]] discipline). */
  private[ops] def rrfContrib(rank: String, kRrf: Int): String =
    s"cast(floor(16384.0 / (cast($kRrf as double) + " +
      s"cast($rank as double))) as bigint)"

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of two
    * ranked lists `(q_id, rank, id)` — the standard hybrid-search
    * combiner (BM25 leg + vector leg): score = Σ floor(2^14 /
    * (kRrf + rank)) over the lists that ranked the doc, re-ranked
    * top-k per query. Rank-based, so the legs' score scales never need
    * calibrating; integer contributions keep the fusion exact and
    * order-independent. Both inputs are top-k-bounded (probes × k
    * rows) — the fusion is broadcast-sized by construction. */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int,
      kRrf: Int = 60): DataFrame = {
    require(k >= 1 && kRrf >= 1, "k and kRrf must be >= 1")
    val fa = a.select(col("q_id"), col("id"),
      expr(rrfContrib("rank", kRrf)).as("ca"))
    val fb = b.select(col("q_id").as("__q2"), col("id").as("__i2"),
      expr(rrfContrib("rank", kRrf)).as("cb"))
    fa.join(fb, col("q_id") === col("__q2") &&
        col("id") === col("__i2"), "full_outer")
      .select(coalesce(col("q_id"), col("__q2")).as("q_id"),
        coalesce(col("id"), col("__i2")).as("id"),
        (coalesce(col("ca"), lit(0L)) + coalesce(col("cb"), lit(0L)))
          .as("rrf_q"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("rrf_q").desc, col("id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("id"), col("rrf_q"))
  }

  /** Character-trigram index for substring (LIKE '%...%') search
    * acceleration — the pg_trgm technique: `(h, id)` rows, one per
    * DISTINCT char 3-gram per doc (native one-pass
    * [[graft.functions.CharGramHashesExpr]]; map-only build, same
    * standing-artifact contract as [[postingsIndex]]). */
  def trigramIndex(docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("id"),
      explode(F.charGramHashes(col(textCol), 3)).as("h"))

  /** Index-accelerated substring search: docs whose text CONTAINS each
    * pattern (`patterns` = one `pat` string per row, broadcast —
    * patterns must be >= 3 chars so they have at least one trigram).
    * A matching doc must contain EVERY distinct pattern trigram, so
    * the gram join + count filter prunes the corpus to near-matches
    * (hash collisions only ever ADD candidates — never drop one), and
    * the exact `contains` verify touches only candidate docs' text: a
    * match-sized join, never a corpus LIKE scan. Returns (id, pat). */
  def likeSearch(index: DataFrame, docs: DataFrame, patterns: DataFrame,
      textCol: String, idCol: String): DataFrame = {
    val pg = patterns
      .filter(assert_true(length(col("pat")) >= 3,
        lit("likeSearch: pattern must be >= 3 chars")).isNull)
      .select(col("pat"), size(F.charGramHashes(col("pat"), 3)).as("ng"),
        explode(F.charGramHashes(col("pat"), 3)).as("h"))
    // (h, id) rows are distinct per doc by construction, so the
    // all-grams test is a plain count against the pattern's gram count
    val cand = index.join(broadcast(pg), "h")
      .groupBy(col("id"), col("pat"), col("ng"))
      .agg(count(lit(1)).as("nh"))
      .filter(col("nh") === col("ng"))
      .select(col("id"), col("pat"))
    cand.join(docs.select(col(idCol).cast("long").as("id"),
        col(textCol).as("__text")), "id")
      .filter(expr("contains(__text, pat)"))
      .select(col("id"), col("pat"))
  }

  /** KWIC snippets: the `window`-token context around each matched
    * doc's FIRST phrase occurrence, as one space-joined string —
    * `(id, w1, w2, p0, snippet)`. The index finds matches and
    * positions; only the MATCHED docs' raw text is fetched (a
    * match-sized semi-join against `docs`, never a corpus scan for a
    * selective phrase). Token windows, not char offsets: the snippet
    * is `tokens[max(p0-window, 0) .. p0+1+window]` under the same
    * whitespace tokenization the index was built with. */
  def snippets(index: DataFrame, docs: DataFrame, phrases: DataFrame,
      textCol: String, idCol: String, window: Int = 3): DataFrame = {
    require(window >= 0, "window must be >= 0")
    phraseFirstPos(index, phrases)
      .join(docs.select(col(idCol).cast("long").as("id"),
        col(textCol).as("__text")), "id")
      .select(col("id"), col("w1"), col("w2"), col("p0"),
        expr(s"concat_ws(' ', slice(filter(split(__text, ' '), " +
          s"t -> t != ''), greatest(p0 - $window, 0) + 1, " +
          s"p0 + 1 + $window - greatest(p0 - $window, 0) + 1))")
          .as("snippet"))
  }
}
