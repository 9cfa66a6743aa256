package graft

import org.apache.spark.sql.functions._

import graft.functions.F
import graft.ops.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark shuffle spark join"),
    (2L, "spark plan"),
    (3L, "cat dog cat dog cat"),
    (4L, "shuffle join plan shuffle"),
    (5L, "")).toDF("doc_id", "text")

  // ===================================================================
  // tokenPositions (native expression)
  // ===================================================================

  test("tokenPositions emits (term, tf, pos) in first-occurrence order") {
    val rows = Seq("a b a  c b a").toDF("t")
      .select(explode(F.tokenPositions(col("t"))).as("e"))
      .select(col("e.t"), col("e.tf"), col("e.pos"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Int](2)))
    assert(rows.toSeq === Seq(
      ("a", 3L, Seq(0, 2, 5)), ("b", 2L, Seq(1, 4)), ("c", 1L, Seq(3))))
  }

  test("tokenPositions of an empty/whitespace doc is empty") {
    val n = Seq("", "   ").toDF("t")
      .select(size(F.tokenPositions(col("t")))).collect().map(_.getInt(0))
    assert(n.toSeq === Seq(0, 0))
  }

  // ===================================================================
  // postingsIndex layout
  // ===================================================================

  test("postingsIndex: post rows carry tf+pos+dl; len rows cover all docs") {
    val idx = Retrieval.postingsIndex(corpus, "text", "doc_id")
    val post = idx.filter(col("role") === "post")
      .select("term", "id", "tf", "pos", "dl").collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getSeq[Int](3), r.getLong(4)))).toMap
    assert(post(("spark", 1L)) === ((2L, Seq(0, 2), 4L)))
    assert(post(("join", 4L)) === ((1L, Seq(1), 4L)))
    assert(post(("cat", 3L)) === ((3L, Seq(0, 2, 4), 5L)))
    val lens = idx.filter(col("role") === "len")
      .select("id", "dl").as[(Long, Long)].collect().toMap
    assert(lens === Map(1L -> 4L, 2L -> 2L, 3L -> 5L, 4L -> 4L, 5L -> 0L))
    // empty doc: a len row but no post rows
    assert(idx.filter(col("role") === "post" && col("id") === 5L).count() === 0)
  }

  // ===================================================================
  // BM25 semantics
  // ===================================================================

  test("bm25TopK ranks term-sharing docs only, self excluded") {
    val idx = Retrieval.postingsIndex(corpus, "text", "doc_id")
    val out = Retrieval.bm25TopK(idx, corpus.filter(col("doc_id") === 2),
        "text", "doc_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // query "spark plan": candidates are docs 1 (spark) and 4 (plan);
    // doc 3 shares nothing, doc 5 is empty, self (2) excluded
    assert(out.map(_._3).toSet === Set(1L, 4L))
    assert(out.map(_._2).toSeq.sorted === Seq(1, 2))
  }

  test("bm25 rewards rarer terms: rare-term doc outranks common-term doc") {
    val docs = Seq(
      (1L, "rare alpha"),
      (2L, "common beta"),
      (3L, "common gamma"),
      (4L, "common delta"),
      (10L, "rare common")).toDF("doc_id", "text")
    val idx = Retrieval.postingsIndex(docs, "text", "doc_id")
    val out = Retrieval.bm25TopK(idx, docs.filter(col("doc_id") === 10),
        "text", "doc_id", k = 4).orderBy(col("rank"))
      .collect().map(_.getLong(2))
    // "rare" (df=2) must contribute more than "common" (df=4)
    assert(out.head === 1L)
  }

  test("bm25Scores is partitioning-invariant (integer contribution sums)") {
    val idx = Retrieval.postingsIndex(corpus, "text", "doc_id")
    val probes = corpus.filter(col("doc_id") <= 2)
    val once = Retrieval.bm25Scores(idx, probes, "text", "doc_id")
      .orderBy("q_id", "id").collect().toSeq
    val again = Retrieval.bm25Scores(
      Retrieval.postingsIndex(corpus.repartition(7), "text", "doc_id"),
      probes.repartition(3), "text", "doc_id")
      .orderBy("q_id", "id").collect().toSeq
    assert(once === again)
  }

  // ===================================================================
  // Standing-index fold
  // ===================================================================

  test("refreshPostingsIndex fold == rebuild for any batch split") {
    val full = Retrieval.postingsIndex(corpus, "text", "doc_id")
    val folded = Retrieval.refreshPostingsIndex(
      Retrieval.postingsIndex(corpus.filter(col("doc_id") <= 3),
        "text", "doc_id"),
      corpus.filter(col("doc_id") > 3), "text", "doc_id")
    assert(folded.exceptAll(full).count() === 0)
    assert(full.exceptAll(folded).count() === 0)
    // and BM25 served from the folded index matches the rebuilt one
    val probes = corpus.filter(col("doc_id") === 1)
    val a = Retrieval.bm25TopK(full, probes, "text", "doc_id", 5)
      .orderBy("q_id", "rank").collect().toSeq
    val b = Retrieval.bm25TopK(folded, probes, "text", "doc_id", 5)
      .orderBy("q_id", "rank").collect().toSeq
    assert(a === b)
  }

  test("fold == rebuild over random corpora and random 3-way splits " +
      "(seeded)") {
    val rnd = new scala.util.Random(42)
    val words = Array("a", "bb", "ccc", "dd", "e", "fff", "g")
    for (trial <- 1 to 3) {
      val docs = (0 until 30).map { i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(12))(
          words(rnd.nextInt(words.length))).mkString(" "))
      }.toDF("doc_id", "text")
      val (c1, c2) = (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong)
      val (lo, hi) = (math.min(c1, c2), math.max(c1, c2))
      val folded = Retrieval.refreshPostingsIndex(
        Retrieval.refreshPostingsIndex(
          Retrieval.postingsIndex(docs.filter(col("doc_id") < lo),
            "text", "doc_id"),
          docs.filter(col("doc_id") >= lo && col("doc_id") < hi),
          "text", "doc_id"),
        docs.filter(col("doc_id") >= hi), "text", "doc_id")
      val full = Retrieval.postingsIndex(docs, "text", "doc_id")
      assert(folded.exceptAll(full).count() === 0, s"trial $trial")
      assert(full.exceptAll(folded).count() === 0, s"trial $trial")
    }
  }

  // ===================================================================
  // Phrase search
  // ===================================================================

  test("phraseMatch finds exact adjacency with per-doc phrase tf") {
    val idx = Retrieval.postingsIndex(corpus, "text", "doc_id")
    val out = Retrieval.phraseMatch(idx,
        Seq(("cat", "dog")).toDF("w1", "w2"))
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(out.toSeq === Seq((3L, 2L))) // "cat dog cat dog cat"
    // reversed order is a different phrase
    val rev = Retrieval.phraseMatch(idx,
        Seq(("dog", "cat")).toDF("w1", "w2"))
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(rev.toSeq === Seq((3L, 2L)))
    // non-adjacent pair never matches
    val non = Retrieval.phraseMatch(idx,
      Seq(("spark", "cat")).toDF("w1", "w2"))
    assert(non.count() === 0)
  }

  test("snippets clamp the window at doc boundaries and use the FIRST " +
      "occurrence") {
    val docs = Seq(
      (1L, "cat dog tail one two three four"),   // match at start
      (2L, "a b c d cat dog"),                   // match at end
      (3L, "x cat dog y cat dog z")).toDF("doc_id", "text") // two hits
    val idx = Retrieval.postingsIndex(docs, "text", "doc_id")
    val out = Retrieval.snippets(idx, docs,
        Seq(("cat", "dog")).toDF("w1", "w2"), "text", "doc_id",
        window = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getString(4)))
      .sortBy(_._1)
    assert(out(0) === ((1L, 0, "cat dog tail one")))
    assert(out(1) === ((2L, 4, "c d cat dog")))
    assert(out(2) === ((3L, 1, "x cat dog y cat")))
  }

  test("proximityMatch finds unordered co-occurrence within the window " +
      "and reports the closest pair") {
    val docs = Seq(
      (1L, "alpha x y beta"),        // dist 3, one order
      (2L, "beta alpha"),            // dist 1, reversed
      (3L, "alpha x y z q w beta"),  // dist 6 > w
      (4L, "alpha beta x alpha")).toDF("doc_id", "text")
    val idx = Retrieval.postingsIndex(docs, "text", "doc_id")
    val out = Retrieval.proximityMatch(idx,
        Seq(("alpha", "beta")).toDF("w1", "w2"), w = 3)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getInt(4)))
      .sortBy(_._1)
    // doc 3 excluded (distance 6); doc 4 has pairs (0,1) d1 and (3,1)
    // d2 -> n_pairs 2, min 1
    assert(out.toSeq === Seq((1L, 1L, 3), (2L, 1L, 1), (4L, 2L, 1)))
  }

  test("likeSearch returns exactly the contains() docs — trigram " +
      "pruning is candidate-only, collisions never drop a match") {
    val docs = Seq(
      (1L, "the spark shuffle plan"),
      (2L, "spark shuf only"),
      (3L, "a sparkly shuffle"),   // has 'spark' grams but not phrase
      (4L, "spark shuffle twice spark shuffle")).toDF("doc_id", "text")
    val idx = Retrieval.trigramIndex(docs, "text", "doc_id")
    val out = Retrieval.likeSearch(idx, docs,
        Seq("spark shuffle").toDF("pat"), "text", "doc_id")
      .collect().map(_.getLong(0)).sorted
    val truth = docs.filter(col("text").contains("spark shuffle"))
      .collect().map(_.getLong(0)).sorted
    assert(out.toSeq === truth.toSeq)
    assert(out.toSeq === Seq(1L, 4L))
  }

  test("bm25 top-1 of a duplicated doc is its exact twin (the " +
      "retrieval-quality sanity the exact-copy probe scales up)") {
    val base = (0 until 20).map(i =>
      (i.toLong, s"w${i}a w${i}b w${i}c shared common tail"))
    val twins = (0 until 20).map(i => (100L + i, base(i)._2))
    val docs = (base ++ twins).toDF("doc_id", "text")
    val idx = Retrieval.postingsIndex(docs, "text", "doc_id")
    val top1 = Retrieval.bm25TopK(idx,
        docs.filter(col("doc_id") >= 100), "text", "doc_id", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(top1.length === 20)
    top1.foreach { case (q, id) =>
      assert(id === q - 100, s"probe $q: top-1 must be its twin, got $id")
    }
  }

  test("rrfFuse: both-legs doc outranks single-leg doc at equal rank; " +
      "single-leg docs still fuse (full-outer)") {
    val a = Seq((1L, 1, 10L), (1L, 2, 11L)).toDF("q_id", "rank", "id")
    val b = Seq((1L, 1, 10L), (1L, 2, 12L)).toDF("q_id", "rank", "id")
    val out = Retrieval.rrfFuse(a, b, k = 5)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    // 10 in both legs at rank 1: 2*floor(16384/61) = 2*268 = 536
    assert(out(0) === ((1, 10L, 536L)))
    // 11 and 12 each rank-2 single-leg: floor(16384/62) = 264; tie
    // breaks by id
    assert(out(1) === ((2, 11L, 264L)))
    assert(out(2) === ((3, 12L, 264L)))
  }

  test("phraseMatch handles repeated-token phrases (w1 == w2)") {
    val docs = Seq((1L, "b b b"), (2L, "b a b")).toDF("doc_id", "text")
    val idx = Retrieval.postingsIndex(docs, "text", "doc_id")
    val out = Retrieval.phraseMatch(idx, Seq(("b", "b")).toDF("w1", "w2"))
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 2L))) // positions (0,1) and (1,2)
  }
}
