package graft

import org.apache.spark.sql.functions._

import graft.ops.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ===================================================================
  // featureBuckets
  // ===================================================================

  test("featureBuckets emits unigrams then bigrams in text order, mod B") {
    val fs = Seq("a b c").toDF("t")
      .select(Curation.featureBuckets(col("t"), 512)).head().getSeq[Long](0)
    assert(fs.length === 5) // 3 unigrams + 2 bigrams
    assert(fs.forall(b => b >= 0 && b < 512))
    val single = Seq("solo").toDF("t")
      .select(Curation.featureBuckets(col("t"), 512)).head().getSeq[Long](0)
    assert(single.length === 1) // no bigrams below 2 tokens
  }

  // ===================================================================
  // DSIR selection
  // ===================================================================

  private def dsirCorpus = {
    val a = (1 to 8).map(i => (i.toLong, s"spark scala shuffle partition plan $i"))
    val b = (9 to 16).map(i => (i.toLong, s"cat dog bird fish mouse $i"))
    (a ++ b).toDF("doc_id", "text")
  }

  test("dsirSelect ranks target-like docs first, weights descending") {
    val raw = dsirCorpus
    val target = raw.filter(col("doc_id") <= 4) // family-A sample
    val out = Curation.dsirSelect(target, raw, "text", "doc_id",
      numBuckets = 256, topK = 8).collect()
    assert(out.map(_.getInt(0)).toSeq === (1 to 8))
    val ws = out.map(_.getLong(2))
    assert(ws.zip(ws.tail).forall { case (x, y) => x >= y })
    // all 8 family-A docs outrank every family-B doc
    assert(out.map(_.getLong(1)).toSet === (1L to 8L).toSet)
  }

  test("dsirSelect is partitioning-invariant (integer weight sums)") {
    val raw = dsirCorpus
    val target = raw.filter(col("doc_id") <= 4)
    val once = Curation.dsirSelect(target, raw, "text", "doc_id", 256, 8)
      .collect().toSeq
    val again = Curation.dsirSelect(target.repartition(7), raw.repartition(5),
      "text", "doc_id", 256, 8).collect().toSeq
    assert(once === again)
  }

  test("dsirIndex fold == rebuild (exact integer histograms)") {
    val raw = dsirCorpus
    val target = raw.filter(col("doc_id") <= 4)
    val atOnce = Curation.dsirIndex(target, raw, "text", 256)
    val folded = Curation.refreshDsirIndex(
      Curation.dsirIndex(target.filter(col("doc_id") <= 2),
        raw.filter(col("doc_id") <= 8), "text", 256),
      target.filter(col("doc_id") > 2), raw.filter(col("doc_id") > 8),
      "text")
    assert(atOnce.exceptAll(folded).count() === 0)
    assert(folded.exceptAll(atOnce).count() === 0)
    // and scoring from either artifact is identical
    val a = Curation.dsirScoreFromIndex(atOnce, raw, "text", "doc_id", 8)
      .collect().toSeq
    val b = Curation.dsirScoreFromIndex(folded, raw, "text", "doc_id", 8)
      .collect().toSeq
    assert(a === b)
  }

  // ===================================================================
  // BPE merge training
  // ===================================================================

  test("bpeMerges learns merges and merged symbols stay atomic") {
    // words: aab x3, cb x2. Step 1 ties (|a|a vs |a|b, both pc=3) break
    // lexicographically -> merge aa. Step 2 MUST see pair (aa, b) — the
    // regression here is a sentinel-dropping replace that leaves the
    // merged symbol fused to its left neighbour ("aa|b" vs "|aa|b"),
    // which would re-learn (a, b) instead.
    val docs = Seq("aab aab", "aab cb", "cb").toDF("text")
    val out = Curation.bpeMerges(docs, "text", 2)
      .orderBy("step").collect()
    assert(out(0).getString(1) === "a~a")
    assert(out(0).getString(2) === "aa")
    assert(out(0).getLong(3) === 3L)
    assert(out(1).getString(1) === "aa~b")
    assert(out(1).getString(2) === "aab")
    assert(out(1).getLong(3) === 3L)
  }

  test("bpeMerges counts overlapping pairs, weighted by word frequency") {
    // 'aaa' x2: pair (a,a) occurs at 2 positions per word -> pc = 4
    val docs = Seq("aaa aaa").toDF("text")
    val out = Curation.bpeMerges(docs, "text", 1).head()
    assert(out.getString(1) === "a~a")
    assert(out.getLong(3) === 4L)
  }

  test("bpeEncode applies merges in order, incl. unseen words") {
    // training learns (a,a) then (aa,b) — see the merge test above
    val docs = Seq("aab aab", "aab cb", "cb").toDF("text")
    val merges = Curation.bpeMerges(docs, "text", 2)
    val enc = Seq((1L, "aab aab"), (2L, "aab cb"), (3L, "aabcb"))
      .toDF("doc_id", "text")
    val out = Curation.bpeEncode(enc, merges, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // aab -> one symbol after both merges; cb stays c|b (2);
    // unseen aabcb -> |aab|c|b (3)
    assert(out.toSeq === Seq((1L, 2L, 2L), (2L, 2L, 3L), (3L, 1L, 3L)))
  }

  test("bpeMerges rejects k < 1") {
    val docs = Seq("ab").toDF("text")
    intercept[IllegalArgumentException] {
      Curation.bpeMerges(docs, "text", 0)
    }
  }

  test("bpeMerges large-k driver path computes the same rules as the " +
      "Spark loop (and survives pair exhaustion)") {
    val docs = graft.engine.Tables.load(spark, sfDir, "documents")
      .limit(40).select($"text")
    // same k through both paths: sparkLoopMaxK=0 forces the collected-
    // dict trainer, the default keeps the per-step Spark loop
    val viaSpark = Curation.bpeMerges(docs, "text", 8)
      .collect().map(_.toString).toSeq
    val viaDict = Curation.bpeMerges(docs, "text", 8, sparkLoopMaxK = 0)
      .collect().map(_.toString).toSeq
    assert(viaSpark === viaDict)
    assert(viaDict.size === 8)
    // a corpus with 2 single-pair words exhausts after 2 merges: both
    // paths stop emitting rows rather than fail
    val tiny = Seq("ab cd").toDF("text")
    assert(Curation.bpeMerges(tiny, "text", 20, sparkLoopMaxK = 20).count()
      === 2L)
    assert(Curation.bpeMerges(tiny, "text", 20, sparkLoopMaxK = 0).count()
      === 2L)
  }

  // ===================================================================
  // Bigram-LM quality
  // ===================================================================

  test("lmQuality ranks the unpredictable doc first; partition-invariant") {
    // docs 1-4 repeat the same bigrams; doc 5 is one-off word pairs
    val docs = Seq(
      (1L, "the quick fox jumps high"),
      (2L, "the quick fox jumps high"),
      (3L, "the quick fox jumps high"),
      (4L, "the quick fox jumps high"),
      (5L, "zebra quantum pickle warp")).toDF("doc_id", "text")
    val out = Curation.lmQuality(docs, "text", "doc_id", topK = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(3)))
    assert(out.head._2 === 5L) // the outlier is rank 1
    assert(out.head._3 > out(1)._3) // strictly more surprising
    assert(out.forall(_._3 > 0L)) // surprisal stays positive
    val again = Curation.lmQuality(docs.repartition(7), "text", "doc_id", 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(3)))
    assert(out.toSeq === again.toSeq)
  }

  // ===================================================================
  // Domain mixture
  // ===================================================================

  private def mixCorpus = Seq(
    // big source: long docs; small source: short docs
    (1L, "big", "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "big", "alpha beta gamma delta epsilon zeta eta theta"),
    (3L, "big", "alpha beta gamma delta epsilon zeta eta theta"),
    (4L, "big", "alpha beta gamma delta epsilon zeta eta theta"),
    (5L, "small", "alpha beta"),
    (6L, "small", "gamma delta")
  ).toDF("doc_id", "source", "text")

  test("domainMixture sqrt-tempering upweights the small domain") {
    val out = Curation.domainMixture(mixCorpus, "text", "doc_id", "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (_, bigTok, bigRate, _) = out("big")
    val (_, smallTok, smallRate, smallSampled) = out("small")
    assert(bigTok === 32L && smallTok === 4L)
    // sqrt tempering: small source's rate exceeds the big source's
    assert(smallRate > bigRate)
    assert(smallSampled <= 2L)
    // realized budget: sum(rate*tokens) stays at/under budget on tokens
    // (floor per source), within one floor step per source
    val spent = out.values.map { case (_, tok, rate, _) =>
      math.min(rate, 10000L) * tok }.sum
    assert(spent <= 6000L * (bigTok + smallTok))
  }

  test("domainMixture sample is deterministic across runs and partitionings") {
    val a = Curation.domainMixture(mixCorpus, "text", "doc_id", "source")
      .orderBy("source").collect().toSeq
    val b = Curation.domainMixture(mixCorpus.repartition(5), "text",
      "doc_id", "source").orderBy("source").collect().toSeq
    assert(a === b)
  }

  test("clusterBalance caps each cell at quota, ranks are dense from 1, " +
      "selection is the hash order and partition-invariant") {
    import spark.implicits._
    // 3 cells: sizes 12, 5, 1 — quota 4 keeps 4 + 4 + 1
    val cells = ((1L to 12L).map(_ -> 0) ++ (20L to 24L).map(_ -> 1) ++
      Seq(30L -> 2)).toDF("id", "cell")
    val out = Curation.clusterBalance(cells, quota = 4)
    val rows = out.collect()
      .map(r => (r.getAs[Int]("cell"), r.getAs[Int]("rank"),
        r.getAs[Long]("id")))
    assert(rows.length === 9)
    for (c <- Seq(0, 1, 2)) {
      val ranks = rows.filter(_._1 == c).map(_._2).sorted
      assert(ranks === (1 to ranks.length).toArray, s"cell $c ranks")
    }
    assert(rows.count(_._1 == 0) === 4)
    assert(rows.count(_._1 == 2) === 1)
    // the kept set IS the 4 smallest (h, id) pairs of cell 0
    val expect0 = (1L to 12L)
      .sortBy(i => ((i * 1103515245L + 12345L) % 2147483647L, i)).take(4)
    assert(rows.filter(_._1 == 0).sortBy(_._2).map(_._3).toSeq === expect0)
    assert(Curation.clusterBalance(cells.repartition(7), quota = 4)
      .collect().map(_.toString).sorted
      === out.collect().map(_.toString).sorted)
    intercept[IllegalArgumentException](
      Curation.clusterBalance(cells, quota = 0))
  }

  // ===================================================================
  // Naive Bayes classifier
  // ===================================================================

  /** Two classes with disjoint vocabularies plus shared filler — the
    * planted structure NB must recover on held-out docs. */
  private def nbCorpus = {
    import spark.implicits._
    val a = (0 to 9).map(i =>
      (i.toLong, s"spark shuffle partition the of plan $i", "tech"))
    val b = (10 to 19).map(i =>
      (i.toLong, s"cat dog bird the of fish $i", "pets"))
    (a ++ b).toDF("id", "text", "label")
  }

  test("nbClassify recovers planted classes on held-out docs") {
    import spark.implicits._
    val counts = Curation.nbCounts(nbCorpus, "text", "label")
    val held = Seq(
      (100L, "spark partition plan shuffle"),
      (101L, "dog cat fish bird"),
      (102L, "the of")).toDF("id", "text") // filler-only: prior decides
    val out = Curation.nbClassify(counts, held, "text", "id")
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[String]("pred_label")).toMap
    assert(out(100L) === "tech")
    assert(out(101L) === "pets")
    // equal priors (10 docs each) + shared filler → tie on score,
    // deterministic smallest-label tie-break
    assert(out(102L) === "pets")
  }

  test("nbClassify drops docs with zero in-vocab tokens") {
    import spark.implicits._
    val counts = Curation.nbCounts(nbCorpus, "text", "label")
    val held = Seq((200L, "zzz qqq unseen")).toDF("id", "text")
    assert(Curation.nbClassify(counts, held, "text", "id").count() === 0)
  }

  test("nbCounts fold == rebuild and is partitioning-invariant") {
    val c = nbCorpus
    val atOnce = Curation.nbCounts(c, "text", "label")
    val folded = Curation.refreshNbCounts(
      Curation.nbCounts(c.filter(col("id") < 5), "text", "label"),
      c.filter(col("id") >= 5).repartition(7), "text", "label")
    assert(atOnce.collect().map(_.toString).sorted
      === folded.collect().map(_.toString).sorted)
  }

  // ===================================================================
  // Stupid-backoff trigram LM
  // ===================================================================

  test("backoffScores: seen trigram scores c3/c2; pruned trigram backs " +
      "off to the bigram level; unseen word hits the unigram floor") {
    import spark.implicits._
    // "a b c" appears twice (c3=2 survives minCount=2); "a b d" once
    // (pruned); bigram "b d" count 1 so its backoff is defined
    val train = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b d"))
      .toDF("id", "text")
    def score(txt: String): Long = Curation
      .backoffScores(train, Seq((9L, txt)).toDF("id", "text"), "text", "id")
      .head().getAs[Long]("score_q")
    // N=9 tokens, V=4 vocab; c3(a,b,c)=2, c2(a,b)=3 -> S=2/3
    val sSeen = -math.floor(16384.0 * math.log(2.0 / 3.0)).toLong
    assert(score("a b c") === sSeen)
    // trigram (a,b,d) pruned -> 0.4 * cb(b,d)/cu(b) = 0.4 * 1/3
    val sBig = -math.floor(16384.0 * math.log(0.4 * 1.0 / 3.0)).toLong
    assert(score("a b d") === sBig)
    // w3 unseen entirely -> 0.4^2 * (0+1)/(9+4) — 0.4*0.4 (not the
    // 0.16 literal, 1 ulp off) replays the engine's exact arithmetic
    val sUni = -math.floor(16384.0 * math.log(0.4 * 0.4 * 1.0 / 13.0)).toLong
    assert(score("a b zzz") === sUni)
    // docs below 3 tokens yield no row
    assert(Curation.backoffScores(train,
      Seq((9L, "a b")).toDF("id", "text"), "text", "id").count() === 0)
  }

  test("backoffScores is partitioning-invariant (exact integer sums)") {
    import spark.implicits._
    val train = (1 to 20).map(i =>
      (i.toLong, s"the quick brown fox $i jumps over the lazy dog"))
      .toDF("id", "text")
    val held = (50 to 60).map(i =>
      (i.toLong, s"the quick red fox $i sleeps over the lazy cat"))
      .toDF("id", "text")
    val once = Curation.backoffScores(train, held, "text", "id")
      .collect().map(_.toString).sorted
    val again = Curation.backoffScores(train.repartition(7),
      held.repartition(3), "text", "id").collect().map(_.toString).sorted
    assert(once === again)
  }

  test("nbClassify scores are exact and partition-invariant") {
    val counts = Curation.nbCounts(nbCorpus, "text", "label")
    val held = nbCorpus.select(col("id"), col("text"))
    val once = Curation.nbClassify(counts, held, "text", "id")
      .collect().map(_.toString).sorted
    val again = Curation.nbClassify(counts.repartition(5),
      held.repartition(3), "text", "id").collect().map(_.toString).sorted
    assert(once === again)
  }

  // ------------------------------------------- weighted sampling (E-S)

  private def skewedPool = {
    import spark.implicits._
    ((1 to 900).map(i => (i.toLong, "big", s"doc about topic $i words")) ++
      (1001 to 1100).map(i => (i.toLong, "small", s"rare doc $i notes")))
      .toDF("id", "source", "text")
  }

  test("weightedSample with flattening weights draws a source-flat " +
      "sample from a 9:1 skewed pool") {
    val pool = skewedPool
    val sel = Curation.weightedSample(pool, "text", "id", "source",
      Curation.flatteningWeights(pool, "source"), k = 120)
    assert(sel.count() === 120)
    val bySrc = sel.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // equal weight mass per source => ~60/60 despite the 9:1 pool; the
    // small source holds 100 docs so it cannot exhaust at 60. 4-sigma-ish
    // band for a weighted WOR draw of 120.
    assert(bySrc("small") > 30 && bySrc("small") < 95, bySrc.toString)
    // unweighted contrast: uniform draw of 120 would give small ~12
    val unif = Curation.weightedSample(pool, "text", "id", "source",
      spark.sql("SELECT 'big' AS source, 1000000 AS w UNION ALL " +
        "SELECT 'small', 1000000"), k = 120)
      .filter(col("source") === "small").count()
    assert(unif < bySrc("small"), s"uniform drew $unif small docs")
  }

  test("weightedSample is deterministic and partitioning-invariant") {
    val pool = skewedPool
    val w = Curation.flatteningWeights(pool, "source")
    val a = Curation.weightedSample(pool, "text", "id", "source", w, 50)
      .collect().map(_.toString)
    val b = Curation.weightedSample(pool.repartition(13), "text", "id",
        "source", w, 50).collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("weightedSample with k >= pool size returns the whole pool") {
    val pool = skewedPool.limit(40)
    val sel = Curation.weightedSample(pool, "text", "id", "source",
      Curation.flatteningWeights(pool, "source"), k = 1000)
    assert(sel.count() === 40)
  }
}
