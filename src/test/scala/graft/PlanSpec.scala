package graft

import org.apache.spark.sql.DataFrame

/** Plan-shape regressions: these assertions encode the 100 TB design
  * contract — filters reach the parquet scan, projection prunes columns,
  * aggregation is partial/final, small dimensions broadcast, per-row
  * signature stages stay shuffle-free. A change that silently turns one
  * of these into a full scan / shuffle / cartesian fails here before it
  * ever reaches a cluster. */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("q02: predicates push down to the parquet scan") {
    val p = planOf("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"))
    assert(!p.contains("PushedFilters: []"))
  }

  test("q02: column pruning — scan reads only referenced columns") {
    val p = planOf("q02_filter_project")
    val readSchema = p.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment"))
    assert(!readSchema.contains("l_suppkey"))
  }

  test("q04: aggregation is two-phase partial/final (no raw-row shuffle)") {
    val p = planOf("q04_pricing_summary")
    assert(p.contains("partial_sum"))
    assert(p.contains("HashAggregate"))
  }

  test("q20: dimension join broadcasts (no shuffle of the small side)") {
    val p = planOf("q20_join_3way")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q12: period phase 2 is a pushed-down range filter on ts") {
    // events.ts is read as nanosecond longs then converted, so the filter
    // itself can't reach parquet — but it must sit directly on the scan
    // (no shuffle between), and the scan must prune columns
    val df = SparkEntry.queries("q12_period_day")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("FileScan"))
    assert(!p.split("HashAggregate")(0).contains("Exchange") ||
      p.contains("Filter"))
  }

  test("hot paths stay inside whole-stage codegen") {
    // AQE finalizes the plan on execution; the '*(n)' prefix then marks
    // codegen stages in the plan string
    Seq("q04_pricing_summary", "q20_join_3way", "q08_topn_groups").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.collect()
      assert(df.queryExecution.executedPlan.toString.contains("*("),
        s"$q lost codegen")
    }
  }

  test("q30: simhash dedup is ONE aggregate after per-row signatures") {
    val p = planOf("q30_dedup_simhash")
    // exactly two exchanges: the deliberate widen-repartition and the
    // group-by on sig — no join, no cartesian
    assert(!p.contains("Join"))
    assert(p.contains("HashAggregate"))
  }

  test("q32: ANN probe side is broadcast, not shuffled") {
    val p = planOf("q32_ann_bruteforce_topk")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"))
  }
}

/** Plan gates for the newest pipeline queries. */
class PlanSpec2 extends SparkSpec {
  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("q47: IVF centroid assignment broadcasts the centroid side") {
    val p = planOf("q47_ann_ivf_topk")
    assert(p.contains("Broadcast"))
  }

  test("q49: split assignment has no join and exactly one aggregate path") {
    val p = planOf("q49_split_assign")
    assert(!p.contains("Join"))
    assert(p.contains("HashAggregate"))
  }

  test("q50: redaction is a pure map over the scan (no exchange after widen)") {
    val p = planOf("q50_redact")
    assert(!p.contains("Join"))
  }

  test("q66: as-of join is the one-shuffle window form, never a nested loop") {
    val p = planOf("q66_asof_join")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Window"))
    // union + window: no join operator at all
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"))
  }

  test("q67: range join is a banded equi-join, never a nested loop") {
    val p = planOf("q67_range_join_count")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("__bin"))
  }

  test("span hash-first hot-set join is size-gated, not a forced broadcast") {
    // The 100 TB contract of the ExactSubstr/duplicateSpans hash-first
    // kernels: the hot-hash set is UNHINTED, so AQE broadcasts it when
    // its measured size is small and keeps the shuffle join when a
    // duplication-heavy corpus makes it huge. A forced broadcast()
    // hint ignores autoBroadcastJoinThreshold — so flipping the
    // thresholds to -1 and observing the join strategy change is a
    // direct test that no hint is present.
    import spark.implicits._
    val docs = (0 until 40).map { i =>
      // every doc shares one long duplicated run; unique tail per doc
      (i.toLong, s"a b c d e f g h i j tail$i x$i y$i z$i")
    }.toDF("id", "text")
    def planAfterRun(): String = {
      val df = graft.ops.Dedup.spanCoverage(docs, "text", "id",
        spanTokens = 3, variant = graft.ops.Dedup.SpanHashFirst)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      // small hot set + default thresholds: AQE broadcasts at runtime
      conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10485760")
      assert(planAfterRun().contains("BroadcastHashJoin"),
        "AQE should broadcast the small hot set")
      // hot set 'over the ceiling' (simulated by threshold = -1): the
      // plan must fall back to a shuffle join — a forced hint would
      // still broadcast here and materialize the set on the driver
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val p = planAfterRun()
      assert(!p.contains("BroadcastHashJoin"),
        "hot-set join must not be a forced broadcast")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"))
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _)) }
  }

  test("q68: decontamination broadcasts the benchmark side") {
    val p = planOf("q68_decontaminate")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q69: repetition stats are map-only — no join, no mid-plan shuffle") {
    val p = planOf("q69_repetition_signals")
    assert(!p.contains("Join"))
    assert(p.contains("ngramrepeatstatsexpr") ||
      p.toLowerCase.contains("ngramrepeatstats"))
  }

  test("q71: sessionization aggregates reuse the window partitioning " +
      "(one exchange on user_id)") {
    val p = planOf("q71_sessionize_batch")
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(p).length
    assert(exchanges === 1, s"expected 1 hash exchange, got $exchanges:\n$p")
  }

  test("q80: semdedup centroid assignment broadcasts; cell join is equi") {
    val p = planOf("q80_semdedup")
    assert(p.contains("Broadcast"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q81: boilerplate flags join on bounded keys — no nested loop") {
    val p = planOf("q81_boilerplate_shingles")
    assert(p.contains("BroadcastHashJoin")) // per-source doc counts
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q82: winnow overlap joins only on the fingerprint key") {
    val p = planOf("q82_winnow_overlap")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q83: cluster histogram is aggregates only — no join") {
    val p = planOf("q83_dup_cluster_histogram")
    assert(!p.contains("Join"))
    assert(p.contains("HashAggregate"))
  }

  test("q84: vocab coverage has no global window; top-k is TakeOrdered") {
    val p = planOf("q84_vocab_coverage")
    assert(!p.contains("Window"))
    assert(p.contains("TakeOrdered"))
  }

  test("q85: hard-negative probes broadcast into the bucket join") {
    val p = planOf("q85_hard_negatives")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q86: packing groupBy reuses the shard window partitioning " +
      "(no exchange between window and aggregate, no global window)") {
    val p = planOf("q86_sequence_packing")
    // the partial aggregate must sit DIRECTLY on the window output —
    // HashPartitioning(shard) satisfies grouping on (shard, seq_id)
    val agg = p.indexOf("partial_count")
    val win = p.indexOf("Window [")
    assert(agg >= 0 && win > agg, s"unexpected plan shape:\n$p")
    assert(!p.substring(agg, win).contains("Exchange"),
      s"exchange between aggregate and window:\n$p")
    assert(!p.contains("SinglePartition")) // never a global window
  }
}

class PipelinePlanSpec extends SparkSpec {
  test("q57: composed cleaning pipeline has no cartesian product") {
    val p = SparkEntry.queries("q57_clean_pipeline")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("HashAggregate"))
    // the degenerate self-join fix: no trivially-true h == h condition
    // means the exact-dedup join must still be a real equi-join
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"))
  }

  test("q28: prefix-filtered jaccard joins are equi-joins with the " +
      "positional filter, never nested-loop") {
    val p = SparkEntry.queries("q28_dedup_jaccard_pairs")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // candidate join keys on the prefix token; PPJoin positional bound
    // survives into the join condition
    assert(p.contains("ph"))
    assert(p.contains("least"))
    // the verify path uses the native merge-walk intersect, not the
    // hash-set-per-row builtin
    assert(p.contains("sortedintersectsizeexpr") ||
      p.toLowerCase.contains("sortedintersectsize"))
  }

  test("q64: incremental jaccard keeps the prefix-filter shape against " +
      "the standing index") {
    val p = SparkEntry.queries("q64_incremental_jaccard")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // the PPJoin positional bound survives into the candidate join
    assert(p.contains("least"))
    // verify is the native merge-walk, same as the batch path
    assert(p.toLowerCase.contains("sortedintersectsize"))
    // prefix extraction ranks tokens with a window, and the candidate
    // join consumes FILTERED prefix rows (rank cut present)
    assert(p.contains("row_number"))
  }

  test("q99: multi-table LSH dedups pairs BEFORE vectors are fetched " +
      "(slim sig join, aggregate, then id join-backs; no cartesian)") {
    val p = SparkEntry.queries("q99_neardup_multitable")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // the (id_a, id_b) dedup aggregate sits between the sig join and
    // the vector fetches: a HashAggregate grouping exactly the pair ids
    assert(p.contains("HashAggregate(keys=[id_a"))
    // the candidate join runs on exploded (table, sig) rows
    assert(p.toLowerCase.contains("generate posexplode"))
  }

  test("q110: PQ codeword argmin is a map-side partial HashAggregate, " +
      "never a row_number sort over the ×ksub codebook expansion") {
    val p = SparkEntry.queries("q110_pq_encode")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the assign path collapses the broadcast-join expansion BEFORE the
    // exchange: min(packed) partial-aggregates per (sub, id) map-side
    assert(p.contains("partial_min"))
    assert(p.contains("BroadcastHashJoin"))
    // seeds rank with a tiny ksub-row window; the corpus-sized assign
    // must not — no Window over the expanded rows means exactly the
    // seed window appears (codebook train) and none in encode
    val windows = "Window ".r.findAllIn(p).size
    assert(windows <= 1, s"expected at most the ksub-row seed window, " +
      s"got $windows Window nodes:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q112: IVFADC prunes cells before the LUT join — broadcast " +
      "routing/LUT, partial-agg ADC sums, windows only probe-bounded") {
    val p = SparkEntry.queries("q112_ivfadc_topk")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // routed cells and the LUT both broadcast into equi-joins
    assert(p.contains("BroadcastHashJoin"))
    // codeword assignment partial-aggregates (the q110 discipline) and
    // the ADC distance sums partial-aggregate over candidate code rows
    assert(p.contains("partial_min"))
    assert(p.contains("partial_sum"))
    // only probe-bounded windows: cell routing (probes × ncells rows)
    // and the final per-probe rank — never a corpus-sized one
    val windows = "Window ".r.findAllIn(p).size
    assert(windows <= 2, s"expected routing + rank windows only, got " +
      s"$windows:\n$p")
  }

  test("q113: standing-PQ serve keeps the q110/q111 discipline — " +
      "broadcast LUT, partial-aggregated assign and ADC sums") {
    val p = SparkEntry.queries("q113_pq_standing_index")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("partial_min"))
    assert(p.contains("partial_sum"))
    // seed window (train, ksub rows) + final per-probe rank only
    val windows = "Window ".r.findAllIn(p).size
    assert(windows <= 2, s"expected seed + rank windows only, got " +
      s"$windows:\n$p")
  }

  test("q114: re-rank fetches raw vectors through BROADCAST joins of " +
      "the probe-bounded shortlist — the corpus is never shuffled for it") {
    val p = SparkEntry.queries("q114_pq_adc_rerank")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"),
      s"shortlist/vector fetch must broadcast, not sort-merge:\n$p")
    assert(p.contains("partial_min"))
    assert(p.contains("partial_sum"))
    // seed window + ADC shortlist rank + exact re-rank — all probe-
    // bounded; never a corpus-sized window
    val windows = "Window ".r.findAllIn(p).size
    assert(windows <= 3, s"expected seed + shortlist + re-rank windows, " +
      s"got $windows:\n$p")
  }

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("q117: BM25 serve broadcasts query terms/df/stats; the score " +
      "aggregate partial-aggregates; only the per-query rank window") {
    val p = planOf("q117_bm25_topk")
    assert(!p.contains("CartesianProduct"))
    // exactly one BroadcastNestedLoopJoin is allowed: the ONE-ROW
    // (n_docs, avgdl) stats frame crossJoin-broadcast into the
    // candidate rows (the Curation one-row-fold pattern)
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, s"only the one-row stats cross join may BNLJ, " +
      s"got $bnlj:\n$p")
    // query-term prune, df, per-query terms, one-row stats: all
    // broadcast equi-joins — the postings are never sort-merge-joined
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"),
      s"BM25 serve must broadcast the query side, not sort-merge:\n$p")
    // quantized contributions partial-aggregate per (q_id, id) map-side
    assert(p.contains("partial_sum"))
    // exactly the final per-query rank window — never a corpus-sized one
    val windows = "Window ".r.findAllIn(p).size
    assert(windows <= 1, s"expected only the rank window, got " +
      s"$windows:\n$p")
  }

  test("q120: SQ8 search broadcasts stats + probes; the coded corpus " +
      "is scanned once, never sort-merge-joined; one rank window") {
    val p = planOf("q120_sq8_topk")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"),
      s"SQ8 serve must broadcast probes, not sort-merge:\n$p")
    // stats (one row) and the probe batch broadcast; BNLJ appears for
    // the one-row stats crossJoin and the theta probe join only
    assert(p.contains("BroadcastNestedLoopJoin"))
    val windows = "Window ".r.findAllIn(p).size
    assert(windows <= 1, s"expected only the rank window, got " +
      s"$windows:\n$p")
  }

  test("q122: IVF x SQ8 prunes cells before any distance work — " +
      "broadcast routing/probes, windows only probe-bounded") {
    val p = planOf("q122_ivf_sq8_topk")
    assert(!p.contains("CartesianProduct"))
    // routing, cell-prune and probe joins broadcast; the one
    // sort-merge join is candidates x coded-corpus on id (both sides
    // corpus-scaled — the q112 candidate-fetch shape)
    val smj = "SortMergeJoin".r.findAllIn(p).size
    assert(smj <= 1, s"only the candidate/code id-join may SMJ:\n$p")
    assert(p.contains("BroadcastHashJoin"))
    // coarse assignment partial-aggregates (the q110 discipline)
    assert(p.contains("partial_min"))
    // routing window (probes x ncells) + final rank only
    val windows = "Window ".r.findAllIn(p).size
    assert(windows <= 2, s"expected routing + rank windows only, got " +
      s"$windows:\n$p")
  }

  test("q128: standing-SQ8 serve keeps the q120 discipline — broadcast " +
      "stats/probes, no sort-merge join, one rank window") {
    val p = planOf("q128_sq8_standing_index")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"),
      s"SQ8 standing serve must broadcast probes:\n$p")
    val windows = "Window ".r.findAllIn(p).size
    assert(windows <= 1, s"expected only the rank window, got " +
      s"$windows:\n$p")
  }

  test("q129: hybrid RRF legs stay top-k-bounded — the fusion join is " +
      "on bounded rank lists, never corpus-sized") {
    val p = planOf("q129_hybrid_rrf")
    assert(!p.contains("CartesianProduct"))
    // each leg caps with WindowGroupLimit before the fusion join
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"both legs must cap top-k before fusing:\n$p")
    assert(p.contains("partial_sum"))
  }

  test("q119: phrase search broadcasts the phrase set into equi-joins; " +
      "the position-adjacency join is an equi-join, never cartesian") {
    val p = planOf("q119_phrase_search")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("BroadcastHashJoin"))
    // bigram mining + phrase counts partial-aggregate
    assert(p.contains("partial_count"))
  }

  test("q134: the KMV sketch build partial-aggregates map-side (bounded " +
      "k-value state before the exchange, never the shingle stream)") {
    val p = planOf("q134_kmv_overlap")
    assert(p.contains("partial_kmv_agg"),
      s"sketch build must be a partial aggregate:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q135: weighted sampling selects via TakeOrdered (per-partition " +
      "top-k + driver merge), never a full sort exchange") {
    val p = planOf("q135_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"),
      s"selection must be TakeOrdered:\n$p")
    // weights join broadcasts the per-source dimension
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q136: PageRank contributions partial-aggregate on dst; the " +
      "final top-20 is TakeOrdered, never a full sort") {
    // the query plan itself is truncated by the per-iteration
    // localCheckpoint, so gate the iteration STEP plan explicitly
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val e = Seq((1L, 2L, 1L), (2L, 1L, 1L)).toDF("src", "dst", "od")
    val ranks = Seq((1L, 1048576L), (2L, 1048576L)).toDF("node", "r")
    val sp = graft.ops.Graph.step(e, ranks)
      .queryExecution.executedPlan.toString
    assert(sp.contains("partial_sum"),
      s"contribution sum must partial-aggregate:\n$sp")
    assert(!sp.contains("CartesianProduct"))
    val p = planOf("q136_pagerank")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q139: triangle closure is conjunctive equi-joins only — the " +
      "degree-ordered orientation never degrades to a nested loop") {
    val p = planOf("q139_triangle_census")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"closure must stay an equi-join:\n$p")
    assert(p.contains("partial_count"))
  }

  test("q137: the Morton coding pass is map-only with literal grid " +
      "bounds (stats collected once, lattice-fit guarded); zone maps " +
      "partial-aggregate per bucket") {
    val p = planOf("q137_zorder_layout")
    // round 9: the 1-row stats frame is collected on the driver and
    // injected as literals (guarding the quantization product against
    // int64 overflow BEFORE any write), so no join of any kind remains
    // in the coding pass
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("partial_min"))
    assert(!p.contains("CartesianProduct"))
  }

  test("tricount refresh serves the fold WITHOUT re-running the " +
      "census: Graph.censusRuns must not move on refresh") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tric").toString
    Seq((1L, 2L), (2L, 3L), (1L, 4L)).toDF("s", "t")
      .write.parquet(s"$dir/wave1")
    Seq((3L, 1L), (3L, 4L)).toDF("s", "t")
      .write.parquet(s"$dir/wave2")
    val engine = new graft.engine.Engine(spark,
      new graft.engine.Catalog(spark))
    val out1 = engine.execute(s"graph tricount create where " +
      s"edges = $dir/wave1 and src = s and dst = t and path = $dir/idx")
    assert(out1.contains("0 triangles over 3 edges"), out1)
    val runsAfterCreate = graft.ops.Graph.censusRuns
    val out2 = engine.execute(s"graph tricount refresh where " +
      s"path = $dir/idx and source = $dir/wave2 and src = s and dst = t")
    // wave2 closes {1,2,3} and {1,3,4}: delta-folded, never recounted
    assert(out2.contains("+2 triangles"), out2)
    assert(out2.contains("total 2"), out2)
    assert(graft.ops.Graph.censusRuns === runsAfterCreate,
      "refresh must fold via triangleDelta only — the full census ran")
    // fold == rebuild: a fresh census over the union agrees
    val union = spark.read.parquet(s"$dir/wave1")
      .unionByName(spark.read.parquet(s"$dir/wave2"))
      .select(
        org.apache.spark.sql.functions.least($"s", $"t").as("a"),
        org.apache.spark.sql.functions.greatest($"s", $"t").as("b"))
      .distinct()
    assert(graft.ops.Graph.triangles(union).count() === 2L)
    val got = engine.execute(s"graph tricount get where path = $dir/idx")
    assert(got.contains("\"n_triangles\":2"), got)
    // the census total commits ATOMICALLY with the edge state: the
    // count rides as a tag inside the live version dir (one commit
    // marker covers both), never as a second artifact whose write
    // could crash apart from the edges
    assert(graft.ops.IndexStore.currentTags(spark, s"$dir/idx")
      .contains("TRICOUNT_2_5"))
    val fs = new org.apache.hadoop.fs.Path(s"$dir/idx-count")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/idx-count")),
      "no separate count artifact may exist (two-write crash window)")
  }
}
