package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** One-shot generator for PLANS.md: formatted Catalyst plans of the
  * headline queries, as reviewable evidence of the scale shapes. */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-plans", defaultCpus = "4")
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val picks = Seq(
      "q04_pricing_summary" -> "partial/final aggregation + pushed filter",
      "q20_join_3way" -> "broadcast dimension joins",
      "q12_period_day" -> "two-phase anchored window (phase 2 shown)",
      "q28_dedup_jaccard_pairs" ->
        "prefix-filtered AllPairs join (df-ordered prefixes + positional filter)",
      "q29_dedup_minhash_lsh" -> "native signature expr + band-bucket join",
      "q47_ann_ivf_topk" -> "IVF assignment + cell-local search",
      "q57_clean_pipeline" -> "composed cleaning pipeline",
      "q66_asof_join" ->
        "as-of join: union + one-shuffle window (no nested loop)",
      "q67_range_join_count" ->
        "banded range join: equi-join on (key, time bin)",
      "q68_decontaminate" -> "broadcast benchmark-side inverted index",
      "q69_repetition_signals" ->
        "map-only per-doc repetition stats (zero shuffles before top-k)",
      "q74_ann_binary_quantized" ->
        "slim hamming pre-rank window + join-back vector fetch",
      "q75_rate_anomaly" ->
        "RANGE-frame trailing-hour window, integer-exact alert rule",
      "q80_semdedup" ->
        "SemDeDup: broadcast centroid assignment + cell-bounded pair join",
      "q84_vocab_coverage" ->
        "TakeOrdered top-k + single-row aggregates (no global window)",
      "q86_sequence_packing" ->
        "sharded running-sum packing (aggregate reuses window partitioning)",
      "q89_containment_pairs" ->
        ("asymmetric containment: contained-side prefix join + " +
          "index-side positional bound"),
      "q64_incremental_jaccard" ->
        ("incremental near-dup: prefix-filtered batch-vs-index join " +
          "(corpus df order from the standing index)"),
      "q94_kmeans_refine" ->
        ("integer-exact Lloyd round: broadcast centroids, " +
          "order-independent integer recenter"),
      "q97_duplicate_spans" ->
        ("exact duplicate spans: native span kernel + (doc, span) " +
          "pre-aggregate, no countDistinct expand"),
      "q98_duplicate_spans_hashfirst" ->
        ("hash-first duplicate spans: native span-hash pass shuffles " +
          "8-byte rows; broadcast hot-hash filter gates the string pass"),
      "q99_neardup_multitable" ->
        ("OR-amplified LSH: slim (id, table, sig) self-join, pair " +
          "dedup BEFORE vectors are fetched (join-backs on id)"),
      "q100_rollup_increments" ->
        ("standing-rollup serving: three delta folds collapse to " +
          "rollup-sized aggregates; serve re-groups WITHOUT touching " +
          "event history"),
      "q101_bloom_gate" ->
        ("Bloom exact-dedup gate: native bitmap aggregate (map-side " +
          "OR partials), broadcast shard probe — batch never shuffles"),
      "q102_rollup_served_dialect" ->
        ("rollup-SERVED dialect increments: the whole plan reads the " +
          "standing rollup's bucket rows — event history absent"),
      "q103_ivf_standing_index" ->
        ("standing IVF: broadcast recorded centroids for probe routing, " +
          "cell-equi-join search — no all-pairs, no corpus shuffle"),
      "q104_dsir_select" ->
        ("DSIR selection: two bucket-histogram aggregates, then a " +
          "shuffle-free scoring pass against ONE broadcast log-ratio " +
          "row; top-k, never a full sort of the pool"),
      "q106_domain_mixture" ->
        ("domain mixture: per-source integer totals (one aggregate); " +
          "rates broadcast back — the sampling filter is map-side"),
      "q107_dsir_standing_index" ->
        ("standing DSIR index: recorded bucket log-ratios broadcast " +
          "against the batch — scoring is map-side, index never " +
          "rebuilt per batch"),
      "q109_lm_quality" ->
        ("bigram-LM quality: corpus bigram hash-aggregates, scoring " +
          "equi-join on the bigram key (NOT broadcast — table grows " +
          "with the corpus), integer-quantized surprisal mean"),
      "q110_pq_encode" ->
        ("PQ encode: broadcast codebooks, map-side packed-min argmin " +
          "— the xksub join expansion collapses BEFORE the exchange"),
      "q111_pq_adc_topk" ->
        ("ADC top-k: broadcast (probe, sub, code) LUT join over codes " +
          "+ partial-aggregated distance sum — floats never rejoin"),
      "q112_ivfadc_topk" ->
        ("IVFADC serving: coarse-cell routing prunes candidates " +
          "BEFORE any code row meets the LUT; shuffle volume is " +
          "candidates, not corpus"),
      "q113_pq_standing_index" ->
        ("standing PQ index: recorded codebooks broadcast against " +
          "batch + probes — train cost absent from the serve plan, " +
          "fold is map-side encode against frozen books"),
      "q114_pq_adc_rerank" ->
        ("ADC shortlist + exact re-rank: raw vectors rejoin ONLY for " +
          "the k'-row shortlist (k'*probes rows), never the corpus"),
      "q115_ivfadc_residual" ->
        ("residual IVFADC (Jégou §V eq. 17): residual encode is one " +
          "broadcast join vs the coarse codebook; per-(probe, cell) " +
          "LUT broadcast; candidates from routed cells only"),
      "q117_bm25_topk" ->
        ("BM25 serve: map-only postings (native one-pass positional " +
          "expr), broadcast query-term prune FIRST — every join and " +
          "the score partial-sum are candidate-sized; one rank window"),
      "q118_postings_standing_index" ->
        ("standing postings index: fold == rebuild (all state " +
          "per-doc); the serve plan is q117's over the folded union — " +
          "df/N/avgdl derived at query time, never stored stale"),
      "q119_phrase_search" ->
        ("phrase search: position-list adjacency — broadcast phrase " +
          "set, the position join shuffles only matched terms' " +
          "occurrence rows, never the corpus"),
      "q120_sq8_topk" ->
        ("SQ8 asymmetric search: one-row stats + probe batch " +
          "broadcast; coded rows reconstruct ONCE then a single " +
          "zip_with fold per pair — brute force at 1/4 the scan bytes"),
      "q122_ivf_sq8_topk" ->
        ("IVF x SQ8: coarse-cell routing prunes candidates, then the " +
          "asymmetric 8-bit distance ranks routed cells only — the " +
          "high-fidelity serving compose (recall ~0.98 within cells)"),
      "q121_cms_heavy_hitters" ->
        ("count-min heavy hitters: occurrence rows explode xdepth " +
          "then collapse map-side to <= depth*width cells — shuffle " +
          "volume independent of corpus size; estimates join the " +
          "broadcast counter cells"),
      "q128_sq8_standing_index" ->
        ("standing SQ8: fold encodes against the RECORDED per-dim " +
          "grid; serve is the broadcast-probe asymmetric scan over " +
          "coded rows"),
      "q129_hybrid_rrf" ->
        ("hybrid RRF: BM25 leg + vector leg each WindowGroupLimit-" +
          "capped top-k, fused on bounded rank lists — never " +
          "corpus-sized"),
      "q127_residual_standing_index" ->
        ("standing residual-IVFADC: fold encodes against FROZEN books " +
          "at both quantizer levels; serve routes cells then " +
          "residual-ADC ranks candidates only"),
      "q124_phrase_snippets" ->
        ("KWIC snippets: match + first-position from the index, raw " +
          "text fetched ONLY for matched docs (match-sized join)"),
      "q123_hll_distinct" ->
        ("HyperLogLog: one hash-aggregate to <= m register cells " +
          "(map-side partials), estimator folds ONE row of exact " +
          "dyadic sums — bounded state at any corpus size"),
      "q130_nb_classifier" ->
        ("Naive Bayes classify: dense vocab x class model joined on " +
          "the token key (ONE corpus shuffle), (id, label) partial " +
          "agg, windowless min(struct) argmax — no per-doc window"),
      "q131_nb_standing_index" ->
        ("standing NB counts: fold == rebuild (integer histograms); " +
          "the classify plan is q130's over the folded artifact"),
      "q132_backoff_lm" ->
        ("stupid-backoff trigram LM: count-pruned trigram join + " +
          "vocab-sized bigram/unigram joins (broadcast-eligible), one " +
          "(id) partial-agg — no windows, no collects"),
      "q133_rp_ann" ->
        ("random-projection ANN: map-only integer projection (hash IS " +
          "the matrix), WindowGroupLimit-capped projected pre-rank, " +
          "exact re-rank fetches only shortlist vectors"),
      "q134_kmv_overlap" ->
        ("KMV cross-source overlap: partial_kmv_agg collapses every " +
          "partition to <= k values before the exchange; pair algebra " +
          "runs on #sources-row sketch frames only"),
      "q135_weighted_sample" ->
        ("E-S weighted sampling: broadcast per-source weights, " +
          "map-only integer race key, TakeOrderedAndProject selection " +
          "— zero corpus-sized shuffles, no full sort"),
      "q136_pagerank" ->
        ("PageRank iteration (step plan): ranks join the degree-" +
          "annotated edges on src, contributions partial-sum on dst; " +
          "final top-20 is TakeOrdered"),
      "q137_zorder_layout" ->
        ("Z-order layout audit: one-row stats broadcast into a " +
          "map-only Morton coding pass; zone maps partial-aggregate " +
          "per (layout, bucket)"),
      "q138_kmv_standing_index" ->
        ("standing KMV: per-key bottom-k union fold (idempotent " +
          "lattice join, fold == rebuild); serve reads the " +
          "#sources-row artifact only"),
      "q139_triangle_census" ->
        ("triangle census: degree-ordered orientation, wedge + " +
          "closure as conjunctive equi-joins only — Σd⁺² bound, " +
          "never a nested loop"),
      "q140_quantile_histogram" ->
        ("log-lattice quantiles: bounded bucket histogram (map-side " +
          "partials to <= #buckets cells/key), per-key running sum " +
          "over bucket rows only"),
      "q141_label_propagation" ->
        ("label propagation round: labels join the df-capped edge " +
          "frame, (node, label) partial-summed votes, windowless " +
          "min(struct) argmax"),
      "q142_personalized_pagerank" ->
        ("personalized PageRank iteration: q136's join/partial-sum " +
          "shape with restart mass only at the broadcast seed set"),
      "q143_components_standing_fold" ->
        ("standing-components fold: star-compressed history + batch " +
          "pairs only — the pair history never re-enters the plan"),
      "q144_kcore" ->
        ("k-core peeling round: one map-side degree partial-" +
          "aggregate + two semi-joins per round, checkpoint each " +
          "round, fixpoint-or-throw — no window, no nested loop"),
      "q145_sorted_neighborhood" ->
        ("sorted-neighborhood blocking: range exchange + per-" +
          "partition ranks + broadcast offsets (no global window); " +
          "window pairing is a block equi-join"),
      "q146_cusum_drift" ->
        ("CUSUM in prefix-min form: two per-type window functions " +
          "instead of a sequential recursion; TakeOrdered top-20"),
      "q147_pmi_pairs" ->
        ("PMI mining: pair/unigram hash-aggregates from per-doc " +
          "arrays (map-only pair materialization, no self-join); " +
          "one-row totals broadcast"),
      "q148_cube_grouping" ->
        ("CUBE: one Expand + partial/final aggregate — the 2^k " +
          "grouping lattice in a single pass"),
      "q149_centroid_drift" ->
        ("centroid drift: one partial (label, half, dim) aggregate, " +
          "lattice floor-div centroids, #labels x dims drift join"),
      "q150_triangle_standing_fold" ->
        ("triangle fold: delta candidates walk each new edge's " +
          "SMALL side (min-degree orientation), closure equi-joins " +
          "the normalized edge set; counts fold by addition"),
      "q151_quantile_standing_index" ->
        ("standing quantile histogram: cell-addition fold, per-key " +
          "running sum over <= #buckets rows, broadcast totals"),
      "q152_markov_accuracy" ->
        ("Markov audit: ONE lead window, train counts partial-" +
          "aggregate, windowless min(struct) argmax, broadcast model " +
          "join"),
      "q153_eps_neighborhood" ->
        ("2-D eps-join: grid-cell equi-join (cell = eps, 3x3 " +
          "candidate explosion, each pair once) — local-density-" +
          "bounded candidates, never N^2"),
      "q154_correlated_subquery" ->
        ("correlated aggregate subquery: Catalyst de-correlates to " +
          "an aggregate + join — no per-row re-execution; the " +
          "above-average test is cross-multiplied integer cents " +
          "(cents * cnt > sum_cents), no division or double"),
      "q155_time_weighted_avg" ->
        ("time-weighted average: ONE lead window for hold " +
          "durations, integer weighted partial-sum per type"),
      "q156_weighted_pagerank" ->
        ("weighted PageRank iteration: q136's shape with " +
          "proportional integer splitting (w div sum-weight)"),
      "q157_recency_decay" ->
        ("recency decay: broadcast max-ts row, map-only bit-shift " +
          "weights, partial-summed per type + struct-max argmax"),
      "q158_markov_standing_fold" ->
        ("standing Markov fold: ONE lead window over the full " +
          "ordered stream, per-(etype, next) integer count partials " +
          "fold by addition, windowless min(struct) argmax serve"),
      "q159_budget_select" ->
        ("token-budget selection WITHOUT a global sort: quality on " +
          "a 1001-level integer lattice, threshold from a bounded " +
          "level histogram (one <=1001-row window), whole levels " +
          "admitted by hash join, only the boundary level pays an " +
          "ordered running sum"),
      "q160_hard_negatives" ->
        ("hard-negative mining: q32's broadcast-probe exact scan " +
          "with a label guard in the join predicate; per-probe " +
          "window rank; composes with IVF candidates at scale"),
      "q161_knn_disagreement" ->
        ("kNN mislabel audit: broadcast probes, per-probe top-5 " +
          "window, integer vote counts, windowless min(struct) " +
          "majority argmax"),
      "q162_session_standing_fold" ->
        ("standing session fold: checkpointed closed-session state, " +
          "open tails as pseudo-events, re-sessionize ONLY tails + " +
          "batch (one per-user window over batch-sized rows) — the " +
          "mapGroupsWithState analog with an EXACT fold"),
      "q163_quality_constraints" ->
        ("constraint suite: every row-local check is a conditional " +
          "count in ONE aggregate pass (one scan for any suite " +
          "size); unique pays one distinct, ref one anti-join — " +
          "receipt is 6 integer rows"),
      "q164_psi_drift" ->
        ("PSI drift: two bounded log-lattice histograms (map-side " +
          "combined to <= #buckets cells/key), full-outer bucket " +
          "join, 2^-14-lattice terms integer-summed — arithmetic " +
          "on bucket rows only"),
      "q165_simhash_hamming" ->
        ("pigeonhole Hamming radius: 4 rows/doc band explode, ONE " +
          "equi-join on (band, bits), exact popcount verify — " +
          "never an all-pairs XOR scan"),
      "q166_matview_fold" ->
        ("standing matview: grouped partials (one pass per input), " +
          "fold re-groups #groups-row state by key — count/sum add, " +
          "min/max lattice-join; serve touches state only"),
      "q167_matview_served" ->
        ("matview-SERVED sql: the whole plan reads the #groups-row " +
          "artifact (lineitem parquet absent — plan-pinned); " +
          "key-only WHERE filters state rows"),
      "q168_column_profile" ->
        ("column profile: every column's null/distinct/len metrics " +
          "ride ONE agg (single scan); exact distincts Expand x6 " +
          "here — the approx HLL mode is the 100 TB path"),
      "q169_funnel_stages" ->
        ("k-step funnel: k-1 per-user min-ts joins, every join and " +
          "aggregate keyed on user_id — one shuffle key reused, " +
          "never a per-user window over the full stream"),
      "q170_session_overlap" ->
        ("interval overlap via hour-bin bucketing: sessions explode " +
          "into spanned bins, candidates equi-join on bin, exact " +
          "overlap verify — never the BroadcastNestedLoopJoin a " +
          "naive inequality join plans"),
      "q171_simhash64_hamming" ->
        ("production Hamming geometry: sig64/16-bit bands, band " +
          "occupancy ~corpus/65536 — same shape as q165 with the " +
          "within-band quadratic term gone (117.6 s -> 11.0 s on " +
          "the 10x probe)"),
      "q172_edit_distance_join" ->
        ("deletion-neighborhood edit join (FastSS): candidates " +
          "equi-join on <=d-deletion variants, so a bucket is an " +
          "ed-2d near-clique and candidate volume tracks TRUE-pair " +
          "volume even on ID-dense corpora where every gram " +
          "saturates — bounded levenshtein verify, never the " +
          "all-pairs scan the oracle runs"),
      "q173_editjoin_prefix" ->
        ("Ed-Join rare-gram prefix geometry: candidates equi-join " +
          "ONLY on each string's q*d+1 rarest gram occurrences " +
          "(shared-prefix grams never reach the join); short " +
          "strings route through the length-banded pool; bounded " +
          "levenshtein verify"),
      "q174_shingle_index_delete" ->
        ("shingle-index tombstones: delete ids anti-join the (id, h) " +
          "rows, then ONE df aggregate + ONE per-doc window re-derive " +
          "rarity/rank/size over survivors — index-rows-only work, " +
          "corpus text never re-read"),
      "q175_sq8_index_delete" ->
        ("SQ8 tombstones: coded rows anti-join away on id, the " +
          "frozen grid row survives (role guard), serve scans only " +
          "surviving codes — delete cost is the anti-join, not a " +
          "rebuild"),
      "q176_postings_index_delete" ->
        ("postings tombstones: per-doc rows anti-join away; df/N/" +
          "avgdl derive from survivors at query time so BM25 stats " +
          "shift without any stored-global maintenance"),
      "q177_matview_delete" ->
        ("matview tombstone fold: delete batch's grouped partials " +
          "NEGATE into the #groups-row state (count/sum subtract, " +
          "zero-count groups retire) — batch-sized work, min/max " +
          "specs refuse loudly (IVM boundary)"),
      "q180_rollup_delete" ->
        ("rollup row-delete via targeted re-aggregation: touched " +
          "buckets semi-join out of the post-delete base (partition-" +
          "prunable time predicate), recompute, splice — untouched " +
          "buckets never move; min/max repaired exactly, which " +
          "subtraction could never do"),
      "q179_simhash_index_fold" ->
        ("standing simhash64 index fold: per-doc (id, sig) rows, no " +
          "derived global state, no recorded geometry — fold is " +
          "anti-join + map-only sig computation of the batch alone; " +
          "16 bytes/doc, the cheapest standing index"),
      "q185_chunk_windows" ->
        ("fixed-token chunk windows with stride (RAG prep): ONE " +
          "map-only whole-stage-codegen pass — split/sequence/slice/" +
          "array_join, no UDF, no shuffle; per-chunk token offsets " +
          "map hits back to source spans; tail = remainder, zero-" +
          "token docs emit nothing"),
      "q184_matview_asof" ->
        ("AS-OF version reads: each retained v=N dir is an immutable " +
          "committed snapshot, so time travel is a plain parquet scan " +
          "of that dir — no log replay, no reconstruction; retention " +
          "deepens history (newest-N prune at write), pruned versions " +
          "refuse loudly instead of silently serving the wrong era"),
      "q183_matview_autofold" ->
        ("ingest auto-fold + transparent serve: the REST-PUT batch " +
          "folds into the matview in the same call (watermark rides " +
          "the SAME IndexStore commit as the fold — PERF lesson 28), " +
          "and the served GROUP BY re-aggregates #groups rows; the " +
          "base parquet is never scanned (plan-asserted), with " +
          "`matview sync` replaying exactly the rows above the " +
          "watermark after a crash or an auto-refresh-off window"),
      "q181_join_matview" ->
        ("standing JOIN matview (Gupta-Mumick delta rules): create " +
          "is one join+group pass; every later fold joins ONLY the " +
          "batch-sized delta (broadcast — no shuffle of the big " +
          "side) against the other side's current snapshot, " +
          "ΔA⋈B_old ∪ (A_old∪ΔA)⋈ΔB for a both-sides commit, then " +
          "folds #groups-row partials — the base join is never " +
          "recomputed"),
      "q182_join_matview_delete" ->
        ("JOIN matview tombstones: (A−D)⋈B partitions A⋈B " +
          "disjointly, so count/sum subtract the partials of " +
          "D ⋈ B_current (broadcast delete batch), zero-count " +
          "groups retire; min/max refuse loudly (IVM boundary), " +
          "non-subset batches abort on the negative-count guard"),
      "q178_matview_served_avg" ->
        ("matview-served avg + HAVING: exact decimal sum / non-null " +
          "count re-fold from #groups rows (bit-equal to the base " +
          "decomposition), HAVING filters group rows post-aggregate " +
          "— the base parquet is never scanned (plan-asserted)"),
      "q186_drop_partition_retention" ->
        ("retention symmetry: drop partition folds the dropped " +
          "buckets' rows OUT of the registered matview (foldDelete " +
          "under an exactly-once drop tag) BEFORE deleting the " +
          "directories; the served GROUP BY afterwards reads only " +
          "#groups rows — base never scanned (plan-asserted), and " +
          "nothing ever serves the forgotten rows"),
      "q187_sql_join" ->
        ("dialect JOIN grammar, live plan: FROM a JOIN b ON a.k=b.k " +
          "compiles to ONE Catalyst inner equi-join (AQE/broadcast " +
          "pick the physical join), WHERE with date-literal folding " +
          "pushes to both scans, GROUP BY runs partial/final over " +
          "the joined frame — the reference cannot parse a JOIN at " +
          "all (is_suport_join() = False)"),
      "q188_join_matview_served" ->
        ("TRANSPARENT join-matview serving: the SAME JOIN command " +
          "answers from the #groups-row artifact — FROM matched " +
          "against the recorded (tables, on-pairs), aggregates " +
          "re-fold the recorded partials (avg = exact decimal sum / " +
          "non-null count, bit-equal to live), and the plan scans " +
          "NEITHER base table (plan-asserted)"),
      "q189_join_matview_sync" ->
        ("join matview sync: per-side lineage watermarks pick each " +
          "side's missed rows (tsd_id > wm — parquet stats prune the " +
          "scan), then the disjoint decomposition ΔL⋈R_old ∪ " +
          "ΔR⋈(L_old∪ΔL) folds the cross delta exactly once; both " +
          "watermarks advance in the SAME IndexStore commit"),
      "q190_tindex_autofold" ->
        ("tindex auto-fold on ingest: the PUT batch folds into the " +
          "standing postings index in the same call (per-doc replace " +
          "— map-only over the batch, no corpus re-read), BM25 " +
          "serves from the artifact with df/N/avgdl derived at query " +
          "time, so fold == rebuild with zero stats drift"),
      "q191_tindex_sync" ->
        ("tindex sync: the wm_<tsd_id> version tag commits atomically " +
          "WITH each fold (no second commit point), so sync is one " +
          "pruned scan of rows above the watermark folded map-only " +
          "into the postings — replaying exactly the auto-refresh-off " +
          "window, idempotent by construction"),
      "q192_dindex_lifecycle" ->
        ("registered dedup (shingle) index lifecycle: the sync fold " +
          "replaces batch ids then re-enriches df / per-doc rank / " +
          "size over the union — one df aggregate + one per-doc " +
          "window over index rows, corpus text read only for the " +
          "batch; the prefix-filter geometry every near-dup gate " +
          "probe depends on is therefore exact after ANY schedule " +
          "of PUTs, syncs, deletes and partition drops"),
      "q194_rollup_sync" ->
        ("rollup sync + transparent serving: the wm_ version tag " +
          "picks the missed rows (one pruned scan), the fold is " +
          "bucket-row-sized, and the served increments() plan reads " +
          "ONLY rollup bucket rows — event history absent " +
          "(plan-asserted); rollups join the watermark family, so a " +
          "batch missed in an off-window is reconcilable instead of " +
          "stale-forever"),
      "q195_nodes_committed" ->
        ("nodes=main: the HA consensus boundary is ONE pushed " +
          "tsd_id <= safe_id predicate at the scan (same machinery " +
          "as committed=true — no post-filter, no extra pass); " +
          "nodes=all reads everything this node holds"),
      "q196_exact_substr_coverage" ->
        ("ExactSubstr coverage: one span groupBy (two-phase agg), " +
          "one join back on span text, then ONE window sorted by " +
          "position WITHIN each doc — merged-interval math rides the " +
          "fixed span width (covered = sum(min(k, next-start)), new " +
          "interval iff gap > k), so per-partition state is one " +
          "doc's duplicated starts, never corpus-sized"),
      "q197_exact_substr_stage" ->
        ("ExactSubstr removal: duplicated starts fan out x k into " +
          "covered indices (bounded explode), LEFT ANTI equi-join on " +
          "(id, position) keeps survivors, reassembly is a per-doc " +
          "array_sort inside the aggregate — all equi-joins, no " +
          "window over the full token stream, no driver loop"),
      "q198_cross_node_ingest" ->
        ("cross-node shared ledger: the SERVED query is one scan + " +
          "two-phase group (nothing cross-node in the plan — fleet " +
          "coordination lives in the metadata ledger's file lock + " +
          "incremental journal replay, per-batch METADATA, never a " +
          "data-plane exchange; the data files land once and every " +
          "node reads the same parquet)"),
      "q199_exact_index_retention" ->
        ("registered exact dedup index: the gate is a broadcast " +
          "Bloom probe (map-side, zero batch shuffle) + one " +
          "left-semi hash join on the 16-byte (id, h) rows for the " +
          "maybe-dups only; create/fold/delete are one projection + " +
          "anti-join each; the sidecar REBUILD is one aggregate over " +
          "corpus-count hash rows — every piece linear, nothing " +
          "pairs"),
      "q200_normalize_nfc" ->
        ("Unicode NFC normalization: ONE map-only projection (native " +
          "NormalizeTextExpr with an isNormalized fast path — " +
          "already-NFC text copies nothing), no shuffle, no agg; the " +
          "canonicalization pass that belongs before every " +
          "content-hash dedup gate"),
      "q202_html_extract" ->
        ("HTML extraction: ONE map-only projection — the native " +
          "single-pass HtmlExtractExpr state machine (script/style/" +
          "comment blocks dropped with content, tags to spaces, core " +
          "entities decoded, whitespace collapsed); no shuffle, no " +
          "agg — the WET-style pull that runs FIRST over a crawl, so " +
          "it must be scan-bound, and is"),
      "q203_redact_pii" ->
        ("PII redaction: three chained codegen'd regexp_replace " +
          "projections (email → IP → phone), map-only, zero " +
          "shuffles; regex texts shared verbatim with the oracle in " +
          "the Java∩RE2 subset"),
      "q205_kafka_chain" ->
        ("native Kafka ingest chain: the SERVED query is one scan + " +
          "two-phase group; the transport is control plane (v0 wire " +
          "fetch loop, one NDJSON landing per message) and the " +
          "mapping/append leg is the streamer's transactional " +
          "foreachBatch — per-batch work tracks message volume, the " +
          "query plan never sees the bus"),
      "q204_ha_sync" ->
        ("HA sync round: the SERVED query is one scan + two-phase " +
          "group (same as q198) — replication is pure control plane: " +
          "the ledger exchange is #batches-row NDJSON metadata, the " +
          "transport moves archived source bytes once per missing " +
          "hash, and duplicate refusal is an O(1) ledger-hash probe; " +
          "no data-plane exchange ever enters the query plan"),
      "q201_scheduled_sync" ->
        ("scheduler-driven rollup sync: the SERVED plan is the " +
          "rollup's #buckets-row artifact scan + final fold (base " +
          "parquet never read, q100's shape); the scheduler itself " +
          "is control plane only — each wake issues one `rollup " +
          "sync`, which folds exactly the rows above the watermark, " +
          "so maintenance cost tracks delta size, not corpus size"),
      "q207_repetition_signals" ->
        ("Gopher repetition signals: per n-gram width, ONE explode of " +
          "the native token-spans kernel then two hash aggregates " +
          "keyed by doc (partial/final combine) — no window, no " +
          "corpus-global state, joins never wider than one doc's " +
          "grams; the left-join back to the doc list is on the doc " +
          "key, so the whole pass is linear and embarrassingly " +
          "parallel at any corpus size"),
      "q208_federated_include" ->
        ("federated include= union: parquet scan UNION JDBCRelation " +
          "scan under ONE two-phase hash aggregate — each side keeps " +
          "its own pushdown (ReadSchema pruning on the parquet scan, " +
          "remote-cursor projection on the JDBC scan), the union adds " +
          "no shuffle of its own, and the auto-derived partition " +
          "triple keeps the foreign side a parallel range-bounded " +
          "scan; at fleet scale this is the reference's " +
          "shard-include shape with heterogeneous shard engines"),
      "q210_modbus_dynamic_join" ->
        ("Modbus dynamic per-point tables recombined: two streamed " +
          "point tables join on the shared poll timestamp (every " +
          "point of one poll carries the poll's first-read stamp) " +
          "through a renaming view; the plan is two parquet scans " +
          "-> one equi-join -> partial/final hash aggregate, and " +
          "the ingest side stays one landing file per point per " +
          "poll — table count scales with the MAP, row volume with " +
          "the poll rate, neither with corpus size"),
      "q209_modbus_chain" ->
        ("Modbus PLC ingest chain: the QUERY plan is the landed " +
          "table's parquet scan -> two-phase hash aggregate (the " +
          "ingest chain — native Modbus TCP poll, batched block " +
          "reads, NDJSON landing, streamer fold — is control/ingest " +
          "plane and leaves no operator in the read path); the wire " +
          "cost per poll is bounded by the read PLAN, not the map " +
          "width: contiguous single-address points merge into block " +
          "reads (ModbusMap.plan), so a 100-point device polls in " +
          "O(blocks) round-trips"),
      "q206_jdbc_scan" ->
        ("foreign-engine scan over the built-in JDBC source: the " +
          "plan is JDBCRelation scan -> two-phase hash aggregate; " +
          "the WHERE filter and the 2-column projection appear as " +
          "PushedFilters/ReadSchema ON THE JDBC SCAN — they execute " +
          "inside the remote engine, so only matching rows of the " +
          "referenced columns ever cross the wire; at scale the " +
          "partition_column/num_partitions quadruple turns the scan " +
          "into N parallel range-bounded remote cursors " +
          "(JdbcSourceSpec asserts 4)"))
    val sb = new StringBuilder
    sb.append("# PLANS — formatted Catalyst plans of headline queries\n\n")
    sb.append("Generated by `graft.Plans` at sf0.001 (plan shape is scale-\n")
    sb.append("independent; AQE may refine exchanges at runtime). What to\n")
    sb.append("look for: `PushedFilters`/`ReadSchema` at every scan,\n")
    sb.append("`partial_*` then final `HashAggregate` pairs, `Broadcast`\n")
    sb.append("joins on dimension/probe sides, no `CartesianProduct`.\n")
    picks.foreach { case (q, why) =>
      val df = SparkEntry.queries(q)(spark, d)
      val plan = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      sb.append(s"\n## $q — $why\n\n```\n$plan```\n")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/PLANS.md"), sb.toString)
    println("written PLANS.md")
    spark.stop()
  }
}
