package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge DataFrames — the link-structure
  * counterpart of the text/vector curation stack (reference-free corpus
  * quality signals: a page's link centrality is a classic crawl-quality
  * prior, and connected components already drive the dedup keep-lists —
  * [[Dedup]]'s pointer-jumping).
  *
  * PageRank (Page, Brin, Motwani & Winograd 1999): the damped power
  * iteration R'(v) = (1-d) + d * Σ_{u→v} R(u)/outdeg(u), here in the
  * non-normalized per-node "random surfer" form. Everything is on a
  * 2^20 integer lattice — ranks start at 2^20, the damping step is
  * `(r * 85 div 100) div outdeg` — so every iteration is exact int64
  * arithmetic: order-independent under any partial aggregation, and a
  * DuckDB oracle unrolling the same iterations reproduces ranks
  * bit-for-bit (floats would drift by reduction order on both sides).
  *
  * Scale shape per iteration: ONE join of ranks against the static
  * (src, dst, outdeg) edge frame on `src`, then ONE hash-aggregate of
  * contributions on `dst` — partial map-side sums collapse each
  * partition to its distinct dst set before the exchange. The edge
  * frame is localCheckpoint'ed once (it is reused every iteration);
  * each iteration's ranks are checkpointed so lineage stays flat (the
  * [[Dedup]] pointer-jumping discipline). On a real layout the edge
  * table is bucketed by `src`, making the per-iteration join
  * shuffle-free on the (much larger) edge side — ranks alone move.
  */
object Graph {
  /** `iters` rounds of integer-lattice PageRank over directed edges
    * `(src, dst)` (distinct; every node reachable as BOTH src and dst —
    * symmetrize one-way graphs first, the standard dangling-node fix).
    * Returns `(node, rank_q)` on the 2^20 lattice. */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 50, "iters must be in [1, 50]")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("od"))
    val e = edges.join(deg, "src").localCheckpoint(true)
    var ranks = e.select(col("src").as("node")).distinct()
      .withColumn("r", lit(1048576L))
    for (_ <- 1 to iters) {
      ranks = step(e, ranks).localCheckpoint(true)
    }
    ranks.select(col("node"), col("r").as("rank_q"))
  }

  /** One power iteration (un-checkpointed — the plan the PlanSpec gate
    * inspects, since localCheckpoint truncates lineage to an RDD scan):
    * join ranks to the degree-annotated edges on src, partial-sum
    * contributions on dst. */
  private[graft] def step(e: DataFrame, ranks: DataFrame): DataFrame =
    e.join(ranks, e("src") === ranks("node"))
      .select(col("dst"), expr("((r * 85) div 100) div od").as("c"))
      .groupBy(col("dst"))
      .agg((lit(157286L) + sum(col("c"))).as("r"))
      .select(col("dst").as("node"), col("r"))

  /** Exact triangle enumeration by degree-ordered orientation (Schank &
    * Wagner 2005; MapReduce analysis: Suri & Vassilvitskii WWW 2011):
    * orient every undirected edge from its (degree, id)-smaller
    * endpoint, generate wedges by self-joining oriented edges on their
    * source, close each wedge against the oriented edge set. Input:
    * undirected edges `(a, b)` with a < b, distinct. Returns one row
    * per triangle `(x, y, z)`, x < y < z.
    *
    * Why orientation is THE scale move: every wedge is generated at
    * its lowest-degree vertex, so wedge count is Σ_v d⁺(v)² with
    * d⁺ ≤ O(√m) — a hub with 10^6 neighbors generates no wedges at
    * all unless both endpoints out-rank it, instead of 10^12 pairs.
    * Two equi-joins, no window, no cartesian; everything exact int64. */
  /** WEIGHTED PageRank: [[pageRank]]'s integer-lattice iteration with
    * edge weights — each node's damped mass splits proportionally to
    * integer edge weight (`(r*85 div 100) * w div sw`, sw = the node's
    * out-weight sum; the nested floor divisions are exact int64 in both
    * engines). Input: directed `(src, dst, w)` with w >= 1, both
    * directions present. Same per-iteration scale shape and checkpoint
    * discipline as [[pageRank]]. */
  def weightedPageRank(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 50, "iters must be in [1, 50]")
    val sw = edges.groupBy("src").agg(sum(col("w")).as("sw"))
    val e = edges.join(sw, "src").localCheckpoint(true)
    var ranks = e.select(col("src").as("node")).distinct()
      .withColumn("r", lit(1048576L))
    for (_ <- 1 to iters) {
      ranks = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst"),
          expr("(((r * 85) div 100) * w) div sw").as("c"))
        .groupBy(col("dst"))
        .agg((lit(157286L) + sum(col("c"))).as("r"))
        .select(col("dst").as("node"), col("r"))
        .localCheckpoint(true)
    }
    ranks.select(col("node"), col("r").as("rank_q"))
  }

  /** Triangles GAINED by adding `newEdges` to `oldEdges` (both
    * undirected `(a, b)` with a < b, distinct, disjoint sets): for each
    * new edge, the common neighbors of its endpoints in the UNION
    * graph close a triangle; a triangle with 2 or 3 new edges is found
    * once per new edge, deduped by its sorted vertex triple. Exactly
    * the set difference triangles(old ∪ new) \ triangles(old) — adding
    * edges never removes a triangle, so the standing census folds by
    * pure addition (q150 proves it against the one-shot oracle).
    *
    * Cost is BATCH-shaped: |newEdges| × degree through two equi-joins
    * against the union adjacency — never a recount of the old graph's
    * Σd⁺² wedges (the q139 full-census cost). */
  def triangleDelta(oldEdges: DataFrame, newEdges: DataFrame): DataFrame = {
    val all = oldEdges.unionByName(newEdges).localCheckpoint(true)
    val adj = all.select(col("a").as("u"), col("b").as("w"))
      .unionByName(all.select(col("b").as("u"), col("a").as("w")))
    val deg = adj.groupBy("u").agg(count(lit(1)).as("d"))
    // enumerate candidates from each new edge's LOWER-degree endpoint
    // (the q139 orientation move, applied to the delta): the expansion
    // is Σ min(deg(a), deg(b)) instead of Σ deg(a) — a hub-incident
    // new edge walks its small side's neighbors, never the hub's
    val oriented = newEdges
      .join(deg.select(col("u").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("u").as("b"), col("d").as("db")), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("a")).otherwise(col("b")).as("lo"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("b")).otherwise(col("a")).as("hi"))
    oriented
      .join(adj.select(col("u").as("lo"), col("w")), Seq("lo"))
      .filter(col("w") =!= col("hi"))
      // close w–hi against the undirected edge SET (normalized key)
      .select(col("lo"), col("hi"), col("w"),
        least(col("w"), col("hi")).as("ca"),
        greatest(col("w"), col("hi")).as("cb"))
      // unhinted + both sides pinned, exactly like the census closure
      // join (see triangles): the pin keeps the edge-set build side at
      // |edges|/N per task so AQE's runtime shuffled-hash rewrite can
      // fire safely at every scale — unpinned, coalescing grew the
      // build partitions past the memory-safe threshold and this join
      // OOM'd the 10x organic probe outright at r15's constant 64m
      .transform(df => Par.pinFine(df, 2, col("ca"), col("cb")))
      .join(Par.pinFine(all.select(col("a").as("ca"), col("b").as("cb")),
          2, col("ca"), col("cb")),
        Seq("ca", "cb"))
      .select(least(col("lo"), col("hi"), col("w")).as("x"),
        (col("lo") + col("hi") + col("w")).as("s"),
        greatest(col("lo"), col("hi"), col("w")).as("z"))
      .select(col("x"), (col("s") - col("x") - col("z")).as("y"),
        col("z"))
      .distinct()
  }

  /** k-core decomposition (Seidman 1983; distributed peeling:
    * Montresor et al. 2013): iteratively delete nodes of degree < k
    * until the remaining subgraph is stable — the unique maximal
    * subgraph where every node keeps >= k neighbors (a density filter:
    * the graph-topology analog of a quality cut — crawl-graph cores
    * mark densely-cited hubs). Input: symmetric directed edge rows
    * `(src, dst)` (both directions present). Returns `(node,
    * core_deg)` — surviving nodes with their within-core degree.
    *
    * The FIXPOINT is unique regardless of deletion order, so an oracle
    * may unroll any round count >= the actual convergence (extra
    * rounds are no-ops). Each round: one degree aggregate (partial,
    * map-side) + two semi-joins of the edge frame against the
    * surviving-node set; lineage checkpointed per round; a
    * non-converged exit THROWS ([[Dedup.connectedComponents]]'
    * discipline), never returns a partial peel. */
  def kcore(edges: DataFrame, k: Int, maxRounds: Int = 10): DataFrame =
    kcoreWithRounds(edges, k, maxRounds)._1

  /** [[kcore]] plus the number of peel rounds taken to the fixpoint —
    * the observable the SCALING rounds-vs-k ladder reads. */
  def kcoreWithRounds(edges: DataFrame, k: Int,
      maxRounds: Int = 10): (DataFrame, Int) = {
    require(k >= 1, "k must be >= 1")
    var e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxRounds) {
      val keep = e.groupBy(col("src").as("n"))
        .agg(count(lit(1)).as("d")).filter(col("d") >= k)
        .select(col("n"))
      val pruned = e.join(keep.withColumnRenamed("n", "src"), Seq("src"),
          "left_semi")
        .join(keep.withColumnRenamed("n", "dst"), Seq("dst"), "left_semi")
        .localCheckpoint(true)
      converged = pruned.count() == e.count()
      e = pruned
      i += 1
    }
    if (!converged) throw new IllegalStateException(
      s"kcore did not converge in $maxRounds rounds — raise maxRounds")
    (e.groupBy(col("src").as("node")).agg(count(lit(1)).as("core_deg")), i)
  }

  /** Personalized PageRank (random walk with restart — Haveliwala WWW
    * 2002): identical integer-lattice iteration to [[pageRank]], except
    * the restart mass returns ONLY to the seed set — initial rank 2^20
    * at seeds / 0 elsewhere, per-round restart term 157286 at seeds /
    * 0 elsewhere. Final ranks measure association with the seed set
    * through the link structure — the "more data like this" curation
    * primitive (seed = a trusted slice, rank = crawl affinity). Same
    * per-iteration scale shape and checkpoint discipline as
    * [[pageRank]]; exact int64 throughout. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 50, "iters must be in [1, 50]")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("od"))
    val e = edges.join(deg, "src").localCheckpoint(true)
    val s = seeds.select(col("node").as("dst"), lit(1L).as("is_seed"))
      .distinct().localCheckpoint(true)
    var ranks = e.select(col("src").as("dst")).distinct()
      .join(s, Seq("dst"), "left")
      .select(col("dst").as("node"),
        (coalesce(col("is_seed"), lit(0L)) * 1048576L).as("r"))
    for (_ <- 1 to iters) {
      ranks = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst"), expr("((r * 85) div 100) div od").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
        .join(s, Seq("dst"), "left")
        .select(col("dst").as("node"),
          (coalesce(col("is_seed"), lit(0L)) * 157286L + col("cs"))
            .as("r"))
        .localCheckpoint(true)
    }
    ranks.select(col("node"), col("r").as("rank_q"))
  }

  /** Semi-supervised label propagation (Zhu & Ghahramani 2002, in the
    * deterministic weighted-majority form): seeds keep their labels
    * forever; each round, every unseeded node adopts the label with
    * the highest incident edge-weight sum among its CURRENTLY-labeled
    * neighbors (ties → smallest label — the q130 windowless
    * `min(struct)` argmax, never a rand() tie-break). Nodes with no
    * labeled neighbor stay unlabeled that round. Input: undirected
    * weighted edges `(a, b, w)` and `seeds (node, label)`; returns
    * `(node, label)` for every node labeled after `rounds` rounds.
    *
    * Scale shape per round: symmetrize (map-only union), ONE join of
    * current labels into the edge frame on the source id, one
    * (node, label) partial-summed vote aggregate, one per-node argmax
    * aggregate — no windows; lineage checkpointed per round. */
  def labelPropagate(und: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 20, "rounds must be in [1, 20]")
    val sym = und.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst"),
        col("w")))
      .localCheckpoint(true)
    var labels = seeds.select(col("node"), col("label"))
    for (_ <- 1 to rounds) {
      val votes = sym.join(labels, labels("node") === sym("src"))
        .groupBy(col("dst"), col("label")).agg(sum(col("w")).as("ws"))
        .groupBy(col("dst"))
        .agg(min(struct((-col("ws")).as("nw"), col("label").as("l")))
          .as("top"))
        .select(col("dst").as("node"), col("top.l").as("label"))
        .join(seeds.select(col("node")), Seq("node"), "left_anti")
      labels = seeds.select(col("node"), col("label"))
        .unionByName(votes).localCheckpoint(true)
    }
    labels
  }

  /** Census invocation counter — observable by the serve-path gate
    * (PlanSpec): a standing-artifact REFRESH must fold through
    * [[triangleDelta]] only, never re-run the full census. */
  @volatile var censusRuns: Long = 0L

  def triangles(und: DataFrame): DataFrame = {
    censusRuns += 1
    val deg = und.select(col("a").as("n")).unionByName(
        und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // orientation AND wedge-endpoint ordering both use the same total
    // (degree, id) rank, so every wedge's closing edge is oriented
    // w1 -> w2 — the closure check is ONE conjunctive equi-join (an OR
    // of directions would defeat the hash join).
    val oriented = und
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("a")).otherwise(col("b")).as("u"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("b")).otherwise(col("a")).as("v"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("db")).otherwise(col("da")).as("dv"))
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.u") === col("e2.u") &&
          struct(col("e1.dv"), col("e1.v")) <
            struct(col("e2.dv"), col("e2.v")))
      .select(col("e1.u").as("w0"), col("e1.v").as("w1"),
        col("e2.v").as("w2"))
    // CLUSTER-MODE option (default OFF): Bloom-gate the wedge stream
    // against the oriented edge set before the closure exchange (guide
    // §3.2). Measured at sf0.1 (optimization r15): closure shuffle
    // 443.8 MB -> 18.9 MB (23x) and closure-join taskTime 141 s ->
    // 44 s — but NET SLOWER wall-clock locally (9.3 -> 11-15 s),
    // because on local NVMe the shuffle is free and the filter costs
    // one extra serialized action (the edge count) plus a scan. On a
    // network-bound cluster the 23x shuffle cut is the dominant term,
    // so the gate ships flagged instead of deleted. False positives
    // only pass extra wedges to the exact closure join — the result
    // is identical either way (spec'd in GraphSpec).
    val bloomGate = und.sparkSession.conf
      .getOption("spark.graft.triangles.bloomWedgeFilter")
      .exists(_.toBoolean)
    val gatedWedges =
      if (!bloomGate) wedges
      else {
        val keyed = oriented.select(
          xxhash64(col("u"), col("v")).as("k"))
        val bf = keyed.stat.bloomFilter("k",
          math.max(keyed.count(), 1L), 0.01)
        val bfB = und.sparkSession.sparkContext.broadcast(bf)
        val mightContain =
          udf((k: Long) => bfB.value.mightContainLong(k))
        wedges.filter(mightContain(xxhash64(col("w1"), col("w2"))))
      }
    // the closure join is UNHINTED but PINNED on both sides (r16): the
    // sort-merge default sorts the Σd⁺² wedge stream (443 MB / 141 s
    // of taskTime at sf0.1) to join an edge-bounded side, and AQE
    // rewrites it to shuffled-hash at runtime WHEN the measured
    // per-partition build fits (maxShuffledHashJoinLocalMapThreshold —
    // session conf, derived from heap/slots in Sessions). A forced
    // SHUFFLE_HASH hint OOM'd the 10x probe (r15), and WITHOUT the pin
    // AQE's byte-sized coalescing merges the edge side toward
    // advisory-sized build partitions — above any memory-safe
    // threshold, so the rewrite stopped firing (r16: q139 4.5 -> 7.2 s
    // at sf0.1 under the derived threshold). The explicit-N
    // repartition on the join key IS the join's own exchange (no extra
    // pass), is AQE-coalesce-exempt by contract, and keeps the build
    // side at |edges|/N per task at EVERY scale — small enough to
    // hash-build safely, which is what makes the rewrite fire. Skew on
    // (w1, w2) is codegree-bounded (≤ d⁺max = O(√m)).
    Par.pinFine(gatedWedges, 2, col("w1"), col("w2")).join(
        Par.pinFine(oriented.select(col("u").as("w1"), col("v").as("w2")),
          2, col("w1"), col("w2")),
        Seq("w1", "w2"))
      .select(least(col("w0"), col("w1"), col("w2")).as("x"),
        expr("w0 + w1 + w2").as("s"),
        greatest(col("w0"), col("w1"), col("w2")).as("z"))
      .select(col("x"), (col("s") - col("x") - col("z")).as("y"), col("z"))
  }
}
