package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Scalar reference model of the same integer-lattice iteration. */
  private def refRanks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val od = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = edges.map(_._1).distinct.map(_ -> 1048576L).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).map { case (dstN, es) =>
        dstN -> es.map { case (srcN, _) =>
          (r(srcN) * 85L / 100L) / od(srcN)
        }.sum
      }
      r = contrib.map { case (n, c) => n -> (157286L + c) }
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int, parts: Int = 1) = {
    val df = edges.toDF("src", "dst")
    Graph.pageRank(if (parts > 1) df.repartition(parts) else df, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("pageRank matches the scalar reference model exactly on a " +
      "star + chain graph, any partitioning") {
    // symmetric star 1-(2,3,4) plus chain 4-5-6
    val one = Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L), (5L, 6L))
    val edges = one ++ one.map { case (a, b) => (b, a) }
    val expected = refRanks(edges, 3)
    assert(run(edges, 3) === expected)
    assert(run(edges, 3, parts = 7) === expected)
  }

  test("pageRank concentrates rank on high-degree nodes") {
    // hub 0 linked to 1..10, plus a detached symmetric pair 100-101
    val one = (1L to 10L).map(i => (0L, i)) ++ Seq((100L, 101L))
    val edges = one ++ one.map { case (a, b) => (b, a) }
    val r = run(edges, 5)
    assert(r(0L) > r(1L) * 3, s"hub ${r(0L)} vs leaf ${r(1L)}")
    assert(r(100L) === r(101L)) // symmetric pair stays symmetric
  }

  test("pageRank is exact-deterministic across reruns (integer lattice)") {
    val one = (1L to 50L).map(i => (i, (i * 7) % 50 + 51))
    val edges = one ++ one.map { case (a, b) => (b, a) }
    assert(run(edges, 3) === run(edges, 3, parts = 11))
  }

  test("weightedPageRank with uniform weights == pageRank; skewed " +
      "weight pulls rank toward the heavy edge's target") {
    val one = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val sym = one ++ one.map { case (a, b) => (b, a) }
    val unif = sym.map { case (a, b) => (a, b, 1L) }.toDF("src", "dst", "w")
    val wpr = Graph.weightedPageRank(unif, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pr = Graph.pageRank(sym.toDF("src", "dst"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wpr === pr)
    // star: hub 0 out-weights 10:1 toward node 1
    val star = Seq((0L, 1L, 10L), (0L, 2L, 1L), (1L, 0L, 1L),
      (2L, 0L, 1L)).toDF("src", "dst", "w")
    val r = Graph.weightedPageRank(star, 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) > r(2L) * 3, r.toString)
  }

  test("pageRank rejects out-of-range iteration counts") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    intercept[IllegalArgumentException](Graph.pageRank(e, 0))
    intercept[IllegalArgumentException](Graph.pageRank(e, 51))
  }

  // --------------------------------------------------------- k-core

  private def core(edges: Seq[(Long, Long)], k: Int,
      maxRounds: Int = 10) = {
    val sym = (edges ++ edges.map { case (a, b) => (b, a) }).distinct
    Graph.kcore(sym.toDF("src", "dst"), k, maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("kcore: K5 survives k=4; an attached chain peels away in a " +
      "cascade; within-core degrees are reported") {
    val k5 = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val chain = Seq((5L, 6L), (6L, 7L), (7L, 8L))
    val r = core(k5 ++ chain, 4)
    assert(r.keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(r.values.forall(_ === 4L)) // chain edges peeled off node 5
  }

  test("kcore: k=1 keeps all non-isolated nodes; k above the max " +
      "degree empties the graph") {
    val edges = Seq((1L, 2L), (2L, 3L))
    assert(core(edges, 1).keySet === Set(1L, 2L, 3L))
    assert(core(edges, 5) === Map.empty)
  }

  test("kcore: a long peel cascade throws past maxRounds instead of " +
      "returning a partial core") {
    val path = (1L to 11L).map(i => (i, i + 1))
    intercept[IllegalStateException](core(path, 2, maxRounds = 3))
    assert(core(path, 2, maxRounds = 10) === Map.empty) // path has no 2-core
  }

  // --------------------------------------------------- personalized PR

  test("personalizedPageRank concentrates mass near the seed; far " +
      "nodes decay; deterministic under repartitioning") {
    // chain 1-2-3-4-5-6 symmetric, seed {1}
    val one = (1L to 5L).map(i => (i, i + 1))
    val edges = (one ++ one.map { case (a, b) => (b, a) })
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    def run(parts: Int) = Graph.personalizedPageRank(
        if (parts > 1) edges.repartition(parts) else edges, seeds, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r = run(1)
    // the seed dominates; the far tail has little mass (note: a path
    // graph oscillates by walk parity, so per-hop monotonicity does
    // NOT hold — only the radius and seed-dominance properties do)
    assert(r(1L) === r.values.max, r.toString)
    assert(r(4L) < r(1L) / 10 && r(5L) < r(1L) / 5, r.toString)
    // a 4-step walk cannot reach distance 5: exactly zero mass
    assert(r(6L) === 0L)
    assert(run(9) === r)
  }

  test("personalizedPageRank with ALL nodes seeded degenerates to " +
      "pageRank (same restart everywhere)") {
    val one = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val edges = (one ++ one.map { case (a, b) => (b, a) })
      .toDF("src", "dst")
    val all = Seq(1L, 2L, 3L).toDF("node")
    val ppr = Graph.personalizedPageRank(edges, all, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pr = Graph.pageRank(edges, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ppr === pr)
  }

  // ------------------------------------------------------- label spread

  private def lp(edges: Seq[(Long, Long, Long)],
      seeds: Seq[(Long, String)], rounds: Int, parts: Int = 1) = {
    val e = edges.toDF("a", "b", "w")
    Graph.labelPropagate(if (parts > 1) e.repartition(parts) else e,
        seeds.toDF("node", "label"), rounds)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("labelPropagate: weighted majority wins, ties break to the " +
      "smallest label, seeds never flip") {
    // 3 --(w2)-- 1[en]   3 --(w1)-- 2[fr]  => 3 takes en
    // 4 --(w1)-- 1[en]   4 --(w1)-- 2[fr]  => tie -> 'en' < 'fr'
    val edges = Seq((1L, 3L, 2L), (2L, 3L, 1L), (1L, 4L, 1L),
      (2L, 4L, 1L), (3L, 2L, 0L))
    val seeds = Seq(1L -> "en", 2L -> "fr")
    val out = lp(edges, seeds, 1)
    assert(out(3L) === "en" && out(4L) === "en")
    assert(out(1L) === "en" && out(2L) === "fr") // seeds fixed
  }

  test("labelPropagate: labels spread transitively across rounds; " +
      "unreachable nodes stay unlabeled; partition-invariant") {
    // chain 1[en] - 2 - 3, island 9-10
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (9L, 10L, 1L))
    val seeds = Seq(1L -> "en")
    val r1 = lp(edges, seeds, 1)
    assert(r1.get(2L) === Some("en") && r1.get(3L) === None)
    val r2 = lp(edges, seeds, 2)
    assert(r2.get(3L) === Some("en"))
    assert(r2.get(9L) === None && r2.get(10L) === None)
    assert(lp(edges, seeds, 2, parts = 7) === r2)
  }

  // ------------------------------------------------------------ triangles

  private def triSet(edges: Seq[(Long, Long)], parts: Int = 1) = {
    val df = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("a", "b")
    Graph.triangles(if (parts > 1) df.repartition(parts) else df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
  }

  test("triangles enumerates K4 (4 triangles) and none in a square") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(triSet(k4) === Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L),
      (2L, 3L, 4L)))
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(triSet(square) === Set.empty)
  }

  test("triangles matches a brute-force reference on a pseudo-random " +
      "graph, any partitioning") {
    // ring + 2-chords (every (i, i+1, i+2) closes) + pseudo-random
    // long chords for degree variety
    val n = 40L
    val edges = (0L until n).flatMap { i =>
      Seq((i, (i + 1) % n), (i, (i + 2) % n),
        (i, (i * 13 + 7) % n))
    }.filter { case (a, b) => a != b }
    val adj = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    val brute = (for {
      x <- nodes; y <- nodes if y > x && adj(x)(y)
      z <- nodes if z > y && adj(x)(z) && adj(y)(z)
    } yield (x, y, z)).toSet
    assert(brute.nonEmpty)
    assert(triSet(edges) === brute)
    assert(triSet(edges, parts = 9) === brute)
  }

  test("triangles counts each triangle exactly once (no orientation " +
      "double-count on equal-degree nodes)") {
    // K3 with all degrees equal — ties broken by id
    assert(triSet(Seq((7L, 8L), (8L, 9L), (7L, 9L)))
      === Set((7L, 8L, 9L)))
  }

  test("the bloom wedge gate (cluster-mode flag) changes nothing in " +
      "the census — false positives only feed the exact closure join") {
    val n = 40L
    val edges = (0L until n).flatMap { i =>
      Seq((i, (i + 1) % n), (i, (i + 2) % n), (i, (i * 13 + 7) % n))
    }.filter { case (a, b) => a != b }
    val off = triSet(edges)
    spark.conf.set("spark.graft.triangles.bloomWedgeFilter", "true")
    try assert(triSet(edges, parts = 5) === off)
    finally spark.conf.unset("spark.graft.triangles.bloomWedgeFilter")
    assert(off.nonEmpty)
  }

  test("triangleDelta == triangles(union) minus triangles(old), " +
      "including triangles with 2 and 3 new edges (deduped)") {
    val old = Seq((1L, 2L), (2L, 3L), (4L, 5L))
    // new edges close: (1,2,3) via one new edge (1,3);
    // (4,5,6) via TWO new edges (4,6),(5,6);
    // (7,8,9) entirely new (THREE new edges)
    val nw = Seq((1L, 3L), (4L, 6L), (5L, 6L),
      (7L, 8L), (8L, 9L), (7L, 9L))
    val delta = Graph.triangleDelta(old.toDF("a", "b"),
        nw.toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(delta === Set((1L, 2L, 3L), (4L, 5L, 6L), (7L, 8L, 9L)))
    val unionTris = triSet(old ++ nw)
    val oldTris = triSet(old)
    assert(delta === unionTris -- oldTris)
  }
}
