package graft

import org.apache.spark.sql.functions._

import graft.ops.Sketches

class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def occurrences(pairs: (String, Int)*) =
    pairs.flatMap { case (t, n) => Seq.fill(n)(t) }.toDF("term")

  test("cmsEstimate never underestimates, and is exact absent collisions") {
    val items = occurrences("a" -> 100, "b" -> 40, "c" -> 7, "d" -> 1)
    val counters = Sketches.cmsCounters(items, "term", 4, 512)
    val truth = Map("a" -> 100L, "b" -> 40L, "c" -> 7L, "d" -> 1L)
    val est = Sketches.cmsEstimate(counters,
        truth.keys.toSeq.toDF("term"), "term", 4, 512)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (t, c) =>
      assert(est(t) >= c, s"$t underestimated: ${est(t)} < $c")
    }
    // 4 distinct terms in 4x512 cells: min over 4 rows dodges any
    // single-row collision — estimates are exact here
    assert(est === truth)
  }

  test("cmsMerge == sketching the union (cell-wise addition)") {
    val a = occurrences("x" -> 10, "y" -> 3)
    val b = occurrences("x" -> 5, "z" -> 8)
    val merged = Sketches.cmsMerge(
      Sketches.cmsCounters(a, "term", 4, 64),
      Sketches.cmsCounters(b, "term", 4, 64))
    val whole = Sketches.cmsCounters(a.unionByName(b), "term", 4, 64)
    assert(merged.exceptAll(whole).count() === 0)
    assert(whole.exceptAll(merged).count() === 0)
    val est = Sketches.cmsEstimate(merged, Seq("x").toDF("term"),
      "term", 4, 64).head().getLong(1)
    assert(est >= 15L)
  }

  test("a term absent from the stream estimates 0 on empty cells") {
    val counters = Sketches.cmsCounters(occurrences("only" -> 5),
      "term", 4, 512)
    // "only" occupies <= 4 of 2048 cells; a probe term missing every
    // one of them reads empty cells -> 0 (the left-join coalesce path)
    val est = Sketches.cmsEstimate(counters,
        Seq("unseen_term_zq").toDF("term"), "term", 4, 512)
      .head().getLong(1)
    assert(est === 0L)
  }

  test("hllEstimate lands within the theoretical error band on a " +
      "large distinct stream, registers bounded by m") {
    val items = (1 to 5000).map(i => s"value_$i").toDF("term")
    val regs = Sketches.hllRegisters(items, "term", m = 64)
    assert(regs.count() <= 64)
    val est = Sketches.hllEstimate(regs, m = 64).head().getLong(0)
    // 1.04/sqrt(64) = 13% standard error; allow 4 sigma
    assert(est > 5000 * 0.48 && est < 5000 * 1.52,
      s"HLL estimate $est implausible for 5000 distinct")
  }

  test("hllMerge == registers of the union; duplicates never move the " +
      "estimate (set semantics)") {
    val a = (1 to 800).map(i => s"v$i").toDF("term")
    val b = (400 to 1200).map(i => s"v$i").toDF("term")
    val merged = Sketches.hllMerge(
      Sketches.hllRegisters(a, "term", 64),
      Sketches.hllRegisters(b, "term", 64))
    val whole = Sketches.hllRegisters(a.unionByName(b), "term", 64)
    assert(merged.exceptAll(whole).count() === 0)
    assert(whole.exceptAll(merged).count() === 0)
    // feeding each element 5x leaves registers (max) unchanged
    val dup5 = Sketches.hllRegisters(
      a.unionByName(a).unionByName(a).unionByName(a).unionByName(a),
      "term", 64)
    val once = Sketches.hllRegisters(a, "term", 64)
    assert(dup5.exceptAll(once).count() === 0)
    assert(once.exceptAll(dup5).count() === 0)
  }

  test("hllEstimate is partitioning-invariant (exact dyadic sums)") {
    val items = (1 to 3000).map(i => s"w$i").toDF("term")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllEstimate(Sketches.hllRegisters(df, "term", 128), 128)
        .collect().toSeq
    assert(run(items) === run(items.repartition(11)))
  }

  test("counter state is bounded by depth*width regardless of stream size") {
    val items = occurrences((1 to 300).map(i => s"t$i" -> 3): _*)
    val counters = Sketches.cmsCounters(items, "term", 4, 32)
    assert(counters.count() <= 4L * 32)
    // total mass per row == stream length (900 occurrences)
    val rowMass = counters.groupBy("r").agg(sum("c").as("m"))
      .collect().map(_.getLong(1)).toSeq
    assert(rowMass === Seq.fill(4)(900L))
  }

  // ---------------------------------------------------------------- KMV

  import graft.functions.F
  import graft.ops.TextOps

  private def hashed(terms: Seq[String]) =
    terms.toDF("term").select(
      Sketches.avalanche31(TextOps.polyHash(col("term"))).as("h"))

  private def sketch(terms: Seq[String], k: Int): Seq[Long] =
    hashed(terms).agg(F.kmvAgg(col("h"), k)).head()
      .getSeq[Long](0)

  test("KmvAgg keeps exactly the k smallest DISTINCT hashes, ascending, " +
      "independent of partitioning and duplication") {
    val terms = (1 to 500).map(i => s"item_$i")
    val withDups = terms ++ terms.take(200) ++ terms.take(50)
    val exact = hashed(terms).distinct().collect().map(_.getLong(0))
      .sorted.take(16).toSeq
    assert(sketch(withDups, 16) === exact)
    val repart = hashed(withDups).repartition(13)
      .agg(F.kmvAgg(col("h"), 16)).head().getSeq[Long](0)
    assert(repart === exact)
  }

  test("a sketch smaller than k IS the distinct set; estimate exact") {
    val terms = Seq("a", "b", "c", "a", "b")
    val sk = sketch(terms, 64)
    assert(sk.length === 3 && sk === sk.sorted)
    val est = hashed(terms).agg(F.kmvAgg(col("h"), 64).as("sk"))
      .select(Sketches.kmvDistinctEst(col("sk"), 64)).head().getLong(0)
    assert(est === 3L)
  }

  test("kmvUnionK(sk(A), sk(B)) == bottom-k of A ∪ B (sketch algebra)") {
    val a = (1 to 400).map(i => s"left_$i")
    val b = (200 to 600).map(i => s"left_$i") // overlap 200..400
    val k = 32
    val skA = sketch(a, k)
    val skB = sketch(b, k)
    val direct = sketch((a ++ b).distinct, k)
    val composed = Seq((skA, skB)).toDF("ska", "skb")
      .select(Sketches.kmvUnionK(col("ska"), col("skb"), k))
      .head().getSeq[Long](0)
    assert(composed === direct)
  }

  test("kmvDistinctEst within the theoretical band on a large set") {
    val n = 5000
    val k = 256
    val est = hashed((1 to n).map(i => s"val_$i"))
      .agg(F.kmvAgg(col("h"), k).as("sk"))
      .select(Sketches.kmvDistinctEst(col("sk"), k)).head().getLong(0)
    // relative standard error ~ 1/sqrt(k-2) = 6.3%; allow 4 sigma
    assert(est > n * 0.75 && est < n * 1.25, s"est $est vs exact $n")
  }

  // ------------------------------------------- log-lattice quantiles

  test("logBucket is monotone and its lower bound brackets every value " +
      "within 12.5% (HDR property), 0..200000") {
    val rows = spark.range(0, 200000).toDF("n")
      .select(col("n"), expr(Sketches.logBucketSpark("n")).as("b"))
      .select(col("n"), col("b"), expr(Sketches.bucketLbSpark("b"))
        .as("lb"))
    // lb <= n everywhere, and n - lb < max(1, lb/8)
    assert(rows.filter(col("lb") > col("n")).count() === 0)
    assert(rows.filter(col("n") - col("lb") >=
      greatest(lit(1L), expr("lb div 8") + 1)).count() === 0)
    // monotone: bucket of n never decreases as n grows
    import org.apache.spark.sql.expressions.Window
    val lagged = rows.withColumn("pb",
      lag(col("b"), 1).over(Window.orderBy(col("n"))))
    assert(lagged.filter(col("pb") > col("b")).count() === 0)
  }

  test("quantileHistogram merges by addition (sketch of union == " +
      "merged parts) with bounded cells") {
    import spark.implicits._
    val a = (1 to 400).map(i => ("s", (i % 977).toLong)).toDF("k", "n")
    val b = (1 to 300).map(i => ("s", (i % 131).toLong)).toDF("k", "n")
    val whole = Sketches.quantileHistogram(a.unionByName(b), "k", "n")
    val merged = Sketches.quantileHistogram(a, "k", "n")
      .unionByName(Sketches.quantileHistogram(b, "k", "n"))
      .groupBy("key", "b").agg(sum("c").as("c"))
    assert(merged.exceptAll(whole).count() === 0)
    assert(whole.exceptAll(merged).count() === 0)
    assert(whole.count() <= 8L * 64)
  }

  test("quantileEst lower-bounds the exact nearest-rank value within " +
      "one bucket width") {
    import spark.implicits._
    val vals = (1 to 5000).map(i => ("s", (i.toLong * i) % 9973))
      .toDF("k", "n")
    val est = Sketches.quantileEst(
        Sketches.quantileHistogram(vals, "k", "n"), Seq(50, 90, 99))
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    val exact = Sketches.quantileEst(
        vals.groupBy(col("k").as("key"), col("n").as("b"))
          .agg(count(lit(1)).as("c")),
        Seq(50, 90, 99), bExpr => bExpr)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    Seq(50, 90, 99).foreach { p =>
      assert(est(p) <= exact(p), s"p$p: est ${est(p)} > exact ${exact(p)}")
      assert(exact(p) - est(p) <= math.max(1L, est(p) / 8 + 1),
        s"p$p: est ${est(p)} too far below exact ${exact(p)}")
    }
  }

  test("kmvJaccardPpm approximates the true Jaccard of the term sets") {
    val a = (1 to 3000).map(i => s"doc_$i")
    val b = (2001 to 5000).map(i => s"doc_$i") // |A∩B|=1000, |A∪B|=5000
    val k = 128
    val row = Seq((sketch(a, k), sketch(b, k))).toDF("ska", "skb")
      .select(Sketches.kmvJaccardPpm(col("ska"), col("skb"), k))
      .head().getLong(0)
    // true J = 0.2; sigma = sqrt(J(1-J)/k) = 3.5% absolute; 4 sigma
    assert(row > 60000L && row < 340000L, s"jaccard ppm $row vs 200000")
  }
}

class PsiSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Sketches

  test("psi: identical histograms score ~0, shifted distributions " +
      "flag drift, and keys missing a side still score") {
    val h = Seq(("a", 3L, 100L), ("a", 10L, 50L), ("a", 20L, 25L))
      .toDF("key", "b", "c")
    val same = Sketches.psi(h, h).collect().head
    assert(same.getAs[Long]("psi_q") <= 1L) // smoothing-only residue
    assert(!same.getAs[Boolean]("drift"))
    // mass moves wholesale from bucket 3 to bucket 40 -> strong drift
    val moved = Seq(("a", 40L, 100L), ("a", 10L, 50L), ("a", 20L, 25L))
      .toDF("key", "b", "c")
    val far = Sketches.psi(h, moved).collect().head
    assert(far.getAs[Boolean]("drift"))
    assert(far.getAs[Long]("n_buckets") === 4L) // union of buckets
    // a key absent from the baseline: its smoothed baseline is uniform
    // over the union buckets, so a skewed batch shape drifts (a
    // SINGLE-bucket new key scores 0 by design — one bucket has no
    // shape to drift)
    val h2 = Seq(("zz", 5L, 10L), ("zz", 30L, 90L)).toDF("key", "b", "c")
    val onBoth = Sketches.psi(h, h.unionByName(h2))
      .collect().map(r => r.getString(0) -> r.getAs[Boolean]("drift"))
      .toMap
    assert(onBoth("zz"))
  }

  test("monitor psi command: frozen baseline, batch check flags the " +
      "drifted key only") {
    val dir = java.nio.file.Files.createTempDirectory("psim")
    val base = ((1 to 200).map(i => ("steady", (i % 50) + 10)) ++
      (1 to 200).map(i => ("drifter", (i % 50) + 10)))
      .toDF("k", "v")
    base.write.parquet(dir.resolve("base.parquet").toString)
    // batch: steady unchanged, drifter's values jump 100x
    val batch = ((1 to 200).map(i => ("steady", (i % 50) + 10)) ++
      (1 to 200).map(i => ("drifter", ((i % 50) + 10) * 100)))
      .toDF("k", "v")
    batch.write.parquet(dir.resolve("batch.parquet").toString)
    val cat = new graft.engine.Catalog(spark)
    cat.registerTable("base", dir.resolve("base.parquet").toString)
    val engine = new graft.engine.Engine(spark, cat)
    val p = dir.resolve("psibase").toString
    engine.execute(s"monitor psi create where table = base and " +
      s"key = k and value = v and path = $p")
    val reply = engine.execute(s"monitor psi check where path = $p " +
      s"and source = ${dir.resolve("batch.parquet")} and key = k " +
      "and value = v")
    assert(reply.contains(""""key":"drifter""""), reply)
    val drifter = reply.split("\\{").find(_.contains("drifter")).get
    val steady = reply.split("\\{").find(_.contains("steady")).get
    assert(drifter.contains(""""drift":true"""), drifter)
    assert(steady.contains(""""drift":false"""), steady)
  }
}
