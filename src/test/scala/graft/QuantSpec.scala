package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Product-quantization family: exactness on a duplicated corpus,
  * reproducibility under repartitioning (the property the integer
  * lattice buys), and recall against exact quantized-L2 truth. */
class ProductQuantSpec extends SparkSpec {
  import spark.implicits._

  /** 8 well-separated deterministic 64-dim base vectors; ids 8..63 are
    * exact copies of base id%8 — so with ksub=8 the trained codewords
    * coincide with the bases and PQ becomes EXACT. */
  private lazy val dupCorpus = {
    def base(b: Int): Array[Float] =
      Array.tabulate(64)(j => (((b * 64 + j) * 2654435761L % 97) / 97.0f
        + (if (j % 8 == b) 3f else 0f)))
    spark.createDataFrame(
      (0 until 64).map(i => (i.toLong, base(i % 8).toSeq)))
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
  }

  test("PQ is exact when codewords coincide with the corpus vectors") {
    val books = Similarity.pqCodebooks(dupCorpus, "embedding", "vec_id",
      numSub = 4, ksub = 8, iters = 1)
    // recenter over exact copies keeps every codeword on its base
    val codes = Similarity.pqEncode(dupCorpus, books, "embedding", "vec_id",
      numSub = 4)
    val byId = codes.collect()
      .groupBy(_.getAs[Long]("id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("sub"))
        .map(_.getAs[Int]("code")).toSeq).toMap
    assert(byId.size === 64)
    for (i <- 8 until 64)
      assert(byId(i.toLong) === byId((i % 8).toLong),
        s"copy $i must encode like base ${i % 8}")
    // ADC distance to an exact duplicate is 0, and it ranks first
    val probes = dupCorpus.filter($"vec_id" >= 8 && $"vec_id" < 16)
    val top1 = Similarity.pqAdcTopK(codes, books, probes,
        "embedding", "vec_id", k = 1, numSub = 4)
      .filter($"rank" === 1).collect()
    assert(top1.length === 8)
    top1.foreach(r => assert(r.getAs[Long]("adc_d2") === 0L))
  }

  test("codebooks, codes and ADC ranks are invariant under repartitioning") {
    val embs = graft.engine.Tables.load(spark, sfDir, "embeddings")
    def run(df: org.apache.spark.sql.DataFrame) = {
      val books = Similarity.pqCodebooks(df, "embedding", "vec_id",
        numSub = 4, ksub = 8, iters = 1)
      val codes = Similarity.pqEncode(df, books, "embedding", "vec_id", numSub = 4)
      val top = Similarity.pqAdcTopK(codes, books,
        df.filter($"vec_id" < 5), "embedding", "vec_id", k = 3, numSub = 4)
      (books.collect().map(_.toString).sorted.toSeq,
        codes.collect().map(_.toString).sorted.toSeq,
        top.collect().map(_.toString).sorted.toSeq)
    }
    val a = run(embs)
    val b = run(embs.repartition(7, $"vec_id"))
    assert(a._1 === b._1)
    assert(a._2 === b._2)
    assert(a._3 === b._3)
  }

  test("every vector gets one dense code per subspace") {
    val embs = graft.engine.Tables.load(spark, sfDir, "embeddings")
    val books = Similarity.pqCodebooks(embs, "embedding", "vec_id",
      numSub = 4, ksub = 8, iters = 1)
    val codes = Similarity.pqEncode(embs, books, "embedding", "vec_id",
      numSub = 4)
    val n = embs.count()
    assert(codes.count() === n * 4)
    assert(codes.groupBy("id").count()
      .filter($"count" =!= 4).count() === 0)
    assert(codes.filter($"code" < 0 || $"code" >= 8).count() === 0)
  }

  test("ADC recall against exact quantized-L2 truth is substantial") {
    val embs = graft.engine.Tables.load(spark, sfDir, "embeddings")
    val probes = embs.filter($"vec_id" < 20)
    val books = Similarity.pqCodebooks(embs, "embedding", "vec_id",
      numSub = 8, ksub = 32, iters = 2)
    val codes = Similarity.pqEncode(embs, books, "embedding", "vec_id",
      numSub = 8)
    val adc = Similarity.pqAdcTopK(codes, books, probes,
        "embedding", "vec_id", k = 5, numSub = 8)
      .select($"q_id", $"id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact truth on the SAME integer lattice (floor(x*1000) longs)
    val q = embs.select($"vec_id".as("id"),
      expr("transform(embedding, x -> cast(floor(x * 1000) as bigint))")
        .as("vq"))
    val d2 = "aggregate(zip_with(a.vq, b.vq, (x, y) -> (x - y) * (x - y)), " +
      "cast(0 as bigint), (acc, v) -> acc + v)"
    val truth = q.as("a").filter($"a.id" < 20)
      .crossJoin(q.as("b")).filter($"a.id" =!= $"b.id")
      .select($"a.id".as("q_id"), $"b.id".as("id"), expr(d2).as("d2"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"q_id")
          .orderBy($"d2", $"id")))
      .filter($"rank" <= 5)
      .select($"q_id", $"id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = adc.intersect(truth).size.toDouble / truth.size
    // deterministic corpus -> deterministic recall; bound set with
    // headroom below the measured value. NOTE the testdata embeddings
    // are near-uniform random — PQ's worst case (no cluster structure
    // for codewords to exploit), so absolute recall here is far below
    // what real embedding corpora give; the assertion is that ADC
    // ranking carries strong signal, several times the random baseline
    // (k/(N-1) ~ 0.01 at N=500).
    assert(recall >= 0.3, s"ADC recall@5 = $recall")
  }

  test("IVFADC with nprobe=ncells equals full ADC; nprobe=1 stays in " +
      "the probe's own cell") {
    val embs = graft.engine.Tables.load(spark, sfDir, "embeddings")
    val probes = embs.filter($"vec_id" < 10)
    val coarse = Similarity.pqCodebooks(embs, "embedding", "vec_id",
      numSub = 1, ksub = 8, iters = 1)
    val cells = Similarity.pqEncode(embs, coarse, "embedding", "vec_id",
      numSub = 1)
    val books = Similarity.pqCodebooks(embs, "embedding", "vec_id",
      numSub = 4, ksub = 8, iters = 1)
    val codes = Similarity.pqEncode(embs, books, "embedding", "vec_id",
      numSub = 4)
    // routing to EVERY cell removes the pruning: must equal full ADC
    val full = Similarity.pqAdcTopK(codes, books, probes,
        "embedding", "vec_id", k = 3, numSub = 4)
      .collect().map(_.toString).sorted.toSeq
    val all = Similarity.ivfAdcTopK(cells, codes, coarse, books, probes,
        "embedding", "vec_id", k = 3, nprobe = 8, numSub = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(all === full)
    // nprobe=1: a probe drawn from the corpus routes to its own cell,
    // so every neighbor it returns must share that cell
    val cellOf = cells.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Int]("code")).toMap
    val one = Similarity.ivfAdcTopK(cells, codes, coarse, books, probes,
        "embedding", "vec_id", k = 3, nprobe = 1, numSub = 4)
      .collect()
    assert(one.nonEmpty)
    one.foreach { r =>
      assert(cellOf(r.getAs[Long]("id")) === cellOf(r.getAs[Long]("q_id")),
        s"nprobe=1 neighbor left the probe's cell: $r")
    }
  }

  test("standing PQ index: fold equals full encode against the recorded " +
      "books, replay is a no-op, serve equals ADC over the same artifact") {
    val init = dupCorpus.filter($"vec_id" < 32)
    val rest = dupCorpus.filter($"vec_id" >= 32)
    val idx = Similarity.refreshPqIndex(
      Similarity.pqIndex(init, "embedding", "vec_id",
        numSub = 4, ksub = 8, iters = 1),
      rest, "embedding", "vec_id", numSub = 4)
    val books = Similarity.pqCodebooks(init, "embedding", "vec_id",
      numSub = 4, ksub = 8, iters = 1)
    // the recorded books ARE the initial training's books
    assert(Similarity.pqIndexBooks(idx).collect()
        .map(_.toString).sorted.toSeq
      === books.collect().map(_.toString).sorted.toSeq)
    // fold == encoding the whole corpus with the initial books
    val full = Similarity.pqEncode(dupCorpus, books, "embedding",
      "vec_id", numSub = 4)
    assert(idx.filter($"role" === "code").select($"id", $"sub", $"code")
        .collect().map(_.toString).sorted.toSeq
      === full.select($"id", $"sub", $"code")
        .collect().map(_.toString).sorted.toSeq)
    // replaying the same batch folds nothing (ids anti-joined first)
    assert(Similarity.refreshPqIndex(idx, rest, "embedding", "vec_id",
      numSub = 4).count() === idx.count())
    // serving from the index == ADC over the recorded codes + books
    val probes = dupCorpus.filter($"vec_id" < 4)
    assert(Similarity.pqSearchIndex(idx, probes, "embedding", "vec_id",
        k = 3, numSub = 4).collect().map(_.toString).sorted.toSeq
      === Similarity.pqAdcTopK(full, books, probes, "embedding",
        "vec_id", k = 3, numSub = 4).collect()
        .map(_.toString).sorted.toSeq)
  }

  test("ADC re-rank: exact duplicates take rank 1 with d2 = 0, and d2 " +
      "is the exact lattice distance of the returned pair") {
    val books = Similarity.pqCodebooks(dupCorpus, "embedding", "vec_id",
      numSub = 4, ksub = 8, iters = 1)
    val codes = Similarity.pqEncode(dupCorpus, books, "embedding",
      "vec_id", numSub = 4)
    val probes = dupCorpus.filter($"vec_id" >= 8 && $"vec_id" < 12)
    val rr = Similarity.pqAdcRerank(codes, books, dupCorpus, probes,
      "embedding", "vec_id", k = 2, shortlist = 6, numSub = 4)
    val rows = rr.collect()
    assert(rows.count(_.getAs[Int]("rank") == 1) === 4)
    // every probe has 7+ exact copies in the corpus -> rank 1 is d2=0
    rows.filter(_.getAs[Int]("rank") == 1)
      .foreach(r => assert(r.getAs[Long]("d2") === 0L))
    // returned d2 == independently computed exact lattice distance
    val q = dupCorpus.select($"vec_id".as("xid"),
      expr("transform(embedding, x -> cast(floor(x * 1000) as bigint))")
        .as("vq"))
    val checked = rr
      .join(q.withColumnRenamed("xid", "q_id")
        .withColumnRenamed("vq", "qv"), "q_id")
      .join(q.withColumnRenamed("xid", "id"), "id")
      .withColumn("d2x",
        expr("aggregate(zip_with(qv, vq, (x, y) -> (x - y) * (x - y)), " +
          "cast(0 as bigint), (acc, v) -> acc + v)"))
      .collect()
    assert(checked.nonEmpty)
    checked.foreach(r =>
      assert(r.getAs[Long]("d2") === r.getAs[Long]("d2x")))
  }

  test("re-rank with shortlist = corpus recovers the exact top-k " +
      "(ADC only shortlists; the exact distance decides)") {
    val embs = graft.engine.Tables.load(spark, sfDir, "embeddings")
      .limit(120).localCheckpoint()
    val probes = embs.filter($"vec_id" < 5)
    val books = Similarity.pqCodebooks(embs, "embedding", "vec_id",
      numSub = 4, ksub = 8, iters = 1)
    val codes = Similarity.pqEncode(embs, books, "embedding", "vec_id",
      numSub = 4)
    val n = embs.count().toInt
    val rr = Similarity.pqAdcRerank(codes, books, embs, probes,
        "embedding", "vec_id", k = 3, shortlist = n, numSub = 4)
      .select($"q_id", $"rank", $"id", $"d2")
      .collect().map(_.toString).sorted.toSeq
    // exact truth on the same lattice
    val q = embs.select($"vec_id".as("id"),
      expr("transform(embedding, x -> cast(floor(x * 1000) as bigint))")
        .as("vq"))
    val d2 = "aggregate(zip_with(a.vq, b.vq, (x, y) -> (x - y) * (x - y)), " +
      "cast(0 as bigint), (acc, v) -> acc + v)"
    val truth = q.as("a").filter($"a.id" < 5)
      .crossJoin(q.as("b")).filter($"a.id" =!= $"b.id")
      .select($"a.id".as("q_id"), $"b.id".as("id"), expr(d2).as("d2"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"q_id")
          .orderBy($"d2", $"id")))
      .filter($"rank" <= 3)
      .select($"q_id", $"rank", $"id", $"d2")
      .collect().map(_.toString).sorted.toSeq
    assert(rr === truth)
  }

  test("residual IVFADC recovers EXACT distances when the fine books " +
      "quantize residuals perfectly (µ_c cancels: ‖(p−µ)−(x−µ)‖ = ‖p−x‖)") {
    // coarse ksub=4 packs 2 bases per cell -> residuals are NONZERO but
    // take exactly 8 distinct values (one per base); fine ksub=8 seeded
    // from ids 0..7 covers all of them, so residual quantization is
    // exact and ADC == exact lattice L2 for EVERY candidate
    val coarse = Similarity.pqCodebooks(dupCorpus, "embedding", "vec_id",
      numSub = 1, ksub = 4, iters = 1)
    val cells = Similarity.pqEncode(dupCorpus, coarse, "embedding",
      "vec_id", numSub = 1)
    val res = Similarity.pqResiduals(dupCorpus, cells, coarse,
      "embedding", "vec_id")
    val books = Similarity.pqResidualBooks(res, numSub = 4, ksub = 8,
      iters = 1)
    val rcodes = Similarity.pqResidualEncode(res, books, numSub = 4)
    val probes = dupCorpus.filter($"vec_id" < 6)
    val got = Similarity.ivfAdcResidualTopK(cells, rcodes, coarse, books,
        probes, "embedding", "vec_id", k = 3, nprobe = 4, numSub = 4)
      .collect().map(_.toString).sorted.toSeq
    val q = dupCorpus.select($"vec_id".as("id"),
      expr("transform(embedding, x -> cast(floor(x * 1000) as bigint))")
        .as("vq"))
    val d2 = "aggregate(zip_with(a.vq, b.vq, (x, y) -> (x - y) * (x - y)), " +
      "cast(0 as bigint), (acc, v) -> acc + v)"
    val truth = q.as("a").filter($"a.id" < 6)
      .crossJoin(q.as("b")).filter($"a.id" =!= $"b.id")
      .select($"a.id".as("q_id"), $"b.id".as("id"),
        expr(d2).as("adc_d2"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"q_id")
          .orderBy($"adc_d2", $"id")))
      .filter($"rank" <= 3)
      .select($"q_id", $"rank", $"id", $"adc_d2")
      .collect().map(_.toString).sorted.toSeq
    assert(got === truth)
  }

  test("residual IVFADC: repartition invariance, candidates confined " +
      "to routed cells at nprobe=1") {
    val embs = graft.engine.Tables.load(spark, sfDir, "embeddings")
    def run(df: org.apache.spark.sql.DataFrame) = {
      val coarse = Similarity.pqCodebooks(df, "embedding", "vec_id",
        numSub = 1, ksub = 8, iters = 1)
      val cells = Similarity.pqEncode(df, coarse, "embedding", "vec_id",
        numSub = 1)
      val res = Similarity.pqResiduals(df, cells, coarse,
        "embedding", "vec_id")
      val books = Similarity.pqResidualBooks(res, numSub = 4, ksub = 8,
        iters = 1)
      val rcodes = Similarity.pqResidualEncode(res, books, numSub = 4)
      (cells, Similarity.ivfAdcResidualTopK(cells, rcodes, coarse, books,
        df.filter($"vec_id" < 10), "embedding", "vec_id",
        k = 3, nprobe = 1, numSub = 4))
    }
    val (cells, one) = run(embs)
    val (_, oneR) = run(embs.repartition(7, $"vec_id"))
    val a = one.collect().map(_.toString).sorted.toSeq
    assert(a === oneR.collect().map(_.toString).sorted.toSeq)
    assert(a.nonEmpty)
    // nprobe=1: a corpus-drawn probe routes to its own cell, so every
    // returned neighbor must share it
    val cellOf = cells.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Int]("code")).toMap
    one.collect().foreach { r =>
      assert(cellOf(r.getAs[Long]("id")) === cellOf(r.getAs[Long]("q_id")),
        s"nprobe=1 neighbor left the probe's cell: $r")
    }
  }
}

/** SQ8 scalar quantization: code range/monotonicity, saturation of
  * out-of-range vectors, exactness when spans collapse to the lattice,
  * repartition invariance, and recall against exact search. */
class ScalarQuantSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: Seq[(Long, Seq[Float])]) =
    spark.createDataFrame(rows).toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))

  test("sq8Encode maps each dim onto 0..255 with min->0 and max->255") {
    val c = vecs(Seq(
      (1L, Seq(0f, -2f)), (2L, Seq(1f, 0f)), (3L, Seq(2f, 2f))))
    val stats = Similarity.sq8Stats(c, "embedding")
    val codes = Similarity.sq8Encode(c, stats, "embedding", "vec_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(codes(1L) === Seq(0L, 0L))     // per-dim minima
    assert(codes(3L) === Seq(255L, 255L)) // per-dim maxima
    // midpoints land mid-range: (1-0)*255 div 2 = 127, (0+2)*255 div 4
    assert(codes(2L) === Seq(127L, 127L))
  }

  test("sq8Encode saturates out-of-range vectors at the boundary codes") {
    val train = vecs(Seq((1L, Seq(0f)), (2L, Seq(1f))))
    val stats = Similarity.sq8Stats(train, "embedding")
    val drift = vecs(Seq((10L, Seq(-5f)), (11L, Seq(9f))))
    val codes = Similarity.sq8Encode(drift, stats, "embedding", "vec_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(codes(10L) === Seq(0L))
    assert(codes(11L) === Seq(255L))
  }

  test("sq8TopK is repartition-invariant (exact int64 distances)") {
    val c = vecs((0 until 40).map(i =>
      (i.toLong, Seq.tabulate(8)(j => ((i * 31 + j * 7) % 13).toFloat))))
    val stats = Similarity.sq8Stats(c, "embedding")
    def run(df: org.apache.spark.sql.DataFrame) = {
      val codes = Similarity.sq8Encode(df, stats, "embedding", "vec_id")
      Similarity.sq8TopK(codes, stats, df.filter($"vec_id" < 5),
          "embedding", "vec_id", k = 4)
        .orderBy("q_id", "rank").collect().toSeq
    }
    assert(run(c) === run(c.repartition(7)))
  }

  test("SQ8 top-1 finds the exact duplicate, within the per-dim " +
      "quantization-residue bound (dims * span^2)") {
    // 20 base vectors + exact duplicates of the first 10
    val base = (0 until 20).map(i => (i.toLong,
      Seq.tabulate(16)(j => (((i * 131 + j * 17) % 29) / 29.0f))))
    val dups = (0 until 10).map(i => (100L + i, base(i)._2))
    val c = vecs(base ++ dups)
    val stats = Similarity.sq8Stats(c, "embedding")
    val codes = Similarity.sq8Encode(c, stats, "embedding", "vec_id")
    val top = Similarity.sq8TopK(codes, stats,
        c.filter($"vec_id" >= 100), "embedding", "vec_id", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // asymmetric distance to an exact duplicate is the pure
    // reconstruction residue: per dim < span (floor remainder), so
    // d2 < dims * maxSpan^2
    val maxSpan = stats.select(expr("array_max(spans)")).head().getLong(0)
    top.foreach { case (q, id, d2) =>
      assert(id === q - 100, s"probe $q: nearest must be its duplicate")
      assert(d2 < 16L * maxSpan * maxSpan,
        s"probe $q: residue $d2 above the quantization bound")
    }
  }
}

/** IVF x SQ8 composition: with nprobe = ncells it degenerates to full
  * SQ8 brute force; with nprobe = 1 candidates stay in the probe's own
  * coarse cell. */
class IvfSq8Spec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = {
    val rows = (0 until 60).map(i => (i.toLong,
      Seq.tabulate(16)(j => (((i * 131 + j * 17) % 29) / 29.0f))))
    spark.createDataFrame(rows).toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
  }

  test("nprobe = ncells recovers exactly the full SQ8 top-k") {
    val coarse = Similarity.pqCodebooks(corpus, "embedding", "vec_id",
      numSub = 1, ksub = 4, iters = 1)
    val cells = Similarity.pqEncode(corpus, coarse, "embedding",
      "vec_id", numSub = 1)
    val stats = Similarity.sq8Stats(corpus, "embedding")
    val codes = Similarity.sq8Encode(corpus, stats, "embedding", "vec_id")
    val probes = corpus.filter($"vec_id" < 5)
    val full = Similarity.sq8TopK(codes, stats, probes, "embedding",
      "vec_id", k = 3).orderBy("q_id", "rank").collect().toSeq
    val routed = Similarity.ivfSq8TopK(cells, codes, coarse, stats,
        probes, "embedding", "vec_id", k = 3, nprobe = 4)
      .orderBy("q_id", "rank").collect().toSeq
    assert(routed === full)
  }

  test("nprobe = 1 candidates never leave the probe's own cell") {
    val coarse = Similarity.pqCodebooks(corpus, "embedding", "vec_id",
      numSub = 1, ksub = 4, iters = 1)
    val cells = Similarity.pqEncode(corpus, coarse, "embedding",
      "vec_id", numSub = 1)
    val stats = Similarity.sq8Stats(corpus, "embedding")
    val codes = Similarity.sq8Encode(corpus, stats, "embedding", "vec_id")
    val cellOf = cells.select($"id", $"code").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val one = Similarity.ivfSq8TopK(cells, codes, coarse, stats,
      corpus.filter($"vec_id" < 5), "embedding", "vec_id",
      k = 3, nprobe = 1)
    one.collect().foreach { r =>
      assert(cellOf(r.getAs[Long]("id")) === cellOf(r.getAs[Long]("q_id")),
        s"nprobe=1 neighbor left the probe's cell: $r")
    }
  }
}

/** Standing residual-IVFADC index: the fold encodes against frozen
  * books at BOTH quantizer levels, so fold == whole-corpus encode. */
class ResidualIndexSpec extends SparkSpec {
  import spark.implicits._

  test("refreshResidualIvfIndex fold == encoding the full corpus " +
      "against the initially trained books; serve == direct serve") {
    val embs = graft.engine.Tables.load(spark, sfDir, "embeddings")
      .limit(64).localCheckpoint()
    val init = embs.filter($"vec_id" < 40)
    val rest = embs.filter($"vec_id" >= 40)
    val folded = Similarity.refreshResidualIvfIndex(
      Similarity.residualIvfIndex(init, "embedding", "vec_id",
        ncells = 8, numSub = 4, ksub = 8, iters = 1),
      rest, "embedding", "vec_id", numSub = 4)
    // rebuild reference: books from init, encode everything
    val coarse = Similarity.pqCodebooks(init, "embedding", "vec_id",
      numSub = 1, ksub = 8, iters = 1)
    val cells = Similarity.pqEncode(embs, coarse, "embedding", "vec_id",
      numSub = 1)
    val resInit = Similarity.pqResiduals(init,
      Similarity.pqEncode(init, coarse, "embedding", "vec_id", 1),
      coarse, "embedding", "vec_id")
    val fine = Similarity.pqResidualBooks(resInit, numSub = 4, ksub = 8,
      iters = 1)
    val resAll = Similarity.pqResiduals(embs, cells, coarse,
      "embedding", "vec_id")
    val rcodes = Similarity.pqResidualEncode(resAll, fine, numSub = 4)
    def set(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(set(folded.filter($"role" === "cell")
        .select($"id", $"code")) ===
      set(cells.select($"id", $"code")))
    assert(set(folded.filter($"role" === "rcode")
        .select($"id", $"sub", $"code")) ===
      set(rcodes.select($"id", $"sub", $"code")))
    // serve from the folded artifact == direct residual-ADC serve
    val probes = embs.filter($"vec_id" < 5)
    val a = set(Similarity.searchResidualIndex(folded, probes,
      "embedding", "vec_id", k = 3, nprobe = 2, numSub = 4))
    val b = set(Similarity.ivfAdcResidualTopK(cells, rcodes, coarse,
      fine, probes, "embedding", "vec_id", k = 3, nprobe = 2,
      numSub = 4))
    assert(a === b)
  }

  test("re-folding the same batch replaces rows instead of duplicating") {
    val embs = graft.engine.Tables.load(spark, sfDir, "embeddings")
      .limit(48).localCheckpoint()
    val init = embs.filter($"vec_id" < 32)
    val rest = embs.filter($"vec_id" >= 32)
    val once = Similarity.refreshResidualIvfIndex(
      Similarity.residualIvfIndex(init, "embedding", "vec_id",
        ncells = 8, numSub = 4, ksub = 8, iters = 1),
      rest, "embedding", "vec_id", numSub = 4).localCheckpoint()
    val twice = Similarity.refreshResidualIvfIndex(once, rest,
      "embedding", "vec_id", numSub = 4)
    assert(twice.exceptAll(once).count() === 0)
    assert(once.exceptAll(twice).count() === 0)
  }
}

/** Standing SQ8 index: frozen-grid fold, saturating drift, serve ==
  * direct SQ8 over the same parts. */
class Sq8IndexSpec extends SparkSpec {
  import spark.implicits._

  test("refreshSq8Index encodes against the RECORDED grid; fold == " +
      "whole-corpus encode; serve == direct sq8TopK") {
    val embs = graft.engine.Tables.load(spark, sfDir, "embeddings")
      .limit(64).localCheckpoint()
    val init = embs.filter($"vec_id" < 40)
    val folded = Similarity.refreshSq8Index(
      Similarity.sq8Index(init, "embedding", "vec_id"),
      embs.filter($"vec_id" >= 40), "embedding", "vec_id")
    val stats = Similarity.sq8Stats(init, "embedding")
    val codes = Similarity.sq8Encode(embs, stats, "embedding", "vec_id")
    def set(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(set(folded.filter($"role" === "code")
        .select($"id", $"codes")) === set(codes))
    val probes = embs.filter($"vec_id" < 5)
    assert(set(Similarity.sq8SearchIndex(folded, probes, "embedding",
        "vec_id", k = 3)) ===
      set(Similarity.sq8TopK(codes, stats, probes, "embedding",
        "vec_id", k = 3)))
    // re-fold replaces, never duplicates
    val twice = Similarity.refreshSq8Index(folded.localCheckpoint(),
      embs.filter($"vec_id" >= 40), "embedding", "vec_id")
    assert(twice.exceptAll(folded).count() === 0)
    assert(folded.exceptAll(twice).count() === 0)
  }
}

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = spark.read
    .parquet(s"$sfDir/embeddings.parquet").localCheckpoint()

  test("rpTopK with shortlist = corpus equals exact brute-force ranking") {
    val probes = embs.filter($"vec_id" < 5)
    val n = embs.count().toInt
    val rp = Similarity.rpTopK(embs, probes, "embedding", "vec_id",
      k = 3, projDims = 16, shortlist = n, scale = 1000)
    // exact reference: full-dim lattice L2 rank
    val q = embs.select($"vec_id",
      org.apache.spark.sql.functions.expr(
        "transform(embedding, x -> cast(floor(x * 1000) as bigint))")
        .as("vq"))
    val exact = q.as("p").filter($"p.vec_id" < 5)
      .crossJoin(q.as("c")).filter($"p.vec_id" =!= $"c.vec_id")
      .select($"p.vec_id".as("q_id"), $"c.vec_id".as("id"),
        org.apache.spark.sql.functions.expr(
          "aggregate(zip_with(p.vq, c.vq, (x, y) -> (x-y)*(x-y)), " +
            "cast(0 as bigint), (a, v) -> a + v)").as("d2"))
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"q_id")
          .orderBy($"d2", $"id")))
      .filter($"rank" <= 3)
      .select($"q_id", $"rank", $"id", $"d2")
    assert(rp.select($"q_id", $"rank", $"id", $"d2")
        .collect().map(_.toString).sorted.toSeq
      === exact.collect().map(_.toString).sorted.toSeq)
  }

  test("rpTopK 64->32 shortlist recall on real embeddings clears the " +
      "measured floor (tools/rp_recall_probe.py: 0.81-0.83 at this tier; " +
      "uniform-random embeddings are the JL adversarial case — " +
      "concentrated distances vs ~1/sqrt(projDims) distortion)") {
    val probes = embs.filter($"vec_id" < 30)
    val rp = Similarity.rpTopK(embs, probes, "embedding", "vec_id",
      k = 3, projDims = 32, shortlist = 100, scale = 1000)
      .select($"q_id", $"id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactTop = Similarity.rpTopK(embs, probes, "embedding", "vec_id",
      k = 3, projDims = 32, shortlist = embs.count().toInt, scale = 1000)
      .select($"q_id", $"id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (rp & exactTop).size.toDouble / exactTop.size
    info(f"rp 64->32 shortlist-100 recall@3: $recall%.3f")
    assert(recall >= 0.6, f"recall $recall%.3f below floor")
  }

  test("rpTopK is partitioning-invariant and guards bad args") {
    val probes = embs.filter($"vec_id" < 3)
    val once = Similarity.rpTopK(embs, probes, "embedding", "vec_id",
      k = 2, projDims = 8, shortlist = 10).collect().map(_.toString).sorted
    val again = Similarity.rpTopK(embs.repartition(7),
      probes.repartition(2), "embedding", "vec_id",
      k = 2, projDims = 8, shortlist = 10).collect().map(_.toString).sorted
    assert(once === again)
    intercept[IllegalArgumentException](Similarity.rpTopK(embs, probes,
      "embedding", "vec_id", k = 5, shortlist = 3))
  }
}
