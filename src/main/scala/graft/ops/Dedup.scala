package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.F

/** Public dedup API — the library surface a training-data pipeline calls
  * (the oracle-checked q27-q31 queries exercise the same machinery; these
  * entry points are the reusable form).
  *
  * All candidate generation is signature-per-row (no shuffle) followed by
  * ONE shuffle on the candidate key — the only shapes that survive 100 TB.
  */
object Dedup {

  /** Exact dedup: one representative (min of `idCol`) per distinct value
    * of `keyExpr` (e.g. `md5(col("text"))`). */
  def exact(df: DataFrame, keyExpr: Column, idCol: String): DataFrame =
    df.groupBy(keyExpr.as("__key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"))
      .drop("__key")

  /** MinHash-LSH candidate pairs over a text column: (id_a, id_b,
    * est_sim) for pairs sharing >= 1 of `bands` signature bands. */
  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 3, k: Int = 16, bands: Int = 4): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val r = k / bands
    val sig = df.select(col(idCol).as("id"),
      F.minhashSig(F.shingleHashes(col(textCol), shingleN), k).as("sig"))
    val banded = sig.select(col("id"), col("sig"),
      explode(TextOps.lshBands(col("sig"), bands, r)).as("bk"))
    val b2 = banded.toDF("id2", "sig2", "bk2")
    banded.join(b2, col("bk") === col("bk2") && col("id") < col("id2"))
      .select(col("id").as("id_a"), col("id2").as("id_b"),
        col("sig").as("sa"), col("sig2").as("sb"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        expr(s"size(filter(sequence(0, ${k - 1}), i -> sa[i] = sb[i])) / $k.0")
          .as("est_sim"))
  }

  /** SimHash clusters: docs sharing an identical 32-bit signature, with
    * the min-id representative (linear output — never pairwise). */
  def simhashClusters(df: DataFrame, textCol: String, idCol: String)
      : DataFrame =
    df.select(col(idCol).as("id"), F.simhash32(col(textCol)).as("sig"))
      .groupBy(col("sig"))
      .agg(count(lit(1)).as("n_docs"), min(col("id")).as("keep_id"))
      .filter(col("n_docs") > 1)

  /** Exact n-gram Jaccard pairs >= `threshold` via the shingle inverted
    * index (complete for any threshold > 0). */
  def jaccardPairs(df: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      explode(F.shingleHashes(col(textCol), shingleN)).as("h"))
    val sz = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val sh2 = sh.toDF("id2", "h2")
    sh.join(sh2, col("h") === col("h2") && col("id") < col("id2"))
      .groupBy(col("id").as("id_a"), col("id2").as("id_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sz.toDF("id_a", "na"), "id_a")
      .join(sz.toDF("id_b", "nb"), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Incremental near-dup: test a NEW batch against an EXISTING corpus
    * without re-pairing the corpus with itself — the daily-ingest pattern
    * at scale (the corpus side ships as a precomputed shingle index, e.g.
    * a parquet table maintained across batches). Returns (new_id,
    * corpus_id, jaccard) pairs >= threshold plus within-batch pairs. */
  def incrementalJaccard(newDocs: DataFrame, corpusIndex: DataFrame,
      textCol: String, idCol: String, shingleN: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    // corpusIndex: (id, h) exploded shingle hashes + (id, n) sizes
    val newSh = newDocs.select(col(idCol).as("new_id"),
      explode(F.shingleHashes(col(textCol), shingleN)).as("h"))
    val newSz = newSh.groupBy("new_id").agg(count(lit(1)).as("n_new"))
    val corpusSz = corpusIndex.groupBy(col("id").as("corpus_id"))
      .agg(count(lit(1)).as("n_corpus"))
    newSh.join(corpusIndex.toDF("corpus_id", "h"), "h")
      .groupBy(col("new_id"), col("corpus_id"))
      .agg(count(lit(1)).as("inter"))
      .join(newSz, "new_id")
      .join(corpusSz, "corpus_id")
      .select(col("new_id"), col("corpus_id"),
        (col("inter").cast("double") /
          (col("n_new") + col("n_corpus") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Build/refresh the shingle index a corpus carries across batches. */
  def shingleIndex(docs: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 3): DataFrame =
    docs.select(col(idCol).as("id"),
      explode(F.shingleHashes(col(textCol), shingleN)).as("h"))

  /** Consolidate near-dup PAIRS into clusters via iterative min-label
    * propagation (connected components): every doc gets the smallest id
    * reachable through the pair graph — the step that turns pairwise
    * similarity into an actionable keep/drop decision. Near-dup graphs
    * are shallow (dup groups, not social networks), so a handful of
    * join+aggregate rounds reaches the fixpoint; each round is two
    * shuffles, no driver iteration over rows. */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", maxIter: Int = 10): DataFrame = {
    val edges = pairs.select(col(aCol).as("x"), col(bCol).as("y"))
      .union(pairs.select(col(bCol).as("x"), col(aCol).as("y")))
    var labels = edges.select(col("x").as("id")).distinct()
      .withColumn("label", col("id"))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = edges.join(labels, edges("y") === labels("id"))
        .groupBy(col("x").as("id")).agg(min(col("label")).as("nbr"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr"), col("label"))).as("label"))
      converged = next.join(labels.toDF("id", "old"), "id")
        .filter(col("label") =!= col("old")).isEmpty
      labels = next
      i += 1
    }
    labels
  }

  /** Embedding near-dup pairs: LSH bucket candidates verified by exact
    * cosine >= `threshold`. */
  def embeddingNearDups(df: DataFrame, vecCol: String, idCol: String,
      bits: Int = 4, threshold: Double = 0.35): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      sqrt(F.dotF(col(vecCol), col(vecCol))).as("nrm"),
      F.vecLsh(col(vecCol), bits).as("bucket"))
    val v2 = v.toDF("id2", "v2", "nrm2", "bucket2")
    v.join(v2, col("bucket") === col("bucket2") && col("id") < col("id2"))
      .select(col("id").as("id_a"), col("id2").as("id_b"),
        (F.dotF(col("v"), col("v2")) / (col("nrm") * col("nrm2")))
          .as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}

/** Public similarity-search API (brute-force and bucketed ANN). */
object Similarity {

  /** Exact top-k cosine neighbors of each probe row against `corpus`.
    * Probes are broadcast — keep the probe set bounded. */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, vecCol: String,
      idCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      sqrt(F.dotF(col(vecCol), col(vecCol))).as("nrm"))
    val p = probes.select(col(idCol).as("q_id"), col(vecCol).as("q_v"),
      sqrt(F.dotF(col(vecCol), col(vecCol))).as("q_nrm"))
    broadcast(p).join(c, col("q_id") =!= col("id"))
      .select(col("q_id"), col("id"),
        (F.dotF(col("q_v"), col("v")) / (col("q_nrm") * col("nrm")))
          .as("cos_sim"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("cos_sim").desc, col("id"))))
      .filter(col("rank") <= k)
  }

  /** IVF-style top-k: vectors assigned to their nearest seed centroid
    * (squared-L2 argmin, ties to the lowest centroid id), probes search
    * only their own cell. `centroids` must be small (broadcast). */
  def ivfTopK(corpus: DataFrame, probeFilter: Column, vecCol: String,
      idCol: String, k: Int, numCentroids: Int): DataFrame = {
    val e = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      F.dotF(col(vecCol), col(vecCol)).as("n2"))
    val cents = e.filter(col("id") < numCentroids)
      .select(col("id").as("cent_id"), col("v").as("cv"), col("n2").as("cn2"))
    val assigned = e.join(broadcast(cents))
      .select(col("id"), col("v"), col("n2"), col("cent_id"),
        (col("n2") - lit(2.0) * F.dotF(col("v"), col("cv")) + col("cn2"))
          .as("dist2"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
          .orderBy(col("dist2"), col("cent_id"))))
      .filter(col("rn") === 1)
      .select(col("id"), col("v"), col("n2"), col("cent_id"))
    val probes = assigned.filter(probeFilter)
      .select(col("id").as("q_id"), col("v").as("q_v"),
        col("n2").as("q_n2"), col("cent_id").as("q_cell"))
    broadcast(probes)
      .join(assigned,
        col("q_cell") === col("cent_id") && col("q_id") =!= col("id"))
      .select(col("q_id"), col("id"),
        (F.dotF(col("q_v"), col("v")) / (sqrt(col("q_n2")) * sqrt(col("n2"))))
          .as("cos_sim"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("cos_sim").desc, col("id"))))
      .filter(col("rank") <= k)
  }

  /** Approximate top-k: probes search only their hyperplane-LSH bucket. */
  def lshTopK(corpus: DataFrame, probes: DataFrame, vecCol: String,
      idCol: String, k: Int, bits: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      sqrt(F.dotF(col(vecCol), col(vecCol))).as("nrm"),
      F.vecLsh(col(vecCol), bits).as("bucket"))
    val p = probes.select(col(idCol).as("q_id"), col(vecCol).as("q_v"),
      sqrt(F.dotF(col(vecCol), col(vecCol))).as("q_nrm"),
      F.vecLsh(col(vecCol), bits).as("q_bucket"))
    broadcast(p).join(c,
        col("q_bucket") === col("bucket") && col("q_id") =!= col("id"))
      .select(col("q_id"), col("id"),
        (F.dotF(col("q_v"), col("v")) / (col("q_nrm") * col("nrm")))
          .as("cos_sim"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("cos_sim").desc, col("id"))))
      .filter(col("rank") <= k)
  }
}
