package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector-compression queries (q110-q116) over [[Similarity]]'s product-
  * quantization family: per-subspace codebook training + encode under
  * the differential oracle, asymmetric-distance (ADC) top-k search
  * over the codes, IVFADC serving, the standing PQ index, and ADC
  * shortlist + exact re-rank. Both use the pure-integer lattice discipline
  * (floor(x*scale) vectors, re-floored centroids) so every distance is
  * an exact int64 and DuckDB replays the identical arithmetic.
  *
  * Pinned parameters (must match the oracle SQL): 64-dim embeddings,
  * numSub=4 subspaces of width 16, ksub=8 codewords seeded from the 8
  * smallest vec_ids, one Lloyd iteration, scale=1000.
  */
object QuantQueries {
  type QFn = (SparkSession, String) => DataFrame

  // ===================================================================
  // q110 — PQ codebook train + encode: every vector's (sub, code) cell
  // assignments after one integer Lloyd round. The whole train->encode
  // path is under the oracle: seeds, assignment argmin (ties to lowest
  // code), integer recenter with lattice re-flooring, re-assignment.
  // ===================================================================

  private val q110: QFn = (s, d) => {
    val vecs = PipelineQueries.wide(s, d, "embeddings", "vec_id")
    val books = Similarity.pqCodebooks(vecs, "embedding", "vec_id",
      numSub = 4, ksub = 8, iters = 1, scale = 1000)
    Similarity.pqEncode(vecs, books, "embedding", "vec_id",
      numSub = 4, scale = 1000)
      .select(col("id").as("vec_id"), col("sub"), col("code"))
      .orderBy(col("vec_id"), col("sub"))
  }

  /** Exact int64 squared L2 between two BIGINT lists (DuckDB). */
  private def dSqDistQ(a: String, b: String) =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(len($a)), " +
      s"i -> (($a)[i+1] - ($b)[i+1]) * (($a)[i+1] - ($b)[i+1]))), " +
      s"(acc, v) -> acc + v)"

  /** Argmin codeword per (vec, sub) of subvector CTE `$rows` against
    * codebook CTE `$books`. */
  private def dPqAssignFrom(rows: String, books: String) = s"""
    SELECT sub, vec_id, code FROM (
      SELECT s.sub, s.vec_id, c.code,
        row_number() OVER (PARTITION BY s.sub, s.vec_id
          ORDER BY ${dSqDistQ("s.sv", "c.cq")}, c.code) AS rn
      FROM $rows s JOIN $books c USING (sub)) WHERE rn = 1"""

  /** Argmin codeword per (vec, sub) against codebook CTE `$books`. */
  private def dPqAssign(books: String) = dPqAssignFrom("sub", books)

  /** Shared train+encode CTE prefix: quantize -> slice -> seed -> assign
    * -> integer recenter (lattice re-floor) -> final assign (a2). */
  private val dPqTrain = s"""
    WITH e AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(floor(x*1000) AS BIGINT)) AS vq
      FROM embeddings),
    sub AS (SELECT vec_id, j AS sub,
        list_slice(vq, j*16 + 1, j*16 + 16) AS sv
      FROM e, range(4) t(j)),
    seeds AS (SELECT sub,
        CAST(row_number() OVER (PARTITION BY sub ORDER BY vec_id) - 1
          AS INT) AS code, sv AS cq
      FROM sub WHERE vec_id IN (SELECT vec_id FROM e ORDER BY vec_id LIMIT 8)),
    a1 AS (${dPqAssign("seeds")}),
    re AS (SELECT sub, code, list(cx ORDER BY pos) AS cq FROM (
        SELECT a1.sub, a1.code, t.i AS pos,
          CAST(floor(CAST(sum(s.sv[t.i + 1]) AS DOUBLE) / count(*))
            AS BIGINT) AS cx
        FROM a1 JOIN sub s ON s.sub = a1.sub AND s.vec_id = a1.vec_id,
          range(16) t(i)
        GROUP BY 1, 2, 3) GROUP BY 1, 2),
    c1 AS (SELECT seeds.sub, seeds.code, coalesce(re.cq, seeds.cq) AS cq
      FROM seeds LEFT JOIN re ON re.sub = seeds.sub AND re.code = seeds.code),
    a2 AS (${dPqAssign("c1")})"""

  private val q110Sql = s"""$dPqTrain
    SELECT vec_id, sub, code FROM a2 ORDER BY vec_id, sub"""

  // ===================================================================
  // q111 — ADC top-k: probes (vec_id < 20) keep exact quantized
  // subvectors, build the (sub, code) -> partial-d2 LUT against the
  // trained codebooks, and rank the CODED corpus purely by summed
  // table entries (exact int64). k=3, ties by vec_id.
  // ===================================================================

  private val q111: QFn = (s, d) => {
    val vecs = PipelineQueries.wide(s, d, "embeddings", "vec_id")
    val books = Similarity.pqCodebooks(vecs, "embedding", "vec_id",
      numSub = 4, ksub = 8, iters = 1, scale = 1000)
    val codes = Similarity.pqEncode(vecs, books, "embedding", "vec_id",
      numSub = 4, scale = 1000)
    Similarity.pqAdcTopK(codes, books,
        vecs.filter(col("vec_id") < 20), "embedding", "vec_id",
        k = 3, numSub = 4, scale = 1000)
      .withColumnRenamed("id", "vec_id")
      .select(col("q_id"), col("rank"), col("vec_id"), col("adc_d2"))
      .orderBy(col("q_id"), col("rank"))
  }

  private val q111Sql = s"""$dPqTrain,
    lut AS (SELECT p.vec_id AS q_id, p.sub, c.code,
        ${dSqDistQ("p.sv", "c.cq")} AS pd2
      FROM sub p JOIN c1 c USING (sub) WHERE p.vec_id < 20),
    sc AS (SELECT l.q_id, a2.vec_id, CAST(sum(l.pd2) AS BIGINT) AS adc_d2
      FROM a2 JOIN lut l ON l.sub = a2.sub AND l.code = a2.code
        AND a2.vec_id != l.q_id
      GROUP BY 1, 2)
    SELECT q_id, rank, vec_id, adc_d2 FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY q_id
        ORDER BY adc_d2, vec_id) AS INT) AS rank FROM sc)
    WHERE rank <= 3 ORDER BY q_id, rank"""

  // ===================================================================
  // q112 — IVFADC serving (Jégou et al. §V): probes route to nprobe=4
  // of 16 coarse cells (integer-lattice coarse quantizer = the PQ
  // machinery at numSub=1), then ADC ranks PQ codes ONLY inside those
  // cells. The full route -> prune -> rank path replays in DuckDB.
  // ===================================================================

  /** Parameterized replica of the [[dPqTrain]] CTE chain with
    * `p`-prefixed names, so one WITH can train two codebook families
    * (coarse + fine) over the shared quantized corpus `e`. Emits
    * ${p}sub, ${p}seeds, ${p}a1, ${p}re, ${p}c1, ${p}a2.
    * `trainWhere` != "TRUE" trains the
    * codebooks on the predicate's subset ONLY, then `a2` assigns the
    * FULL `src` against the frozen books — the standing-index fold
    * semantics (q113/q127); the default emits the original
    * whole-corpus text unchanged. */
  private def dTrainP(p: String, numSub: Int, width: Int,
      ksub: Int, src: String = "e", trainWhere: String = "TRUE"): String = {
    def assign(rows: String, books: String) = s"""
      SELECT sub, vec_id, code FROM (
        SELECT s.sub, s.vec_id, c.code,
          row_number() OVER (PARTITION BY s.sub, s.vec_id
            ORDER BY ${dSqDistQ("s.sv", "c.cq")}, c.code) AS rn
        FROM $rows s JOIN $books c USING (sub)) WHERE rn = 1"""
    val split = trainWhere != "TRUE"
    val t = if (split) s"${p}sub0" else s"${p}sub"
    val sub0 = if (split)
      s""",
    ${p}sub0 AS (SELECT * FROM ${p}sub WHERE $trainWhere)""" else ""
    val seedSrc = if (split) s"$src WHERE $trainWhere" else src
    s"""
    ${p}sub AS (SELECT vec_id, j AS sub,
        list_slice(vq, j*$width + 1, j*$width + $width) AS sv
      FROM $src, range($numSub) t(j))$sub0,
    ${p}seeds AS (SELECT sub,
        CAST(row_number() OVER (PARTITION BY sub ORDER BY vec_id) - 1
          AS INT) AS code, sv AS cq
      FROM $t
      WHERE vec_id IN (SELECT vec_id FROM $seedSrc ORDER BY vec_id LIMIT $ksub)),
    ${p}a1 AS (${assign(t, p + "seeds")}),
    ${p}re AS (SELECT sub, code, list(cx ORDER BY pos) AS cq FROM (
        SELECT a.sub, a.code, t.i AS pos,
          CAST(floor(CAST(sum(s.sv[t.i + 1]) AS DOUBLE) / count(*))
            AS BIGINT) AS cx
        FROM ${p}a1 a JOIN $t s ON s.sub = a.sub
          AND s.vec_id = a.vec_id, range($width) t(i)
        GROUP BY 1, 2, 3) GROUP BY 1, 2),
    ${p}c1 AS (SELECT sd.sub, sd.code, coalesce(re.cq, sd.cq) AS cq
      FROM ${p}seeds sd LEFT JOIN ${p}re re
        ON re.sub = sd.sub AND re.code = sd.code),
    ${p}a2 AS (${assign(s"${p}sub", p + "c1")})"""
  }

  private val q112: QFn = (s, d) => {
    val vecs = PipelineQueries.wide(s, d, "embeddings", "vec_id")
    val coarse = Similarity.pqCodebooks(vecs, "embedding", "vec_id",
      numSub = 1, ksub = 16, iters = 1, scale = 1000)
    val cells = Similarity.pqEncode(vecs, coarse, "embedding", "vec_id",
      numSub = 1, scale = 1000)
    val books = Similarity.pqCodebooks(vecs, "embedding", "vec_id",
      numSub = 4, ksub = 8, iters = 1, scale = 1000)
    val codes = Similarity.pqEncode(vecs, books, "embedding", "vec_id",
      numSub = 4, scale = 1000)
    Similarity.ivfAdcTopK(cells, codes, coarse, books,
        vecs.filter(col("vec_id") < 20), "embedding", "vec_id",
        k = 3, nprobe = 4, numSub = 4, scale = 1000)
      .withColumnRenamed("id", "vec_id")
      .select(col("q_id"), col("rank"), col("vec_id"), col("adc_d2"))
      .orderBy(col("q_id"), col("rank"))
  }

  private val q112Sql = s"""
    WITH e AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(floor(x*1000) AS BIGINT)) AS vq
      FROM embeddings),
    ${dTrainP("cq_", 1, 64, 16)},
    ${dTrainP("fq_", 4, 16, 8)},
    routed AS (SELECT q_id, cell FROM (
        SELECT p.vec_id AS q_id, c.code AS cell,
          row_number() OVER (PARTITION BY p.vec_id
            ORDER BY ${dSqDistQ("p.sv", "c.cq")}, c.code) AS rn
        FROM cq_sub p JOIN cq_c1 c USING (sub) WHERE p.vec_id < 20)
      WHERE rn <= 4),
    lut AS (SELECT p.vec_id AS q_id, p.sub, c.code,
        ${dSqDistQ("p.sv", "c.cq")} AS pd2
      FROM fq_sub p JOIN fq_c1 c USING (sub) WHERE p.vec_id < 20),
    cand AS (SELECT r.q_id, a.vec_id FROM cq_a2 a JOIN routed r
      ON a.code = r.cell AND a.vec_id != r.q_id),
    sc AS (SELECT cd.q_id, cd.vec_id, CAST(sum(l.pd2) AS BIGINT) AS adc_d2
      FROM cand cd JOIN fq_a2 f ON f.vec_id = cd.vec_id
        JOIN lut l ON l.q_id = cd.q_id AND l.sub = f.sub
          AND l.code = f.code
      GROUP BY 1, 2)
    SELECT q_id, rank, vec_id, adc_d2 FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY q_id
        ORDER BY adc_d2, vec_id) AS INT) AS rank FROM sc)
    WHERE rank <= 3 ORDER BY q_id, rank"""

  // ===================================================================
  // q113 — STANDING PQ index: codebooks trained on the initial corpus
  // (vec_id < 400), the rest of the corpus folded in by refreshPqIndex
  // against the RECORDED books (no codeword moves), then ADC top-k
  // served from the standing artifact. The oracle replays the split:
  // train on the initial slice, assign the FULL corpus against those
  // books — which is exactly what the fold produces.
  // ===================================================================

  private val q113: QFn = (s, d) => {
    val vecs = PipelineQueries.wide(s, d, "embeddings", "vec_id")
    // NOT checkpointed (unlike q127): this artifact has only TWO role
    // consumers and the books branch constant-folds away, so the extra
    // eager action measured net-worse (2.01 -> 2.35 s filtered A/B)
    val idx = Similarity.refreshPqIndex(
      Similarity.pqIndex(vecs.filter(col("vec_id") < 400),
        "embedding", "vec_id", numSub = 4, ksub = 8, iters = 1),
      vecs.filter(col("vec_id") >= 400), "embedding", "vec_id",
      numSub = 4)
    Similarity.pqSearchIndex(idx, vecs.filter(col("vec_id") < 20),
        "embedding", "vec_id", k = 3, numSub = 4)
      .withColumnRenamed("id", "vec_id")
      .select(col("q_id"), col("rank"), col("vec_id"), col("adc_d2"))
      .orderBy(col("q_id"), col("rank"))
  }

  private val q113Sql = s"""
    WITH e AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(floor(x*1000) AS BIGINT)) AS vq
      FROM embeddings),
    sub AS (SELECT vec_id, j AS sub,
        list_slice(vq, j*16 + 1, j*16 + 16) AS sv
      FROM e, range(4) t(j)),
    sub0 AS (SELECT * FROM sub WHERE vec_id < 400),
    seeds AS (SELECT sub,
        CAST(row_number() OVER (PARTITION BY sub ORDER BY vec_id) - 1
          AS INT) AS code, sv AS cq
      FROM sub0 WHERE vec_id IN (SELECT vec_id FROM e
        WHERE vec_id < 400 ORDER BY vec_id LIMIT 8)),
    a1 AS (${dPqAssignFrom("sub0", "seeds")}),
    re AS (SELECT sub, code, list(cx ORDER BY pos) AS cq FROM (
        SELECT a1.sub, a1.code, t.i AS pos,
          CAST(floor(CAST(sum(s.sv[t.i + 1]) AS DOUBLE) / count(*))
            AS BIGINT) AS cx
        FROM a1 JOIN sub0 s ON s.sub = a1.sub AND s.vec_id = a1.vec_id,
          range(16) t(i)
        GROUP BY 1, 2, 3) GROUP BY 1, 2),
    c1 AS (SELECT seeds.sub, seeds.code, coalesce(re.cq, seeds.cq) AS cq
      FROM seeds LEFT JOIN re ON re.sub = seeds.sub AND re.code = seeds.code),
    a2 AS (${dPqAssignFrom("sub", "c1")}),
    lut AS (SELECT p.vec_id AS q_id, p.sub, c.code,
        ${dSqDistQ("p.sv", "c.cq")} AS pd2
      FROM sub p JOIN c1 c USING (sub) WHERE p.vec_id < 20),
    sc AS (SELECT l.q_id, a2.vec_id, CAST(sum(l.pd2) AS BIGINT) AS adc_d2
      FROM a2 JOIN lut l ON l.sub = a2.sub AND l.code = a2.code
        AND a2.vec_id != l.q_id
      GROUP BY 1, 2)
    SELECT q_id, rank, vec_id, adc_d2 FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY q_id
        ORDER BY adc_d2, vec_id) AS INT) AS rank FROM sc)
    WHERE rank <= 3 ORDER BY q_id, rank"""

  // ===================================================================
  // q114 — ADC shortlist + EXACT re-rank (IVFADC+R, Jégou et al.
  // §VII): ADC ranks the coded corpus, the top-10 shortlist per probe
  // is re-ranked by exact lattice L2 against the raw vectors, top-3
  // returned. Shortlist→re-rank is all int64, fully under the oracle.
  // ===================================================================

  private val q114: QFn = (s, d) => {
    val vecs = PipelineQueries.wide(s, d, "embeddings", "vec_id")
    val books = Similarity.pqCodebooks(vecs, "embedding", "vec_id",
      numSub = 4, ksub = 8, iters = 1, scale = 1000)
    val codes = Similarity.pqEncode(vecs, books, "embedding", "vec_id",
      numSub = 4, scale = 1000)
    Similarity.pqAdcRerank(codes, books, vecs,
        vecs.filter(col("vec_id") < 20), "embedding", "vec_id",
        k = 3, shortlist = 10, numSub = 4, scale = 1000)
      .withColumnRenamed("id", "vec_id")
      .select(col("q_id"), col("rank"), col("vec_id"), col("d2"))
      .orderBy(col("q_id"), col("rank"))
  }

  private val q114Sql = s"""$dPqTrain,
    lut AS (SELECT p.vec_id AS q_id, p.sub, c.code,
        ${dSqDistQ("p.sv", "c.cq")} AS pd2
      FROM sub p JOIN c1 c USING (sub) WHERE p.vec_id < 20),
    sc AS (SELECT l.q_id, a2.vec_id, CAST(sum(l.pd2) AS BIGINT) AS adc_d2
      FROM a2 JOIN lut l ON l.sub = a2.sub AND l.code = a2.code
        AND a2.vec_id != l.q_id
      GROUP BY 1, 2),
    short AS (SELECT q_id, vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
          ORDER BY adc_d2, vec_id) AS rn FROM sc) WHERE rn <= 10),
    rr AS (SELECT s.q_id, s.vec_id,
        ${dSqDistQ("ec.vq", "ep.vq")} AS d2
      FROM short s JOIN e ec ON ec.vec_id = s.vec_id
        JOIN e ep ON ep.vec_id = s.q_id)
    SELECT q_id, rank, vec_id, d2 FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY q_id
        ORDER BY d2, vec_id) AS INT) AS rank FROM rr)
    WHERE rank <= 3 ORDER BY q_id, rank"""

  // ===================================================================
  // q115 — RESIDUAL IVFADC (Jégou et al. §V eq. 15-17, the production
  // form): the fine quantizer encodes r(x) = x − µ_cell(x) instead of
  // x, and each probe ranks candidates with a PER-(probe, cell) LUT of
  // its own residual against that cell. Residuals are exact int64
  // lattice differences, so train → residual-encode → route → rank all
  // replay in DuckDB. Same pinned geometry as q112 (16 cells, nprobe=4,
  // numSub=4, ksub=8, one Lloyd round per quantizer).
  // ===================================================================

  private val q115: QFn = (s, d) => {
    val vecs = PipelineQueries.wide(s, d, "embeddings", "vec_id")
    val coarse = Similarity.pqCodebooks(vecs, "embedding", "vec_id",
      numSub = 1, ksub = 16, iters = 1, scale = 1000)
    // cells and res each feed two consumers — materialize once, as ONE
    // action (the residualIvfIndex build does the same; the cell rows
    // are a projection of the residual frame; result hash-identical)
    val res = Similarity.pqResiduals(vecs,
      Similarity.pqEncode(vecs, coarse, "embedding", "vec_id",
        numSub = 1, scale = 1000),
      coarse, "embedding", "vec_id", scale = 1000).localCheckpoint()
    val cells = res.select(col("id"), lit(0).as("sub"),
      col("cell").as("code"))
    val books = Similarity.pqResidualBooks(res, numSub = 4, ksub = 8,
      iters = 1)
    val rcodes = Similarity.pqResidualEncode(res, books, numSub = 4)
    Similarity.ivfAdcResidualTopK(cells, rcodes, coarse, books,
        vecs.filter(col("vec_id") < 20), "embedding", "vec_id",
        k = 3, nprobe = 4, numSub = 4, scale = 1000)
      .withColumnRenamed("id", "vec_id")
      .select(col("q_id"), col("rank"), col("vec_id"), col("adc_d2"))
      .orderBy(col("q_id"), col("rank"))
  }

  private val q115Sql = s"""
    WITH e AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(floor(x*1000) AS BIGINT)) AS vq
      FROM embeddings),
    ${dTrainP("cq_", 1, 64, 16)},
    res AS (SELECT a.vec_id, a.code AS cell,
        list_transform(range(64), i -> e.vq[i+1] - c.cq[i+1]) AS vq
      FROM cq_a2 a JOIN e ON e.vec_id = a.vec_id
        JOIN cq_c1 c ON c.code = a.code AND c.sub = 0),
    ${dTrainP("fq_", 4, 16, 8, src = "res")},
    routed AS (SELECT q_id, cell FROM (
        SELECT p.vec_id AS q_id, c.code AS cell,
          row_number() OVER (PARTITION BY p.vec_id
            ORDER BY ${dSqDistQ("p.sv", "c.cq")}, c.code) AS rn
        FROM cq_sub p JOIN cq_c1 c USING (sub) WHERE p.vec_id < 20)
      WHERE rn <= 4),
    pres AS (SELECT r.q_id, r.cell,
        list_transform(range(64), i -> pe.vq[i+1] - cc.cq[i+1]) AS vq
      FROM routed r JOIN e pe ON pe.vec_id = r.q_id
        JOIN cq_c1 cc ON cc.code = r.cell AND cc.sub = 0),
    psub AS (SELECT q_id, cell, j AS sub,
        list_slice(vq, j*16 + 1, j*16 + 16) AS sv
      FROM pres, range(4) t(j)),
    lut AS (SELECT p.q_id, p.cell, p.sub, c.code,
        ${dSqDistQ("p.sv", "c.cq")} AS pd2
      FROM psub p JOIN fq_c1 c USING (sub)),
    cand AS (SELECT r.q_id, r.cell, a.vec_id FROM cq_a2 a JOIN routed r
      ON a.code = r.cell AND a.vec_id != r.q_id),
    sc AS (SELECT cd.q_id, cd.vec_id, CAST(sum(l.pd2) AS BIGINT) AS adc_d2
      FROM cand cd JOIN fq_a2 f ON f.vec_id = cd.vec_id
        JOIN lut l ON l.q_id = cd.q_id AND l.cell = cd.cell
          AND l.sub = f.sub AND l.code = f.code
      GROUP BY 1, 2)
    SELECT q_id, rank, vec_id, adc_d2 FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY q_id
        ORDER BY adc_d2, vec_id) AS INT) AS rank FROM sc)
    WHERE rank <= 3 ORDER BY q_id, rank"""

  // ===================================================================
  // q116 — cluster-balanced sampling: the coarse quantizer's cells cap
  // each semantic cluster's contribution at quota=24, members chosen
  // by deterministic integer-hash rank (Curation.clusterBalance). The
  // cells come from the SAME oracled coarse CTE as q112, so the whole
  // assign -> rank -> cap path replays in DuckDB.
  // ===================================================================

  private val q116: QFn = (s, d) => {
    val vecs = PipelineQueries.wide(s, d, "embeddings", "vec_id")
    val coarse = Similarity.pqCodebooks(vecs, "embedding", "vec_id",
      numSub = 1, ksub = 16, iters = 1, scale = 1000)
    val cells = Similarity.pqEncode(vecs, coarse, "embedding", "vec_id",
      numSub = 1, scale = 1000)
      .select(col("id"), col("code").as("cell"))
    Curation.clusterBalance(cells, quota = 24)
      .withColumnRenamed("id", "vec_id")
      .orderBy(col("cell"), col("rank"))
  }

  private val q116Sql = s"""
    WITH e AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(floor(x*1000) AS BIGINT)) AS vq
      FROM embeddings),
    ${dTrainP("cq_", 1, 64, 16)}
    SELECT cell, rank, vec_id FROM (
      SELECT code AS cell, vec_id,
        CAST(row_number() OVER (PARTITION BY code
          ORDER BY (vec_id * 1103515245 + 12345) % 2147483647, vec_id)
        AS INT) AS rank
      FROM cq_a2)
    WHERE rank <= 24 ORDER BY cell, rank"""

  // ===================================================================

  // ===================================================================
  // q120 — SQ8 scalar quantization: per-dim affine 8-bit codes over the
  // integer lattice (train = per-dim min/span, encode = clamp-scaled
  // floor-div, search = asymmetric exact-int64 distance in the x255
  // space). Probes vec_id < 20, k=3, ties by vec_id — the FAISS-SQ8
  // compression tier under the differential oracle.
  // ===================================================================

  private val q120: QFn = (s, d) => {
    val vecs = PipelineQueries.wide(s, d, "embeddings", "vec_id")
    val stats = Similarity.sq8Stats(vecs, "embedding")
    val codes = Similarity.sq8Encode(vecs, stats, "embedding", "vec_id")
    Similarity.sq8TopK(codes, stats, vecs.filter(col("vec_id") < 20),
        "embedding", "vec_id", k = 3)
      .withColumnRenamed("id", "vec_id")
      .select(col("q_id"), col("rank"), col("vec_id"), col("sq_d2"))
      .orderBy(col("q_id"), col("rank"))
  }

  private val q120Sql = s"""
    WITH e AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(floor(x*1000) AS BIGINT)) AS vq
      FROM embeddings),
    dim AS (SELECT unnest(list_transform(range(len(vq)),
        j -> {'j': j, 'x': vq[CAST(j AS INT) + 1]})) AS u FROM e),
    pd AS (SELECT CAST(u.j AS BIGINT) AS j, min(u.x) AS mn,
        greatest(max(u.x) - min(u.x), 1) AS span FROM dim GROUP BY 1),
    st AS (SELECT list(mn ORDER BY j) AS mns,
        list(span ORDER BY j) AS spans FROM pd),
    codes AS (SELECT vec_id, list_transform(range(len(vq)),
        j -> least(255, greatest(0,
          ((vq[CAST(j AS INT) + 1] - mns[CAST(j AS INT) + 1]) * 255)
            // spans[CAST(j AS INT) + 1]))) AS codes
      FROM e, st),
    pr AS (SELECT vec_id AS q_id, list_transform(range(len(vq)),
        j -> (vq[CAST(j AS INT) + 1] - mns[CAST(j AS INT) + 1]) * 255)
        AS p255
      FROM e, st WHERE vec_id < 20),
    sc AS (SELECT p.q_id, c.vec_id,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(range(len(c.codes)), j ->
            (p.p255[CAST(j AS INT) + 1] - c.codes[CAST(j AS INT) + 1]
              * spans[CAST(j AS INT) + 1]) *
            (p.p255[CAST(j AS INT) + 1] - c.codes[CAST(j AS INT) + 1]
              * spans[CAST(j AS INT) + 1]))),
          (a, v) -> a + v) AS sq_d2
      FROM codes c, pr p, st WHERE c.vec_id != p.q_id)
    SELECT q_id, rank, vec_id, sq_d2 FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY q_id
        ORDER BY sq_d2, vec_id) AS INT) AS rank FROM sc)
    WHERE rank <= 3 ORDER BY q_id, rank"""

  // ===================================================================
  // q122 — IVF x SQ8 serving: the high-fidelity serving compose —
  // probes route to nprobe=4 of 16 coarse cells (q112's integer
  // coarse quantizer), asymmetric SQ8 distances rank only the routed
  // cells' 8-bit codes. Probes vec_id < 20, k=3, ties by vec_id.
  // ===================================================================

  private val q122: QFn = (s, d) => {
    val vecs = PipelineQueries.wide(s, d, "embeddings", "vec_id")
    val coarse = Similarity.pqCodebooks(vecs, "embedding", "vec_id",
      numSub = 1, ksub = 16, iters = 1, scale = 1000)
    val cells = Similarity.pqEncode(vecs, coarse, "embedding", "vec_id",
      numSub = 1, scale = 1000)
    val stats = Similarity.sq8Stats(vecs, "embedding")
    val codes = Similarity.sq8Encode(vecs, stats, "embedding", "vec_id")
    Similarity.ivfSq8TopK(cells, codes, coarse, stats,
        vecs.filter(col("vec_id") < 20), "embedding", "vec_id",
        k = 3, nprobe = 4)
      .withColumnRenamed("id", "vec_id")
      .select(col("q_id"), col("rank"), col("vec_id"), col("sq_d2"))
      .orderBy(col("q_id"), col("rank"))
  }

  private val q122Sql = s"""
    WITH e AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(floor(x*1000) AS BIGINT)) AS vq
      FROM embeddings),
    ${dTrainP("cq_", 1, 64, 16)},
    dim AS (SELECT unnest(list_transform(range(len(vq)),
        j -> {'j': j, 'x': vq[CAST(j AS INT) + 1]})) AS u FROM e),
    pd AS (SELECT CAST(u.j AS BIGINT) AS j, min(u.x) AS mn,
        greatest(max(u.x) - min(u.x), 1) AS span FROM dim GROUP BY 1),
    st AS (SELECT list(mn ORDER BY j) AS mns,
        list(span ORDER BY j) AS spans FROM pd),
    codes AS (SELECT vec_id, list_transform(range(len(vq)),
        j -> least(255, greatest(0,
          ((vq[CAST(j AS INT) + 1] - mns[CAST(j AS INT) + 1]) * 255)
            // spans[CAST(j AS INT) + 1])) * spans[CAST(j AS INT) + 1])
        AS rec
      FROM e, st),
    pr AS (SELECT vec_id AS q_id, list_transform(range(len(vq)),
        j -> (vq[CAST(j AS INT) + 1] - mns[CAST(j AS INT) + 1]) * 255)
        AS p255
      FROM e, st WHERE vec_id < 20),
    routed AS (SELECT q_id, cell FROM (
        SELECT p.vec_id AS q_id, c.code AS cell,
          row_number() OVER (PARTITION BY p.vec_id
            ORDER BY ${dSqDistQ("p.sv", "c.cq")}, c.code) AS rn
        FROM cq_sub p JOIN cq_c1 c USING (sub) WHERE p.vec_id < 20)
      WHERE rn <= 4),
    cand AS (SELECT r.q_id, a.vec_id FROM cq_a2 a JOIN routed r
      ON a.code = r.cell AND a.vec_id != r.q_id),
    sc AS (SELECT cd.q_id, cd.vec_id,
        ${dSqDistQ("p.p255", "c.rec")} AS sq_d2
      FROM cand cd JOIN codes c ON c.vec_id = cd.vec_id
        JOIN pr p ON p.q_id = cd.q_id)
    SELECT q_id, rank, vec_id, sq_d2 FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY q_id
        ORDER BY sq_d2, vec_id) AS INT) AS rank FROM sc)
    WHERE rank <= 3 ORDER BY q_id, rank"""

  // ===================================================================
  // q127 — STANDING residual-IVFADC index: both quantizer levels
  // trained on vec_id < 400, the rest of the corpus folded in against
  // the FROZEN books (coarse assignment -> residual -> fine code, no
  // codeword moves), then residual-ADC served from the artifact. The
  // oracle replays the split: train on the slice, assign the FULL
  // corpus — exactly what the fold produces. Probes vec_id < 20, k=3,
  // nprobe=4.
  // ===================================================================

  private val q127: QFn = (s, d) => {
    val vecs = PipelineQueries.wide(s, d, "embeddings", "vec_id")
    // the folded artifact is consumed FOUR times by the search (one
    // role filter each) — materialize it once (in production the fold
    // output is an IndexStore.write, a real materialization; here the
    // checkpoint is its stand-in), collapsing 4 replicas of the fold
    // subtree out of the serve plan (r16: planning gap 2.1 s -> small)
    val idx = Similarity.refreshResidualIvfIndex(
      Similarity.residualIvfIndex(vecs.filter(col("vec_id") < 400),
        "embedding", "vec_id", ncells = 16, numSub = 4, ksub = 8,
        iters = 1),
      vecs.filter(col("vec_id") >= 400), "embedding", "vec_id",
      numSub = 4).localCheckpoint()
    Similarity.searchResidualIndex(idx, vecs.filter(col("vec_id") < 20),
        "embedding", "vec_id", k = 3, nprobe = 4, numSub = 4)
      .withColumnRenamed("id", "vec_id")
      .select(col("q_id"), col("rank"), col("vec_id"), col("adc_d2"))
      .orderBy(col("q_id"), col("rank"))
  }

  private val q127Sql = s"""
    WITH e AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(floor(x*1000) AS BIGINT)) AS vq
      FROM embeddings),
    ${dTrainP("cq_", 1, 64, 16, trainWhere = "vec_id < 400")},
    res AS (SELECT a.vec_id, a.code AS cell,
        list_transform(range(64), i -> e.vq[i+1] - c.cq[i+1]) AS vq
      FROM cq_a2 a JOIN e ON e.vec_id = a.vec_id
        JOIN cq_c1 c ON c.code = a.code AND c.sub = 0),
    ${dTrainP("fq_", 4, 16, 8, src = "res",
      trainWhere = "vec_id < 400")},
    routed AS (SELECT q_id, cell FROM (
        SELECT p.vec_id AS q_id, c.code AS cell,
          row_number() OVER (PARTITION BY p.vec_id
            ORDER BY ${dSqDistQ("p.sv", "c.cq")}, c.code) AS rn
        FROM cq_sub p JOIN cq_c1 c USING (sub) WHERE p.vec_id < 20)
      WHERE rn <= 4),
    pres AS (SELECT r.q_id, r.cell,
        list_transform(range(64), i -> pe.vq[i+1] - cc.cq[i+1]) AS vq
      FROM routed r JOIN e pe ON pe.vec_id = r.q_id
        JOIN cq_c1 cc ON cc.code = r.cell AND cc.sub = 0),
    psub AS (SELECT q_id, cell, j AS sub,
        list_slice(vq, j*16 + 1, j*16 + 16) AS sv
      FROM pres, range(4) t(j)),
    lut AS (SELECT p.q_id, p.cell, p.sub, c.code,
        ${dSqDistQ("p.sv", "c.cq")} AS pd2
      FROM psub p JOIN fq_c1 c USING (sub)),
    cand AS (SELECT r.q_id, r.cell, a.vec_id FROM cq_a2 a JOIN routed r
      ON a.code = r.cell AND a.vec_id != r.q_id),
    sc AS (SELECT cd.q_id, cd.vec_id, CAST(sum(l.pd2) AS BIGINT) AS adc_d2
      FROM cand cd JOIN fq_a2 f ON f.vec_id = cd.vec_id
        JOIN lut l ON l.q_id = cd.q_id AND l.cell = cd.cell
          AND l.sub = f.sub AND l.code = f.code
      GROUP BY 1, 2)
    SELECT q_id, rank, vec_id, adc_d2 FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY q_id
        ORDER BY adc_d2, vec_id) AS INT) AS rank FROM sc)
    WHERE rank <= 3 ORDER BY q_id, rank"""

  // ===================================================================
  // q128 — STANDING SQ8 index: the per-dim grid trained on vec_id <
  // 400, the rest folded in against the RECORDED stats (saturating
  // clamp for out-of-grid values — folded vectors CAN exceed the
  // trained min/max, exercising the drift path), asymmetric serve
  // from the artifact. Probes vec_id < 20, k=3.
  // ===================================================================

  private val q128: QFn = (s, d) => {
    val vecs = PipelineQueries.wide(s, d, "embeddings", "vec_id")
    val idx = Similarity.refreshSq8Index(
      Similarity.sq8Index(vecs.filter(col("vec_id") < 400),
        "embedding", "vec_id"),
      vecs.filter(col("vec_id") >= 400), "embedding", "vec_id")
    Similarity.sq8SearchIndex(idx, vecs.filter(col("vec_id") < 20),
        "embedding", "vec_id", k = 3)
      .withColumnRenamed("id", "vec_id")
      .select(col("q_id"), col("rank"), col("vec_id"), col("sq_d2"))
      .orderBy(col("q_id"), col("rank"))
  }

  private val q128Sql = s"""
    WITH e AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(floor(x*1000) AS BIGINT)) AS vq
      FROM embeddings),
    dim AS (SELECT unnest(list_transform(range(len(vq)),
        j -> {'j': j, 'x': vq[CAST(j AS INT) + 1]})) AS u FROM e
      WHERE vec_id < 400),
    pd AS (SELECT CAST(u.j AS BIGINT) AS j, min(u.x) AS mn,
        greatest(max(u.x) - min(u.x), 1) AS span FROM dim GROUP BY 1),
    st AS (SELECT list(mn ORDER BY j) AS mns,
        list(span ORDER BY j) AS spans FROM pd),
    codes AS (SELECT vec_id, list_transform(range(len(vq)),
        j -> least(255, greatest(0,
          ((vq[CAST(j AS INT) + 1] - mns[CAST(j AS INT) + 1]) * 255)
            // spans[CAST(j AS INT) + 1])) * spans[CAST(j AS INT) + 1])
        AS rec
      FROM e, st),
    pr AS (SELECT vec_id AS q_id, list_transform(range(len(vq)),
        j -> (vq[CAST(j AS INT) + 1] - mns[CAST(j AS INT) + 1]) * 255)
        AS p255
      FROM e, st WHERE vec_id < 20),
    sc AS (SELECT p.q_id, c.vec_id,
        ${dSqDistQ("p.p255", "c.rec")} AS sq_d2
      FROM codes c, pr p WHERE c.vec_id != p.q_id)
    SELECT q_id, rank, vec_id, sq_d2 FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY q_id
        ORDER BY sq_d2, vec_id) AS INT) AS rank FROM sc)
    WHERE rank <= 3 ORDER BY q_id, rank"""

  // ===================================================================
  // q175 — standing SQ8 index DELETE (tombstones): q128's artifact
  // (grid trained on vec_id < 400, the rest folded against the
  // RECORDED stats) forgets every vec_id ≡ 3 (mod 7) via
  // Similarity.deleteFromIndex — coded rows anti-join away, the
  // frozen grid survives — then serves the same probes. The oracle
  // codes the WHOLE corpus on the training-set grid and searches only
  // the survivors: hash equality proves serve-after-delete ==
  // serve-over-survivors with the recorded geometry (a full rebuild
  // would additionally retrain the grid — that is the drift remedy,
  // not the delete path, same frozen-geometry discipline as refresh).
  // ===================================================================

  private val q175: QFn = (s, d) => {
    val vecs = PipelineQueries.wide(s, d, "embeddings", "vec_id")
    val idx = Similarity.refreshSq8Index(
      Similarity.sq8Index(vecs.filter(col("vec_id") < 400),
        "embedding", "vec_id"),
      vecs.filter(col("vec_id") >= 400), "embedding", "vec_id")
    val afterDelete = Similarity.deleteFromIndex(idx,
      vecs.filter(col("vec_id") % 7 === 3).select(col("vec_id")))
    Similarity.sq8SearchIndex(afterDelete,
        vecs.filter(col("vec_id") < 20), "embedding", "vec_id", k = 3)
      .withColumnRenamed("id", "vec_id")
      .select(col("q_id"), col("rank"), col("vec_id"), col("sq_d2"))
      .orderBy(col("q_id"), col("rank"))
  }

  private val q175Sql = s"""
    WITH e AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(floor(x*1000) AS BIGINT)) AS vq
      FROM embeddings),
    dim AS (SELECT unnest(list_transform(range(len(vq)),
        j -> {'j': j, 'x': vq[CAST(j AS INT) + 1]})) AS u FROM e
      WHERE vec_id < 400),
    pd AS (SELECT CAST(u.j AS BIGINT) AS j, min(u.x) AS mn,
        greatest(max(u.x) - min(u.x), 1) AS span FROM dim GROUP BY 1),
    st AS (SELECT list(mn ORDER BY j) AS mns,
        list(span ORDER BY j) AS spans FROM pd),
    codes AS (SELECT vec_id, list_transform(range(len(vq)),
        j -> least(255, greatest(0,
          ((vq[CAST(j AS INT) + 1] - mns[CAST(j AS INT) + 1]) * 255)
            // spans[CAST(j AS INT) + 1])) * spans[CAST(j AS INT) + 1])
        AS rec
      FROM e, st),
    pr AS (SELECT vec_id AS q_id, list_transform(range(len(vq)),
        j -> (vq[CAST(j AS INT) + 1] - mns[CAST(j AS INT) + 1]) * 255)
        AS p255
      FROM e, st WHERE vec_id < 20),
    sc AS (SELECT p.q_id, c.vec_id,
        ${dSqDistQ("p.p255", "c.rec")} AS sq_d2
      FROM codes c, pr p
      WHERE c.vec_id != p.q_id AND c.vec_id % 7 != 3)
    SELECT q_id, rank, vec_id, sq_d2 FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY q_id
        ORDER BY sq_d2, vec_id) AS INT) AS rank FROM sc)
    WHERE rank <= 3 ORDER BY q_id, rank"""

  // ===================================================================
  // q133 — random-projection ANN (Johnson–Lindenstrauss / Achlioptas):
  // 64-dim lattice vectors project to 16 signed int64 sums via the
  // parity-of-quadratic-mix ±1 matrix (the hash IS the matrix — no
  // stored state), probes (vec_id < 20) pre-rank by projected L2 to a
  // 20-candidate shortlist, exact full-dimension re-rank to top 3.
  // Every distance exact int64 — the oracle replays the projection
  // integer-for-integer.
  // ===================================================================

  private val q133: QFn = (s, d) => {
    val all = PipelineQueries.wide(s, d, "embeddings", "vec_id")
    Similarity.rpTopK(all, all.filter(col("vec_id") < 20), "embedding",
        "vec_id", k = 3, projDims = 16, shortlist = 20, scale = 1000)
      .withColumnRenamed("id", "vec_id")
      .orderBy(col("q_id"), col("rank"))
  }

  /** The ±1 sign at (i, j): parity of (y² mod P + x) with
    * x = i + j·100003, y = x·2654435761 mod P — integer-identical to
    * Similarity.rpProjExpr. */
  private def dRpSign(i: String, j: String) =
    s"(CASE WHEN (((($i + $j * 100003) * 2654435761 % 2147483647) * " +
      s"(($i + $j * 100003) * 2654435761 % 2147483647) % 2147483647) " +
      s"+ ($i + $j * 100003)) % 2 = 0 THEN 1 ELSE -1 END)"

  private val q133Sql = s"""
    WITH e AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(floor(x*1000) AS BIGINT)) AS vq
      FROM embeddings),
    pj AS (SELECT vec_id, vq, list_transform(range(16), j ->
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(range(len(vq)),
            i -> vq[i+1] * ${dRpSign("i", "j")})),
          (a, v) -> a + v)) AS pj
      FROM e),
    pre AS (SELECT q.vec_id AS q_id, c.vec_id AS id, q.vq AS q_vq, c.vq,
        ${dSqDistQ("q.pj", "c.pj")} AS pd2
      FROM pj q JOIN pj c ON q.vec_id < 20 AND q.vec_id != c.vec_id),
    sl AS (SELECT *, row_number() OVER (PARTITION BY q_id
        ORDER BY pd2, id) AS pre_rank FROM pre),
    ex AS (SELECT q_id, id, pd2, ${dSqDistQ("q_vq", "vq")} AS d2
      FROM sl WHERE pre_rank <= 20),
    r AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id
        ORDER BY d2, id) AS INT) AS rank FROM ex)
    SELECT q_id, rank, id AS vec_id, pd2, d2 FROM r
    WHERE rank <= 3 ORDER BY q_id, rank"""

  // ===================================================================
  // q149 — embedding centroid drift: per label, the squared L2 between
  // the quantized centroids of the first and second half of the corpus
  // (vec_id < 1000 vs >= 1000 at sf0.01 scale — the halves stand in for
  // "last week's batch vs this week's"). The semantic-drift monitor of
  // an embedding pipeline: exact integer throughout — per-dim int64
  // sums, floor-divided centroids on the lattice, integer squared
  // distance — so the oracle hash-matches. Scale shape: ONE partial
  // hash-aggregate per (label, half, dim); the drift join is
  // #labels x dims rows.
  // ===================================================================

  private val q149: QFn = (s, d) => {
    val vecs = PipelineQueries.wide(s, d, "embeddings", "vec_id")
    val m = vecs.agg(max(col("vec_id")).as("maxid"))
    val sums = vecs.crossJoin(broadcast(m))
      .select(col("label"),
        (col("vec_id") * 2 > col("maxid")).cast("int").as("half"),
        posexplode(expr(
          "transform(embedding, x -> cast(floor(x * 1000) as bigint))"))
          .as(Seq("dim", "vq")))
      .groupBy("label", "half", "dim")
      .agg(sum(col("vq")).as("sv"), count(lit(1)).as("c"))
      .withColumn("cq", expr("sv div c"))
    sums.filter(col("half") === 0)
      .select(col("label"), col("dim"), col("cq").as("c0"))
      .join(sums.filter(col("half") === 1)
        .select(col("label"), col("dim"), col("cq").as("c1")),
        Seq("label", "dim"))
      .groupBy("label")
      .agg(sum((col("c0") - col("c1")) * (col("c0") - col("c1")))
        .as("drift_q2"))
      .orderBy(col("label"))
  }

  private val q149Sql = """
    WITH mx AS (SELECT max(vec_id) AS maxid FROM embeddings),
    q AS (SELECT label,
        CASE WHEN vec_id * 2 > maxid THEN 1 ELSE 0 END AS half,
        unnest(list_transform(embedding,
          x -> CAST(floor(x * 1000) AS BIGINT))) AS vq,
        unnest(range(len(embedding))) AS dim
      FROM embeddings, mx),
    sums AS (SELECT label, half, dim, CAST(sum(vq) AS BIGINT) AS sv,
        count(*) AS c FROM q GROUP BY 1, 2, 3),
    cent AS (SELECT label, half, dim, sv // c AS cq FROM sums)
    SELECT a.label, CAST(sum((a.cq - b.cq) * (a.cq - b.cq)) AS BIGINT)
      AS drift_q2
    FROM cent a JOIN cent b ON a.label = b.label AND a.dim = b.dim
      AND a.half = 0 AND b.half = 1
    GROUP BY 1 ORDER BY 1"""

  val queries: Map[String, QFn] = Map(
    "q149_centroid_drift" -> q149,
    "q110_pq_encode" -> q110,
    "q111_pq_adc_topk" -> q111,
    "q112_ivfadc_topk" -> q112,
    "q113_pq_standing_index" -> q113,
    "q114_pq_adc_rerank" -> q114,
    "q115_ivfadc_residual" -> q115,
    "q116_cluster_balance" -> q116,
    "q120_sq8_topk" -> q120,
    "q122_ivf_sq8_topk" -> q122,
    "q127_residual_standing_index" -> q127,
    "q128_sq8_standing_index" -> q128,
    "q175_sq8_index_delete" -> q175,
    "q133_rp_ann" -> q133)

  val oracles: Map[String, String] = Map(
    "q149_centroid_drift" -> q149Sql,
    "q110_pq_encode" -> q110Sql,
    "q111_pq_adc_topk" -> q111Sql,
    "q112_ivfadc_topk" -> q112Sql,
    "q113_pq_standing_index" -> q113Sql,
    "q114_pq_adc_rerank" -> q114Sql,
    "q115_ivfadc_residual" -> q115Sql,
    "q116_cluster_balance" -> q116Sql,
    "q120_sq8_topk" -> q120Sql,
    "q122_ivf_sq8_topk" -> q122Sql,
    "q127_residual_standing_index" -> q127Sql,
    "q128_sq8_standing_index" -> q128Sql,
    "q175_sq8_index_delete" -> q175Sql,
    "q133_rp_ann" -> q133Sql)
}
