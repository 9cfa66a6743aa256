#!/usr/bin/env python3
"""Load-independent QUALITY probe for the PQ family (q110-q112).

Replicates Similarity.{pqCodebooks, pqEncode, pqAdcTopK, ivfAdcTopK}
in numpy on the SAME integer lattice (floor(x*scale) int64 vectors,
re-floored centroids, exact integer distances, ties to the lowest
code/id) and reports, per corpus and per (numSub, ksub) tier:

  * ADC top-k recall vs EXACT quantized-L2 brute-force ground truth —
    the quality cost of searching codes instead of vectors;
  * the ADC distance-distortion distribution
    (adc_d2 - exact_d2) / exact_d2 over all probe x corpus pairs —
    how far the LUT approximation bends individual distances (ADC
    distance to a vector's own codeword chain underestimates, distant
    pairs spread both ways);
  * per-vector reconstruction error |q - decode(code)|^2 / |q|^2 —
    the compression-fidelity side (what numSub x log2(ksub) bits buy);
  * the IVFADC (q112) recall column: ADC through nprobe-of-ncells
    coarse routing, the composed serving path.

The LSH precedent (tools/recall_probe.py found the plane-family
correlation bug) is the reason this exists: cost evidence without a
quality curve is half a scaling story.

Usage: pq_recall_probe.py <sf-dir> [<sf-dir> ...]
"""
import sys

import numpy as np
import pyarrow.parquet as pq

SCALE = 1000


def load(sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    V = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], np.floor(V[order] * SCALE).astype(np.int64)


def train_books(Q, num_sub, ksub, iters):
    """pqCodebooks replica: seeds = ksub smallest ids' subvectors,
    Lloyd rounds of argmin assign + floor(sum/count) recenter."""
    n, dims = Q.shape
    w = dims // num_sub
    subs = Q.reshape(n, num_sub, w)
    books = subs[:ksub].transpose(1, 0, 2).copy()  # (sub, code, w)
    for _ in range(iters):
        codes = assign_codes(subs, books)
        for s in range(num_sub):
            for c in range(ksub):
                m = subs[codes[:, s] == c, s, :]
                if len(m):
                    books[s, c] = np.floor(m.sum(0) / len(m)).astype(np.int64)
    return books


def assign_codes(subs, books):
    """(n, num_sub) argmin codes, exact int distance, ties lowest code."""
    n, num_sub, w = subs.shape
    codes = np.empty((n, num_sub), dtype=np.int64)
    for s in range(num_sub):
        d = ((subs[:, s, None, :] - books[None, s, :, :]) ** 2).sum(2)
        codes[:, s] = np.argmin(d, axis=1)  # first min = lowest code
    return codes


def adc_scores(subs_p, codes, books):
    """(n_probes, n) summed LUT distances — pqAdcTopK replica."""
    n_p, num_sub, w = subs_p.shape
    out = np.zeros((n_p, codes.shape[0]), dtype=np.int64)
    for s in range(num_sub):
        lut = ((subs_p[:, s, None, :] - books[None, s, :, :]) ** 2).sum(2)
        out += lut[:, codes[:, s]]
    return out


def topk(ids, scores, k, self_idx):
    scores = scores.copy().astype(np.float64)
    scores[self_idx] = np.inf
    order = np.lexsort((ids, scores))[:k]
    return set(ids[order])


def probe(sf_dir, tiers, k=5, n_probes=50, nprobe_tiers=(1, 2, 4)):
    ids, Q = load(sf_dir)
    n, dims = Q.shape
    probes = np.arange(min(n_probes, n))
    # exact quantized-L2 ground truth (the q111 oracle's distance)
    ex = ((Q[probes, None, :] - Q[None, :, :]) ** 2).sum(2)
    truth = [topk(ids, ex[i], k, p) for i, p in enumerate(probes)]
    print(f"\n== {sf_dir}  N={n} dims={dims} probes={len(probes)} "
          f"recall@{k} ==")
    print("tier          | recall | distort p50/p90 | recon p50/p90 "
          "| ivfadc recall @ nprobe " + "/".join(map(str, nprobe_tiers))
          + " | RESIDUAL ivfadc @ same")
    for (num_sub, ksub, iters) in tiers:
        w = dims // num_sub
        subs = Q.reshape(n, num_sub, w)
        books = train_books(Q, num_sub, ksub, iters)
        codes = assign_codes(subs, books)
        adc = adc_scores(subs[probes], codes, books)
        rec = np.mean([len(topk(ids, adc[i], k, p) & truth[i]) / k
                       for i, p in enumerate(probes)])
        # distance distortion over all probe x corpus pairs (self off)
        mask = np.ones_like(ex, dtype=bool)
        mask[np.arange(len(probes)), probes] = False
        dist = (adc[mask] - ex[mask]) / np.maximum(ex[mask], 1)
        d50, d90 = np.percentile(np.abs(dist), [50, 90])
        # reconstruction: decode codes, relative squared error
        recon = books[np.arange(num_sub)[None, :], codes]  # (n,sub,w)
        rerr = ((Q.reshape(n, num_sub, w) - recon) ** 2).sum((1, 2)) \
            / np.maximum((Q ** 2).sum(1), 1)
        r50, r90 = np.percentile(rerr, [50, 90])
        # IVFADC: coarse = PQ at num_sub=1, ksub=16 cells (q112 shape)
        ncells = 16
        cbooks = train_books(Q, 1, ncells, 1)
        cells = assign_codes(Q.reshape(n, 1, dims), cbooks)[:, 0]
        cd = ((Q[probes, None, :] - cbooks[0][None, :, :]) ** 2).sum(2)
        route_order = np.argsort(cd, axis=1, kind="stable")
        ivf_cols = []
        for npb in nprobe_tiers:
            routed = route_order[:, :npb]
            r = []
            for i, p in enumerate(probes):
                ok = np.isin(cells, routed[i])
                sc = adc[i].astype(np.float64).copy()
                sc[~ok] = np.inf
                r.append(len(topk(ids, sc, k, p) & truth[i]) / k)
            ivf_cols.append(np.mean(r))
        # RESIDUAL IVFADC (q115 / ivfAdcResidualTopK replica): fine
        # books trained on r = Q − µ_cell, per-(probe, cell) LUTs of
        # the probe's own residual, candidates from routed cells
        R = Q - cbooks[0][cells]
        rbooks = train_books(R, num_sub, ksub, iters)
        rcodes = assign_codes(R.reshape(n, num_sub, w), rbooks)
        rivf_cols = []
        for npb in nprobe_tiers:
            routed = route_order[:, :npb]
            r = []
            for i, p in enumerate(probes):
                sc = np.full(n, np.inf)
                for c in routed[i]:
                    pr = (Q[p] - cbooks[0][c]).reshape(num_sub, w)
                    lut = ((pr[:, None, :] - rbooks) ** 2).sum(2)
                    members = cells == c
                    sc[members] = lut[
                        np.arange(num_sub)[:, None],
                        rcodes[members].T].sum(0)
                r.append(len(topk(ids, sc, k, p) & truth[i]) / k)
            rivf_cols.append(np.mean(r))
        print(f"m={num_sub} k*={ksub} it={iters} | {rec:.3f}  | "
              f"{d50:.3f} / {d90:.3f}   | {r50:.3f} / {r90:.3f} | "
              + " / ".join(f"{v:.3f}" for v in ivf_cols) + " | "
              + " / ".join(f"{v:.3f}" for v in rivf_cols))


if __name__ == "__main__":
    tiers = [(4, 8, 1),     # the pinned q110-q112 oracle geometry
             (8, 64, 3),    # a realistic serving tier (48-bit codes)
             (8, 256, 3)]   # classic IVFADC paper geometry (64-bit)
    for sf in sys.argv[1:]:
        probe(sf, tiers)
