#!/usr/bin/env python3
"""Load-independent QUALITY probe for SQ8 scalar quantization (q120).

Replicates Similarity.{sq8Stats, sq8Encode, sq8TopK} in numpy on the
SAME integer lattice (floor(x*scale) int64 vectors, per-dim min/span,
clamp-scaled floor-div codes, asymmetric x255 integer distances, ties
to the lowest id) and reports, per corpus:

  * SQ8 top-k recall vs EXACT quantized-L2 brute-force ground truth —
    what 8 bits/dim costs in neighbor fidelity (expected: near-1.0,
    the SQ tier trades 4x bandwidth for almost no recall, unlike PQ's
    much deeper compression);
  * per-vector reconstruction error |q*255 - decode|^2 / |q*255|^2 in
    the x255 comparison space — the compression-fidelity side;
  * the PQ comparison column (recall at the q110 geometry numSub=4,
    ksub=8, 1 Lloyd iter) so the two compression tiers' quality gap is
    visible side by side at identical k.

Usage: sq8_recall_probe.py <sf-dir> [<sf-dir> ...]
"""
import sys

import numpy as np
import pyarrow.parquet as pq

SCALE = 1000
K = 10
N_PROBES = 50


def load(sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    V = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], np.floor(V[order] * SCALE).astype(np.int64)


def exact_topk(Q, qids, C, cids, k):
    out = []
    for i, q in enumerate(Q):
        d2 = ((C - q) ** 2).sum(axis=1)
        d2[cids == qids[i]] = np.iinfo(np.int64).max  # self-exclude
        idx = np.lexsort((cids, d2))[:k]
        out.append(set(cids[idx]))
    return out


def sq8(Vq):
    mn = Vq.min(axis=0)
    span = np.maximum(Vq.max(axis=0) - mn, 1)
    codes = np.clip((Vq - mn) * 255 // span, 0, 255)
    return mn, span, codes


def sq8_topk(Q, qids, codes, cids, mn, span, k):
    out = []
    recon = codes * span  # x255 space
    for i, q in enumerate(Q):
        p255 = (q - mn) * 255
        d2 = ((p255 - recon) ** 2).sum(axis=1)
        d2[cids == qids[i]] = np.iinfo(np.int64).max
        idx = np.lexsort((cids, d2))[:k]
        out.append(set(cids[idx]))
    return out


def pq_topk(Q, qids, Vq, cids, k, num_sub=4, ksub=8, iters=1):
    n, d = Vq.shape
    w = d // num_sub
    subs = Vq.reshape(n, num_sub, w)
    books = subs[:ksub].transpose(1, 0, 2).astype(np.int64).copy()
    for _ in range(iters):
        for s in range(num_sub):
            d2 = ((subs[:, s, None, :] - books[s][None]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for c in range(ksub):
                m = a == c
                if m.any():
                    books[s][c] = np.floor(
                        subs[m, s].sum(axis=0) / m.sum()).astype(np.int64)
    codes = np.stack([((subs[:, s, None, :] - books[s][None]) ** 2)
                      .sum(axis=2).argmin(axis=1)
                      for s in range(num_sub)], axis=1)
    out = []
    for i, q in enumerate(Q):
        qs = q.reshape(num_sub, w)
        lut = np.stack([((qs[s][None] - books[s]) ** 2).sum(axis=1)
                        for s in range(num_sub)])
        d2 = lut[np.arange(num_sub)[None], codes].sum(axis=1)
        d2[cids == qids[i]] = np.iinfo(np.int64).max
        idx = np.lexsort((cids, d2))[:k]
        out.append(set(cids[idx]))
    return out


def main():
    print(f"{'corpus':>12} {'n':>7} {'sq8_recall@10':>13} "
          f"{'pq_recall@10':>12} {'recon_err_med':>13} {'recon_err_p95':>13}")
    for sf_dir in sys.argv[1:]:
        ids, Vq = load(sf_dir)
        mn, span, codes = sq8(Vq)
        Q, qids = Vq[:N_PROBES], ids[:N_PROBES]
        truth = exact_topk(Q, qids, Vq, ids, K)
        got = sq8_topk(Q, qids, codes, ids, mn, span, K)
        rec = np.mean([len(t & g) / K for t, g in zip(truth, got)])
        gotpq = pq_topk(Q, qids, Vq, ids, K)
        recpq = np.mean([len(t & g) / K for t, g in zip(truth, gotpq)])
        p255 = (Vq - mn) * 255
        err = ((p255 - codes * span) ** 2).sum(axis=1) / np.maximum(
            (p255 ** 2).sum(axis=1), 1)
        print(f"{sf_dir.split('/')[-1]:>12} {len(ids):>7} {rec:>13.3f} "
              f"{recpq:>12.3f} {np.median(err):>13.2e} "
              f"{np.percentile(err, 95):>13.2e}")


if __name__ == "__main__":
    main()
