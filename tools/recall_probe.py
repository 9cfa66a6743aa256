#!/usr/bin/env python3
"""Load-independent RECALL probe for the OR-amplified hyperplane LSH.

Replicates the engine's deterministic plane family (vec_lsh: plane J
component i = ((i + J*64) * 2654435761 % P % 2001 - 1000)/1000) in
numpy, computes brute-force cosine ground truth over the embeddings
table, and reports what fraction of true pairs share >= 1 LSH bucket
under (a) a single table and (b) the derived (bits, tables) geometry —
plus the exact union candidate-pair count for the cost side. Counts are
machine-load-independent (the same methodology as the q89 candidate
counts): quality decay is as visible as wall-clock.

Usage: recall_probe.py <sf-dir> [<sf-dir> ...]
"""
import math
import sys

import numpy as np
import pyarrow.parquet as pq

P = 2147483647


def derive_bits(n, target=1024):
    buckets = max(1, (n + target - 1) // target)
    b = 0 if buckets <= 1 else (buckets - 1).bit_length()
    return min(20, max(4, b))


def derive_tables(bits, recall=0.9, cosine=0.9, cap=64):
    p = 1.0 - math.acos(cosine) / math.pi
    hit = p ** bits
    if hit >= 1.0 - 1e-12:
        return 1
    return min(cap, max(1, math.ceil(math.log(1 - recall) / math.log(1 - hit))))


def signatures(V, bits, tables):
    """Exact replica of vec_lsh's quadratic-congruential plane family
    (the squaring breaks the LCG lattice a plain multiplicative hash
    has — see VecLshExpr)."""
    dim = V.shape[1]
    J = np.arange(tables * bits, dtype=np.int64)
    i = np.arange(dim, dtype=np.int64)
    x = i[None, :] + J[:, None] * 64
    y = (x * 2654435761) % P
    plane = (((y * y % P + x) * 2654435761) % P % 2001 - 1000) / 1000.0
    D = V @ plane.T  # (N, tables*bits)
    bitm = (D > 0).astype(np.int64)
    sigs = np.zeros((V.shape[0], tables), dtype=np.int64)
    for t in range(tables):
        for j in range(bits):
            sigs[:, t] |= bitm[:, t * bits + j] << j
    return sigs


def truth_pairs(V, lo):
    """All i<j pairs with cosine >= lo, chunked."""
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    n = len(Vn)
    out_i, out_j, out_c = [], [], []
    step = 2048
    for s in range(0, n, step):
        G = Vn[s:s + step] @ Vn.T  # (chunk, n)
        ii, jj = np.nonzero(G >= lo)
        keep = (ii + s) < jj
        out_i.append(ii[keep] + s)
        out_j.append(jj[keep])
        out_c.append(G[ii[keep], jj[keep]])
    return np.concatenate(out_i), np.concatenate(out_j), np.concatenate(out_c)


def bucket_recall(sigs, ti, tj, tables):
    """Fraction of truth pairs sharing >= 1 bucket among `tables`."""
    if len(ti) == 0:
        return float("nan")
    hit = np.zeros(len(ti), dtype=bool)
    for t in range(tables):
        hit |= sigs[ti, t] == sigs[tj, t]
    return float(hit.mean())


def union_candidates(sigs, tables, n):
    """Exact distinct candidate-pair count across `tables` tables."""
    keys = []
    for t in range(tables):
        order = np.argsort(sigs[:, t], kind="stable")
        s = sigs[order, t]
        # bucket boundaries
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        ends = np.r_[starts[1:], len(s)]
        for a, b in zip(starts, ends):
            if b - a < 2:
                continue
            ids = np.sort(order[a:b])
            ii, jj = np.triu_indices(len(ids), 1)
            keys.append(ids[ii].astype(np.int64) * n + ids[jj])
    if not keys:
        return 0
    return len(np.unique(np.concatenate(keys)))


def seeded_eval(V, rng, n_pairs=1000):
    """Recall of SEEDED cosine~0.9-0.95 twin pairs (the near-dup regime
    deriveTables calibrates for) measured at the geometry each corpus
    tier derives, INCLUDING the 100 TB cap (bits=20) where single-table
    decay is worst. Twins are appended to the real corpus so bucket
    crowding stays realistic."""
    base = V[:n_pairs]
    # eps ~ 0.33-0.47 on unit-ish gaussians -> cos ~ 0.90-0.95
    eps = 0.33 + 0.14 * rng.random((n_pairs, 1))
    noise = rng.standard_normal(base.shape) * np.linalg.norm(
        base, axis=1, keepdims=True) / math.sqrt(base.shape[1])
    twins = base + eps * noise
    W = np.vstack([V, twins])
    ti = np.arange(n_pairs)
    tj = np.arange(len(V), len(V) + n_pairs)
    cos = (base * twins).sum(1) / (
        np.linalg.norm(base, axis=1) * np.linalg.norm(twins, axis=1))
    keep = cos >= 0.9
    rows = []
    for bits in (derive_bits(len(W)), 12, 20):
        L = derive_tables(bits)
        sigs = signatures(W, bits, L)
        r1 = bucket_recall(sigs, ti[keep], tj[keep], 1)
        rL = bucket_recall(sigs, ti[keep], tj[keep], L)
        rows.append((bits, L, int(keep.sum()), r1, rL))
    return rows


def main(dirs):
    print("| corpus | N | bits | L | truth pairs (cos>=0.9) | "
          "recall 1 table | recall L tables | union candidates (1 / L) | "
          "recall@0.35 (1 / L) |")
    print("|---|---|---|---|---|---|---|---|---|")
    for d in dirs:
        t = pq.read_table(f"{d}/embeddings.parquet", columns=["embedding"])
        V = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        n = len(V)
        bits = derive_bits(n)
        L = derive_tables(bits)
        sigs = signatures(V, bits, L)
        ti, tj, tc = truth_pairs(V, 0.35)
        hi = tc >= 0.9
        r1 = bucket_recall(sigs, ti[hi], tj[hi], 1)
        rL = bucket_recall(sigs, ti[hi], tj[hi], L)
        lo1 = bucket_recall(sigs, ti, tj, 1)
        loL = bucket_recall(sigs, ti, tj, L)
        c1 = union_candidates(sigs[:, :1], 1, n)
        cL = union_candidates(sigs, L, n)
        print(f"| {d} | {n} | {bits} | {L} | {int(hi.sum())} | "
              f"{r1:.3f} | {rL:.3f} | {c1} / {cL} | "
              f"{lo1:.3f} / {loL:.3f} |")
    print()
    print("Seeded cosine 0.90-0.95 twins (the regime deriveTables "
          "calibrates), largest corpus + wide-bits tiers:")
    print("| bits | L = deriveTables | seeded pairs | recall 1 table | "
          "recall L tables |")
    print("|---|---|---|---|---|")
    t = pq.read_table(f"{dirs[-1]}/embeddings.parquet",
                      columns=["embedding"])
    V = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    for bits, L, np_, r1, rL in seeded_eval(V, np.random.default_rng(42)):
        print(f"| {bits} | {L} | {np_} | {r1:.3f} | {rL:.3f} |")


if __name__ == "__main__":
    main(sys.argv[1:])
