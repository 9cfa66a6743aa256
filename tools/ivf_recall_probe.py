#!/usr/bin/env python3
"""Load-independent RECALL probe for the standing IVF index (q103).

Replicates Similarity.{ivfIndex, ivfSearchIndex} in numpy — seed
centroids = k smallest ids (the kmeansIters=0 path), assignment by
argmin |v|^2 - 2 v.c + |c|^2 with centroid-id tie-break, probes routed
to their nprobe nearest cells — and reports top-k recall against
brute-force cosine ground truth, per nprobe, plus the fraction of the
corpus each probe actually scans (the cost side). Counts are
machine-load-independent (the candidate-count methodology); nprobe is
the recall lever ivfSearchIndex exposes, and this probe is its
measured curve.

Usage: ivf_recall_probe.py <sf-dir> [<sf-dir> ...]
"""
import sys

import numpy as np
import pyarrow.parquet as pq


def load(sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    V = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], V[order]


def assign(V, cents):
    # dist^2 = |v|^2 - 2 v.c + |c|^2, centroid-index tie-break via argmin
    n2 = (V * V).sum(1)
    cn2 = (cents * cents).sum(1)
    d2 = n2[:, None] - 2.0 * (V @ cents.T) + cn2[None, :]
    return d2, np.argmin(d2, axis=1)


def topk_sets(sims, ids, k):
    """Per probe row: the set of ids of the k highest sims (id tie-break
    ascending, self excluded beforehand)."""
    out = []
    for row in sims:
        order = np.lexsort((ids, -row))[:k]
        out.append(set(ids[order]))
    return out


def probe(sf_dir, k=5, n_probes=50):
    ids, V = load(sf_dir)
    n = len(ids)
    cells = max(16, min(16384, (n + 1023) // 1024))  # deriveCells
    cents = V[:cells]  # k smallest ids = first rows after sort
    d2, cell_of = assign(V, cents)
    probes = np.arange(min(n_probes, n))
    # ground truth: brute-force cosine top-k, self excluded
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    sims = Vn[probes] @ Vn.T
    for i, p in enumerate(probes):
        sims[i, p] = -np.inf
    truth = topk_sets(sims, ids, k)
    occupancy = np.bincount(cell_of, minlength=cells)
    print(f"{sf_dir}: N={n} cells={cells} "
          f"mean-cell={occupancy.mean():.0f} max-cell={occupancy.max()}")
    print(f"  {'nprobe':>6} {'recall@'+str(k):>9} {'corpus scanned':>14}")
    for nprobe in (1, 2, 4, 8, min(16, cells)):
        route = np.argsort(d2[probes], axis=1)[:, :nprobe]
        hits = 0
        scanned = 0
        for i, p in enumerate(probes):
            member = np.isin(cell_of, route[i])
            member[p] = False
            scanned += member.sum()
            cand_sims = sims[i][member]
            cand_ids = ids[member]
            order = np.lexsort((cand_ids, -cand_sims))[:k]
            hits += len(set(cand_ids[order]) & truth[i])
        total = sum(len(t) for t in truth)
        print(f"  {nprobe:>6} {hits/total:>9.3f} "
              f"{scanned/(len(probes)*n):>13.1%}")


if __name__ == "__main__":
    for d in sys.argv[1:] or ["/root/testdata/sf0.01"]:
        probe(d)
