#!/usr/bin/env python3
"""Load-independent QUALITY probe for random-projection ANN (q133).

Replicates Similarity.rpTopK's integer projection in numpy on the SAME
lattice (floor(x*scale) int64 vectors; sign(j,i) = parity of the
quadratic congruential mix of x = i + j*100003) and reports shortlist
recall vs exact quantized-L2 ground truth per (projDims, shortlist)
tier. Random embeddings are the adversarial case for JL — pairwise
distances concentrate, so the pre-rank must separate margins smaller
than the projection distortion (~1/sqrt(projDims) relative).

Usage: rp_recall_probe.py <sf-dir> [<sf-dir> ...]
"""
import sys

import numpy as np
import pyarrow.parquet as pq

SCALE = 1000
P = 2147483647
K = 3
NPROBE = 50


def load(sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    V = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], np.floor(V[order] * SCALE).astype(np.int64)


def signs(proj_dims, dims):
    j, i = np.meshgrid(np.arange(proj_dims, dtype=np.int64),
                       np.arange(dims, dtype=np.int64), indexing="ij")
    x = i + j * 100003
    y = (x * 2654435761) % P
    return np.where((y * y % P + x) % 2 == 0, 1, -1).astype(np.int64)


def topk_sets(D, ids, qn, k):
    # per probe row: k smallest by (d, id); ids sorted asc so argsort
    # with stable kind breaks ties by id
    out = []
    for qi in range(qn):
        d = D[qi].copy()
        d[qi] = np.iinfo(np.int64).max  # self-exclude
        idx = np.argsort(d, kind="stable")[:k]
        out.append({(int(ids[qi]), int(ids[j])) for j in idx})
    return out


def main():
    for sf_dir in sys.argv[1:]:
        ids, V = load(sf_dir)
        n, dims = V.shape
        qn = min(30, n)
        ex = np.einsum("id,jd->ij", V[:qn] - 0, V - 0)  # placeholder
        diff = V[:qn, None, :] - V[None, :, :]
        exact = np.einsum("qnd,qnd->qn", diff, diff)
        gt = topk_sets(exact, ids, qn, K)
        print(f"== {sf_dir}  n={n} dims={dims} probes={qn} k={K}")
        for pd in (8, 16, 32):
            S = signs(pd, dims)
            PJ = V @ S.T
            pdiff = PJ[:qn, None, :] - PJ[None, :, :]
            pdist = np.einsum("qnd,qnd->qn", pdiff, pdiff)
            for sl in (20, 50, 100):
                hits = tot = 0
                for qi in range(qn):
                    d = pdist[qi].copy()
                    d[qi] = np.iinfo(np.int64).max
                    cand = set(np.argsort(d, kind="stable")[:sl])
                    e = exact[qi].copy()
                    e[qi] = np.iinfo(np.int64).max
                    order = [j for j in np.argsort(e, kind="stable")
                             if j in cand][:K]
                    got = {(int(ids[qi]), int(ids[j])) for j in order}
                    hits += len(got & gt[qi])
                    tot += len(gt[qi])
                print(f"  projDims={pd:2d} shortlist={sl:3d} "
                      f"recall@{K}={hits / tot:.3f}")


if __name__ == "__main__":
    main()
