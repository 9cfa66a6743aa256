#!/usr/bin/env python3
"""Build a bench-only scale probe: documents/embeddings/events replicated
Kx with id offsets (every copy keeps its content — the worst-case dedup
workload: each doc gains K-1 exact near-dup partners), TPC-H tables
passed through unchanged. NO oracle runs here — timing evidence only
(see SCALING.md); correctness stays gated on the driver's sf dirs.

Usage: python3 tools/make_probe.py <srcSfDir> <outDir> [K=10] [--perturb]
       [--tpch] [--extend-window]

--extend-window shifts each events copy by i * (corpus time span + 1
day), so the probe's time RANGE grows Kx with the row count and
per-time-bin density stays FLAT — the organic-growth geometry for the
time-pair family (sessionization, interval overlap, inter-event gaps,
per-bin rates). The default replication replays the SAME window Kx
denser, which grows per-bin pair volume ~K^2x (lesson 31: a
replication probe distorts density, not just volume); with this flag
those queries read input-volume scaling instead of a density artifact.

--tpch ALSO replicates orders+lineitem Kx as disjoint copies (all keys
offset per copy) — the weak-scaling probe for the trade-graph queries
(q136/q139/q150): edge and wedge volume grow Kx with the copy count,
degree distribution unchanged. Offsets are 1e7-sized (fits sf<=1 keys
with room; results stay in 64-bit after the graph's *3 node encoding).

--perturb re-permutes each copy's tokens with a PER-COPY deterministic
order (sort by md5(token || copy index)), so replicas share a vocabulary
but almost no 3-gram shingles — they do NOT form Jaccard/winnow near-dup
clusters: the "organic growth" probe (input-volume scaling), vs the
default exact-copy probe (output-volume scaling, the adversarial dedup
workload). Caveats: simhash is order-blind, so even permuted copies stay
simhash-identical, and embeddings are exact copies in both probes.
"""
import sys, os, shutil
import duckdb

def main():
    src, out = sys.argv[1], sys.argv[2]
    flags = ("--perturb", "--tpch", "--extend-window")
    rest = [a for a in sys.argv[3:] if a not in flags]
    k = int(rest[0]) if rest else 10
    perturb = "--perturb" in sys.argv
    tpch = "--tpch" in sys.argv
    extend_window = "--extend-window" in sys.argv
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    # permute POSITIONS (not values): sorting the tokens themselves would
    # group duplicates into runs and mint super-hot n-grams ("x x x x x")
    # shared corpus-wide — measured to blow the q68 decontamination join
    # to 123M rows. Position-keyed md5 order spreads duplicates randomly.
    text = ("CASE WHEN i = 0 THEN text ELSE array_to_string("
            "list_transform(list_sort(list_transform("
            "range(len(string_split(text, ' '))), "
            "j -> md5(CAST(j AS VARCHAR) || '#' || i) || '|' "
            "|| CAST(j AS VARCHAR))), "
            "s -> string_split(text, ' ')"
            "[CAST(string_split(s, '|')[2] AS INT) + 1]), ' ') "
            "|| ' v' || i END")
    reps = {
        # id offsets keep seed/probe ids (vec_id<20 etc.) unique to copy 0
        # and preserve (user_id, ts) uniqueness for the window queries
        "documents": {"doc_id": "doc_id + i * 10000000",
                      **({"text": text} if perturb else {})},
        "embeddings": {"vec_id": "vec_id + i * 10000000"},
        "events": {"event_id": "event_id + i * 1000000000",
                   "user_id": "user_id + i * 1000000000"},
    }
    if extend_window:
        # whole-days shift per copy, one day past the corpus span, so
        # copies occupy disjoint windows and day/hour bucket boundaries
        # stay aligned with the original grain
        span_days = con.sql(
            f"SELECT CAST(date_diff('day', min(ts), max(ts)) AS INT) + 1 "
            f"FROM read_parquet('{src}/events.parquet')").fetchone()[0]
        reps["events"]["ts"] = f"ts + i * INTERVAL '{span_days}' DAY"
    if tpch:
        reps["orders"] = {
            "o_orderkey": "o_orderkey + i * 10000000",
            "o_custkey": "o_custkey + i * 10000000"}
        reps["lineitem"] = {
            "l_orderkey": "l_orderkey + i * 10000000",
            "l_suppkey": "l_suppkey + i * 10000000",
            "l_partkey": "l_partkey + i * 10000000"}
        # customer keys track o_custkey's offsets (referential
        # integrity per copy); each copy's names get a '-<i>' suffix so
        # the edit-distance families stay disjoint across copies — the
        # near-pair volume grows Kx (organic growth), not K^2x
        reps["customer"] = {
            "c_custkey": "c_custkey + i * 10000000",
            "c_name": ("CASE WHEN i = 0 THEN c_name ELSE "
                       "c_name || '-' || CAST(i AS VARCHAR) END")}
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings", "events"]:
        s, d = f"{src}/{t}.parquet", f"{out}/{t}.parquet"
        if not os.path.exists(s):
            continue
        if t not in reps:
            shutil.copyfile(s, d)
            continue
        exprs = reps[t]
        cols = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM read_parquet('{s}')").fetchall()]
        # select list in ORIGINAL column order, applying per-col rewrites
        sel = [f"{exprs[c]} AS {c}" if c in exprs else c for c in cols]
        con.sql(
            f"COPY (SELECT {', '.join(sel)} "
            f"FROM read_parquet('{s}'), range({k}) r(i)) "
            f"TO '{d}' (FORMAT parquet)")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{d}')").fetchone()[0]
        print(f"{t}: {n} rows ({k}x)")

if __name__ == "__main__":
    main()
