#!/usr/bin/env python3
"""Build a TRUE organic-growth corpus at K x the source scale factor —
new rows drawn from the SOURCE'S distributions, never replicated:

  - documents: new doc_ids, token counts ~ U(10,100) over the original
    30-word vocabulary plus a Heaps-style long tail of NEW tokens
    (vocabulary grows sublinearly with the corpus, the way a real crawl
    does); ~1.5% of new docs are exact duplicates of a random PRIOR doc
    (real corpora contain real duplicates, so dedup output stays
    non-trivial and ~linear in corpus size — not the ~K^2 the
    replication probes manufacture);
  - embeddings: new vectors sampled from per-label / per-dimension
    gaussians FIT on the source (cluster geometry preserved, no
    identical twins);
  - events: 10x users AND a 10x time range (organic density: per-bin
    volume flat), value ~ the source's exponential;
  - TPC-H: customer/supplier/part pools grow Kx with NEW keys and
    names (degree distributions preserved, name families disjoint from
    the originals), orders/lineitem reference the grown pools.

The original rows are kept verbatim as the corpus prefix (growth adds,
it does not rewrite history). Bench-only evidence, like make_probe.py:
no oracle runs against this corpus.

Usage: python3 tools/make_organic.py <srcSfDir> <outDir> [K=10]
"""
import sys, os, json, shutil
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CORE_VOCAB = None  # filled from the source corpus


def load(src, t):
    return pq.read_table(f"{src}/{t}.parquet")


def write(out, t, table):
    pq.write_table(table, f"{out}/{t}.parquet")
    print(f"{t}: {table.num_rows} rows")


def documents(src, out, k, rng):
    orig = load(src, "documents")
    texts = orig.column("text").to_pylist()
    langs_col = orig.column("lang").to_pylist()
    srcs_col = orig.column("source").to_pylist()
    n0 = len(texts)
    vocab = sorted({t for s in texts for t in s.split(" ")})
    langs, lcounts = np.unique(langs_col, return_counts=True)
    lprobs = lcounts / lcounts.sum()
    sources = sorted(set(srcs_col))
    # Heaps-style long tail: K x docs -> ~sqrt(K) x vocabulary
    n_new_vocab = int(len(vocab) * (np.sqrt(k) - 1))
    tail = [f"organ{i:03d}" for i in range(n_new_vocab)]
    new_texts, new_langs, new_srcs = [], [], []
    all_texts = list(texts)
    for _ in range(n0 * (k - 1)):
        if rng.random() < 0.015 and all_texts:
            t = all_texts[rng.integers(0, len(all_texts))]
        else:
            n_tok = rng.integers(10, 101)
            toks = [vocab[rng.integers(0, len(vocab))]
                    if rng.random() >= 0.02 or not tail
                    else tail[rng.integers(0, len(tail))]
                    for _ in range(n_tok)]
            t = " ".join(toks)
        all_texts.append(t)
        new_texts.append(t)
        new_langs.append(str(langs[np.searchsorted(
            np.cumsum(lprobs), rng.random())]))
        new_srcs.append(sources[rng.integers(0, len(sources))])
    ids = list(range(n0 * k))
    texts_all = texts + new_texts
    write(out, "documents", pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts_all),
        "lang": pa.array(langs_col + new_langs),
        "source": pa.array(srcs_col + new_srcs),
        "n_chars": pa.array([len(t) for t in texts_all], pa.int64())}))


def embeddings(src, out, k, rng):
    orig = load(src, "embeddings")
    vecs = np.array(orig.column("embedding").to_pylist(), dtype=np.float32)
    labels = np.array(orig.column("label").to_pylist())
    n0, dim = vecs.shape
    means = {l: vecs[labels == l].mean(axis=0) for l in np.unique(labels)}
    stds = {l: vecs[labels == l].std(axis=0) for l in np.unique(labels)}
    n_new = n0 * (k - 1)
    new_labels = rng.integers(0, len(means), n_new)
    new_vecs = np.stack([
        means[l] + stds[l] * rng.standard_normal(dim)
        for l in new_labels]).astype(np.float32)
    write(out, "embeddings", pa.table({
        "vec_id": pa.array(range(n0 * k), pa.int64()),
        "embedding": pa.array(
            list(vecs) + list(new_vecs),
            pa.list_(pa.float32())),
        "label": pa.array(
            list(labels.astype(int)) + list(new_labels.astype(int)),
            pa.int32())}))


def events(src, out, k, rng):
    orig = load(src, "events")
    n0 = orig.num_rows
    ts = orig.column("ts").to_pandas()
    t_min, t_max = ts.min(), ts.max()
    span_us = int((t_max - t_min).total_seconds() * 1e6)
    users0 = int(np.max(orig.column("user_id").to_numpy())) + 1
    types = sorted(set(orig.column("event_type").to_pylist()))
    n_new = n0 * (k - 1)
    # new events fill the EXTENDED window (t_max .. t_min + k*span):
    # per-bin density stays at the source's level
    lo = int(t_max.value // 1000) + 1
    hi = int(t_min.value // 1000) + span_us * k
    new_ts = np.sort(rng.integers(lo, hi, n_new))
    vals = np.round(np.minimum(rng.exponential(50.0, n_new), 600.0), 2)
    write(out, "events", pa.concat_tables([orig, pa.table({
        "event_id": pa.array(range(n0, n0 + n_new), pa.int64()),
        "ts": pa.array(new_ts, pa.timestamp("us")),
        "user_id": pa.array(
            rng.integers(0, users0 * k, n_new), pa.int64()),
        "event_type": pa.array(
            [types[i] for i in rng.integers(0, len(types), n_new)]),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(
            [json.dumps({"k": int(v)})
             for v in rng.integers(0, 100, n_new)]),
    }).cast(orig.schema)]))


def tpch(src, out, k, rng):
    for t in ("region", "nation"):
        shutil.copyfile(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
    cust = load(src, "customer")
    nc0 = cust.num_rows
    segs = sorted(set(cust.column("c_mktsegment").to_pylist()))
    n_new = nc0 * (k - 1)
    write(out, "customer", pa.concat_tables([cust, pa.table({
        "c_custkey": pa.array(range(nc0, nc0 * k), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}"
                            for i in range(nc0, nc0 * k)]),
        "c_nationkey": pa.array(
            rng.integers(0, 25, n_new), pa.int32()),
        "c_acctbal": pa.array(np.round(
            rng.uniform(-1000, 10000, n_new), 2), pa.float64()),
        "c_mktsegment": pa.array(
            [segs[i] for i in rng.integers(0, len(segs), n_new)]),
    }).cast(cust.schema)]))
    supp = load(src, "supplier")
    ns0 = supp.num_rows
    write(out, "supplier", pa.concat_tables([supp, pa.table({
        "s_suppkey": pa.array(range(ns0, ns0 * k), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}"
                            for i in range(ns0, ns0 * k)]),
        "s_nationkey": pa.array(
            rng.integers(0, 25, ns0 * (k - 1)), pa.int32()),
        "s_acctbal": pa.array(np.round(
            rng.uniform(0, 10000, ns0 * (k - 1)), 2), pa.float64()),
    }).cast(supp.schema)]))
    part = load(src, "part")
    np0 = part.num_rows
    names = part.column("p_name").to_pylist()
    adjs = sorted({n.split(" ")[0] for n in names})
    nouns = sorted({n.split(" ")[-1] for n in names})
    brands = sorted(set(part.column("p_brand").to_pylist()))
    ptypes = sorted(set(part.column("p_type").to_pylist()))
    n_new = np0 * (k - 1)
    write(out, "part", pa.concat_tables([part, pa.table({
        "p_partkey": pa.array(range(np0, np0 * k), pa.int64()),
        "p_name": pa.array([
            f"{adjs[rng.integers(0, len(adjs))]} "
            f"{nouns[rng.integers(0, len(nouns))]}"
            for _ in range(n_new)]),
        "p_brand": pa.array(
            [brands[i] for i in rng.integers(0, len(brands), n_new)]),
        "p_type": pa.array(
            [ptypes[i] for i in rng.integers(0, len(ptypes), n_new)]),
        "p_size": pa.array(rng.integers(1, 51, n_new), pa.int32()),
        "p_retailprice": pa.array(np.round(
            rng.uniform(900, 2900, n_new), 2), pa.float64()),
    }).cast(part.schema)]))
    orders = load(src, "orders")
    no0 = orders.num_rows
    n_new = no0 * (k - 1)
    statuses, prios = ["O", "P", "F"], [
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    day_us = 86400000000
    d0 = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
    odate = d0 + rng.integers(0, 2404, n_new) * day_us
    new_orders = pa.table({
        "o_orderkey": pa.array(range(no0, no0 * k), pa.int64()),
        "o_custkey": pa.array(
            rng.integers(0, nc0 * k, n_new), pa.int64()),
        "o_orderstatus": pa.array(
            [statuses[i] for i in rng.integers(0, 3, n_new)]),
        "o_totalprice": pa.array(np.round(
            rng.uniform(1000, 500000, n_new), 2), pa.float64()),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": pa.array(
            [prios[i] for i in rng.integers(0, 5, n_new)]),
    }).cast(orders.schema)
    write(out, "orders", pa.concat_tables([orders, new_orders]))
    li = load(src, "lineitem")
    # new lines per new order ~ U(1,7): matches the source's ~4 avg
    nlines = rng.integers(1, 8, n_new)
    okeys = np.repeat(np.arange(no0, no0 * k, dtype=np.int64), nlines)
    odates = np.repeat(odate, nlines)
    m = len(okeys)
    lineno = np.concatenate([np.arange(1, n + 1) for n in nlines])
    rf, ls = ["A", "N", "R"], ["O", "F"]
    new_li = pa.table({
        "l_orderkey": pa.array(okeys, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, np0 * k, m), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, ns0 * k, m), pa.int64()),
        "l_linenumber": pa.array(lineno, pa.int32()),
        "l_quantity": pa.array(
            rng.integers(1, 51, m).astype(np.float64), pa.float64()),
        "l_extendedprice": pa.array(np.round(
            rng.uniform(900, 105000, m), 2), pa.float64()),
        "l_discount": pa.array(np.round(
            rng.integers(0, 11, m) / 100.0, 2), pa.float64()),
        "l_tax": pa.array(np.round(
            rng.integers(0, 9, m) / 100.0, 2), pa.float64()),
        "l_returnflag": pa.array([rf[i] for i in rng.integers(0, 3, m)]),
        "l_linestatus": pa.array([ls[i] for i in rng.integers(0, 2, m)]),
        "l_shipdate": pa.array(
            odates + rng.integers(1, 96, m) * day_us, pa.timestamp("us")),
    }).cast(li.schema)
    write(out, "lineitem", pa.concat_tables([li, new_li]))


def main():
    src, out = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(421)
    documents(src, out, k, rng)
    embeddings(src, out, k, rng)
    events(src, out, k, rng)
    tpch(src, out, k, rng)


if __name__ == "__main__":
    main()
