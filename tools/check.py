#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
  <outDir> = directory Verify wrote: <name>/ parquet dirs + oracle_sql.json

For each query: load the Spark parquet result and the DuckDB oracle
result, sort columns by name, sort rows, compare cell-by-cell
(exact equality — the driver hash-matches).
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            mine = con.sql(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')"
            ).df()
            orc = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        mine = mine[sorted(mine.columns)]
        orc = orc[sorted(orc.columns)]
        if list(mine.columns) != list(orc.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} vs {list(orc.columns)}")
            n_fail += 1
            continue
        if len(mine) != len(orc):
            print(f"FAIL {name}: rows {len(mine)} vs {len(orc)}")
            n_fail += 1
            continue
        ms = mine.sort_values(by=list(mine.columns), ignore_index=True)
        os_ = orc.sort_values(by=list(orc.columns), ignore_index=True)
        # exact compare; report first differing cell
        diff = None
        for c in ms.columns:
            a, b = ms[c], os_[c]
            neq = ~((a == b) | (a.isna() & b.isna()))
            if neq.any():
                i = neq.idxmax()
                diff = (c, i, a[i], b[i])
                break
        if diff:
            c, i, av, bv = diff
            print(f"FAIL {name}: col={c} row={i} spark={av!r} oracle={bv!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(ms)} rows, {len(ms.columns)} cols)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
