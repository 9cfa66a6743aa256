#!/usr/bin/env python3
"""Build the dense-ID string-similarity probe used by the q172/q173
regime-boundary receipt (SCALING.md): a customer table with ids
1..N*15000 and names regenerated on TPC-H's dense "Customer#%09d"
pattern, every other table passed through unchanged from the source
sf dir. At 150k names the 9-digit ID space is locally saturated, so
the TRUE d<=1 Levenshtein pair set is ~3.3M — the adversarial corpus
for gram-frequency candidate schemes (the digit-gram space has only
10^3 trigrams) and the home turf of the deletion-neighborhood join.
NO oracle runs here — timing evidence only; correctness stays gated
on the driver's sf dirs.

Usage: python3 tools/make_name_probe.py <srcSfDir> <outDir> [K=10]
"""
import sys, os, shutil
import duckdb

def main():
    src, out = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM '{src}/customer.parquet'").fetchone()[0]
    con.execute(f"""
      COPY (
        WITH base AS (SELECT * FROM '{src}/customer.parquet'
                      ORDER BY c_custkey LIMIT 1)
        SELECT i AS c_custkey,
               'Customer#' || lpad(CAST(i AS VARCHAR), 9, '0') AS c_name,
               base.* EXCLUDE (c_custkey, c_name)
        FROM base, range(1, {n * k} + 1) t(i)
      ) TO '{out}/customer.parquet' (FORMAT PARQUET)""")
    for t in ("region nation supplier part orders lineitem events "
              "documents embeddings").split():
        s, d = f"{src}/{t}.parquet", f"{out}/{t}.parquet"
        if os.path.exists(s) and not os.path.exists(d):
            shutil.copyfile(s, d)
    print(f"wrote {out}: customer={n * k} rows, other tables copied")

if __name__ == "__main__":
    main()
