#!/usr/bin/env python3
"""Z-order pruning-selectivity probe (evidence for SCALING.md).

Replays q137's integer lattice in DuckDB over events at a given sf:
quantize (user, time-ms) to 10 bits each, Morton-code, bucket into 64
quads (zorder) vs 64 time-ranges (linear layout), then for a ladder of
centered square box predicates measure buckets/rows scanned under each
layout's zone maps vs the rows actually matching.

Usage: python3 tools/zorder_probe.py <sfDir>
"""
import sys
import duckdb

def main():
    sf = sys.argv[1]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf}/events.parquet')")
    morton = " + ".join(
        f"(((zq_x >> {i}) & 1) << {2*i}) + (((zq_y >> {i}) & 1) << {2*i+1})"
        for i in range(10))
    con.sql(f"""CREATE TEMP TABLE lay AS
      WITH base AS (SELECT user_id AS u, epoch_us(ts) // 1000 AS tm
        FROM events),
      st AS (SELECT min(u) AS xmin, max(u) AS xmax,
          min(tm) AS ymin, max(tm) AS ymax FROM base),
      q AS (SELECT ((u - xmin) * 1024) // (xmax - xmin + 1) AS zq_x,
          ((tm - ymin) * 1024) // (ymax - ymin + 1) AS zq_y
        FROM base, st),
      zc AS (SELECT zq_x, zq_y, {morton} AS z FROM q)
      SELECT zq_x, zq_y, z // 16384 AS zb, zq_y // 16 AS lb FROM zc""")
    print(f"{'box side':>9} {'match':>7} | {'z-bkts':>6} {'z-rows':>8} | "
          f"{'l-bkts':>6} {'l-rows':>8} | row ratio")
    for frac in (16, 8, 4, 2):
        half = 1024 // (2 * frac)
        lo, hi = 512 - half, 512 + half - 1
        row = con.sql(f"""
          WITH zz AS (SELECT zb, min(zq_x) xm, max(zq_x) xx,
              min(zq_y) ym, max(zq_y) yx, count(*) c FROM lay GROUP BY 1),
          lz AS (SELECT lb, min(zq_x) xm, max(zq_x) xx,
              min(zq_y) ym, max(zq_y) yx, count(*) c FROM lay GROUP BY 1)
          SELECT
            (SELECT count(*) FROM lay WHERE zq_x BETWEEN {lo} AND {hi}
              AND zq_y BETWEEN {lo} AND {hi}),
            (SELECT count(*) FROM zz WHERE xm <= {hi} AND xx >= {lo}
              AND ym <= {hi} AND yx >= {lo}),
            (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) FROM zz
              WHERE xm <= {hi} AND xx >= {lo} AND ym <= {hi} AND yx >= {lo}),
            (SELECT count(*) FROM lz WHERE xm <= {hi} AND xx >= {lo}
              AND ym <= {hi} AND yx >= {lo}),
            (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) FROM lz
              WHERE xm <= {hi} AND xx >= {lo} AND ym <= {hi} AND yx >= {lo})
          """).fetchone()
        match, zb, zr, lb, lr = row
        ratio = (lr / zr) if zr else float("nan")
        print(f"1/{frac:<7} {match:>7} | {zb:>6} {zr:>8} | "
              f"{lb:>6} {lr:>8} | {ratio:.2f}x")

if __name__ == "__main__":
    main()
