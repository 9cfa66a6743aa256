#!/usr/bin/env python3
"""Merge per-SF full-bench JSONs into the SCALING.md per-query ladder.

Usage: python3 tools/make_ladder.py <sf0.001.json> <sf0.01.json>
       <sf0.1.json> [out.md]

Emits a markdown table: query | sf0.001 | sf0.01 | sf0.1 | x(0.01->0.1),
sorted by query name, flagging any 0.01->0.1 ratio > 3x with ' !' so the
adjudication pass can grep for them ('x(0.01->0.1)' is the decade step
that matters: the 0.001->0.01 step is fixed-cost-dominated at these
sizes). Rows where either reading is <0.5 s get '~' on the ratio — at
sub-half-second scale the JVM/task-launch constant IS the measurement.
"""
import json, sys

def load(p):
    with open(p) as f:
        return json.load(f)["queries"]

def main():
    a, b, c = load(sys.argv[1]), load(sys.argv[2]), load(sys.argv[3])
    out = sys.argv[4] if len(sys.argv) > 4 else None
    names = sorted(set(a) | set(b) | set(c))
    lines = ["| query | sf0.001 | sf0.01 | sf0.1 | x(0.01->0.1) |",
             "|---|---|---|---|---|"]
    flagged = []
    for n in names:
        va, vb, vc = a.get(n, -1), b.get(n, -1), c.get(n, -1)
        if vb and vb > 0 and vc and vc > 0:
            r = vc / vb
            noise = "~" if (vb < 0.5 or vc < 0.5) else ""
            flag = " !" if (r > 3.0 and not noise) else ""
            if flag:
                flagged.append((n, vb, vc, r))
            ratio = f"{noise}{r:.2f}x{flag}"
        else:
            ratio = "-"
        def f(v):
            return f"{v:.3f}" if v is not None and v >= 0 else "ERR"
        lines.append(f"| {n} | {f(va)} | {f(vb)} | {f(vc)} | {ratio} |")
    ta = sum(v for v in a.values() if v > 0)
    tb = sum(v for v in b.values() if v > 0)
    tc = sum(v for v in c.values() if v > 0)
    lines.append(f"| **total ({len(names)} queries)** | **{ta:.1f}** "
                 f"| **{tb:.1f}** | **{tc:.1f}** | **{tc/tb:.2f}x** |")
    md = "\n".join(lines)
    if out:
        with open(out, "w") as f:
            f.write(md + "\n")
    else:
        print(md)
    if flagged:
        print(f"\n{len(flagged)} rows >3x on the 0.01->0.1 decade "
              "(adjudicate in SCALING.md):", file=sys.stderr)
        for n, vb, vc, r in flagged:
            print(f"  {n}: {vb:.3f} -> {vc:.3f} ({r:.2f}x)",
                  file=sys.stderr)

if __name__ == "__main__":
    main()
