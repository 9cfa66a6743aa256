#!/usr/bin/env python3
"""Generate the pass/fail counts the docs cite from CORRECTNESS_r*.json
(the driver's hard signal) — never hand-write these numbers into prose.

Usage: python3 tools/status_counts.py   # prints one line per round file
"""
import glob
import json
import os
import re

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
    rnd = re.search(r"_r(\d+)", f).group(1)
    d = json.load(open(f))
    qs = {k: v for k, v in d.items() if isinstance(v, dict)}
    ok = [k for k, v in qs.items()
          if v.get("rows_match") and v.get("schema_match")
          and v.get("hash_match")]
    bad = sorted(set(qs) - set(ok))
    print(f"r{rnd}: {len(ok)}/{len(qs)} pass"
          + (f"  failing: {', '.join(bad)}" if bad else ""))
