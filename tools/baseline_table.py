#!/usr/bin/env python3
"""Emit the consolidated per-query baseline markdown table from a
Bench battery artifact (BENCH_DETAIL.json). Keeps BASELINE.md's
published column mechanically derivable from the committed artifact:

    python3 tools/baseline_table.py BENCH_DETAIL.json > /tmp/table.md
"""
import json
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAIL.json"
d = json.load(open(path))
qs = sorted(d["queries"].items())
cols = 2
rows = (len(qs) + cols - 1) // cols
print("| query | r09 s | query | r09 s |")
print("|---|---|---|---|")
for r in range(rows):
    cells = []
    for c in range(cols):
        i = r + c * rows
        if i < len(qs):
            k, v = qs[i]
            cells.append(f"{k} | {v:.2f}")
        else:
            cells.append(" | ")
    print("| " + " | ".join(cells) + " |")
print()
print(f"Total: {d['value']:.1f} s / {len(qs)} queries; sf={d['sf']}")
