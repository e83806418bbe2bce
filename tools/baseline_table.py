#!/usr/bin/env python3
"""Emit the consolidated per-query baseline markdown table from a
Bench battery artifact (BENCH_DETAIL.json). Keeps BASELINE.md's
published column mechanically derivable from the committed artifact:

    python3 tools/baseline_table.py BENCH_DETAIL.json [label] > /tmp/table.md

`label` names the column (default "r09 s"). Pass a second artifact
path as argv[3] with argv[4] as its label to emit a two-column table
(e.g. count-eval and hash-eval of the same battery side by side).
"""
import json
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAIL.json"
label = sys.argv[2] if len(sys.argv) > 2 else "r09 s"
d = json.load(open(path))
second = None
if len(sys.argv) > 4:
    d2 = json.load(open(sys.argv[3]))
    second = (d2["queries"], sys.argv[4], d2["value"])

if second is not None:
    q2, label2, total2 = second
    print(f"| query | {label} | {label2} |")
    print("|---|---|---|")
    for k, v in sorted(d["queries"].items()):
        v2 = q2.get(k)
        v2s = f"{v2:.2f}" if v2 is not None else ""
        print(f"| {k} | {v:.2f} | {v2s} |")
    print()
    print(f"Totals: {d['value']:.1f} s ({label}) / {total2:.1f} s ({label2}) "
          f"over {len(d['queries'])} queries; sf={d['sf']}")
    sys.exit(0)

qs = sorted(d["queries"].items())
cols = 2
rows = (len(qs) + cols - 1) // cols
print(f"| query | {label} | query | {label} |")
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
