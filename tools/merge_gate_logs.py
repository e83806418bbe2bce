#!/usr/bin/env python3
"""Merge one or more check.py logs into a CORRECTNESS-style JSON.

Usage: tools/merge_gate_logs.py out.json log1 [log2 ...]
Later logs override earlier ones (rerun-after-fix picks up the fix).
"""
import json, re, sys

rows = {}
for path in sys.argv[2:]:
    for line in open(path):
        m = re.match(r"ok\s+(\S+) \((\d+) rows(?:, ([\d.]+)s)?\)", line)
        if m:
            rows[m.group(1)] = {"pass": True, "rows": int(m.group(2)),
                                "oracle_sec": float(m.group(3)) if m.group(3) else None,
                                "err": None}
            continue
        m = re.match(r"FAIL (\S+): (.*)", line)
        if m:
            rows[m.group(1)] = {"pass": False, "rows": None,
                                "oracle_sec": None, "err": m.group(2)[:200]}
json.dump(dict(sorted(rows.items())), open(sys.argv[1], "w"), indent=1)
n_ok = sum(1 for r in rows.values() if r["pass"])
print(f"{n_ok}/{len(rows)} pass -> {sys.argv[1]}")
