#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query output parquet, runs the oracle SQL in DuckDB over the
same sf tables and compares (columns sorted by name, rows sorted by all
columns, exact value match).
"""
import json, sys, glob, os, time
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

def fresh_con():
    # fresh connection per query: a big-corpus oracle that OOMs must
    # not poison the remaining keys (one 100x run lost 80 keys to a
    # single bad allocation); bounded memory + an explicit spill dir
    # keep DuckDB from fighting concurrent JVMs for the whole box
    c = duckdb.connect()
    c.sql(f"SET memory_limit='{os.environ.get('CHECK_MEM', '48GB')}'")
    os.makedirs("/tmp/duck_spill", exist_ok=True)
    c.sql("SET temp_directory='/tmp/duck_spill'")
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        # driver testdata is single-file parquet; Spark-written corpora
        # (ScaleData's /tmp/scale10 etc.) are directories of part files
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        c.sql(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")
    return c

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
# optional key subset: tools/check.py <sf> <out> q1,q2
if len(sys.argv) > 3:
    only = set(sys.argv[3].split(","))
    oracle = {k: v for k, v in oracle.items() if k in only}
BIG_ROWS = int(os.environ.get("CHECK_BIG_ROWS", "5000000"))

def big_compare(con, q, sql, n_got):
    """Set-exact compare inside DuckDB for outputs too large for pandas:
    row counts equal + EXCEPT ALL empty in both directions (duplicates
    counted), dtypes checked on a 1000-row sample. Same strictness as
    the frame path, constant client memory."""
    got_rel = f"SELECT * FROM '{out_dir}/{q}/*.parquet'"
    n_want = con.sql(f"SELECT count(*) FROM ({sql}) t").fetchone()[0]
    if n_got != n_want:
        return f"rows {n_got} != {n_want}"
    gs = con.sql(f"SELECT * FROM ({got_rel}) t LIMIT 1000").df()
    ws = con.sql(f"SELECT * FROM ({sql}) t LIMIT 1000").df()
    gd = sorted((c, str(gs[c].dtype)) for c in gs.columns)
    wd = sorted((c, str(ws[c].dtype)) for c in ws.columns)
    if gd != wd:
        return f"schema {gd} != {wd}"
    cols = ", ".join(f'"{c}"' for c in sorted(gs.columns))
    for a, b, tag in ((got_rel, sql, "got-want"), (sql, got_rel, "want-got")):
        extra = con.sql(
            f"SELECT count(*) FROM (SELECT {cols} FROM ({a}) x "
            f"EXCEPT ALL SELECT {cols} FROM ({b}) y) t").fetchone()[0]
        if extra:
            return f"{extra} rows only in {tag.split('-')[0]} side ({tag})"
    return None

fails = 0
for q, sql in sorted(oracle.items()):
    t0 = time.time()
    con = None
    try:
        con = fresh_con()
        n_got = con.sql(
            f"SELECT count(*) FROM '{out_dir}/{q}/*.parquet'").fetchone()[0]
        if n_got > BIG_ROWS:
            err = big_compare(con, q, sql, n_got)
            if err:
                print(f"FAIL {q}: {err}", flush=True)
                fails += 1
            else:
                print(f"ok   {q} ({n_got} rows, {time.time() - t0:.1f}s, set-exact)",
                      flush=True)
            continue
        got = con.sql(f"SELECT * FROM '{out_dir}/{q}/*.parquet'").df()
        want = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {q}: exec error: {e}", flush=True)
        fails += 1
        continue
    finally:
        # close on EVERY path: a failed key's connection still holds up
        # to the memory limit, and leaking it aborts the whole run on
        # the next allocation
        if con is not None:
            con.close()
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    if list(got.columns) != list(want.columns):
        print(f"FAIL {q}: columns {list(got.columns)} != {list(want.columns)}", flush=True)
        fails += 1
        continue
    if len(got) != len(want):
        print(f"FAIL {q}: rows {len(got)} != {len(want)}", flush=True)
        fails += 1
        continue
    g = got.sort_values(by=list(got.columns), ignore_index=True)
    w = want.sort_values(by=list(want.columns), ignore_index=True)
    mismatch = []
    for c in g.columns:
        a, b = g[c], w[c]
        # The driver hashes typed values: int64 19835 vs float64 19835.0
        # hash-differ even though `==` passes (e.g. DuckDB HUGEINT ->
        # pandas float64). Flag any dtype drift as a hard failure.
        if str(a.dtype) != str(b.dtype):
            mismatch.append(f"{c}: dtype {a.dtype} != {b.dtype}")
            continue
        try:
            eq = (a == b) | (a.isna() & b.isna())
        except Exception:
            eq = a.astype(str) == b.astype(str)
        if not eq.all():
            i = (~eq).idxmax()
            mismatch.append(f"{c}[row{i}]: {a[i]!r} != {b[i]!r} (dtype {a.dtype}/{b.dtype})")
    if mismatch:
        print(f"FAIL {q}: " + "; ".join(mismatch[:3]), flush=True)
        fails += 1
    else:
        print(f"ok   {q} ({len(got)} rows, {time.time() - t0:.1f}s)", flush=True)
print(f"\n{len(oracle) - fails}/{len(oracle)} passed")
sys.exit(1 if fails else 0)
