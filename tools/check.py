#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against SparkEntry.oracleSql in DuckDB and compare (columns sorted by
name, exact values). Usage: tools/check.py <sfDir> <verifyOutDir> [onlyCsv]

onlyCsv (optional): comma-separated query names — check just those (resume
a ×N-scale run past a crash without redoing the finished prefix).
"""
import json, sys, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
# ×N-scale oracles (fresh-corpus windows over millions of DISTINCT long
# strings) can exceed DuckDB's in-memory budget: give it a spill directory.
# Do NOT set preserve_insertion_order=false here — the SPARK DUMP is read
# with a bare SELECT (no ORDER BY; parquet row order IS the contract), and
# that flag scrambles it (measured: fetch_diff_reverse false-FAIL at ×100).
# memory_limit under RAM so ×100 oracles SPILL instead of racing the OS
# allocator to death — but not too low: the simhash oracle's 3.2B-row
# bit expansion needs ~80GB of working set even when spilling.
def fresh_con():
    # GRAFT_CHECK_MEMLIMIT: some xN oracles aggregate through operators
    # DuckDB cannot spill (ordered string_agg over 500k docs); a roomier
    # box can raise the cap per retry instead of editing this file.
    c = duckdb.connect(config={"temp_directory": "/tmp/duckdb_spill",
                               "memory_limit": os.environ.get(
                                   "GRAFT_CHECK_MEMLIMIT", "80GB")})
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        c.execute(f"CREATE VIEW {os.path.basename(f)[:-8]} AS "
                  f"SELECT * FROM read_parquet('{f}')")
    return c
con = fresh_con()

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
# re-exec bookkeeping: an OOM'd DuckDB poisons the whole process
# allocator (even connect() fails afterwards), so on oracle failure we
# replace this process with a fresh one covering the remaining cells;
# the running tally rides through the environment.
ok = int(os.environ.get("GRAFT_CHECK_OK", "0"))
fail = int(os.environ.get("GRAFT_CHECK_FAIL", "0"))
all_cells = [d for d in sorted(os.listdir(out_dir))
             if os.path.isdir(os.path.join(out_dir, d))
             and (only is None or d in only)]
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    if only is not None and name not in only:
        continue
    got = con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
    got = got[sorted(got.columns)]
    # Driver-stringification hazard: a DECIMAL column in the dump reaches
    # the driver's hasher as Decimal('900.10') (pyarrow) but the oracle's
    # as float64 900.1 (duckdb fetchdf) — values equal, strings not, hash
    # red while this duckdb-vs-duckdb compare stays green (rounds 2+3).
    import pyarrow.parquet as pq
    import glob as _g
    schema = pq.read_schema(sorted(_g.glob(f"{d}/*.parquet"))[0])
    dec_cols = [f.name for f in schema if "decimal" in str(f.type)]
    if dec_cols:
        fail += 1
        print(f"[FAIL] {name}: decimal-typed dump columns {dec_cols} — "
              f"stringify them (cast to string both sides) or the driver's "
              f"hash will diverge from this compare")
        continue
    if name not in oracle:
        print(f"[rows-only] {name}: rows={len(got)}")
        continue
    # one oracle blowing DuckDB's memory (ordered string_aggs over 50M+
    # tokens cannot spill) must not kill the whole gate: report and move
    # on — and reconnect, since an OOM'd connection is poisoned
    try:
        # ordered-result preservation is only needed for the SPARK DUMP
        # read (bare SELECT, parquet order = contract); the oracle has its
        # own ORDER BY, and letting DuckDB drop insertion order is what
        # allows giant aggregations to stream/spill instead of OOM
        con.execute("SET preserve_insertion_order=false")
        try:
            exp = con.sql(oracle[name]).df()
        finally:
            con.execute("SET preserve_insertion_order=true")
    except Exception as e:
        fail += 1
        print(f"[ERR]  {name}: oracle failed: {type(e).__name__}: {str(e).splitlines()[0][:160]}",
              flush=True)
        remaining = all_cells[all_cells.index(name) + 1:]
        if not remaining:
            print(f"\n{ok} ok, {fail} fail")
            sys.exit(1)
        os.environ["GRAFT_CHECK_OK"] = str(ok)
        os.environ["GRAFT_CHECK_FAIL"] = str(fail)
        os.execv(sys.executable,
                 [sys.executable, os.path.abspath(__file__), sf_dir, out_dir,
                  ",".join(remaining)])
    exp = exp[sorted(exp.columns)]
    status = []
    if list(got.columns) != list(exp.columns):
        status.append(f"cols {list(got.columns)} vs {list(exp.columns)}")
    elif len(got) != len(exp):
        status.append(f"rows {len(got)} vs {len(exp)}")
    else:
        import pandas as pd
        # exact compare (the driver hashes values); report first diff cell
        for c in got.columns:
            a, b = got[c], exp[c]
            if str(a.dtype) != str(b.dtype):
                status.append(f"dtype[{c}] {a.dtype} vs {b.dtype}")
            neq = ~((a == b) | (a.isna() & b.isna()))
            if neq.any():
                i = neq.idxmax()
                status.append(f"val[{c}] row{i}: {a[i]!r} vs {b[i]!r} ({int(neq.sum())} diffs)")
    if status:
        fail += 1
        print(f"[FAIL] {name}: " + "; ".join(status[:4]))
    else:
        ok += 1
        print(f"[ok]   {name}: {len(got)} rows")
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
