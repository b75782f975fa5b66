#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 scripts/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name>/ parquet (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB over the parquet
tables in <sf_dir>, and compares row-sets exactly (columns sorted by name,
rows sorted by all columns). Exits nonzero on any mismatch.
"""
import json
import math
import os
import sys

import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            # floats compared BIT-EXACT: every query rounds identically on
            # both engines with matching fold order, so no tolerance is
            # needed — and the driver's hash compare gets none either
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            rr.append(repr(v))
        out.append(tuple(rr))
    out.sort()
    return [tuple(sorted(cols))] + out

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    failures, passed, rows_only = [], [], []
    result_dirs = sorted(d for d in os.listdir(out_dir)
                         if os.path.isdir(os.path.join(out_dir, d)))
    for name in result_dirs:
        got_rel = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        got_cols = [d[0] for d in got_rel.description]
        got = got_rel.fetchall()
        if name not in oracles:
            rows_only.append((name, len(got)))
            continue
        try:
            exp_rel = con.execute(oracles[name])
            exp_cols = [d[0] for d in exp_rel.description]
            exp = exp_rel.fetchall()
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        g, e_ = canon(got, got_cols), canon(exp, exp_cols)
        if g[0] != e_[0]:
            failures.append((name, f"schema mismatch: spark={g[0]} oracle={e_[0]}"))
        elif len(g) != len(e_):
            failures.append((name, f"row count: spark={len(g)-1} oracle={len(e_)-1}"))
        elif g != e_:
            diff = next(i for i in range(1, len(g)) if g[i] != e_[i])
            failures.append((name, f"value mismatch at sorted row {diff-1}:\n"
                             f"    spark : {g[diff]}\n    oracle: {e_[diff]}"))
        else:
            passed.append((name, len(got)))

    for name, n in passed:
        print(f"PASS  {name} ({n} rows)")
    for name, n in rows_only:
        status = "ROWS-ONLY" if n > 0 else "ROWS-ONLY-EMPTY(!)"
        print(f"{status}  {name} ({n} rows)")
    for name, msg in failures:
        print(f"FAIL  {name}: {msg}")
    missing = set(oracles) - set(result_dirs)
    for name in sorted(missing):
        print(f"MISSING RESULT  {name} (query crashed in Verify?)")
    print(f"\n{len(passed)} passed, {len(rows_only)} rows-only, "
          f"{len(failures)} failed, {len(missing)} missing")
    sys.exit(1 if (failures or missing) else 0)

if __name__ == "__main__":
    main()
