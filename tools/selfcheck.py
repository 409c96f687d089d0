#!/usr/bin/env python3
"""Dev-only self-check (mirrors the driver's DuckDB oracle compare).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify, re-runs the oracle SQL in DuckDB
against the same parquet tables and compares the sorted result sets
exactly (column names sorted, rows sorted, values exact — floats must
be bit-identical, which the Det discipline guarantees).

NOT part of the shipped library; uses driver-side python/duckdb only.
"""
import json
import math
import sys
import time

import duckdb
import numpy as np

# An oracle that holds DuckDB for longer than this is a build failure:
# the driver's correctness compare has a finite budget, and one
# pathological oracle zeroes the whole round's scorecard (round 15:
# q_logreg's 24-round CTE chain re-inlined its regexp feature CTE and
# took >=14 min, producing an empty CORRECTNESS_r15.json).
ORACLE_BUDGET_SEC = 60.0

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(norm(x) for x in v)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    t_start = time.time()
    slow = []
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
            t0 = time.time()
            want = con.execute(sql).fetchdf()
            dt_oracle = time.time() - t0
            if dt_oracle > ORACLE_BUDGET_SEC:
                slow.append((name, dt_oracle))
                print(f"SLOW {name}: oracle took {dt_oracle:.1f}s "
                      f"(budget {ORACLE_BUDGET_SEC:.0f}s)")
            gc, wc = sorted(got.columns), sorted(want.columns)
            if gc != wc:
                print(f"FAIL {name}: columns {gc} != {wc}")
                n_fail += 1
                continue
            dt = [(c, str(got[c].dtype), str(want[c].dtype)) for c in gc
                  if str(got[c].dtype) != str(want[c].dtype)]
            if dt:
                print(f"FAIL {name}: dtype mismatch {dt}")
                n_fail += 1
                continue
            # The driver's comparator sorts with pandas, which cannot
            # hash array cells (TypeError: unhashable numpy.ndarray) —
            # so array-typed output columns are a hard failure here too.
            # check every row, not just the first: a leading NULL would
            # otherwise let an array column slip past this guard
            arr_cols = [c for c in gc if len(got) and got[c].map(
                lambda v: isinstance(v, (list, np.ndarray))).any()]
            if arr_cols:
                print(f"FAIL {name}: array-typed output columns {arr_cols} "
                      "(driver comparator cannot sort them)")
                n_fail += 1
                continue
            g = sorted((tuple(norm(v) for v in row)
                        for row in got[gc].itertuples(index=False, name=None)),
                       key=repr)
            w = sorted((tuple(norm(v) for v in row)
                        for row in want[wc].itertuples(index=False, name=None)),
                       key=repr)
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
                n_fail += 1
                continue
            bad = [(a, b) for a, b in zip(g, w) if a != b]
            if bad:
                print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ; first: "
                      f"\n  spark={bad[0][0]}\n  duck ={bad[0][1]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(g)} rows)")
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    wall = time.time() - t_start
    print(f"== {n_pass} pass, {n_fail} fail, wall {wall:.1f}s ==")
    if slow:
        print(f"== BUILD FAILURE: {len(slow)} oracle(s) over "
              f"{ORACLE_BUDGET_SEC:.0f}s budget: "
              + ", ".join(f"{n} {t:.1f}s" for n, t in slow) + " ==")
    return 1 if (n_fail or slow) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
