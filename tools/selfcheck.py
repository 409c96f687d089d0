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

import duckdb
import numpy as np

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
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
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
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
