#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <outDir>
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

For each query parquet in outDir, runs the matching oracle SQL from
oracle_sql.json in DuckDB (tables = parquet files in sfDir), canonicalizes
both sides (columns sorted by name, rows sorted by all columns), and
compares values.
"""
import json, sys, glob, os
import duckdb

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for qname in sorted(oracle):
        qdir = f"{out_dir}/{qname}"
        if not os.path.isdir(qdir):
            print(f"FAIL {qname}: no spark output dir"); n_fail += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM '{qdir}/*.parquet'").fetchdf()
            want = con.execute(oracle[qname]).fetchdf()
        except Exception as e:
            print(f"FAIL {qname}: {e}"); n_fail += 1; continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"FAIL {qname}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; continue
        gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        ws = want.sort_values(by=list(want.columns)).reset_index(drop=True)
        if len(gs) != len(ws):
            print(f"FAIL {qname}: rows {len(gs)} != {len(ws)}"); n_fail += 1; continue
        # dtype-tolerant value compare
        mismatch = None
        for c in gs.columns:
            a, b = gs[c], ws[c]
            try:
                import pandas as pd
                if a.dtype.kind in "fc" or b.dtype.kind in "fc":
                    import numpy as np
                    if not np.allclose(a.astype(float), b.astype(float),
                                       rtol=0, atol=0, equal_nan=True):
                        diff = (a.astype(float) - b.astype(float)).abs()
                        mismatch = (c, float(diff.max())); break
                else:
                    if not (a.astype(str) == b.astype(str)).all():
                        bad = (a.astype(str) != b.astype(str))
                        i = bad[bad].index[0]
                        mismatch = (c, f"row {i}: {a[i]!r} != {b[i]!r}"); break
            except Exception as e:
                mismatch = (c, f"compare error {e}"); break
        if mismatch:
            print(f"FAIL {qname}: col {mismatch[0]}: {mismatch[1]}"); n_fail += 1
        else:
            print(f"PASS {qname} ({len(gs)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
