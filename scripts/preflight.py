#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate (SURVEY §5.2).

Usage:
    python3 scripts/preflight.py [SF_DIR] [VERIFY_OUT_DIR]

Expects `graft.Verify` to have been run first:
    sbt "runMain graft.Verify <SF_DIR> <VERIFY_OUT_DIR>"

For every result dir <out>/<key>/ it loads the Spark parquet dump, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same SF's parquet
tables, and compares: row count, column-name set, dtypes, and exact cell
values (floats compared bit-exact — the engine's determinism contract is
bit-identity, not tolerance). Keys without oracle SQL get a rows-only check.

Exit code 0 iff every key passes.
"""
import glob
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def compare(key, sdf, odf):
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"rows spark={len(sdf)} oracle={len(odf)}")
        return problems
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        problems.append(f"cols spark={scols} oracle={ocols}")
        return problems
    for c in scols:
        a, b = sdf[c], odf[c]
        if str(a.dtype) != str(b.dtype):
            problems.append(f"dtype[{c}] spark={a.dtype} oracle={b.dtype}")
        av, bv = a.values, b.values
        if a.dtype.kind == "f" and b.dtype.kind == "f":
            eq = (av == bv) | (np.isnan(av.astype(float)) & np.isnan(bv.astype(float)))
            if not eq.all():
                i = int(np.argmin(eq))
                diff = np.nanmax(np.abs(av.astype(float) - bv.astype(float)))
                problems.append(
                    f"value[{c}] row {i}: spark={av[i]!r} oracle={bv[i]!r} "
                    f"(maxdiff={diff:.3e}, n={int((~eq).sum())})")
        else:
            eq = pd.Series(av).astype(object).where(pd.notna(av), None) \
                 == pd.Series(bv).astype(object).where(pd.notna(bv), None)
            both_null = pd.isna(pd.Series(av)) & pd.isna(pd.Series(bv))
            eq = eq | both_null
            if not eq.all():
                i = int(np.argmin(eq.values))
                problems.append(
                    f"value[{c}] row {i}: spark={av[i]!r} oracle={bv[i]!r} "
                    f"(n={int((~eq).sum())})")
    return problems


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    with open(os.path.join(out, "oracle_sql.json")) as f:
        oracle = json.load(f)
    keys = sorted(d for d in os.listdir(out)
                  if os.path.isdir(os.path.join(out, d)))
    n_pass = n_fail = 0
    for key in keys:
        files = sorted(glob.glob(os.path.join(out, key, "*.parquet")))
        if not files:
            print(f"FAIL {key:28s} no spark parquet output")
            n_fail += 1
            continue
        sdf = con.execute(
            "SELECT * FROM read_parquet(?)", [files]).df()
        if key not in oracle:
            ok = len(sdf) > 0
            print(f"{'pass' if ok else 'FAIL'} {key:28s} rows-only "
                  f"(no oracle) rows={len(sdf)}")
            n_pass += ok
            n_fail += (not ok)
            continue
        try:
            odf = con.execute(oracle[key]).df()
        except Exception as e:
            print(f"FAIL {key:28s} oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        problems = compare(key, sdf, odf)
        if len(sdf) == 0:
            problems.append("EMPTY result (hash-matches trivially; fix query)")
        if problems:
            print(f"FAIL {key:28s} " + "; ".join(problems[:4]))
            n_fail += 1
        else:
            print(f"pass {key:28s} rows={len(sdf)}")
            n_pass += 1
    missing = sorted(set(oracle) - set(keys))
    for key in missing:
        print(f"FAIL {key:28s} oracle declared but no Verify output")
        n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail (sf={sf})")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
