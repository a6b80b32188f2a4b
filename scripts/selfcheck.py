#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only, not part of
the library): reads Verify's output dir, runs each oracle SQL in DuckDB over
the same parquet tables, and compares values (columns sorted by name, rows
sorted by all columns).

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>
(Run `sbt "runMain graft.Verify <sfDir> <outDir>"` first.)
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize cell values for stable comparison
    def norm(v):
        if isinstance(v, float):
            return f"{v!r}"
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return str(list(v))
        return str(v)
    out = df.apply(lambda c: c.map(norm))
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output at {spark_path}")
            n_fail += 1
            continue
        try:
            got = canon(con.execute(f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df())
            want = canon(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: schema  spark={list(got.columns)} oracle={list(want.columns)}")
            n_fail += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows  spark={len(got)} oracle={len(want)}")
            n_fail += 1
        elif not got.equals(want):
            diff = (got != want).any(axis=1)
            print(f"FAIL {name}: {int(diff.sum())} differing rows of {len(got)}")
            print("  spark:", got[diff].head(3).to_dict("records"))
            print("  oracle:", want[diff].head(3).to_dict("records"))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    # queries without oracle → rows-only info
    for name in sorted(os.listdir(out_dir)):
        if name not in oracles and os.path.isdir(f"{out_dir}/{name}"):
            n = con.execute(f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchone()[0]
            print(f"INFO {name}: no oracle, {n} rows")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
