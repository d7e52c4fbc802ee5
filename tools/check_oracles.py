#!/usr/bin/env python3
"""Dev-only harness mirror: run after `graft.Verify` to compare each query's
parquet dump against its DuckDB oracle on the same testdata. NOT part of the
shipped library (the Scala engine has no Python dependency) — this only
pre-validates oracle parity locally the way the driver will.

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: v.item() if hasattr(v, "item") else v)
            if df[c].map(lambda v: type(v).__name__ == "date").any():
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        g, x = normalize(got), normalize(exp)
        if list(g.columns) != list(x.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(x.columns)}")
            n_fail += 1
            continue
        if len(g) != len(x):
            print(f"FAIL {name}: rows {len(g)} vs {len(x)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(
                g.reset_index(drop=True), x.reset_index(drop=True),
                check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch: {str(e)[:400]}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
