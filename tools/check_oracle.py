#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run graft.Verify first, then
this script re-runs each oracle_sql.json entry in DuckDB over the same
parquet tables and compares values column-name-sorted, row-sorted.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical value forms: decimals -> str, timestamps -> iso str
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failed = []
    import glob
    import os
    # queries the Verify run attempted: anything attempted but missing a
    # dump crashed (or wrote an empty result) and must FAIL, while
    # queries filtered out of the run are skipped. Older dumps without
    # attempted.json are treated as full runs (everything attempted).
    attempted_path = f"{out_dir}/attempted.json"
    if os.path.exists(attempted_path):
        with open(attempted_path) as f:
            attempted = set(json.load(f))
    else:
        attempted = set(oracles)
    skipped = 0
    for name, sql in sorted(oracles.items()):
        try:
            if not glob.glob(f"{out_dir}/{name}/*.parquet"):
                if name in attempted:
                    failed.append((name, "attempted but no parquet dump "
                                   "(query crashed or wrote empty output)"))
                else:
                    skipped += 1  # filtered out of this Verify run
                continue
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
            g, w = normalize(got), normalize(want)
            if list(g.columns) != list(w.columns):
                failed.append((name, f"cols: spark={list(g.columns)} duck={list(w.columns)}"))
                continue
            if len(g) != len(w):
                failed.append((name, f"rows: spark={len(g)} duck={len(w)}"))
                continue
            dt = [(c, str(g[c].dtype), str(w[c].dtype)) for c in g.columns
                  if str(g[c].dtype) != str(w[c].dtype)]
            if dt:
                # align numeric dtype-only differences (e.g. int32 vs int64)
                # so equals() below reflects VALUE differences only; report
                # when alignment is impossible.
                hard = []
                for c, gd, wd in dt:
                    try:
                        common = pd.api.types.pandas_dtype(
                            "float64" if ("float" in gd or "float" in wd) else "int64")
                        g[c] = g[c].astype(common)
                        w[c] = w[c].astype(common)
                    except (TypeError, ValueError):
                        hard.append((c, gd, wd))
                if hard:
                    failed.append((name, f"dtype mismatch: {hard}"))
                    continue
            if not g.equals(w):
                neq = (g != w) & ~(g.isna() & w.isna())
                bad_cols = [c for c in g.columns if neq[c].any()]
                idx = neq.any(axis=1)
                sample = pd.concat(
                    [g[idx].head(3).add_suffix("_spark"),
                     w[idx].head(3).add_suffix("_duck")], axis=1)
                failed.append((name, f"values differ in {bad_cols}\n{sample}"))
                continue
            print(f"  OK   {name} ({len(g)} rows)")
        except Exception as e:  # noqa: BLE001
            failed.append((name, f"error: {e}"))
    for name, why in failed:
        print(f"  FAIL {name}: {why}")
    checked = len(oracles) - skipped
    print(f"{checked - len(failed)}/{checked} queries match"
          + (f" ({skipped} not dumped, skipped)" if skipped else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
