#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same
parquet tables, sorts columns by name, and compares row counts, schemas
and values. Exit 0 iff everything matches.
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracle.items()):
        try:
            got = norm(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            failures.append((name, f"spark result unreadable: {e}"))
            continue
        try:
            exp = norm(con.execute(sql).fetchdf())
        except Exception as e:
            failures.append((name, f"oracle sql failed: {e}"))
            continue
        if list(got.columns) != list(exp.columns):
            failures.append(
                (name, f"columns differ: spark={list(got.columns)} oracle={list(exp.columns)}"))
            continue
        if len(got) != len(exp):
            failures.append((name, f"rowcount differ: spark={len(got)} oracle={len(exp)}"))
            continue
        bad = None
        for c in got.columns:
            g, e = got[c], exp[c]
            if pd.api.types.is_float_dtype(g):
                eq = (g.isna() & e.isna()) | (g == e)
            elif g.dtype == object:
                eq = (g.isna() & e.isna()) | (g.astype(str) == e.astype(str))
            else:
                eq = (g.isna() & e.isna()) | (g == e)
            if not bool(eq.all()):
                i = int(np.argmin(eq.values))
                bad = f"col {c} row {i}: spark={g.iloc[i]!r} oracle={e.iloc[i]!r}"
                break
        if bad:
            failures.append((name, bad))
        else:
            print(f"  OK   {name} ({len(got)} rows)")
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    print(f"{len(oracle) - len(failures)}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
