#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Runs every oracle_sql.json query in DuckDB over the sfDir parquet tables and
compares it to the Spark parquet dump under <verifyOutDir>/<name>/, the same
way the driver does (columns sorted by name, values compared exactly).
"""
import glob
import json
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df


def main(sfdir: str, outdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            duck = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        spark = pq.ParquetDataset(files).read().to_pandas()
        s, d = norm(spark), norm(duck)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            n_bad += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            n_bad += 1
            continue
        bad_cols = []
        dtype_cols = []
        for c in s.columns:
            a, b = s[c].to_numpy(), d[c].to_numpy()
            # The driver's hash is dtype-sensitive: an oracle whose column
            # comes back e.g. HUGEINT (DuckDB promotes SUM(BIGINT)) fails
            # the driver even when every value matches (q185, round 11).
            # astype() would silently mask exactly that, so flag it FIRST.
            if a.dtype != b.dtype and not (a.dtype.kind == b.dtype.kind == "f"):
                dtype_cols.append(f"{c} (spark={a.dtype} duck={b.dtype})")
            try:
                b = b.astype(a.dtype)
            except Exception:
                pass
            if a.dtype.kind == "f":
                eq = np.array_equal(a, b, equal_nan=True)
                if not eq:
                    with np.errstate(invalid="ignore"):
                        mx = np.nanmax(np.abs(a - b.astype(float)))
                    bad_cols.append(f"{c} (maxdiff={mx:.3e})")
            else:
                same = pd.Series(a).fillna("\0NULL") .eq(pd.Series(b).fillna("\0NULL")) \
                    if a.dtype == object else np.array_equal(a, b)
                if isinstance(same, pd.Series):
                    same = bool(same.all())
                if not same:
                    bad_cols.append(c)
        if dtype_cols:
            print(f"FAIL {name}: DTYPE mismatch (driver hash would differ "
                  f"even on equal values) in {dtype_cols}")
            n_bad += 1
            continue
        if bad_cols:
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            idx = None
            for c in [c.split(" ")[0] for c in bad_cols][:1]:
                a, b = s[c], d[c]
                neq = ~(a.eq(b) | (a.isna() & b.isna()))
                idx = neq[neq].index[:3]
                for i in idx:
                    print(f"   row {i}: spark={a[i]!r} duck={b[i]!r}")
            n_bad += 1
        else:
            print(f"OK   {name}: {len(s)} rows, {len(s.columns)} cols")
    print(f"\n{len(oracle) - n_bad}/{len(oracle)} queries match")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
