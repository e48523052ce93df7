#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every queries() entry in
Spark AND its oracle_sql() twin in DuckDB on the same parquet tables, compare
row count, column names, and order-insensitive values.

Usage: python tests/run_oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry_mod  # noqa: E402
from email_address_parser_spark.session import build_session  # noqa: E402
from email_address_parser_spark.sources.testdata import TABLES  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for col in df.columns:
        if df[col].dtype == object:
            continue
        if str(df[col].dtype).startswith("float"):
            df[col] = df[col].round(9)
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = build_session(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(got)} (rows-only, no oracle) {time.time()-t0:.1f}s")
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {exc}")
            continue

        problems = []
        if len(got) != len(want):
            problems.append(f"rows spark={len(got)} duckdb={len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols spark={sorted(got.columns)} duckdb={sorted(want.columns)}")
        if not problems:
            g, w = normalize(got), normalize(want)
            try:
                pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
            except AssertionError as exc:
                diff_mask = None
                problems.append(f"values differ: {str(exc).splitlines()[-1][:200]}")
                for col in g.columns:
                    if not g[col].equals(w[col]):
                        neq = (g[col].astype(str) != w[col].astype(str))
                        problems.append(
                            f"  col {col}: {int(neq.sum())} diffs; sample spark={g[col][neq].head(3).tolist()} duckdb={w[col][neq].head(3).tolist()}"
                        )
        if problems:
            failures.append(name)
            print(f"FAIL {name} ({time.time()-t0:.1f}s):")
            for p in problems:
                print(f"   {p}")
        else:
            print(f"ok   {name}: rows={len(got)} match {time.time()-t0:.1f}s")

    spark.stop()
    print("RESULT:", "FAIL " + ",".join(failures) if failures else "ALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
