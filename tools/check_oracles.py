#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and (column-name-sorted, row-sorted) values EXACTLY. Stricter
than any plausible value-hash: if this passes, a hash comparison passes.

Usage: python tools/check_oracles.py [--sf DIR] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype("int64")
        elif s.dtype == object:
            df[c] = s.map(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else (
                    tuple(v) if isinstance(v, (list, tuple)) else v
                )
            )
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        errs.append(f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return errs
    if len(spark_pdf) != len(duck_pdf):
        errs.append(f"row count differs: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) != len(b):
        return errs
    for c in a.columns:
        ca, cb = a[c], b[c]
        if pd.api.types.is_float_dtype(ca) or pd.api.types.is_float_dtype(cb):
            ca = ca.astype(float)
            cb = cb.astype(float)
            neq = ~((ca == cb) | (ca.isna() & cb.isna()))
            if neq.any():
                idx = neq.idxmax()
                maxdiff = (ca - cb).abs().max()
                errs.append(
                    f"float col {c!r}: {int(neq.sum())} mismatches, max|Δ|={maxdiff:.3e}, "
                    f"first at row {idx}: spark={ca[idx]!r} duck={cb[idx]!r}"
                )
        else:
            eq = (ca == cb) | (ca.isna() & cb.isna())
            if not eq.all():
                idx = (~eq).idxmax()
                errs.append(
                    f"col {c!r}: {int((~eq).sum())} mismatches, first at row {idx}: "
                    f"spark={ca[idx]!r} duck={cb[idx]!r}"
                )
    return errs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from hbasewd_spark.session import get_spark
    import importlib
    entry_mod = importlib.import_module("__spark_entry__")

    spark = get_spark(app_name="check_oracles", cpus=args.cpus)
    con = duck_con(args.sf)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, args.sf).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark side raised: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_pdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb oracle raised: {e}")
            n_fail += 1
            continue
        errs = compare(name, spark_pdf, duck_pdf)
        if errs:
            n_fail += 1
            print(f"FAIL  {name} [{time.time()-t0:.1f}s]")
            for e in errs[:5]:
                print(f"      {e}")
        else:
            print(f"ok    {name}: {len(spark_pdf)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{len(qs)} queries, {n_fail} failed, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
