#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle compare.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle_sql.json entry in DuckDB against views over <sfDir>/*.parquet,
sorts columns by name and rows by all columns, and compares values exactly.
This is builder-side tooling only — the shipped Scala code never touches it.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(values_equal(x, y) for x, y in zip(la, lb))
    if hasattr(a, "tolist"):
        a = a.tolist()
    if hasattr(b, "tolist"):
        b = b.tolist()
    if str(type(a)) != str(type(b)):
        # normalize numpy/python scalar mismatches via == (int64 vs int etc.)
        pass
    return a == b


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list:
    problems = []
    s, d = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(d.columns):
        problems.append(f"columns differ: spark={list(s.columns)} duck={list(d.columns)}")
        return problems
    # Dtype-kind-strict: the driver's hash compare distinguishes numeric KINDS
    # (round 1: DuckDB ceil()->DOUBLE vs Spark LONG, and sum(int)->HUGEINT vs
    # LONG both hash-failed while int32-vs-int64 columns hash-matched fine).
    # So: integer widths are interchangeable, but int vs float vs bool vs
    # object vs datetime is a real divergence.
    def kind(dtype) -> str:
        k = dtype.kind  # 'i'/'u' int, 'f' float, 'b' bool, 'M' datetime, 'O' object
        return {"u": "i"}.get(k, k)

    for col in s.columns:
        st, dt = str(s[col].dtype), str(d[col].dtype)
        if kind(s[col].dtype) != kind(d[col].dtype):
            problems.append(f"col {col}: dtype kind differs: spark={st} duck={dt}")
        elif st == "object" and len(s) and len(d):
            sv = next((x for x in s[col] if x is not None), None)
            dv = next((x for x in d[col] if x is not None), None)
            if sv is not None and dv is not None and type(sv).__name__ != type(dv).__name__:
                problems.append(
                    f"col {col}: object payload type differs: spark={type(sv).__name__} duck={type(dv).__name__}")
    if problems:
        return problems
    if len(s) != len(d):
        problems.append(f"row count differs: spark={len(s)} duck={len(d)}")
        return problems
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        bad = [(i, x, y) for i, (x, y) in enumerate(zip(sv, dv)) if not values_equal(x, y)]
        if bad:
            i, x, y = bad[0]
            problems.append(f"col {col}: {len(bad)} mismatches, first at row {i}: spark={x!r} duck={y!r}")
    return problems


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for qdir in sorted(Path(out_dir).iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        spark_df = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df()
        if name not in oracle:
            print(f"[rows-only] {name}: {len(spark_df)} rows")
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"[FAIL] {name}: oracle SQL error: {exc}")
            n_fail += 1
            continue
        problems = compare(name, spark_df, duck_df)
        if problems:
            n_fail += 1
            print(f"[FAIL] {name}:")
            for p in problems:
                print(f"       {p}")
        else:
            n_pass += 1
            print(f"[pass] {name}: {len(spark_df)} rows")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
