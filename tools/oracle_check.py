#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB over the same
parquet tables, sorts columns by name and rows by all columns, and
compares values exactly. Mirrors (as closely as we can infer) the
driver's rows/schema/hash match.

Dev tool only — not part of the library build.
"""
import glob
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def kind(s: pd.Series) -> str:
    """Pre-coercion type bucket, mirroring the driver's typed value hash.

    DuckDB HUGEINT (uncast sum(BIGINT) etc.) arrives as float64/object,
    never int64 — so an int-vs-float kind mismatch here is exactly the
    class of failure the driver catches but value comparison would miss.
    """
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "other"


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize dtypes: ints -> int64, floats -> float64, rest -> object str
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]")
        else:
            out[c] = s.map(lambda v: str(v))
    df = pd.DataFrame(out)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    results = {}
    for path in sorted(glob.glob(os.path.join(outdir, "*"))):
        name = os.path.basename(path)
        if not os.path.isdir(path):
            continue
        spark = pd.read_parquet(path)
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(spark)} " + ("OK" if len(spark) > 0 else "EMPTY!")
            continue
        try:
            duck = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        s, d = canon(spark), canon(duck)
        if list(s.columns) != list(d.columns):
            results[name] = f"SCHEMA spark={list(s.columns)} duck={list(d.columns)}"
            continue
        # Type-strict gate (pre-coercion): fail when DuckDB's raw dtype
        # bucket differs from Spark's (e.g. HUGEINT-promoted sums
        # arriving as float64 where Spark wrote int64).
        tbad = []
        for c in s.columns:
            ks, kd = kind(spark[c]), kind(duck[c])
            if ks != kd:
                tbad.append(f"{c}: spark={ks}({spark[c].dtype}) duck={kd}({duck[c].dtype})")
        if tbad:
            results[name] = "TYPE " + "; ".join(tbad[:4])
            continue
        if len(s) != len(d):
            results[name] = f"ROWS spark={len(s)} duck={len(d)}"
            continue
        bad = []
        for c in s.columns:
            a, b = s[c].values, d[c].values
            if pd.api.types.is_float_dtype(s[c]):
                neq = ~((a == b) | (pd.isna(a) & pd.isna(b)))
            else:
                neq = ~((a == b) | (pd.isna(a) & pd.isna(b)))
            if neq.any():
                i = int(np.argmax(neq))
                bad.append(f"{c}[row {i}]: spark={a[i]!r} duck={b[i]!r} ({int(neq.sum())} diffs)")
        results[name] = "OK" if not bad else "VALUES " + "; ".join(bad[:3])
    width = max(len(k) for k in results) if results else 0
    n_ok = sum(1 for v in results.values() if v == "OK" or v.startswith("ROWS_ONLY rows") and v.endswith("OK"))
    for k in sorted(results):
        print(f"{k:<{width}}  {results[k]}")
    print(f"-- {n_ok}/{len(results)} green")
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
