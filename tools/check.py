#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, load the engine's parquet output, and compare
(schema-name set, row count, sorted-row values).

Usage: python3 tools/check.py <sfdir> <verify_outdir>
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None) if getattr(df[c].dt, "tz", None) else df[c]
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


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
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    return a == b


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = normalize(con.sql(sql).df())
            got = normalize(pd.read_parquet(f"{outdir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            failures += 1
            continue
        if sorted(exp.columns) != sorted(got.columns):
            print(f"FAIL {name}: columns exp={sorted(exp.columns)} got={sorted(got.columns)}")
            failures += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            failures += 1
            continue
        mismatch = None
        for c in exp.columns:
            ev, gv = exp[c].tolist(), got[c].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                if not values_equal(a, b):
                    mismatch = (c, i, a, b)
                    break
            if mismatch:
                break
        if mismatch:
            c, i, a, b = mismatch
            print(f"FAIL {name}: value mismatch col={c} row={i} exp={a!r} got={b!r}")
            failures += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries pass")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
