#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`, compares each query's parquet
against its oracle SQL executed in DuckDB over the same sf tables.

Usage: python3 tools/check_correctness.py <sfDir> <outDir>
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    # driver sorts columns by name before hashing values
    return df[sorted(df.columns)]


def cell(v):
    # driver-green rounds show integer-width mismatches (int32 vs int64)
    # passing while Decimal-vs-float scale mismatches fail => the driver
    # hashes canonical value strings, not physical dtypes
    if hasattr(v, "item"):
        v = v.item()
    if isinstance(v, float):
        return repr(v)  # full precision
    return str(v)


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_green = n_red = n_noorc = 0
    for name in names:
        parts = sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))
        if not parts:
            print(f"{name:28s} NO_SPARK_OUTPUT")
            n_red += 1
            continue
        spark_df = pd.concat([pd.read_parquet(p) for p in parts])
        if name not in oracle:
            print(f"{name:28s} no_oracle rows={len(spark_df)}")
            n_noorc += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"{name:28s} ORACLE_SQL_ERROR: {e}")
            n_red += 1
            continue
        s, d = canon(spark_df), canon(duck_df)
        problems = []
        if list(s.columns) != list(d.columns):
            problems.append(f"schema: spark={list(s.columns)} duck={list(d.columns)}")
        elif len(s) != len(d):
            problems.append(f"rows: spark={len(s)} duck={len(d)}")
        else:
            for c in s.columns:
                if str(s[c].dtype) != str(d[c].dtype):
                    print(f"{name:28s} note dtype[{c}]: "
                          f"spark={s[c].dtype} duck={d[c].dtype}")
            sv = s.map(cell).values.tolist()
            dv = d.map(cell).values.tolist()
            ndiff = sum(1 for a, b in zip(sv, dv) if a != b)
            if ndiff:
                problems.append(f"{ndiff} differing rows")
                for a, b in list(zip(sv, dv)):
                    if a != b:
                        problems.append(f"  spark={a}\n  duck ={b}")
                        break
        if problems:
            print(f"{name:28s} RED  " + "; ".join(problems[:4]))
            n_red += 1
        else:
            print(f"{name:28s} green rows={len(s)}")
            n_green += 1
    print(f"\n{n_green} green, {n_red} red, {n_noorc} no_oracle")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
