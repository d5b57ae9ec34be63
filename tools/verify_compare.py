#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables and compare (rows / schema / value-hash) against
the Spark parquet dumps graft.Verify wrote.

Usage: python3 tools/verify_compare.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, hashlib
import duckdb

sf, out = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{out}/oracle_sql.json"))
con = duckdb.connect()
for t in glob.glob(f"{sf}/*.parquet"):
    name = t.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

def canon(df):
    # driver-style: sort columns by name, round floats, stringify, hash rows
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for tup in df.itertuples(index=False):
        parts = []
        for v in tup:
            if isinstance(v, float):
                parts.append(f"{v:.6g}")
            else:
                parts.append(str(v))
        rows.append("|".join(parts))
    rows.sort()
    return cols, hashlib.md5("\n".join(rows).encode()).hexdigest(), len(rows)

fails = []
for name in sorted(oracle):
    sql = oracle[name]
    try:
        odf = con.execute(sql).df()
        sdf = duckdb.connect().execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
        oc, oh, on = canon(odf)
        sc, sh, sn = canon(sdf)
        ok = (oc == sc) and (oh == sh) and (on == sn)
        print(f"{name}: rows={sn}/{on} schema={'OK' if oc==sc else (sc,oc)} hash={'OK' if oh==sh else 'MISMATCH'}")
        if not ok:
            fails.append(name)
    except Exception as e:
        print(f"{name}: ERROR {e}")
        fails.append(name)
print("FAILS:", fails if fails else "none")
sys.exit(1 if fails else 0)
