#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB correctness compare.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name>/ parquet (graft.Verify output), runs the
matching oracle SQL from oracle_sql.json in DuckDB against the sfDir tables,
sorts columns by name, and compares row multisets exactly.
"""
import sys, os, json
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = repr(v)
            vals.append(str(v))
        out.append("\x00".join(vals))
    return sorted(out)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        spark_rel = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        s_cols = spark_rel.columns
        s_rows = spark_rel.fetchall()
        if name not in oracle:
            print(f"[rows-only] {name}: {len(s_rows)} rows " +
                  ("OK" if len(s_rows) > 0 else "EMPTY!"))
            continue
        o_rel = con.sql(oracle[name])
        o_cols = o_rel.columns
        o_rows = o_rel.fetchall()
        if sorted(map(str.lower, s_cols)) != sorted(map(str.lower, o_cols)):
            print(f"[FAIL-schema] {name}: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
            n_fail += 1
            continue
        cs, co = canon(s_rows, [c.lower() for c in s_cols]), canon(o_rows, [c.lower() for c in o_cols])
        if cs == co:
            print(f"[PASS] {name}: {len(s_rows)} rows")
            n_pass += 1
        else:
            n_fail += 1
            print(f"[FAIL] {name}: spark {len(s_rows)} rows vs oracle {len(o_rows)} rows")
            sset, oset = set(cs), set(co)
            for x in list(sset - oset)[:3]:
                print(f"    spark-only: {x[:160]}")
            for x in list(oset - sset)[:3]:
                print(f"    oracle-only: {x[:160]}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
