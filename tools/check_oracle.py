#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run each oracle SQL
in DuckDB against the sf tables, compare to the Spark parquet dumps
(columns sorted by name, values compared exactly)."""
import sys, glob, math
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = f.split("/")[-1].removesuffix(".parquet")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

import json
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v

fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchall()
        exp_cols = [d[0] for d in con.description]
        got_rel = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        got = got_rel.fetchall()
        got_cols = [d[0] for d in con.description]
        # driver sorts columns by name before hashing
        ei = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        if sorted(exp_cols) != sorted(got_cols):
            fails.append(name)
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            continue
        exp_n = [tuple(norm(r[i]) for i in ei) for r in exp]
        got_n = [tuple(norm(r[i]) for i in gi) for r in got]
        if exp_n == got_n:
            print(f"ok   {name}: {len(got)} rows")
        else:
            fails.append(name)
            print(f"FAIL {name}: rows spark={len(got)} duck={len(exp)}")
            for i, (a, b) in enumerate(zip(got_n, exp_n)):
                if a != b:
                    print(f"  first diff at row {i}:\n    spark={a}\n    duck ={b}")
                    break
            if len(got_n) != len(exp_n):
                print(f"  len diff; spark[0]={got_n[0] if got_n else None}")
    except Exception as e:
        fails.append(name)
        print(f"ERROR {name}: {str(e)[:300]}")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
