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
        exp_rel = con.execute(sql)
        exp_arrow = exp_rel.fetch_arrow_table()
        exp = [tuple(r.values()) for r in exp_arrow.to_pylist()]
        exp_cols = exp_arrow.column_names
        exp_types = {c: str(exp_arrow.schema.field(c).type) for c in exp_cols}
        got_rel = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        got_arrow = got_rel.fetch_arrow_table()
        got = [tuple(r.values()) for r in got_arrow.to_pylist()]
        got_cols = got_arrow.column_names
        got_types = {c: str(got_arrow.schema.field(c).type) for c in got_cols}
        # the driver hashes TYPED Arrow values: a DuckDB HUGEINT
        # (decimal128) vs Spark BIGINT diverges even on equal values.
        # Only flag decimal-vs-nondecimal — the one class that has
        # actually burned us (q_embed_stats r7, q_word_drift r8).
        type_mismatch = [
            c for c in exp_cols
            if c in got_types
            and exp_types[c].startswith("decimal") != got_types[c].startswith("decimal")
        ]
        if type_mismatch:
            fails.append(name)
            print(f"FAIL {name}: TYPE mismatch "
                  + ", ".join(f"{c}: duck={exp_types[c]} spark={got_types[c]}"
                              for c in type_mismatch))
            continue
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
