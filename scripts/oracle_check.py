#!/usr/bin/env python3
"""Local dev replica of the driver's correctness gate: reads Verify's output
parquet + oracle_sql.json, runs each oracle in DuckDB over the same sf dir,
and compares (rows, schema-ish, values) with columns sorted by name.

Usage: oracle_check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, hashlib
import duckdb

sfdir = sys.argv[1]
outdir = sys.argv[2]
only = set(sys.argv[3:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for tup in df.itertuples(index=False):
        vals = []
        for v in tup:
            if isinstance(v, float):
                vals.append(f"{v:.10g}")
            else:
                vals.append(str(v))
        rows.append("\x01".join(vals))
    rows.sort()
    return cols, rows

fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        spark_df = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        duck_df = con.sql(sql).df()
        sc, sr = canon(spark_df)
        dc, dr = canon(duck_df)
        schema_ok = sc == dc
        rows_ok = len(sr) == len(dr)
        hash_ok = hashlib.sha256("\n".join(sr).encode()).hexdigest() == \
                  hashlib.sha256("\n".join(dr).encode()).hexdigest()
        status = "PASS" if (schema_ok and rows_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            fails += 1
            print(f"{status} {name}: schema={schema_ok} ({sc} vs {dc}) "
                  f"rows={len(sr)}/{len(dr)} hash={hash_ok}")
            if rows_ok and not hash_ok:
                diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
                for a, b in diff:
                    print(f"  spark: {a}\n  duck : {b}")
        else:
            print(f"{status} {name} ({len(sr)} rows)")
    except Exception as e:
        fails += 1
        print(f"ERR  {name}: {str(e)[:300]}")
sys.exit(1 if fails else 0)
