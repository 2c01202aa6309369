#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle SQL and compare values column-name-sorted.
Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return v


def rows_key(df):
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in r) for r in df[cols].itertuples(index=False, name=None)]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, rows


def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.sql(f"SELECT * FROM parquet_scan('{out}/{name}/*.parquet')").df()
            if list(got.columns) == ["graft_error"]:
                # Verify's failure sentinel: the query crashed at dump time
                msg = got["graft_error"].iloc[0] if len(got) else "?"
                print(f"FAIL {name}: query failed in Verify: {str(msg)[:200]}")
                n_fail += 1
                continue
            exp = con.sql(sql).df()
            gc, gr = rows_key(got)
            ec, er = rows_key(exp)
            if gc != ec:
                print(f"FAIL {name}: columns spark={gc} duck={ec}")
                n_fail += 1
            elif gr != er:
                diff = [i for i, (a, b) in enumerate(zip(gr, er)) if a != b]
                print(f"FAIL {name}: rows spark={len(gr)} duck={len(er)}, "
                      f"first diffs at {diff[:3]}")
                for i in diff[:3]:
                    print(f"  spark: {gr[i]}\n  duck : {er[i]}")
                if len(gr) != len(er):
                    print(f"  spark[0]={gr[0] if gr else None}\n  duck [0]={er[0] if er else None}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(gr)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {str(e)[:300]}")
            n_fail += 1
    # rows-only bound certification (written by Verify's BoundChecks):
    # the 7 approximate queries carry an error/recall bound against their
    # exact twin instead of a hash — surface it next to the hash results
    # so a sweep is only green when the bounds held too.
    try:
        bounds = json.load(open(f"{out}/bounds.json"))
    except FileNotFoundError:
        bounds = {}
    for name, b in sorted(bounds.items()):
        if only and name not in only:
            continue
        status = "PASS" if b.get("bound_ok") else "FAIL"
        print(f"{status} {name} [bound] {b.get('metric')}="
              f"{b.get('value')} vs {b.get('bound')}")
        if b.get("bound_ok"):
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
