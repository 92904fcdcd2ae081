#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL from
Verify's oracle_sql.json in DuckDB over the sfDir parquet tables and compare
against the engine's parquet output (row count, sorted column names, and the
full value multiset, floats normalized to 6dp).

Usage: python3 scripts/compare_oracle.py <verifyOutDir> <sfDir> [queryName...]
"""
import json, sys, math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    import decimal
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return format(round(v, 6), ".6f")
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    sql_map = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        except Exception:
            pass
    n_ok = n_bad = 0
    for name in sorted(sql_map):
        if only and name not in only:
            continue
        sql = sql_map[name]
        try:
            cur = con.execute(sql)
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
            cur2 = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols = [d[0] for d in cur2.description]
            s_rows = cur2.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        oc, orows = norm_rows(o_cols, o_rows)
        sc, srows = norm_rows(s_cols, s_rows)
        if oc != sc:
            print(f"FAIL {name}: schema spark={sc} oracle={oc}")
            n_bad += 1
        elif len(orows) != len(srows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            n_bad += 1
        elif orows != srows:
            diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs {diffs}")
            n_bad += 1
        else:
            n_ok += 1
            print(f"ok   {name} ({len(srows)} rows)")
    print(f"== {n_ok} ok, {n_bad} failed ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
