#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run DuckDB oracle SQL over
the same parquet tables and diff against the Spark outputs written by
`graft.Verify`. Columns are sorted by name before comparison (driver
behavior); rows are compared in order.

Usage: verify_local.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols = spark_rel.description
            spark_rows = spark_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_bad += 1
            continue
        try:
            o_rel = con.execute(sql)
            o_cols = o_rel.description
            oracle_rows = o_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        s_names = [c[0] for c in s_cols]
        o_names = [c[0] for c in o_cols]
        if sorted(s_names) != sorted(o_names):
            print(f"FAIL {name}: columns spark={sorted(s_names)} "
                  f"oracle={sorted(o_names)}")
            n_bad += 1
            continue
        s_idx = [s_names.index(c) for c in sorted(s_names)]
        o_idx = [o_names.index(c) for c in sorted(o_names)]
        s_sorted = [tuple(norm(r[i]) for i in s_idx) for r in spark_rows]
        o_sorted = [tuple(norm(r[i]) for i in o_idx) for r in oracle_rows]
        if len(s_sorted) != len(o_sorted):
            print(f"FAIL {name}: rows spark={len(s_sorted)} "
                  f"oracle={len(o_sorted)}")
            n_bad += 1
            continue
        diffs = [(i, a, b) for i, (a, b) in
                 enumerate(zip(s_sorted, o_sorted)) if a != b]
        if diffs:
            i, a, b = diffs[0]
            print(f"FAIL {name}: {len(diffs)}/{len(s_sorted)} rows differ; "
                  f"first at {i}:\n  spark : {a}\n  oracle: {b}")
            print(f"  (cols sorted: {sorted(s_names)})")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(s_sorted)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
