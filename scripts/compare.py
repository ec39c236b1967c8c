#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/compare.py <sfDir> <outDir>

For every <outDir>/<name> parquet dir produced by graft.Verify, runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB (with each
<sfDir>/<table>.parquet registered as a view named <table>) and compares
row count, column names/types, and exact values (doubles bit-exact).
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    for name in names:
        try:
            spark_rel = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = [(c[0], str(c[1])) for c in spark_rel.description]
            spark_rows = spark_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(spark_rows)})")
            continue
        try:
            orel = con.execute(oracle[name])
            ocols = [(c[0], str(c[1])) for c in orel.description]
            orows = orel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        # driver sorts columns by name before hashing
        sidx = [i for _, i in sorted((c[0], i) for i, c in enumerate(spark_cols))]
        oidx = [i for _, i in sorted((c[0], i) for i, c in enumerate(ocols))]
        scols_sorted = [spark_cols[i] for i in sidx]
        ocols_sorted = [ocols[i] for i in oidx]
        problems = []
        if [c[0] for c in scols_sorted] != [c[0] for c in ocols_sorted]:
            problems.append(
                f"column names differ: {scols_sorted} vs {ocols_sorted}")
        elif [c[1] for c in scols_sorted] != [c[1] for c in ocols_sorted]:
            problems.append(
                f"column types differ: {scols_sorted} vs {ocols_sorted}")
        if len(spark_rows) != len(orows):
            problems.append(f"row count {len(spark_rows)} vs {len(orows)}")
        if not problems:
            for rn, (sr, orr) in enumerate(zip(spark_rows, orows)):
                sv = [sr[i] for i in sidx]
                ov = [orr[i] for i in oidx]
                if sv != ov:
                    problems.append(f"row {rn} differs:\n  spark:  {sv}\n  oracle: {ov}")
                    if len(problems) >= 3:
                        break
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({len(spark_rows)} rows):")
            for p in problems:
                print(f"  {p}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(spark_rows)} rows)")
    missing = sorted(set(oracle) - set(names))
    for m in missing:
        print(f"FAIL {m}: oracle declared but no spark output")
        n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
