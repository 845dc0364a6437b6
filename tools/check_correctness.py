#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_correctness.py <verifyOutDir> <sfDir>

Loads each <outDir>/<query>/ parquet result, runs the matching SQL from
<outDir>/oracle_sql.json in DuckDB (views over <sfDir>/*.parquet), sorts
columns by name, and compares values exactly (rows compared in sorted
order). Exits nonzero on any mismatch.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for r in rows:
        out.append(tuple(round(v, 9) if isinstance(v, float) else v for v in r))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
            exp = con.execute(sql)
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"error: {e}"))
            print(f"[FAIL] {name}: {e}")
            continue
        if sorted(got_cols) != sorted(exp_cols):
            failures.append((name, f"schema: {sorted(got_cols)} vs {sorted(exp_cols)}"))
            print(f"[FAIL] {name}: column mismatch {sorted(got_cols)} vs {sorted(exp_cols)}")
            continue
        # align column order by sorted name
        gidx = [got_cols.index(c) for c in sorted(got_cols)]
        eidx = [exp_cols.index(c) for c in sorted(exp_cols)]
        g = canon([[r[i] for i in gidx] for r in got_rows])
        e = canon([[r[i] for i in eidx] for r in exp_rows])
        if len(g) != len(e):
            failures.append((name, f"rows: {len(g)} vs {len(e)}"))
            print(f"[FAIL] {name}: row count {len(g)} vs {len(e)}")
            continue
        bad = [(a, b) for a, b in zip(g, e) if a != b]
        if bad:
            failures.append((name, f"{len(bad)} differing rows, first: {bad[0]}"))
            print(f"[FAIL] {name}: {len(bad)} differing rows; first: got={bad[0][0]} exp={bad[0][1]}")
        else:
            print(f"[ ok ] {name}: {len(g)} rows match")
    extra = set(json.load(open(f"{out_dir}/oracle_sql.json"))) - set(oracle)
    if failures:
        print(f"\n{len(failures)} FAILURES")
        sys.exit(1)
    print("\nall queries match")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
