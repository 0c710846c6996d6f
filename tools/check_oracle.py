#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: run each
SparkEntry.oracleSql statement in DuckDB against the testdata tables and
hash-compare with the Spark result parquet that graft.Verify dumped.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Dev-only tool (duckdb/pyarrow are driver-side packages, not library deps).
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    """Order-insensitive canonical form: sort columns by name, stringify,
    sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_fmt(r[i]) for i in order))
    out.sort()
    return out


def _fmt(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_fmt(x) for x in v) + "]"
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        # A SPARK_GRAFT_VERIFY_ONLY subset dump: absent result dirs are
        # "not run this pass", not failures.
        if not os.path.isdir(f"{out_dir}/{name}"):
            n_skip += 1
            continue
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [c.lower() for c in got_rel.columns]
            got = canon(got_rel.fetchall(), got_cols)
            want_rel = con.sql(sql)
            want_cols = [c.lower() for c in want_rel.columns]
            want = canon(want_rel.fetchall(), want_cols)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: columns spark={sorted(got_cols)} duckdb={sorted(want_cols)}")
            n_fail += 1
        elif got != want:
            diff_a = [r for r in got if r not in set(want)][:3]
            diff_b = [r for r in want if r not in set(got)][:3]
            print(f"FAIL {name}: {len(got)} vs {len(want)} rows; "
                  f"spark-only={diff_a} duckdb-only={diff_b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    skipped = f", {n_skip} not dumped" if n_skip else ""
    print(f"== {n_pass} pass, {n_fail} fail{skipped} ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
