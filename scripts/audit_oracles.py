#!/usr/bin/env python3
"""Oracle robustness audit (dev tool, driver-side python env).

Runs every oracle SQL twice in DuckDB — threads=1 and threads=8 — and
reports (a) any query that ERRORS (e.g. sqrt of a float-negative
variance: raised only lane/vectorization-dependently, so it can pass
one run and kill the next) and (b) any query whose ROW ORDER differs
between runs (a non-total ORDER BY would flap the driver's hash
compare).

Usage: python3 scripts/audit_oracles.py <sfdir> <oracle_sql.json>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run(sf, sql, threads):
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={threads}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    out = {}
    for name, q in sql.items():
        try:
            out[name] = con.sql(q).df()
        except Exception as e:  # noqa: BLE001 - report, don't die
            out[name] = f"ERR {e}"
    return out


def main():
    sf, oracle_path = sys.argv[1], sys.argv[2]
    sql = json.load(open(oracle_path))
    a, b = run(sf, sql, 1), run(sf, sql, 8)
    bad = 0
    for name in sorted(sql):
        ra, rb = a[name], b[name]
        if isinstance(ra, str) or isinstance(rb, str):
            print(f"ERROR    {name}: {(ra if isinstance(ra, str) else rb)[:160]}")
            bad += 1
        elif not ra.equals(rb):
            print(f"UNSTABLE {name}: row order differs across thread counts")
            bad += 1
    print(f"{len(sql) - bad} ok, {bad} problematic of {len(sql)}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
