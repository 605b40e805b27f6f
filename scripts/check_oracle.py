#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Dev tool only (driver-side python env) — runs Verify's parquet dumps
against the oracle SQL in DuckDB and compares strictly:
columns sorted by name, exact value equality (with a float report so
near-misses are visible while iterating).

Usage: python3 scripts/check_oracle.py <sfdir> <outdir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.reset_index(drop=True)
    import datetime
    for col in df.columns:
        if df[col].dtype == object:
            vals = df[col].dropna()
            if len(vals) and all(isinstance(v, datetime.date) and not isinstance(v, datetime.datetime) for v in vals.head(20)):
                df[col] = pd.to_datetime(df[col])
    return df


def cell_eq(a, b):
    if a is None and b is None:
        return True
    fa, fb = isinstance(a, float), isinstance(b, float)
    if fa and np.isnan(a):
        return fb and np.isnan(b)
    if isinstance(a, (list, np.ndarray)) or isinstance(b, (list, np.ndarray)):
        a = list(a) if a is not None else None
        b = list(b) if b is not None else None
        if a is None or b is None or len(a) != len(b):
            return False
        return all(cell_eq(x, y) for x, y in zip(a, b))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    return a == b


def compare(name, spark_df, duck_df):
    s, d = canon(spark_df), canon(duck_df)
    problems = []
    if list(s.columns) != list(d.columns):
        problems.append(f"columns differ: spark={list(s.columns)} duck={list(d.columns)}")
        return problems
    if len(s) != len(d):
        problems.append(f"row count differs: spark={len(s)} duck={len(d)}")
        return problems
    for col in s.columns:
        sv, dv = s[col].to_numpy(), d[col].to_numpy()
        if np.issubdtype(s[col].dtype, np.floating) and np.issubdtype(d[col].dtype, np.floating):
            both_nan = np.isnan(sv.astype(float)) & np.isnan(dv.astype(float))
            exact = np.sum((sv == dv) | both_nan)
            if exact != len(sv):
                diff = np.abs(sv.astype(float) - dv.astype(float))
                diff = diff[~np.isnan(diff)]
                problems.append(
                    f"col {col}: {len(sv)-exact}/{len(sv)} float cells differ "
                    f"(max abs diff {np.max(diff) if len(diff) else 'nan'})")
        else:
            bad = [i for i in range(len(sv)) if not cell_eq(sv[i], dv[i])]
            if bad:
                i = bad[0]
                problems.append(
                    f"col {col}: {len(bad)}/{len(sv)} cells differ; first at row {i}: "
                    f"spark={sv[i]!r} duck={dv[i]!r}")
    # dtype report (informational — the driver hashes values, but big dtype
    # gaps like int32 vs int64 are worth seeing)
    for col in s.columns:
        if s[col].dtype != d[col].dtype:
            problems.append(f"[dtype] {col}: spark={s[col].dtype} duck={d[col].dtype}")
    return problems


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for tname in TABLES:
        # driver dirs hold single files; graft.DataGen dirs hold a
        # part-file directory per table — glob in that case. Partial
        # fixtures (e.g. the documents-only mid-scale resolve tiling)
        # just skip the absent tables.
        p = f"{sfdir}/{tname}.parquet"
        if not os.path.exists(p):
            print(f"  (no {tname}.parquet in {sfdir} — view skipped)")
            continue
        src = f"read_parquet('{p}/*.parquet')" if os.path.isdir(p) else f"'{p}'"
        sel = "*"
        if tname == "events":
            cols = dict((r[0], r[1]) for r in
                        con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall())
            if cols.get("ts") == "BIGINT":
                # DataGen round-trips TIMESTAMP(NANOS) as int64 nanos;
                # same ns→µs truncation Tables.load / DuckDB apply
                sel = "* REPLACE (make_timestamp(ts // 1000) AS ts)"
        con.execute(f"CREATE VIEW {tname} AS SELECT {sel} FROM {src}")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    result_dirs = {os.path.basename(p): p for p in glob.glob(os.path.join(outdir, "*")) if os.path.isdir(p)}
    n_pass = n_fail = n_vacuous = 0
    for qname in sorted(result_dirs):
        if qname not in oracle:
            n = len(pd.read_parquet(result_dirs[qname]))
            print(f"  (rows-only) {qname}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
            continue
        spark_df = pd.read_parquet(result_dirs[qname])
        try:
            duck_df = con.execute(oracle[qname]).fetchdf()
        except Exception as e:
            print(f"FAIL {qname}: oracle SQL error: {e}")
            n_fail += 1
            continue
        problems = compare(qname, spark_df, duck_df)
        hard = [p for p in problems if not p.startswith("[dtype]")]
        if hard:
            print(f"FAIL {qname}:")
            for p in problems:
                print(f"    {p}")
            n_fail += 1
        else:
            note = "" if not problems else f"  ({'; '.join(problems)})"
            # VERDICT r13 #7: a 0 ≡ 0 agreement proves nothing about the
            # kernel (dd_cluster_density passed vacuously for a full
            # round) — keep the pass a pass, but mark it loudly so an
            # un-adjudicated empty-result query can't hide in the green.
            if len(spark_df) == 0 and len(duck_df) == 0:
                print(f"PASS {qname} (0 rows) [VACUOUS: both engines "
                      f"empty — kernel unexercised]{note}")
                n_vacuous += 1
            else:
                print(f"PASS {qname} ({len(spark_df)} rows){note}")
            n_pass += 1
    errs_path = os.path.join(outdir, "errors.json")
    errs = json.load(open(errs_path)) if os.path.exists(errs_path) else {}
    for qname, msg in sorted(errs.items()):
        print(f"FAIL {qname}: spark-side error: {msg}")
        n_fail += 1
    missing = set(oracle) - set(result_dirs) - set(errs)
    for qname in sorted(missing):
        print(f"FAIL {qname}: no spark result written")
        n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail"
          + (f", {n_vacuous} VACUOUS (adjudicate: both engines empty)"
             if n_vacuous else ""))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
