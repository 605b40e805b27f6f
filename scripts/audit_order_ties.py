#!/usr/bin/env python3
"""Audit oracle ORDER BY totality against the actual data.

The driver's compare is positional, so a query whose final ORDER BY
admits ties between rows that DIFFER in some emitted column is a
latent flake: both engines may emit the tied rows in either order
(this bit c12_window_frames — the synthetic lineitem has duplicate
(l_orderkey, l_linenumber) pairs). For every oracle whose trailing
ORDER BY names plain output columns, this runs the SQL in DuckDB and
flags any sort-key tie group whose rows are not identical in every
column. Queries whose ORDER BY uses expressions or aliases not in the
output are reported as 'manual' for eyeball review.

Usage: python3 scripts/audit_order_ties.py <sfdir> <oracle_sql.json>
"""
import sys, json, re
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def order_cols(sql: str):
    """(columns, limit) of the LAST ORDER BY (greedy prefix → final
    clause), or None if unparsable (window-spec/expression sorts go to
    manual). limit is None when the query has no trailing LIMIT."""
    m = re.search(r".*\bORDER\s+BY\s+(.*?)(LIMIT\s+(\d+))?\s*$",
                  sql.strip(), re.IGNORECASE | re.DOTALL)
    if not m:
        return None
    cols = []
    for part in m.group(1).split(","):
        c = part.strip()
        c = re.sub(r"\s+(ASC|DESC)(\s+NULLS\s+(FIRST|LAST))?$", "", c,
                   flags=re.IGNORECASE)
        if not re.fullmatch(
                r"([A-Za-z_][A-Za-z0-9_]*\.)?[A-Za-z_][A-Za-z0-9_]*|\d+", c):
            return None  # expression — manual review
        cols.append(c.split(".")[-1])  # strip table qualifier
    return cols, (int(m.group(3)) if m.group(3) else None)


# Permanently adjudicated queries (VERDICT r12 item #7) — each entry is
# a PROOF of tie-safety that the mechanical column check cannot express,
# reviewed and recorded here so the audit is zero-residue:
ADJUDICATED = {
    "c12_window_frames":
        "sorts on (l_suppkey, l_shipdate, l_orderkey, l_linenumber, "
        "l_quantity); the payload columns are ROWS-frame aggregates "
        "that read ONLY l_quantity, which is itself part of the tie "
        "key — permuting rows inside any tie group leaves every "
        "frame's quantity multiset (hence every emitted value, hence "
        "the positional compare) unchanged",
}


def main():
    sfdir, oracle_path = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    flagged, manual, adjudicated, ok = [], [], [], 0

    def single_row(sql):
        """A <=1-row result is order-free regardless of its ORDER BY
        (or lack of one) — the mechanical closure for scalar-aggregate
        oracles (q_chisq, tx_zipf_slope)."""
        try:
            return len(con.execute(sql).fetchdf()) <= 1
        except Exception:
            return False

    for name in sorted(oracle):
        sql = oracle[name]
        if name in ADJUDICATED:
            adjudicated.append(name)
            continue
        parsed = order_cols(sql)
        if parsed is None:
            if single_row(sql):
                ok += 1
            else:
                manual.append(name)
            continue
        cols, limit = parsed
        try:
            if limit is not None:
                # fetch one extra row: a boundary tie with an EXCLUDED
                # row that differs in payload is also a flake (engines
                # may pick either variant into the limited result)
                df = con.execute(re.sub(
                    r"LIMIT\s+\d+\s*$", f"LIMIT {limit + 1}",
                    sql.strip(), flags=re.IGNORECASE)).fetchdf()
            else:
                df = con.execute(sql).fetchdf()
        except Exception as e:
            flagged.append((name, f"oracle error: {e}"))
            continue
        # positional ORDER BY (e.g. ORDER BY 1, 2) → resolve to names
        cols = [df.columns[int(c) - 1] if c.isdigit() else c for c in cols]
        if not set(cols) <= set(df.columns):
            if len(df) <= 1:
                ok += 1  # single-row: order-free
            else:
                manual.append(name)  # sorts on a non-emitted column
            continue
        payload = [c for c in df.columns if c not in cols]
        if not payload:
            ok += 1  # output == sort key: ties are interchangeable
            continue
        # hash full rows and sort-key rows; a tie group is bad iff it
        # contains more than one distinct full row
        def h(sub):
            return pd.util.hash_pandas_object(
                sub.astype(str), index=False)
        g = pd.DataFrame({"k": h(df[cols]), "r": h(df)})
        bad = (g.groupby("k")["r"].nunique() > 1)
        nbad = int(bad.sum())
        if nbad:
            flagged.append((name, f"{nbad} sort-key tie group(s) with "
                            f"differing payload (cols={cols})"))
        else:
            ok += 1
    for name, why in flagged:
        print(f"FLAG {name}: {why}")
    for name in adjudicated:
        print(f"ADJUDICATED {name}: {ADJUDICATED[name]}")
    if manual:
        print(f"manual review (expression/non-output ORDER BY): "
              f"{', '.join(manual)}")
    print(f"\n{ok} total-order ok, {len(flagged)} flagged, "
          f"{len(adjudicated)} adjudicated, "
          f"{len(manual)} manual of {len(oracle)}")
    # manual rows are residue: the audit is only clean at zero
    sys.exit(1 if (flagged or manual) else 0)


if __name__ == "__main__":
    main()
