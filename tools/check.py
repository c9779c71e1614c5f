#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev tool only — the
shipped engine is the Scala library; this script just lets the builder run
the DuckDB-oracle compare before committing).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the matching
SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the same source
tables, then compares: column names (sorted), row counts, and values (rows
sorted by all columns, column order normalized).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def values_equal(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb
    except (TypeError, ValueError):
        pass
    return str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Optional 3rd arg: comma-separated query names — check only those
    # (matches Verify's own name filter, for single-query iteration).
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    if only is not None:
        oracle = {k: v for k, v in oracle.items() if k in only}
    failures = []
    import glob
    import os
    result_dirs = sorted(
        d.rstrip("/").split("/")[-1]
        for d in glob.glob(f"{out_dir}/*/") if "=" not in d)
    if only is not None:
        result_dirs = [d for d in result_dirs if d in only]
    # A query that crashed in Verify has no output dir; iterating only the
    # dirs that exist would silently skip it (round-1 bug). Check the union
    # of oracle keys and output dirs, plus Verify's own error report.
    try:
        verrs = json.load(open(f"{out_dir}/errors.json"))
    except Exception:
        verrs = {}
    if only is not None:
        # A filtered run must not go red on some OTHER query's stale
        # failure record from a previous full Verify.
        verrs = {k: v for k, v in verrs.items() if k in only}
    for name, msg in sorted(verrs.items()):
        failures.append((name, f"verify reported failure: {msg}"))
    for name in sorted(oracle):
        if name not in result_dirs and name not in verrs:
            failures.append((name, "oracle entry has no spark output dir"))
    for name in result_dirs:
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            failures.append((name, f"spark output unreadable: {e}"))
            continue
        if name not in oracle:
            print(f"[rows-only] {name}: {len(got)} rows")
            if len(got) == 0:
                failures.append((name, "no oracle and 0 rows"))
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            failures.append((name, f"oracle sql failed: {e}"))
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            failures.append((name, f"columns {list(g.columns)} != {list(e.columns)}"))
            continue
        if len(g) != len(e):
            failures.append((name, f"row count {len(g)} != {len(e)}"))
            continue
        bad = None
        for col in g.columns:
            # The driver's gate hashes dtype-faithful canonical strings, so
            # Spark bigint 99111 vs DuckDB HUGEINT->float64 99111.0 fails
            # there even when float(a)==float(b). Mirror that strictness:
            # an int-kind column on one side and float-kind on the other is
            # a failure regardless of values (round-2 finding: this gap let
            # three red rows pass locally).
            gk, ek = g[col].dtype.kind, e[col].dtype.kind
            if {gk, ek} <= {"i", "u", "f"} and ("f" in (gk, ek)) and gk != ek:
                bad = (f"col {col}: dtype kind mismatch "
                       f"spark={g[col].dtype} oracle={e[col].dtype}")
                break
            gv, ev = g[col].tolist(), e[col].tolist()
            for i, (x, y) in enumerate(zip(gv, ev)):
                if not values_equal(x, y):
                    bad = f"col {col} row {i}: spark={x!r} oracle={y!r}"
                    break
            if bad:
                break
        if bad:
            failures.append((name, bad))
        else:
            print(f"[ok] {name}: {len(g)} rows")
    print()
    if failures:
        for n, msg in failures:
            print(f"[FAIL] {n}: {msg}")
        sys.exit(1)
    print(f"ALL PASS ({len(result_dirs)} queries)")


if __name__ == "__main__":
    main()
