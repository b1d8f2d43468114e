#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs after `graft.Verify` has dumped each query's result parquet plus
oracle_sql.json: executes every oracle SQL in DuckDB against the fixture
tables and compares against the Spark result — column names (sorted),
row count, and values. Exits nonzero on any mismatch.

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if hasattr(v, "isoformat"):  # datetime/date — compare at micro precision
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def key(row):
    return tuple((repr(type(x).__name__), repr(x)) for x in row)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            want = con.sql(sql)
            want_cols = [c.lower() for c in want.columns]
            want_rows = [tuple(norm(v) for v in r) for r in want.fetchall()]
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [c.lower() for c in got.columns]
            got_rows = [tuple(norm(v) for v in r) for r in got.fetchall()]
        except Exception as e:
            failures.append((name, f"spark result unreadable: {e}"))
            continue
        if sorted(got_cols) != sorted(want_cols):
            failures.append((name, f"columns differ: spark={sorted(got_cols)} "
                                   f"oracle={sorted(want_cols)}"))
            continue
        # align column order by name (driver sorts columns by name)
        gperm = [got_cols.index(c) for c in sorted(got_cols)]
        wperm = [want_cols.index(c) for c in sorted(want_cols)]
        g = sorted([tuple(r[i] for i in gperm) for r in got_rows], key=repr)
        w = sorted([tuple(r[i] for i in wperm) for r in want_rows], key=repr)
        if len(g) != len(w):
            failures.append((name, f"row count: spark={len(g)} oracle={len(w)}"))
            continue
        bad = [(a, b) for a, b in zip(g, w) if a != b]
        if bad:
            failures.append(
                (name, f"{len(bad)}/{len(g)} rows differ; first: "
                       f"spark={bad[0][0]} oracle={bad[0][1]}"))
        else:
            print(f"  OK   {name}: {len(g)} rows")
    for name, msg in failures:
        print(f"  FAIL {name}: {msg}")
    print(f"{len(oracle) - len(failures)}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
