#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs after `graft.Verify` has dumped each query's result parquet plus
oracle_sql.json: executes every oracle SQL in DuckDB against the fixture
tables and compares against the Spark result — column names (sorted),
row count, values, AND column types. Exits nonzero on any mismatch.

The type check is the round-9 lesson: the driver's hash is typed, so a
DuckDB HUGEINT (from uncast integer SUM/"//" arithmetic) against a Spark
BIGINT fails the driver even when every value is equal. Value-only
comparison is blind to that; this gate is not.

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import os
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


def norm_type(t):
    """Canonical form for a DuckDB type string, for strict compare.

    Only genuinely-equivalent spellings are collapsed; width/precision
    drift (HUGEINT vs BIGINT, FLOAT vs DOUBLE, DECIMAL vs anything) stays
    distinct because the driver's typed hash distinguishes them.
    Spark writes session-UTC timestamps that DuckDB reads back as
    TIMESTAMP WITH TIME ZONE while oracle casts say TIMESTAMP — same
    int64-micros payload, so those collapse.
    """
    t = str(t).upper()
    t = t.replace("TIMESTAMP WITH TIME ZONE", "TIMESTAMP")
    return t


def type_drift(want, got):
    """Per-column type mismatches between oracle and Spark relations."""
    wt = {c.lower(): norm_type(t) for c, t in zip(want.columns, want.types)}
    gt = {c.lower(): norm_type(t) for c, t in zip(got.columns, got.types)}
    return [(c, wt[c], gt[c]) for c in sorted(wt)
            if c in gt and wt[c] != gt[c]]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            # Spark-written fixture (e.g. GenSf's real sf1.0) — a directory
            # of part files rather than the driver's single-file layout
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
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
        drift = type_drift(want, got)
        if drift:
            failures.append(
                (name, "type drift (oracle vs spark): " + ", ".join(
                    f"{c}: {w} vs {g}" for c, w, g in drift)))
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
